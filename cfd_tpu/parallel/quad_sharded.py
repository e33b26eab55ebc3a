"""The flagship quad/Pallas cavity step under shard_map (multi-chip).

VERDICT round-2 item 1: the 10x single-chip fast path (kernels.quad
tentative-state carry + fused V-cycle level 0) made SPMD, so the flagship
number survives scale-out instead of reverting to the whole-array XLA
sharded path (parallel.sharded.ShardedCavity).

Decomposition: 1-D over quad PLANE ROWS (kernels.quad.quad_shard_dims).
The red/black parity of the quad layout lives entirely in the plane index
q = 2*(j%2) + (i%2) — a plane-row split never flips the coloring across
devices, which is what makes the kernels shardable at all. Each device owns
P plane rows (P % 8 == 0) and carries them bracketed by 8-row neighbor halo
strips, refreshed with ``lax.ppermute`` between kernel invocations; 8 rows
is exactly the kernels' slab halo, so the existing band-shrink bookkeeping
absorbs device-edge staleness the same way it absorbs slab-edge staleness
(the kernels just receive a traced global ``row_base``).

V-cycle layout per solve iteration:

* level 0 (dominant cost): the fused quad Pallas kernels
  (pre_smooth_restrict / post_prolong_smooth) on local blocks;
* level 1: XLA red/black smoothing on the local aligned blocks with the
  same band bookkeeping — the 8-row halo covers a full pre(2 pairs)+
  residual+post(1 pair) block with NO mid-level exchange (7 rows consumed);
* level 2 down to the dense-pinv coarsest solve: residual all_gathered and
  the tiny tail run REPLICATED on every device (identical redundant FLOPs
  beat any communication at those sizes — same coarse-switch pattern as
  parallel.mg_sharded).

Per V-cycle communication: 3 halo refreshes (p, rc, ec — 8-row strips), one
small all_gather (level-2 source), and the pmax residual scalar. The
tolerance while_loop sees replicated scalars, so every device runs the same
cycle count and the iterates match the single-device quad solver to f32
roundoff on owned rows (asserted in tests/test_quad_sharded.py).

Reference anchor: this replaces the reference's SOR hot loop
(cavity-01.cpp:609-690) at scale; sharding design per SURVEY.md section 5.7.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P_

from cfd_tpu.kernels.quad import (
    from_quad,
    make_quad_channel_corr_predictor_source,
    make_quad_channel_corrector,
    make_quad_corr_predictor_source,
    make_quad_corrector,
    make_quad_post_prolong_smooth,
    make_quad_pre_smooth_restrict,
    quad_dims,
    quad_shard_dims,
    to_quad,
    uncorrect_quad,
)
from cfd_tpu.poisson import multigrid as M
from cfd_tpu.state import State
from cfd_tpu.solver import Case

DEV_HALO = 8


def _shard_map(f, mesh, in_specs, out_specs):
    """shard_map with varying-mesh-axis checking off: pallas_call's
    out_shape ShapeDtypeStructs carry no vma annotation, which trips
    check_vma inside an SPMD body (the collectives are still type-checked
    by execution; correctness is asserted against the single-device path
    in tests/test_quad_sharded.py)."""
    try:
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    except TypeError:  # pragma: no cover - older jax spelling
        from jax.experimental.shard_map import shard_map as _esm

        return _esm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                    check_rep=False)


def _shift_perm(n: int, direction: int) -> list[tuple[int, int]]:
    if direction > 0:
        return [(i, i + 1) for i in range(n - 1)]
    return [(i + 1, i) for i in range(n - 1)]


def _refresh(x, P: int, mdy: int, axis: str):
    """Refresh the DEV_HALO-row halo strips of a local extended array
    (rows axis = -2; works for (4, P+16, W) quad and (P+16, W) flat).
    Edge devices receive ppermute's zero fill — their halo rows are dead
    (outside the padded global grid) and masked by every consumer."""
    if mdy == 1:
        return x
    h = DEV_HALO
    nd = x.ndim
    idx = (0,) * nd

    def rows(lo, size):
        sl = [slice(None)] * nd
        sl[-2] = slice(lo, lo + size)
        return tuple(sl)

    from_south = lax.ppermute(x[rows(P, h)], axis, _shift_perm(mdy, +1))
    from_north = lax.ppermute(x[rows(h, h)], axis, _shift_perm(mdy, -1))
    x = lax.dynamic_update_slice(x, from_south, idx)
    top = (0,) * (nd - 2) + (P + h, 0)
    return lax.dynamic_update_slice(x, from_north, top)


def _refresh_many(arrs, P: int, mdy: int, axis: str):
    """One ppermute pair for SEVERAL same-shaped extended arrays (the
    step's us*/vs*/b/guess refresh points): the 8-row strips are stacked
    along a new leading axis so each direction is ONE collective instead
    of one per array — on a real ICI ring this cuts the per-step halo
    latency terms 2k -> 2 at identical byte volume (VERDICT round-4
    item 5, "fuse the refreshes"). Value-identical to mapping
    ``_refresh`` (same strips, same permutation); equivalence is pinned
    by the sharded-vs-single-device trajectory tests."""
    if mdy == 1:
        return tuple(arrs)
    h = DEV_HALO
    nd = arrs[0].ndim

    def rows(lo, size):
        sl = [slice(None)] * (nd + 1)
        sl[-2] = slice(lo, lo + size)
        return tuple(sl)

    stack = jnp.stack(arrs)
    from_south = lax.ppermute(stack[rows(P, h)], axis, _shift_perm(mdy, +1))
    from_north = lax.ppermute(stack[rows(h, h)], axis, _shift_perm(mdy, -1))
    stack = lax.dynamic_update_slice(stack, from_south, (0,) * (nd + 1))
    top = (0,) * (nd - 1) + (P + h, 0)  # nd+1 indices: stack adds one dim
    stack = lax.dynamic_update_slice(stack, from_north, top)
    return tuple(stack[i] for i in range(len(arrs)))


def _row_vec_global(w_full: np.ndarray, ny: int, length: int) -> jnp.ndarray:
    """(length, 1) globally-indexed row vector with a DEV_HALO zero prefix:
    v[DEV_HALO + g] = w_full[g, 1] for padded rows g (0 outside 1..ny)."""
    v = np.zeros(length)
    src = np.zeros(w_full.shape[0])
    src[1 : ny + 1] = w_full[1 : ny + 1, 1]
    v[DEV_HALO : DEV_HALO + src.size] = src
    return jnp.asarray(v, jnp.float32).reshape(length, 1)


def _sub_mean_local(b, mean, rb, ny: int, nx: int,
                    step_rect: tuple[int, int] | None = None):
    """b - mean on interior cells of a local extended quad block (global
    row index jj = 2*(rb + local_row) + plane parity, so halo rows receive
    the same treatment as their owning device and stay consistent without
    an extra refresh; edge-device dead halo rows fall outside 1..ny).
    ``step_rect`` = (step_i, inlet_j): exclude the backward-step solid
    rectangle (fluid-only mean, backwards_step-01.cpp:843-865)."""
    q = lax.broadcasted_iota(jnp.int32, b.shape, 0)
    l = lax.broadcasted_iota(jnp.int32, b.shape, 1)
    i = lax.broadcasted_iota(jnp.int32, b.shape, 2)
    jj = 2 * (rb + l) + (q >> 1)
    ii = 2 * i + (q & 1)
    cell = (jj >= 1) & (jj <= ny) & (ii >= 1) & (ii <= nx)
    if step_rect is not None:
        step_i, inlet_j = step_rect
        cell = cell & ~((ii <= step_i) & (jj > inlet_j))
    return jnp.where(cell, b - mean, b)


def make_sharded_quad_solve(problem: M.PoissonProblem, cfg: M.MGConfig,
                            shape: tuple[int, int], mdy: int,
                            interpret: bool = False, axis: str = "dy",
                            pin_mean: bool = False):
    """Build solve_local(guess, b, rb, jy, max_b) for use inside a
    shard_map body over an ``axis``-sized-``mdy`` mesh axis.

    ``guess``/``b`` are local extended quad blocks (4, P+16, Wqa) with
    FRESH halos; ``rb`` = jy*P - DEV_HALO (traced); ``max_b`` the global
    max|b| (already pmaxed). Returns (p, cycles, residual_inf) with p's
    halos fresh and replicated scalars.

    ``pin_mean``: pure-Neumann flavor (Rayleigh-Benard) — subtract the
    global interior mean of p after every V-cycle (psummed own-row
    partials; the subtraction is globally indexed so halo rows stay
    consistent, and the fused residual stays valid because the constant
    is exactly the nullspace — same argument as the single-device path,
    poisson.multigrid make_multigrid_poisson)."""
    if cfg.whole_solve or cfg.whole_step:
        # the whole-solve/whole-step kernels need the full fine level in
        # one device's VMEM; under shard_map the fine level is SPMD — fail
        # loudly rather than silently running the per-kernel sharded path
        raise ValueError("whole_solve/whole_step are single-device only "
                         "(the sharded path fuses the coarse tail via "
                         "tail_from instead)")
    Hq8s, P, W = quad_shard_dims(shape, mdy)
    dtype = jnp.float32
    loc = (P + 2 * DEV_HALO, W)

    pre_quad = make_quad_pre_smooth_restrict(
        shape, problem, cfg.omega, cfg.pre_sweeps, loc,
        shard=(P, mdy), interpret=interpret)
    post_quad = make_quad_post_prolong_smooth(
        shape, problem, cfg.omega, cfg.post_sweeps, loc,
        shard=(P, mdy), interpret=interpret)

    # hierarchy below the quad level: the SAME aligned levels as the
    # single-device quad path (poisson.multigrid make_multigrid_poisson
    # aligned_io), so cycle counts and iterates coincide
    probs = [problem]
    while (probs[-1].nx % 2 == 0 and probs[-1].ny % 2 == 0
           and probs[-1].nx // 2 >= cfg.min_coarse
           and probs[-1].ny // 2 >= cfg.min_coarse):
        probs.append(M.coarsen_problem(probs[-1]))
    if len(probs) < 3:
        raise ValueError("sharded quad multigrid needs >= 3 levels")
    levels = [M._build_level(p, dtype, aligned=True) for p in probs[1:]]
    L1 = levels[0]
    Hq, Wq, Hq8, Wqa = quad_dims(shape)
    assert L1.shape == (Hq8, Wqa), (L1.shape, (Hq8, Wqa))
    pinv = jnp.asarray(M._dense_pinv(probs[-1]), dtype)
    bot = levels[-1]
    bot_ny, bot_nx = bot.ny, bot.nx

    # level-1 sharded-smoother constants
    p1 = probs[1]
    ny1, nx1 = p1.ny, p1.nx
    idx2_1 = 1.0 / (p1.dx * p1.dx)
    idy2_1 = 1.0 / (p1.dy * p1.dy)
    wE1 = L1.wE  # (1, W) aligned column vectors, identical on all devices
    wW1 = L1.wW
    wN1g = _row_vec_global(p1.wN, ny1, Hq8s + 2 * DEV_HALO)
    wS1g = _row_vec_global(p1.wS, ny1, Hq8s + 2 * DEV_HALO)

    gmax = lambda x: lax.pmax(x, axis)

    def l1_geom(jy):
        """(interior, red, black, inv, wN, wS) on the local extended
        level-1 block from the device's mesh position."""
        lr = lax.broadcasted_iota(jnp.int32, loc, 0)
        lc = lax.broadcasted_iota(jnp.int32, loc, 1)
        gj = jy * P - DEV_HALO + lr  # global aligned level-1 row
        interior = (gj >= 1) & (gj <= ny1) & (lc >= 1) & (lc <= nx1)
        even = ((gj + lc) % 2) == 0
        off = (jy * P).astype(jnp.int32)  # into the HALO-prefixed vectors
        zero = jnp.asarray(0, jnp.int32)
        wN = lax.dynamic_slice(wN1g, (off, zero), (loc[0], 1))
        wS = lax.dynamic_slice(wS1g, (off, zero), (loc[0], 1))
        denom = idx2_1 * (wE1 + wW1) + idy2_1 * (wN + wS)
        denom = jnp.broadcast_to(denom, loc)
        inv = jnp.where(interior, 1.0 / jnp.where(denom > 0, denom, 1.0),
                        jnp.zeros(loc, dtype))
        return interior, interior & even, interior & ~even, inv, wN, wS

    def l1_band(k, jy):
        """Valid-row band after k half-sweeps of consumption: shrinks from
        the halo edges except where the device touches a physical boundary
        (same bookkeeping as kernels.quad._band_maker, at XLA level)."""
        lr = lax.broadcasted_iota(jnp.int32, loc, 0)
        lo = jnp.where(jy == 0, 0, k)
        hi = jnp.where(jy == mdy - 1, loc[0], loc[0] - k)
        return (lr >= lo) & (lr < hi)

    def l1_half(e, r, mask, geom):
        _, _, _, inv, wN, wS = geom
        gs = (idx2_1 * (wE1 * M._sh(e, 0, 1) + wW1 * M._sh(e, 0, -1))
              + idy2_1 * (wN * M._sh(e, 1, 0) + wS * M._sh(e, -1, 0))
              - r) * inv
        upd = e + cfg.omega * (gs - e)
        return jnp.where(mask, upd.astype(e.dtype), e)

    def l1_residual(e, r, geom, consumed, jy):
        interior = geom[0]
        a = (idx2_1 * (wE1 * (M._sh(e, 0, 1) - e) + wW1 * (M._sh(e, 0, -1) - e))
             + idy2_1 * (geom[4] * (M._sh(e, 1, 0) - e)
                         + geom[5] * (M._sh(e, -1, 0) - e)))
        res = jnp.where(interior & l1_band(consumed + 1, jy), r - a,
                        jnp.zeros_like(r))
        return res

    # ---------------- replicated tail (levels 2..bottom) ----------------

    def rep_smooth(level, p, b, n):
        interior, red, black = M._inline_masks(level)
        inv = M._inv_diag(level, interior)

        def body(_, p):
            p = M._smooth(level, p, b, cfg.omega, red, inv)
            return M._smooth(level, p, b, cfg.omega, black, inv)

        return lax.fori_loop(0, n, body, p)

    def coarse_solve(b):
        vec = b[1 : bot_ny + 1, 1 : bot_nx + 1].reshape(-1)
        e = (pinv.astype(b.dtype) @ vec).reshape(bot_ny, bot_nx)
        out = jnp.zeros(bot.shape, dtype=b.dtype)
        return out.at[1 : bot_ny + 1, 1 : bot_nx + 1].set(e)

    def rep_vcycle(k, p, b):
        level = levels[k]
        if fused_tail is not None and k == tail_k:
            return fused_tail(b)  # p is zeros at every call site
        if k == len(levels) - 1:
            return coarse_solve(b)
        p = rep_smooth(level, p, b, cfg.pre_sweeps)
        r = M._residual(level, p, b)
        rc = M._restrict(level, levels[k + 1], r)
        ec = rep_vcycle(k + 1, jnp.zeros(levels[k + 1].shape, dtype=rc.dtype), rc)
        p = p + M._prolong(levels[k + 1], level, ec)
        return rep_smooth(level, p, b, cfg.post_sweeps)

    # fused replicated tail (kernels.mg_tail): from GLOBAL level
    # cfg.tail_from down, the replicated hierarchy runs as one Pallas call
    # per device instead of per-level XLA dispatches — the multi-chip twin
    # of the single-device tail_from knob. levels[k] is global level k+1;
    # the replicated region starts at levels[1] (global 2), so requests
    # shallower than that clamp to it.
    fused_tail, tail_k = None, None
    if cfg.tail_from is not None:
        start = max(1, cfg.tail_from - 1)
        if start <= len(levels) - 2:
            from cfd_tpu.kernels.mg_tail import make_mg_tail

            fused_tail, tail_k = make_mg_tail(
                levels[start:], cfg.omega, cfg.pre_sweeps, cfg.post_sweeps,
                np.asarray(pinv, np.float32), interpret=interpret), start

    def l1_solve(rc, jy):
        """Level-1 correction for the fresh-haloed local source rc:
        pre pairs + residual + (gather -> replicated levels 2.. -> local
        slice) + post pairs, all within the 8-row halo budget (no mid-level
        exchange; 2*(pre+post) + 1 = 7 rows consumed <= 8)."""
        geom = l1_geom(jy)
        red, black = geom[1], geom[2]
        e = jnp.zeros(loc, dtype=rc.dtype)
        k = 0
        for _ in range(cfg.pre_sweeps):
            e = l1_half(e, rc, red & l1_band(k + 1, jy), geom)
            e = l1_half(e, rc, black & l1_band(k + 2, jy), geom)
            k += 2
        r1 = l1_residual(e, rc, geom, k, jy)
        # coarse switch: gather own rows into the global level-1 residual,
        # run the tiny tail replicated, slice the local correction back out
        r_own = lax.slice_in_dim(r1, DEV_HALO, DEV_HALO + P, axis=0)
        r_g = lax.all_gather(r_own, axis, axis=0, tiled=True)  # (Hq8s, W)
        r_g = lax.slice_in_dim(r_g, 0, Hq8, axis=0)
        rc2 = M._restrict(L1, levels[1], r_g)
        e2 = rep_vcycle(1, jnp.zeros(levels[1].shape, dtype=rc2.dtype), rc2)
        ef_g = M._prolong(levels[1], L1, e2)  # global (Hq8, W), every device
        ef_pad = jnp.pad(ef_g, ((DEV_HALO, Hq8s + DEV_HALO - Hq8), (0, 0)))
        ef = lax.dynamic_slice(
            ef_pad, ((jy * P).astype(jnp.int32), jnp.asarray(0, jnp.int32)),
            loc)
        e = e + ef  # globally-valid correction: halo rows stay consistent
        for _ in range(cfg.post_sweeps):
            e = l1_half(e, rc, red & l1_band(k + 1, jy), geom)
            e = l1_half(e, rc, black & l1_band(k + 2, jy), geom)
            k += 2
        return e  # own rows exact; halos stale by k (caller refreshes)

    rr = partial(_refresh, P=P, mdy=mdy, axis=axis)
    n_int_fine = problem.nx * problem.ny
    ny_f, nx_f = problem.ny, problem.nx
    own_rows = ((lax.broadcasted_iota(jnp.int32, (4,) + loc, 1) >= DEV_HALO)
                & (lax.broadcasted_iota(jnp.int32, (4,) + loc, 1)
                   < DEV_HALO + P))

    def solve_local(guess, b, rb, jy, max_b):
        dtype_ = b.dtype
        tol = jnp.maximum(
            cfg.tol_factor * jnp.where(max_b > 0, max_b, jnp.ones_like(max_b)),
            jnp.asarray(cfg.abs_tol, dtype_))

        def cond(carry):
            _, res, prev, it = carry
            return (res > tol) & (it < cfg.max_cycles) & (res < cfg.stall_ratio * prev)

        def body(carry):
            p, res, _, it = carry
            p, rc = pre_quad(rb, p, b)
            p = rr(p)
            rc = rr(rc)
            ec = l1_solve(rc, jy)
            ec = rr(ec)
            p, part = post_quad(rb, p, b, ec)
            p = rr(p)
            if pin_mean:
                mean = lax.psum(
                    jnp.sum(jnp.where(own_rows, p, 0.0)), axis) / n_int_fine
                p = _sub_mean_local(p, mean.astype(dtype_), rb, ny_f, nx_f)
            return p, gmax(part).astype(dtype_), res, it + 1

        big = jnp.asarray(1e30, dtype_)
        init = (guess, big / 2, big, jnp.asarray(0, jnp.int32))
        p, res, _, iters = lax.while_loop(cond, body, init)
        return p, iters, res

    return solve_local


def make_sharded_masked_step_solve(grid, coeffs, cfg: M.MGConfig,
                                   shape: tuple[int, int], mdy: int,
                                   interpret: bool = False,
                                   axis: str = "dy"):
    """Sharded variant of poisson.multigrid.make_masked_quad_multigrid_
    poisson (the backward-step defect-correction solver): the quad exact
    masked fine level (kernels.step_quad pre/post) runs SPMD on local
    blocks; level 1 (the largest full-2D-weight coarse level, 1/4 of the
    fine cells) band-smooths SPMD too, with the non-separable weights
    sliced per device from the padded global arrays (a dynamic_slice at
    jy*P — no separable row/column split is needed because the weights
    stream as local 2D blocks, exactly like the iterate); only the tail
    BELOW level 1 (~1/12 of the fine cells) runs REPLICATED from an
    all_gathered level-2 source. Grids too small to coarsen twice keep
    the old level-1 coarse switch.

    V(1,1) only: the exact masked fine smoother consumes 3 rows per pair
    (ghost stage + red + black planes), so one pair + the residual/
    restriction fills the 8-row device halo exactly (the kernel factories
    enforce it); the level-1 band pair + residual consumes 3 rows of the
    same budget.

    Returns solve_local(guess, b, rb, jy, max_b) with the
    make_sharded_quad_solve contract."""
    from cfd_tpu.kernels.rb_smoother import rb_pairs_for_level
    from cfd_tpu.kernels.step_quad import (
        make_quad_step_post_prolong_smooth,
        make_quad_step_pre_smooth_restrict,
    )

    if cfg.whole_solve or cfg.whole_step:
        raise ValueError("whole_solve/whole_step are single-device only "
                         "(the sharded path fuses the coarse tail via "
                         "tail_from instead)")
    rect = M.step_rect_params(grid)
    if rect is None:
        raise ValueError("sharded masked multigrid requires the reference's "
                         "step rectangle raster")
    step_i, inlet_j = rect
    if cfg.pre_sweeps != 1 or cfg.post_sweeps != 1:
        raise ValueError(
            f"sharded masked step multigrid runs V(1,1) only, got "
            f"V({cfg.pre_sweeps},{cfg.post_sweeps}) (the exact masked "
            "smoother consumes 3 rows/pair of the 8-row device halo)")
    idx2, idy2 = coeffs.idx2, coeffs.idy2
    dtype = jnp.float32
    Hq8s, P, W = quad_shard_dims(shape, mdy)
    loc = (P + 2 * DEV_HALO, W)

    probs = [M.masked_channel_problem(grid, coeffs.dx, coeffs.dy)]
    while (probs[-1].nx % 2 == 0 and probs[-1].ny % 2 == 0
           and probs[-1].nx // 2 >= cfg.min_coarse
           and probs[-1].ny / 2 >= cfg.min_coarse):
        probs.append(M.coarsen_problem(probs[-1]))
    if len(probs) < 2:
        raise ValueError("grid too small for the sharded masked hierarchy")
    levels = [M._build_level(p, dtype, aligned=True, allow_full=True)
              for p in probs[1:]]
    Hq, Wq, Hq8, Wqa = quad_dims(shape)
    if levels[0].shape != (Hq8, Wqa):
        raise ValueError(f"aligned coarse shape {levels[0].shape} != quad "
                         f"plane shape {(Hq8, Wqa)}")
    pinv = jnp.asarray(M._dense_pinv(probs[-1]), dtype)
    bot = levels[-1]
    bot_ny, bot_nx = bot.ny, bot.nx

    pre = make_quad_step_pre_smooth_restrict(
        shape, step_i, inlet_j, idx2, idy2, cfg.omega, cfg.pre_sweeps,
        loc, shard=(P, mdy), interpret=interpret)
    post = make_quad_step_post_prolong_smooth(
        shape, step_i, inlet_j, idx2, idy2, cfg.omega, cfg.post_sweeps,
        loc, shard=(P, mdy), interpret=interpret)

    # level 1 runs SPMD (band-smoothed below) when a level 2 exists; the
    # replicated Pallas tail then starts at levels[1]
    l1_spmd = len(levels) >= 2
    rep_lo = 1 if l1_spmd else 0
    # fused-tail start (levels index; global level tail_k+1) decided up
    # front so per-level closures are only built for reachable levels
    tail_k = None
    if cfg.tail_from is not None and l1_spmd:
        _start = max(1, cfg.tail_from - 1)
        if _start <= len(levels) - 2:
            tail_k = _start
    pallas_pre_field = {}
    pallas_post = {}
    for k in range(rep_lo, len(levels) - 1 if tail_k is None else tail_k):
        pallas_pre_field[k] = rb_pairs_for_level(
            levels[k], cfg.omega, cfg.pre_sweeps, with_residual_field=True,
            interpret=interpret, aligned_io=True)
        pallas_post[k] = rb_pairs_for_level(
            levels[k], cfg.omega, cfg.post_sweeps, interpret=interpret,
            aligned_io=True)

    # --- level-1 SPMD band smoother constants (sliced full-2D weights) ---
    L1 = levels[0]
    p1 = probs[1]
    ny1, nx1 = p1.ny, p1.nx
    idx2_1 = 1.0 / (p1.dx * p1.dx)
    idy2_1 = 1.0 / (p1.dy * p1.dy)
    Hq8_, Wqa_ = L1.shape
    pad_g = lambda a: jnp.pad(
        jnp.asarray(a, dtype), ((DEV_HALO, Hq8s + DEV_HALO - Hq8_), (0, 0)))
    wEg, wWg = pad_g(L1.wE), pad_g(L1.wW)
    wNg, wSg = pad_g(L1.wN), pad_g(L1.wS)

    def l1_geom(jy):
        """(interior, red, black, inv, wE, wW, wN, wS) on the local
        extended level-1 block: weights dynamic-sliced from the padded
        global arrays at the device's mesh position, decoupled cells
        (denom == 0, e.g. inside the solid rectangle) excluded exactly as
        multigrid._inline_masks does for non-separable levels."""
        off = (jy * P).astype(jnp.int32)
        zero = jnp.asarray(0, jnp.int32)
        sl = lambda g: lax.dynamic_slice(g, (off, zero), loc)
        wE, wW, wN, wS = sl(wEg), sl(wWg), sl(wNg), sl(wSg)
        lr = lax.broadcasted_iota(jnp.int32, loc, 0)
        lc = lax.broadcasted_iota(jnp.int32, loc, 1)
        gj = jy * P - DEV_HALO + lr
        denom = idx2_1 * (wE + wW) + idy2_1 * (wN + wS)
        interior = ((gj >= 1) & (gj <= ny1) & (lc >= 1) & (lc <= nx1)
                    & (denom > 0))
        even = ((gj + lc) % 2) == 0
        inv = jnp.where(interior,
                        1.0 / jnp.where(denom > 0, denom,
                                        jnp.ones_like(denom)),
                        jnp.zeros(loc, dtype))
        return interior, interior & even, interior & ~even, inv, wE, wW, wN, wS

    def l1_band(k, jy):
        lr = lax.broadcasted_iota(jnp.int32, loc, 0)
        lo = jnp.where(jy == 0, 0, k)
        hi = jnp.where(jy == mdy - 1, loc[0], loc[0] - k)
        return (lr >= lo) & (lr < hi)

    def l1_half(e, r, mask, geom):
        _, _, _, inv, wE, wW, wN, wS = geom
        gs = (idx2_1 * (wE * M._sh(e, 0, 1) + wW * M._sh(e, 0, -1))
              + idy2_1 * (wN * M._sh(e, 1, 0) + wS * M._sh(e, -1, 0))
              - r) * inv
        upd = e + cfg.omega * (gs - e)
        return jnp.where(mask, upd.astype(e.dtype), e)

    def l1_residual(e, r, geom, consumed, jy):
        interior, _, _, _, wE, wW, wN, wS = geom
        a = (idx2_1 * (wE * (M._sh(e, 0, 1) - e) + wW * (M._sh(e, 0, -1) - e))
             + idy2_1 * (wN * (M._sh(e, 1, 0) - e)
                         + wS * (M._sh(e, -1, 0) - e)))
        return jnp.where(interior & l1_band(consumed + 1, jy), r - a,
                         jnp.zeros_like(r))

    def coarse_solve(b):
        vec = b[1 : bot_ny + 1, 1 : bot_nx + 1].reshape(-1)
        e = (pinv.astype(b.dtype) @ vec).reshape(bot_ny, bot_nx)
        out = jnp.zeros(bot.shape, dtype=b.dtype)
        return out.at[1 : bot_ny + 1, 1 : bot_nx + 1].set(e)

    # fused replicated tail below the SPMD level 1 (see
    # make_sharded_quad_solve; full-2D-weight flavor here). levels[k] is
    # global level k+1; the replicated region starts at levels[1].
    fused_tail = None
    if tail_k is not None:
        from cfd_tpu.kernels.mg_tail import make_mg_tail

        fused_tail = make_mg_tail(
            levels[tail_k:], cfg.omega, cfg.pre_sweeps, cfg.post_sweeps,
            np.asarray(pinv, np.float32), interpret=interpret)

    def cvcycle(k, p, b):
        level = levels[k]
        if fused_tail is not None and k == tail_k:
            return fused_tail(b)  # p is zeros at every call site
        if k == len(levels) - 1:
            return coarse_solve(b)
        p, r = pallas_pre_field[k](p, b)
        rc = M._restrict(level, levels[k + 1], r)
        ec = cvcycle(k + 1, jnp.zeros(levels[k + 1].shape, dtype=rc.dtype),
                     rc)
        p = p + M._prolong(levels[k + 1], level, ec)
        return pallas_post[k](p, b)

    rr = partial(_refresh, P=P, mdy=mdy, axis=axis)
    gmax = lambda x: lax.pmax(x, axis)

    def slice_local(glob_field, jy):
        """Globally-valid (Hq8, W) field -> local extended block (halo rows
        consistent by construction — every device slices the same array)."""
        gp = jnp.pad(glob_field, ((DEV_HALO, Hq8s + DEV_HALO - Hq8),
                                  (0, 0)))
        return lax.dynamic_slice(
            gp, ((jy * P).astype(jnp.int32), jnp.asarray(0, jnp.int32)),
            loc)

    def l1_solid_fill(e, jy):
        """Local-block twin of multigrid._solid_fill: Neumann-extend the
        level-1 correction into solid cells (fluid-4-neighbor average)
        before the post kernel's mask-blind in-kernel 1->0 prolongation —
        the fix for the barely-contracting masked near-wall mode (see
        multigrid._solid_fill for the measured factors).  Requires fresh
        halos; the outermost halo row reads outside the block, so callers
        refresh again afterwards."""
        interior, _, _, _, _, _, _, _ = l1_geom(jy)  # fluid cells only
        lr = lax.broadcasted_iota(jnp.int32, loc, 0)
        lc = lax.broadcasted_iota(jnp.int32, loc, 1)
        gj = jy * P - DEV_HALO + lr
        geo = (gj >= 1) & (gj <= ny1) & (lc >= 1) & (lc <= nx1)
        f = interior.astype(e.dtype)
        ef = e * f
        num = (M._sh(ef, 0, 1) + M._sh(ef, 0, -1)
               + M._sh(ef, 1, 0) + M._sh(ef, -1, 0))
        den = (M._sh(f, 0, 1) + M._sh(f, 0, -1)
               + M._sh(f, 1, 0) + M._sh(f, -1, 0))
        fill = num / jnp.maximum(den, jnp.ones_like(den))
        return jnp.where(geo & ~interior & (den > 0), fill.astype(e.dtype),
                         e)

    def l1_solve(rc, jy):
        """Level-1 correction for the fresh-haloed local source rc: one
        red/black pair + residual (3 halo rows consumed), coarse switch at
        level 2 (gather own rows of the level-1 residual, restrict + run
        the tiny replicated tail, slice the local correction back), post
        pair. Own rows exact; halos stale by the band (caller refreshes)."""
        geom = l1_geom(jy)
        red, black = geom[1], geom[2]
        e = jnp.zeros(loc, dtype=rc.dtype)
        k = 0
        for _ in range(cfg.pre_sweeps):
            e = l1_half(e, rc, red & l1_band(k + 1, jy), geom)
            e = l1_half(e, rc, black & l1_band(k + 2, jy), geom)
            k += 2
        r1 = l1_residual(e, rc, geom, k, jy)
        r_own = lax.slice_in_dim(r1, DEV_HALO, DEV_HALO + P, axis=0)
        r_g = lax.all_gather(r_own, axis, axis=0, tiled=True)
        r_g = lax.slice_in_dim(r_g, 0, Hq8, axis=0)
        rc2 = M._restrict(L1, levels[1], r_g)
        e2 = cvcycle(1, jnp.zeros(levels[1].shape, dtype=rc2.dtype), rc2)
        ef_g = M._prolong(levels[1], L1, e2)
        e = e + slice_local(ef_g, jy)
        for _ in range(cfg.post_sweeps):
            e = l1_half(e, rc, red & l1_band(k + 1, jy), geom)
            e = l1_half(e, rc, black & l1_band(k + 2, jy), geom)
            k += 2
        return e

    def solve_local(guess, b, rb, jy, max_b):
        dtype_ = b.dtype
        tol = jnp.maximum(
            cfg.tol_factor * jnp.where(max_b > 0, max_b,
                                       jnp.ones_like(max_b)),
            jnp.asarray(cfg.abs_tol, dtype_))

        def cond(carry):
            _, res, prev, it = carry
            return ((res > tol) & (it < cfg.max_cycles)
                    & (res < cfg.stall_ratio * prev))

        def body(carry):
            p, res, _, it = carry
            p, rc = pre(rb, p, b)
            p = rr(p)
            if l1_spmd:
                # level 1 band-smooths SPMD on the fresh-haloed local
                # source; only the tail below it runs replicated
                rc = rr(rc)
                ec = l1_solve(rc, jy)
                # solid-fill needs fresh halos and invalidates the
                # outermost halo row — refresh around it
                ec = rr(l1_solid_fill(rr(ec), jy))
            else:
                # grids too small to coarsen twice: defect-correction
                # coarse switch at level 1 — gather own rows of the
                # restricted residual, run the full-2D-weight hierarchy
                # replicated (bitwise-identical on every device), slice
                # the local correction back out
                rc_own = lax.slice_in_dim(rc, DEV_HALO, DEV_HALO + P,
                                          axis=0)
                rc_g = lax.all_gather(rc_own, axis, axis=0, tiled=True)
                rc_g = lax.slice_in_dim(rc_g, 0, Hq8, axis=0)
                ec_g = cvcycle(0, jnp.zeros(levels[0].shape,
                                            dtype=rc_g.dtype), rc_g)
                # solid-fill before the post kernel's mask-blind in-kernel
                # prolongation (global array: no halo bookkeeping needed)
                ec = slice_local(M._solid_fill(levels[0], ec_g), jy)
            p, part = post(rb, p, b, ec)
            p = rr(p)
            return p, gmax(part).astype(dtype_), res, it + 1

        big = jnp.asarray(1e30, dtype_)
        init = (guess, big / 2, big, jnp.asarray(0, jnp.int32))
        p, res, _, iters = lax.while_loop(cond, body, init)
        return p, iters, res

    return solve_local


class ShardedQuadProjection:
    """Multi-chip projection solver (cavity or channel flavor) on the
    quad/Pallas fast path.

    State: 4 extended-stacked global arrays (4, mdy*(P+16), Wqa) sharded
    over a 1-D ("dy",) mesh — each device's slice is its local quad block
    with halo strips (the tentative-carry fields us*, vs*, p, p_prev).
    ``step``/``multi_step`` are jitted shard_map SPMD programs;
    ``logical_state`` gathers and converts to the padded (ny+2, nx+2)
    layout for stats/export (print cadence only).

    Flavor differences (dispatched on ``case.ordering``):

    * cavity — rho-multiplied corrector (cavity-01.cpp:695-711), max|b|
      fused into the step kernel (pmaxed partials feed the tolerance);
    * channel — rho-divided corrector + inlet/outlet BCs
      (channel-01.cpp:513-541, 693-702), source mean removal over the
      global interior (the kernel's own-row partial sums are psummed, the
      mean subtracted on globally-indexed cells so halo rows stay
      consistent without an extra exchange), tolerance base max|b|
      computed after the removal as on the single-device path.
    * rayleigh_benard — the fused tentative-carry RB kernel
      (kernels.rb_quad: corrector + T advection-diffusion + predictor +
      buoyancy + source) with the carry (us*, vs*, p, T) instead of
      (us*, vs*, p, p_prev); pure-Neumann V-cycle with psummed per-cycle
      mean pinning; guess = p (RB uses no extrapolated warm start). No
      reference code exists for RB (README.md:79-94) — semantics match
      physics.boussinesq's single-device quad path.
    * backwards_step — the fused masked tentative-carry kernel
      (kernels.step_quad: iota-derived step-rectangle masks) with the
      3-array carry (us*, vs*, p) — no extrapolated warm start (MEASURED
      to hurt the masked defect correction, kernels.step_quad docstring);
      fluid-only psummed mean removal; the defect-correction solve
      (make_sharded_masked_step_solve) runs the quad exact masked fine
      level AND the sliced-2D-weight level 1 SPMD, with only the tail
      below level 2 (~1/12 of the cells) replicated.
      V(1,1) fine level (8-row halo budget of the exact masked smoother).
      Reference: backwards_step-01.cpp:685-740 (the masked SOR this
      replaces at scale).
    """

    # Largest mesh the 1-D plane-row decomposition is validated/modeled
    # for: tools/comm_model.py (honest round-5 inputs incl. the measured
    # sharded-builder bookkeeping efficiency) puts the parallel efficiency
    # at ~0.38-0.50 by 8 chips and ~0.26-0.36 at 16 (replicated coarse
    # tail + halo/ICI time + band bookkeeping), and Mosaic's 128-lane
    # column-halo granularity makes a 2-D split unprofitable at the target
    # sizes (PARITY.md round-5 final decision). Past this the factory
    # refuses loudly instead of silently scaling badly.
    MAX_VALIDATED_MESH = 16

    def __init__(self, case: Case, mesh, interpret: bool = False,
                 axis: str = "dy", tol_factor: float | None = None,
                 mg_overrides: dict | None = None,
                 allow_unvalidated_mesh: bool = False,
                 force_sharded_path: bool = False):
        from cfd_tpu.poisson.multigrid import (MGConfig, cavity_problem,
                                               channel_problem,
                                               neumann_problem)

        grid = case.grid
        flavor = (case.name if case.name in ("rayleigh_benard",
                                             "backwards_step")
                  else case.ordering)
        if flavor not in ("cavity", "channel", "rayleigh_benard",
                          "backwards_step"):
            raise ValueError("ShardedQuadProjection covers the cavity, "
                             "channel, rayleigh_benard and backwards_step "
                             "flavors")
        if grid.has_solids and flavor != "backwards_step":
            raise ValueError("masked geometry is supported only for the "
                             "backwards_step rectangle raster")
        if flavor in ("rayleigh_benard", "backwards_step") \
                and not case.carry_tentative:
            raise ValueError(f"the sharded {flavor} flavor needs the quad "
                             "kernel path (layout='quad', f32)")
        if np.dtype(case.dtype) != np.float32:
            raise ValueError("the quad fast path is float32")
        self.flavor = flavor
        self.case = case
        self.mesh = mesh
        self.axis = axis
        mdy = mesh.shape[axis]
        if mdy > self.MAX_VALIDATED_MESH and not allow_unvalidated_mesh:
            raise ValueError(
                f"{mdy}-way 1-D plane-row decomposition exceeds the "
                f"validated/modeled bound ({self.MAX_VALIDATED_MESH} chips: "
                "~0.26-0.36 modeled efficiency at 16, tools/comm_model.py). "
                "Pass allow_unvalidated_mesh=True to proceed anyway.")
        self.mdy = mdy
        # 1-device fast path (VERDICT round-4 item 5): the sharded program's
        # band bookkeeping (extended halo rows, traced row_base, where-masked
        # level-1 bands, replicated coarse tail) measured 21-35% overhead on
        # a 1-device mesh that never communicates (BASELINE.md round-4
        # sharded-native row). When the mesh has one device and the caller
        # passed no sharded-solve knobs, delegate every entry point to the
        # case's own single-device fast path — the SAME program a meshless
        # run would execute, so the 1-device mesh is a true fast-path
        # equivalence point. ``force_sharded_path=True`` (or any explicit
        # tol_factor/mg_overrides, which configure the SHARDED solve) keeps
        # the sharded program — that mode remains the native Mosaic lowering
        # evidence for the sharded kernel variants
        # (tools/sharded_native_bench.py --force-sharded).
        self.delegated = (mdy == 1 and not force_sharded_path
                          and tol_factor is None and not mg_overrides)
        shape = grid.shape
        self.shape = shape
        if self.delegated:
            self._init_delegate(case)
            return
        Hq8s, P, W = quad_shard_dims(shape, mdy)
        self.P, self.W, self.Hq8s = P, W, Hq8s
        coeffs = case.coeffs
        info = case.info or {}

        # channel: V(1,2) — V(2,1) cannot contract an error mode of the
        # 1536x512 channel problem (cases/channel.py sweep note) and
        # V(2,2)'s level-1 block (9 rows) would blow the 8-row device
        # halo; V(1,2) fits (7 rows) with V(2,2)-class convergence.
        # step flavor: V(1,1) — the exact masked smoother's halo budget
        # (make_sharded_masked_step_solve).
        pre, post = {"backwards_step": (1, 1), "channel": (1, 2)}.get(
            flavor, (2, 1))
        mg = MGConfig(tol_factor=tol_factor if tol_factor is not None
                      else 1e-9, abs_tol=0.0,
                      pre_sweeps=pre, post_sweeps=post)
        if mg_overrides:
            mg = dataclasses.replace(mg, **mg_overrides)
        if mg.coarse_dtype is not None:
            raise ValueError(
                "coarse_dtype (mixed-precision coarse hierarchy) is a "
                "single-device per-kernel-path knob — the sharded builders "
                "keep their own f32 level-1 block + replicated tail")
        if mg.corr_opt:
            raise ValueError(
                "corr_opt (line-searched coarse correction) is a "
                "single-device per-kernel-path knob — the sharded masked "
                "builder does not take it")
        if (flavor != "backwards_step"
                and 2 * (mg.pre_sweeps + mg.post_sweeps) + 1 > DEV_HALO):
            raise ValueError(
                f"V({mg.pre_sweeps},{mg.post_sweeps}) consumes "
                f"{2 * (mg.pre_sweeps + mg.post_sweeps) + 1} halo rows per "
                f"level-1 solve > the {DEV_HALO}-row device halo")
        self.mg = mg
        step_rect = None
        if flavor == "cavity":
            self._bc_vel = info.get("lid_velocity", 1.0)
            problem = cavity_problem(grid.nx, grid.ny, grid.dx, grid.dy)
            fused = make_quad_corr_predictor_source(
                shape, coeffs, self._bc_vel, shard=(P, mdy),
                interpret=interpret)
        elif flavor == "channel":
            self._bc_vel = info.get("inlet_velocity", 1.0)
            problem = channel_problem(grid.nx, grid.ny, grid.dx, grid.dy)
            fused = make_quad_channel_corr_predictor_source(
                shape, coeffs, self._bc_vel, shard=(P, mdy),
                interpret=interpret)
        elif flavor == "rayleigh_benard":
            from cfd_tpu.kernels.rb_quad import make_quad_rb_step_kernel

            problem = neumann_problem(grid.nx, grid.ny, grid.dx, grid.dy)
            fused = make_quad_rb_step_kernel(
                shape, coeffs, info["kappa"], info.get("t_bottom", 1.0),
                info.get("t_top", 0.0), buoyancy=1.0, shard=(P, mdy),
                interpret=interpret)
        else:
            from cfd_tpu.kernels.step_quad import (
                make_quad_step_corr_predictor_source)
            from cfd_tpu.poisson.multigrid import step_rect_params

            step_rect = step_rect_params(grid)
            if step_rect is None:
                raise ValueError("the sharded backwards_step flavor "
                                 "requires the reference rectangle raster")
            self._bc_vel = info.get("inlet_velocity", 1.0)
            problem = None
            fused = make_quad_step_corr_predictor_source(
                shape, coeffs, step_rect[0], step_rect[1], self._bc_vel,
                shard=(P, mdy), interpret=interpret)
        if flavor == "backwards_step":
            solve = make_sharded_masked_step_solve(
                grid, coeffs, mg, shape, mdy, interpret=interpret, axis=axis)
        else:
            solve = make_sharded_quad_solve(
                problem, mg, shape, mdy, interpret=interpret, axis=axis,
                pin_mean=flavor == "rayleigh_benard")
        self._solve = solve
        self._interpret = interpret
        rr = partial(_refresh, P=P, mdy=mdy, axis=axis)
        rrm = partial(_refresh_many, P=P, mdy=mdy, axis=axis)
        gmax = lambda x: lax.pmax(x, axis)
        n_fluid = grid.n_fluid
        ny_i, nx_i = grid.ny, grid.nx
        n_carry = 3 if flavor == "backwards_step" else 4
        self.n_carry = n_carry

        def step_local(us, vs, p, aux=None):
            # ``aux``: the 4th carried array — p_prev (cavity/channel
            # extrapolated warm start) or T (rayleigh_benard); absent for
            # backwards_step (plain-p warm start, 3-array carry)
            jy = lax.axis_index(axis)
            rb = jy * P - DEV_HALO
            if flavor == "rayleigh_benard":
                us2, vs2, T2, b, part = fused(rb, us, vs, p, aux)
                us2, vs2, T2, b = rrm((us2, vs2, T2, b))
                mean = lax.psum(part, axis) / n_fluid
                b = _sub_mean_local(b, mean, rb, ny_i, nx_i)
                max_b = gmax(jnp.max(jnp.abs(b)))
                p2, iters, res = solve(p, b, rb, jy, max_b)
                return us2, vs2, p2, T2, iters, res
            if flavor == "backwards_step":
                us2, vs2, b, part = fused(rb, us, vs, p)
                us2, vs2, b = rrm((us2, vs2, b))
                mean = lax.psum(part, axis) / n_fluid
                b = _sub_mean_local(b, mean, rb, ny_i, nx_i,
                                    step_rect=step_rect)
                max_b = gmax(jnp.max(jnp.abs(b)))
                p2, iters, res = solve(p, b, rb, jy, max_b)
                return us2, vs2, p2, iters, res
            us2, vs2, b, guess, part = fused(rb, us, vs, p, aux)
            us2, vs2, b, guess = rrm((us2, vs2, b, guess))
            if flavor == "cavity":
                max_b = gmax(part)
            else:
                mean = lax.psum(part, axis) / n_fluid
                b = _sub_mean_local(b, mean, rb, ny_i, nx_i)
                max_b = gmax(jnp.max(jnp.abs(b)))
            p2, iters, res = solve(guess, b, rb, jy, max_b)
            return us2, vs2, p2, p, iters, res

        spec = P_(None, axis, None)
        scalar = P_()
        self._spec = spec
        self._sharding = NamedSharding(mesh, spec)
        out_specs = (spec,) * n_carry + (scalar, scalar)

        self._step = jax.jit(_shard_map(
            step_local, mesh, in_specs=(spec,) * n_carry,
            out_specs=out_specs))

        def chunk(*arrs, n_steps):
            def body(carry, _):
                out = step_local(*carry)
                return out[:n_carry], out[n_carry:]

            carry, (iters, res) = lax.scan(
                body, arrs, None, length=n_steps)
            return (*carry, iters, res)

        self._chunk_cache: dict[int, callable] = {}

        def make_chunk(n):
            return jax.jit(_shard_map(
                partial(chunk, n_steps=n), mesh,
                in_specs=(spec,) * n_carry, out_specs=out_specs))

        self._make_chunk = make_chunk

        # boundary converters (host-cadence): logical padded layout <->
        # extended-stacked sharded layout
        self._to_quad = lambda a: to_quad(a, shape)
        Hq, Wq, Hq8, Wqa = quad_dims(shape)
        self._Hq8 = Hq8
        if flavor == "rayleigh_benard":
            self._corr = None  # case.align/unalign_state cover the boundary
        elif flavor == "backwards_step":
            from cfd_tpu.kernels.step_quad import make_quad_step_corrector

            self._corr = make_quad_step_corrector(
                shape, coeffs, step_rect[0], step_rect[1], self._bc_vel,
                interpret=interpret)
        else:
            mk_corr = (make_quad_corrector if flavor == "cavity"
                       else make_quad_channel_corrector)
            self._corr = mk_corr(shape, coeffs, self._bc_vel,
                                 interpret=interpret)
        self._step_rect = step_rect
        self._coeffs = coeffs

    # ---------------- layout conversion (print cadence only) ----------------

    def _extend(self, q: np.ndarray) -> np.ndarray:
        """(4, Hq8?, W) global quad -> (4, mdy*(P+16), W) extended-stacked."""
        q = np.asarray(q)
        pad_rows = self.Hq8s - q.shape[1]
        qp = np.pad(q, ((0, 0), (DEV_HALO, pad_rows + DEV_HALO), (0, 0)))
        parts = [qp[:, jy * self.P : jy * self.P + self.P + 2 * DEV_HALO, :]
                 for jy in range(self.mdy)]
        return np.concatenate(parts, axis=1)

    def _collapse(self, x) -> np.ndarray:
        """(4, mdy*(P+16), W) -> (4, Hq8s, W) own rows."""
        x = np.asarray(x)
        E = self.P + 2 * DEV_HALO
        parts = [x[:, jy * E + DEV_HALO : jy * E + DEV_HALO + self.P, :]
                 for jy in range(self.mdy)]
        return np.concatenate(parts, axis=1)

    def _put(self, a: np.ndarray):
        return jax.device_put(jnp.asarray(a, jnp.float32), self._sharding)

    # ---------------- 1-device delegation (mdy == 1) ----------------

    def _init_delegate(self, case: Case) -> None:
        """Build the single-device fast-path entry points (mdy == 1): the
        state is the case's own carry (the aligned quad State), the step is
        ``solver.make_step(case)`` — byte-for-byte the program a meshless
        run executes, so a 1-device mesh pays zero sharding bookkeeping."""
        from cfd_tpu.solver import make_step

        step_fn = make_step(case)
        self._sd_step = jax.jit(step_fn)

        def chunk(state, n_steps):
            def body(s, _):
                s2, d = step_fn(s)
                return s2, (d.poisson_iters, d.poisson_residual)

            return lax.scan(body, state, None, length=n_steps)

        self._sd_chunk_cache: dict[int, callable] = {}
        self._sd_make_chunk = lambda n: jax.jit(partial(chunk, n_steps=n))

    def _delegate_initial_state(self):
        case = self.case
        if case.initial_state_fn is not None:
            return case.initial_state_fn()
        s = State.zeros(self.shape, dtype=case.dtype)
        u, v = case.velocity_bc(s.u, s.v)
        p_prev = s.p if case.extrapolate_warm_start else None
        st = State(u, v, s.p, s.T, p_prev)
        if case.align_state is not None:
            st = case.align_state(st)
        return st

    def initial_state(self):
        """Tentative-carry initial state from the logical zero state (BCs
        applied), as ``n_carry`` sharded extended-stacked arrays (delegated
        mdy == 1: the case's single-device carry State)."""
        if self.delegated:
            return self._delegate_initial_state()
        case = self.case
        if self.flavor == "rayleigh_benard":
            # the factory's initial_state_fn returns the ALIGNED quad
            # carry (us*, vs*, p, T) directly on the quad path
            return self.from_logical(case.initial_state_fn())
        s = State.zeros(self.shape, dtype=jnp.float32)
        u, v = case.velocity_bc(s.u, s.v)
        return self.from_logical(State(u, v, s.p, s.T, None))

    def from_logical(self, st: State):
        """Logical padded-layout State -> sharded tentative-carry state
        (the inverse of ``logical``; the resume boundary for checkpoints,
        which store the logical layout with p_prev = previous pressure).
        RB also accepts the factory's ALIGNED quad carry directly."""
        case = self.case
        if self.delegated:
            if (case.align_state is not None
                    and st.u.shape == self.shape):  # logical layout only
                st = case.align_state(st)
            return st
        if self.flavor == "rayleigh_benard":
            if st.u.shape == self.shape:  # logical layout -> aligned carry
                st = case.align_state(st)
            qs = [np.asarray(a) for a in (st.u, st.v, st.p, st.T)]
            return tuple(self._put(self._extend(q)) for q in qs)
        u, v, p = st.u, st.v, st.p
        if self.flavor == "backwards_step":
            from cfd_tpu.kernels.step_quad import uncorrect_step_quad

            us, vs = uncorrect_step_quad(u, v, p, self.shape,
                                         self._coeffs, *self._step_rect)
            fields = (us, vs, p)
        else:
            us, vs = uncorrect_quad(u, v, p, self.shape, self._coeffs,
                                    cavity_form=self.flavor == "cavity")
            p_prev = st.p_prev if st.p_prev is not None else p
            fields = (us, vs, p, p_prev)
        qs = [np.asarray(self._to_quad(a)) for a in fields]
        return tuple(self._put(self._extend(q)) for q in qs)

    def step(self, state):
        if self.delegated:
            st, d = self._sd_step(state)
            return st, {"poisson_iters": d.poisson_iters,
                        "poisson_residual": d.poisson_residual}
        out = self._step(*state)
        return tuple(out[: self.n_carry]), {"poisson_iters": out[-2],
                                            "poisson_residual": out[-1]}

    def run_chunk(self, state, n_steps: int):
        if self.delegated:
            if n_steps not in self._sd_chunk_cache:
                self._sd_chunk_cache[n_steps] = self._sd_make_chunk(n_steps)
            st, (iters, res) = self._sd_chunk_cache[n_steps](state)
            return st, {"poisson_iters": iters, "poisson_residual": res}
        if n_steps not in self._chunk_cache:
            self._chunk_cache[n_steps] = self._make_chunk(n_steps)
        out = self._chunk_cache[n_steps](*state)
        return tuple(out[: self.n_carry]), {"poisson_iters": out[-2],
                                            "poisson_residual": out[-1]}

    # ---------------- lagged-controller adaptive dt (multi-chip) ----------------

    def make_adaptive(self, max_courant: float, growth: float,
                      dt_ceiling: float, spc: int):
        """Lagged-controller adaptive stepping on the SHARDED quad fast
        path (the multi-chip twin of cfd_tpu.adaptive's "lagged" branch):
        the same tentative-carry fused kernels with the (dt_corr, dt_pred)
        SMEM pair and the Courant maxima fused into their scalar
        reductions; under shard_map the per-device Courant partials are
        pmaxed and the controller update (dt' = min(dt*min(growth,
        max_co/Co), ceiling)) runs replicated on every device, so dt stays
        a replicated traced scan carry — no host sync per step.

        Returns (chunk, from_logical_a, to_logical_s):

        * chunk(*state, du, d, t) -> (*state2, du2, d2, t2, packed) — a
          jitted shard_map scan of ``spc`` steps; packed = (du2, d2, t2,
          dt_last, co_last, iters_last, res_last) f32, fetched at print
          cadence only;
        * from_logical_a(logical_state, dt) / to_logical_s(state, dt_used)
          — the resume/print boundary, reusing the case's single-device
          adaptive converters (Case.adaptive_impl_carry) on the gathered
          global quad arrays."""
        if self.delegated:
            raise ValueError(
                "this 1-device engine delegates to the single-device fast "
                "path (quad_sharded mdy==1 delegation) — adaptive runs go "
                "through cfd_tpu.adaptive.run_adaptive, which routes a "
                "delegated engine to the single-device lagged controller")
        case, flavor = self.case, self.flavor
        if case.adaptive_impl_carry is None:
            raise ValueError("sharded adaptive needs the quad kernel case "
                             "(Case.adaptive_impl_carry: layout='quad', "
                             "f32 multigrid)")
        P, mdy, axis = self.P, self.mdy, self.axis
        grid = case.grid
        idx_, idy_ = 1.0 / grid.dx, 1.0 / grid.dy
        coeffs = self._coeffs
        info = case.info or {}
        interp = self._interpret
        shape = self.shape
        if flavor == "cavity":
            fused_a = make_quad_corr_predictor_source(
                shape, coeffs, self._bc_vel, shard=(P, mdy),
                interpret=interp, traced_dt=True, emit_courant=True)
        elif flavor == "channel":
            fused_a = make_quad_channel_corr_predictor_source(
                shape, coeffs, self._bc_vel, shard=(P, mdy),
                interpret=interp, traced_dt=True, emit_courant=True)
        elif flavor == "rayleigh_benard":
            from cfd_tpu.kernels.rb_quad import make_quad_rb_step_kernel

            fused_a = make_quad_rb_step_kernel(
                shape, coeffs, info["kappa"], info.get("t_bottom", 1.0),
                info.get("t_top", 0.0), buoyancy=1.0, shard=(P, mdy),
                interpret=interp, traced_dt=True, emit_courant=True)
        else:
            from cfd_tpu.kernels.step_quad import (
                make_quad_step_corr_predictor_source)

            fused_a = make_quad_step_corr_predictor_source(
                shape, coeffs, self._step_rect[0], self._step_rect[1],
                self._bc_vel, shard=(P, mdy), interpret=interp,
                traced_dt=True, emit_courant=True)
        solve = self._solve
        rr = partial(_refresh, P=P, mdy=mdy, axis=axis)
        rrm = partial(_refresh_many, P=P, mdy=mdy, axis=axis)
        gmax = lambda x: lax.pmax(x, axis)
        n_fluid = grid.n_fluid
        ny_i, nx_i = grid.ny, grid.nx
        step_rect = self._step_rect
        n_carry = self.n_carry

        def astep_local(arrs, du, d):
            jy = lax.axis_index(axis)
            rb = jy * P - DEV_HALO
            if flavor == "rayleigh_benard":
                us, vs, p, T = arrs
                us2, vs2, T2, b, part, mu, mv = fused_a(
                    rb, (du, d), us, vs, p, T)
                us2, vs2, T2, b = rrm((us2, vs2, T2, b))
                mean = lax.psum(part, axis) / n_fluid
                b = _sub_mean_local(b, mean, rb, ny_i, nx_i)
                max_b = gmax(jnp.max(jnp.abs(b)))
                p2, iters, res = solve(p, b, rb, jy, max_b)
                new = (us2, vs2, p2, T2)
            elif flavor == "backwards_step":
                us, vs, p = arrs
                us2, vs2, b, part, mu, mv = fused_a(rb, (du, d), us, vs, p)
                us2, vs2, b = rrm((us2, vs2, b))
                mean = lax.psum(part, axis) / n_fluid
                b = _sub_mean_local(b, mean, rb, ny_i, nx_i,
                                    step_rect=step_rect)
                max_b = gmax(jnp.max(jnp.abs(b)))
                p2, iters, res = solve(p, b, rb, jy, max_b)
                new = (us2, vs2, p2)
            else:
                us, vs, p, pp = arrs
                us2, vs2, b, guess, part, mu, mv = fused_a(
                    rb, (du, d), us, vs, p, pp)
                us2, vs2, b, guess = rrm((us2, vs2, b, guess))
                if flavor == "cavity":
                    max_b = gmax(part)
                else:
                    mean = lax.psum(part, axis) / n_fluid
                    b = _sub_mean_local(b, mean, rb, ny_i, nx_i)
                    max_b = gmax(jnp.max(jnp.abs(b)))
                p2, iters, res = solve(guess, b, rb, jy, max_b)
                new = (us2, vs2, p2, p)
            co_per_dt = gmax(mu) * idx_ + gmax(mv) * idy_
            return new, iters, res, co_per_dt

        def chunk_local(*args):
            arrs = args[:n_carry]
            du, d, t = args[n_carry:]

            def body(carry, _):
                arrs_, du_, d_, t_ = carry
                new, iters, res, co_per_dt = astep_local(arrs_, du_, d_)
                # Courant of the step the kernel just CORRECTED (evolved
                # over du_) — one step stale, adaptive.run_adaptive lagged
                co_prev = du_ * co_per_dt
                scale = jnp.minimum(growth, max_courant
                                    / jnp.maximum(co_prev, 1e-12))
                d2 = jnp.minimum(d_ * scale,
                                 jnp.asarray(dt_ceiling, d_.dtype))
                return (new, d_, d2, t_ + d_), (iters, res, d_, co_prev)

            (arrs, du2, d2, t2), (iters, res, dts, cos) = lax.scan(
                body, (arrs, du, d, t), None, length=spc)
            packed = jnp.stack([
                du2.astype(jnp.float32), d2.astype(jnp.float32),
                t2.astype(jnp.float32), dts[-1].astype(jnp.float32),
                cos[-1].astype(jnp.float32), iters[-1].astype(jnp.float32),
                res[-1].astype(jnp.float32)])
            return (*arrs, du2, d2, t2, packed)

        spec, scalar = self._spec, P_()
        chunk = jax.jit(_shard_map(
            chunk_local, self.mesh,
            in_specs=(spec,) * n_carry + (scalar,) * 3,
            out_specs=(spec,) * n_carry + (scalar,) * 4))

        _, to_aligned_c, to_logical_c = case.adaptive_impl_carry()
        to_logical_c = jax.jit(to_logical_c)
        Hq8 = self._Hq8

        def from_logical_a(st: State, dt):
            g = to_aligned_c(st, dt)  # global quad carry State
            fields = ((g.u, g.v, g.p, g.T) if flavor == "rayleigh_benard"
                      else (g.u, g.v, g.p) if flavor == "backwards_step"
                      else (g.u, g.v, g.p, g.p_prev))
            return tuple(self._put(self._extend(np.asarray(a)))
                         for a in fields)

        def to_logical_s(state, dt_used):
            arrs = [jnp.asarray(self._collapse(x)[:, :Hq8, :])
                    for x in state]
            if flavor == "rayleigh_benard":
                st = State(arrs[0], arrs[1], arrs[2], arrs[3], None)
            elif flavor == "backwards_step":
                st = State(arrs[0], arrs[1], arrs[2], None, None)
            else:
                st = State(arrs[0], arrs[1], arrs[2], None, arrs[3])
            return to_logical_c(st, jnp.asarray(dt_used, jnp.float32))

        return chunk, from_logical_a, to_logical_s

    def logical(self, state) -> State:
        """Gather + correct to the logical padded (ny+2, nx+2) state (the
        tentative carry's unalign: run the corrector on the gathered quad
        arrays)."""
        if self.delegated:
            case = self.case
            if (case.unalign_state is not None
                    and state.u.shape != self.shape):
                return case.unalign_state(state)
            return state
        arrs = [self._collapse(x)[:, : self._Hq8, :] for x in state]
        f = lambda a: from_quad(jnp.asarray(a), self.shape)
        if self.flavor == "rayleigh_benard":
            us, vs, p, T = arrs
            st = State(jnp.asarray(us), jnp.asarray(vs), jnp.asarray(p),
                       jnp.asarray(T), None)
            return self.case.unalign_state(st)
        if self.flavor == "backwards_step":
            us, vs, p = arrs
            u2, v2 = self._corr(jnp.asarray(us), jnp.asarray(vs),
                                jnp.asarray(p))
            return State(f(u2), f(v2), f(p), None, None)
        us, vs, p, aux = arrs
        u2, v2, _ = self._corr(jnp.asarray(us), jnp.asarray(vs),
                               jnp.asarray(p), jnp.asarray(p))
        return State(f(u2), f(v2), f(p), None, f(aux))


# Back-compat name from before the channel flavor was folded in (round-3):
# the cavity-flagship tests, dryrun_multichip and docs predate it.
ShardedQuadCavity = ShardedQuadProjection
