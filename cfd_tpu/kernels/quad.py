"""Pallas TPU kernels: 2x2 block-parity ("quad-split") projection step.

The flow state is carried as FOUR quarter-resolution planes per field,
indexed by (row parity, col parity) of the global cell index:

    Q[q][J, I] = a[2J + r, 2I + s],   q = 2*r + s

This layout is what makes the remaining V-cycle costs disappear on TPU:

* Red-black smoothing: the checkerboard parity (i+j) %% 2 equals (r+s) %% 2,
  so "red" is exactly planes {0, 3} and "black" planes {1, 2}. A half-sweep
  updates two whole planes DENSELY — no parity iota, no select, half the
  VPU work of the masked full-array formulation (measured: the marginal
  red+black pair costs ~61 us at 2048^2 in the masked layout, ~2x the
  dense arithmetic).
* Restriction: the 4 children of a coarse cell live at the SAME plane
  coordinates (up to a +-1 roll), so full-weighting is an elementwise mean
  of the 4 residual planes — the pre-smoother emits the coarse source
  directly, replacing a full-size residual write + reduce_window + pad
  chain (~60 us/step at 2048^2).
* Prolongation: each fine plane is a 2x2-weighted (bilinear 9-3-3-1)
  combination of the coarse correction at coarse size — four small
  stencils fused into the post-smoother, replacing the stack+reshape
  interleave chain (~96 us/step of layout copies at 2048^2).
* Stencil shifts: a +-1 global shift maps to a plane permutation where
  only half the planes need a (quarter-size) roll — less shift work than
  the full-array form.

No lane-granularity interleave appears anywhere: Mosaic has no strided
lane access, which is exactly why the split is by PARITY (plane selection
+ whole-register rolls) rather than by blocks.

Semantics match the natural-layout kernels in kernels.projection and the
XLA multigrid path (cavity flavor) up to float32 contraction order
(asserted in tests/test_quad.py in interpret mode). Reference provenance
is unchanged: predictor cavity-01.cpp:548-603, source :622-630, corrector
:695-711, ghost BCs :523-543.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def quad_dims(shape: tuple[int, int]) -> tuple[int, int, int, int]:
    """(Hq, Wq, Hq8, Wqa): logical and Mosaic-aligned plane dims for a
    logical padded (H, W) grid."""
    H, W = shape
    Hq, Wq = -(-H // 2), -(-W // 2)
    return Hq, Wq, _round_up(Hq, 8), _round_up(Wq, 128)


def quad_shape(shape: tuple[int, int]) -> tuple[int, int, int]:
    Hq, Wq, Hq8, Wqa = quad_dims(shape)
    return (4, Hq8, Wqa)


def quad_shard_dims(shape: tuple[int, int], mdy: int) -> tuple[int, int, int]:
    """(Hq8s, P, Wqa) for an mdy-way plane-ROW decomposition of the quad
    layout: global plane rows padded up so every device owns P = Hq8s/mdy
    rows, P a multiple of 8 (Mosaic slab/halo alignment). Parity lives in
    the plane index q, not the plane row, so row decomposition never flips
    the red/black coloring across devices."""
    Hq, Wq, Hq8, Wqa = quad_dims(shape)
    Hq8s = _round_up(Hq, 8 * mdy)
    return Hq8s, Hq8s // mdy, Wqa


def to_quad(a: jnp.ndarray, shape: tuple[int, int]) -> jnp.ndarray:
    """(H, W) natural -> (4, Hq8, Wqa) quad. XLA, boundary-only (init/
    stats/export) — never on the hot path."""
    H, W = shape
    Hq, Wq, Hq8, Wqa = quad_dims(shape)
    ap = jnp.pad(a, ((0, 2 * Hq - H), (0, 2 * Wq - W)))
    g = ap.reshape(Hq, 2, Wq, 2)
    planes = jnp.stack([g[:, 0, :, 0], g[:, 0, :, 1], g[:, 1, :, 0], g[:, 1, :, 1]])
    return jnp.pad(planes, ((0, 0), (0, Hq8 - Hq), (0, Wqa - Wq)))


def from_quad(q: jnp.ndarray, shape: tuple[int, int]) -> jnp.ndarray:
    """(4, Hq8, Wqa) quad -> (H, W) natural (inverse of to_quad)."""
    H, W = shape
    Hq, Wq, _, _ = quad_dims(shape)
    p = q[:, :Hq, :Wq]
    g = jnp.stack([jnp.stack([p[0], p[1]], axis=-1),
                   jnp.stack([p[2], p[3]], axis=-1)], axis=1)
    return g.reshape(2 * Hq, 2 * Wq)[:H, :W]


def _qshift(planes, dj: int, di: int):
    """shifted[q][J, I] = a[2J+r+dj, 2I+s+di] (same convention as
    projection._roll: consumer masks handle wraparound). Only planes whose
    parity carries need a (quarter-size) roll."""
    out = [None] * 4
    for r in range(2):
        for s in range(2):
            rp, cj = (r + dj) % 2, (r + dj) // 2
            sp, ci = (s + di) % 2, (s + di) // 2
            a = planes[2 * rp + sp]
            if cj:
                a = jnp.roll(a, -cj, axis=0)
            if ci:
                a = jnp.roll(a, -ci, axis=1)
            out[2 * r + s] = a
    return out


def _qiota(s, slab: int, W: int):
    """Per-plane global (row, col) index arrays for a slab starting at
    plane row ``s``: grow[q] = 2*(s+J) + r, gcol[q] = 2*I + s_parity."""
    J = s + jax.lax.broadcasted_iota(jnp.int32, (slab, W), 0)
    I = jax.lax.broadcasted_iota(jnp.int32, (slab, W), 1)
    grow = [2 * J + (q >> 1) for q in range(4)]
    gcol = [2 * I + (q & 1) for q in range(4)]
    return grow, gcol


def _where4(conds, vals, planes):
    return [jnp.where(c, v, p) for c, v, p in zip(conds, vals, planes)]


def _make_quad_slab_kernel(shape, n_qin: int, n_qout: int, compute,
                           tile_rows: int, interpret: bool, halo: int,
                           flat_in_shape=None, flat_out_shape=None,
                           scalar_reduce: str | tuple | None = None,
                           const_inputs=(),
                           vmem_bytes_per_cell: int = 110,
                           vmem_headroom: float = 10e6,
                           shard: int | None = None,
                           scalar_params: int = 0):
    """Skeleton: stream ``n_qin`` quad fields (4, Hq8, Wqa) through
    overlapping plane-row slabs, run ``compute(s, qins, flat_in, consts) ->
    (qouts, flat_out, scalar_arrplanes)`` and write back own rows.

    ``flat_in_shape``/``flat_out_shape``: one optional natural-layout array
    whose rows coincide 1:1 with plane rows (the coarse grid of a factor-2
    coarsening: coarse row Jc == plane row J). The flat input slab covers
    exactly the quad slab's rows; a consumer's row J+1 read (prolongation)
    is a jnp.roll whose slab-top wraparound is absorbed by the band shrink
    and the Jc == nyc edge clamp.

    ``const_inputs``: small jnp arrays (weight vectors) passed as whole
    VMEM inputs and handed to compute as refs — Mosaic rejects captured
    array constants inside kernel bodies.

    ``scalar_reduce`` ("max" | "sum", or a tuple of them): compute's last
    return is a list of 4 (slab, W) plane arrays (or, for a tuple, a list
    of such groups — one per op) reduced over each tile's own unique rows
    into one SMEM scalar each; the call returns them as trailing scalars
    in order.

    ``scalar_params``: number of traced f32 scalars (e.g. an adaptive dt)
    appended to the call as one (n,) SMEM input; compute then receives them
    as a trailing ``scalars`` ref argument — coefficients derived from them
    stay traced, so changing dt never recompiles.

    ``shard``: per-device owned plane-row count P for the SPMD (shard_map)
    variant. The arrays are then LOCAL blocks of height P + 16: the
    device's P rows bracketed by DEV_HALO-row neighbor strips (refreshed by
    the caller's ppermute exchange between kernel invocations). The call
    gains a leading traced ``row_base`` scalar — the GLOBAL plane row of
    local row 0 (= jy*P - DEV_HALO; an SMEM input, since mesh position is
    data in SPMD) — and ``compute`` receives the global slab start, so all
    iota-derived masks/bands keep their global meaning. DEV_HALO equals
    the slab halo (8): the same shrink bookkeeping that absorbs slab-edge
    staleness absorbs device-edge staleness. Scalar reductions restrict to
    own (non-halo) rows and return per-device partials (caller pmax/psums).
    """
    scalar = scalar_reduce is not None
    s_multi = isinstance(scalar_reduce, tuple)
    s_ops = (scalar_reduce if s_multi
             else ((scalar_reduce,) if scalar else ()))
    n_s = len(s_ops)
    Hq, Wq, Hq8, W = quad_dims(shape)
    sharded = shard is not None
    DEV_HALO = 8
    if sharded:
        if shard % 8:
            raise ValueError(f"shard rows must be a multiple of 8, got {shard}")
        Hq8 = shard + 2 * DEV_HALO  # all row bookkeeping below is local
    # VMEM discipline: this chip has 128 MB VMEM and XLA places while-loop
    # carries and whole intermediates IN VMEM (the S(1) buffers in
    # profiles) when kernels leave room — VMEM-resident "HBM" refs stream
    # at multi-TB/s, so the scoped scratch budget trades directly against
    # that placement. Measured at 2048^2: 13 MB -> 1019 steps/s (tiny
    # tiles, 1.67x slab redundancy), 24 MB -> 1055, 40 MB -> 1064 (the
    # sweet spot), 64 MB -> 1037, 110 MB -> 868 (placements evicted).
    # The limit carries slack over the sizing budget: Mosaic's real stack
    # need is not exactly linear in slab cells, and a 1-2 MB overshoot
    # otherwise fails the compile (measured 41.2M at a 40.05M limit for the
    # channel fused kernel).
    #
    # Per-size rule (round-3 item 4): the 40 MB sweet spot exists only
    # while whole quad fields FIT in the VMEM left over (a field is
    # 4*Hq8*Wqa*4 B ~ 18 MB at 2048^2). At 4096^2 a field is ~72 MB —
    # no carry placement is possible regardless, so the budget flips to
    # "as much slab as the kernel can use" (fewer overlapping-slab
    # redundant rows, longer DMA bursts). CFD_TPU_VMEM_BUDGET_MB
    # overrides for sweeps (tools/quad_vmem_sweep.py).
    import os as _os

    field_mb = 4 * Hq8 * W * 4 / 1e6  # Hq8 is local height when sharded
    env = _os.environ.get("CFD_TPU_VMEM_BUDGET_MB")
    if env is not None:
        budget = float(env) * 1e6
    elif field_mb <= 24.0:
        budget = 40.0e6
    else:
        budget = 100.0e6
    # vmem_headroom: hard-limit slack over the sizing budget (Mosaic's real
    # stack need overshoots linear slab-cell estimates; the limit is a
    # compile-time cap, not a reservation, so generous slack only risks
    # masking a genuine mis-sizing)
    vmem_limit = int(budget + vmem_headroom)
    slab_cap = int(budget // (vmem_bytes_per_cell * W))
    t_cap = max(8, ((slab_cap - 2 * halo) // 8) * 8)
    T = min(_round_up(tile_rows, 8), t_cap, Hq8)
    if T + 2 * halo >= Hq8:
        T = Hq8
    slab = min(T + 2 * halo, Hq8)
    n_tiles = -(-Hq8 // T)
    has_fin = flat_in_shape is not None
    has_fout = flat_out_shape is not None
    fin_slab = slab if has_fin else 0
    n_const = len(const_inputs)
    n_in = n_qin + (1 if has_fin else 0)
    n_out = n_qout + (1 if has_fout else 0)

    def kernel(*refs):
        qin_hbm = refs[:n_qin]
        fin_hbm = refs[n_qin] if has_fin else None
        consts = refs[n_in : n_in + n_const]
        rb_ref = refs[n_in + n_const] if sharded else None
        k_sp = n_in + n_const + (1 if sharded else 0)
        sp_ref = refs[k_sp] if scalar_params else None
        out0 = k_sp + (1 if scalar_params else 0)
        qout_hbm = refs[out0 : out0 + n_qout]
        fout_hbm = refs[out0 + n_qout] if has_fout else None
        sref = refs[out0 + n_out] if scalar else None
        k0 = out0 + n_out + (1 if scalar else 0)
        qin_s = refs[k0 : k0 + n_qin]
        fin_s = refs[k0 + n_qin] if has_fin else None
        o0 = k0 + n_in
        qout_s = refs[o0 : o0 + n_qout]
        fout_s = refs[o0 + n_qout] if has_fout else None
        sems = refs[-1]
        i = pl.program_id(0)

        def coords(t):
            r0 = pl.multiple_of(jnp.minimum(t * T, Hq8 - T).astype(jnp.int32), 8)
            s = pl.multiple_of(jnp.clip(r0 - halo, 0, Hq8 - slab).astype(jnp.int32), 8)
            return r0, s

        r0, s = coords(i)
        slot = jax.lax.rem(i.astype(jnp.int32), jnp.int32(2))
        nxt = jax.lax.rem((i + 1).astype(jnp.int32), jnp.int32(2))

        def start_in(t, sl):
            _, st = coords(t)
            for k in range(n_qin):
                pltpu.make_async_copy(
                    qin_hbm[k].at[:, pl.ds(st, slab), :], qin_s[k].at[sl],
                    sems.at[sl, k]).start()
            if has_fin:
                pltpu.make_async_copy(
                    fin_hbm.at[pl.ds(st, fin_slab), :], fin_s.at[sl],
                    sems.at[sl, n_qin]).start()

        @pl.when(i == 0)
        def _():
            start_in(0, slot)

        @pl.when(i + 1 < n_tiles)
        def _():
            start_in(i + 1, nxt)

        for k in range(n_qin):
            pltpu.make_async_copy(qin_hbm[k].at[:, pl.ds(s, slab), :],
                                  qin_s[k].at[slot], sems.at[slot, k]).wait()
        fin = None
        if has_fin:
            pltpu.make_async_copy(fin_hbm.at[pl.ds(s, fin_slab), :],
                                  fin_s.at[slot], sems.at[slot, n_qin]).wait()
            fin = fin_s[slot]

        qins = [[qin_s[k][slot, q] for q in range(4)] for k in range(n_qin)]
        # compute sees the GLOBAL slab start so iota masks/bands stay global
        s_glob = pl.multiple_of((s + rb_ref[0]).astype(jnp.int32), 8) \
            if sharded else s
        if scalar_params:
            outs = compute(s_glob, qins, fin, consts, sp_ref)
        else:
            outs = compute(s_glob, qins, fin, consts)
        qouts, fout, sarr = outs

        if scalar:
            Jl = jax.lax.broadcasted_iota(jnp.int32, (slab, W), 0)
            prev_r0 = jnp.minimum((i - 1) * T, Hq8 - T).astype(jnp.int32)
            start = jnp.where(i > 0, prev_r0 + T, 0)
            own = (s + Jl >= jnp.maximum(r0, start)) & (s + Jl < r0 + T)
            if sharded:  # halo rows belong to the neighbor device
                own = own & (s + Jl >= DEV_HALO) & (s + Jl < DEV_HALO + shard)
            groups = sarr if s_multi else [sarr]
            tile_vals = []
            for op, grp in zip(s_ops, groups):
                vals = [jnp.where(own, a, jnp.zeros_like(a)) for a in grp]
                if op == "max":
                    tile_vals.append(functools.reduce(
                        jnp.maximum, [jnp.max(a) for a in vals]))
                else:
                    tile_vals.append(sum(jnp.sum(a) for a in vals))

            @pl.when(i == 0)
            def _():
                for j in range(n_s):
                    sref[0, j] = tile_vals[j]

            @pl.when(i > 0)
            def _():
                for j in range(n_s):
                    if s_ops[j] == "max":
                        sref[0, j] = jnp.maximum(sref[0, j], tile_vals[j])
                    else:
                        sref[0, j] = sref[0, j] + tile_vals[j]

        off = pl.multiple_of((r0 - s).astype(jnp.int32), 8)
        copies = []
        for k in range(n_qout):
            for q in range(4):
                qout_s[k][0, q] = qouts[k][q]
            cp = pltpu.make_async_copy(
                qout_s[k].at[0, :, pl.ds(off, T), :],
                qout_hbm[k].at[:, pl.ds(r0, T), :], sems.at[slot, n_in + k])
            cp.start()
            copies.append(cp)
        if has_fout:
            fout_s[0] = fout
            cp = pltpu.make_async_copy(
                fout_s.at[0, pl.ds(off, T), :],
                fout_hbm.at[pl.ds(r0, T), :], sems.at[slot, n_in + n_qout])
            cp.start()
            copies.append(cp)
        for cp in copies:
            cp.wait()

    in_specs = ([pl.BlockSpec(memory_space=pl.ANY)] * n_in
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_const)
    if sharded:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    if scalar_params:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    out_specs = [pl.BlockSpec(memory_space=pl.ANY)] * n_out
    out_shape = [jax.ShapeDtypeStruct((4, Hq8, W), jnp.float32)] * n_qout
    if has_fout:
        out_shape.append(jax.ShapeDtypeStruct(flat_out_shape, jnp.float32))
    if scalar:
        out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        out_shape.append(jax.ShapeDtypeStruct((1, n_s), jnp.float32))
    scratch = [pltpu.VMEM((2, 4, slab, W), jnp.float32) for _ in range(n_qin)]
    if has_fin:
        scratch.append(pltpu.VMEM((2, fin_slab, W), jnp.float32))
    scratch += [pltpu.VMEM((1, 4, slab, W), jnp.float32) for _ in range(n_qout)]
    if has_fout:
        scratch.append(pltpu.VMEM((1, slab, W), jnp.float32))
    scratch.append(pltpu.SemaphoreType.DMA((2, n_in + n_out)))
    fn = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=False,
                                             vmem_limit_bytes=vmem_limit),
    )

    def _post(outs):
        if scalar:
            return tuple(outs[:-1]) + tuple(outs[-1][0, j]
                                            for j in range(n_s))
        return tuple(outs)

    if sharded and scalar_params:

        def call(row_base, params, *arrays):
            rb = jnp.reshape(row_base, (1,)).astype(jnp.int32)
            sp = jnp.reshape(jnp.asarray(params, jnp.float32),
                             (scalar_params,))
            return _post(fn(*arrays, *const_inputs, rb, sp))
    elif sharded:

        def call(row_base, *arrays):
            rb = jnp.reshape(row_base, (1,)).astype(jnp.int32)
            return _post(fn(*arrays, *const_inputs, rb))
    elif scalar_params:

        def call(params, *arrays):
            sp = jnp.reshape(jnp.asarray(params, jnp.float32),
                             (scalar_params,))
            return _post(fn(*arrays, *const_inputs, sp))
    else:

        def call(*arrays):
            return _post(fn(*arrays, *const_inputs))

    return call, (Hq8, W, slab, T)


def _cavity_bc_quad(u, v, grow, gcol, ny: int, nx: int, lid: float):
    """kernels.projection._cavity_bc_slab in quad form (cavity-01.cpp:
    523-543): same update order, per-plane iota conditions."""
    uS = _qshift(u, -1, 0)
    u = _where4([(g == ny + 1) & (c <= nx) for g, c in zip(grow, gcol)],
                [2.0 * lid - a for a in uS], u)
    uN = _qshift(u, 1, 0)
    u = _where4([(g == 0) & (c <= nx) for g, c in zip(grow, gcol)],
                [-a for a in uN], u)
    vE = _qshift(v, 0, 1)
    v = _where4([(c == 0) & (g <= ny) for g, c in zip(grow, gcol)],
                [-a for a in vE], v)
    vW = _qshift(v, 0, -1)
    v = _where4([(c == nx + 1) & (g <= ny) for g, c in zip(grow, gcol)],
                [-a for a in vW], v)
    return u, v


def make_quad_predictor_source(shape, coeffs, lid_velocity: float = 1.0,
                               tile_rows: int = 128, interpret: bool = False,
                               traced_dt: bool = False):
    """(u4, v4) -> (us4, vs4, b4, max|b|): cavity ghost BCs + MAC predictor
    + Poisson source + tolerance base, all in quad layout (the quad twin of
    kernels.projection.make_predictor_source).

    ``traced_dt``: the call gains a leading dt scalar (SMEM) and all
    dt-derived coefficients stay traced — the adaptive-stepping fast path
    (round-3 item 5): changing dt never recompiles."""
    H, Wp = shape
    ny, nx = H - 2, Wp - 2
    idx, idy = coeffs.idx, coeffs.idy
    lid = lid_velocity

    def compute(s, qins, fin, consts, scalars=None):
        u, v = qins
        slab, W = u[0].shape
        dt = scalars[0] if traced_dt else None
        rho_dt = (coeffs.density / dt) if traced_dt \
            else (coeffs.density / coeffs.dt)
        grow, gcol = _qiota(s, slab, W)
        u, v = _cavity_bc_quad(u, v, grow, gcol, ny, nx, lid)
        us_raw, vs_raw = _predictor_quad(u, v, coeffs, dt=dt)
        us, vs, b = [], [], []
        for q in range(4):
            g, c = grow[q], gcol[q]
            u_valid = (g >= 1) & (g <= ny) & (c >= 1) & (c <= nx - 1)
            v_valid = (g >= 1) & (g <= ny - 1) & (c >= 1) & (c <= nx)
            zero = jnp.zeros_like(u[q])
            us.append(jnp.where(u_valid, us_raw[q], zero))
            vs.append(jnp.where(v_valid, vs_raw[q], zero))

        usW = _qshift(us, 0, -1)
        vsS = _qshift(vs, -1, 0)
        for q in range(4):
            g, c = grow[q], gcol[q]
            cell = (g >= 1) & (g <= ny) & (c >= 1) & (c <= nx)
            div = (us[q] - usW[q]) * idx + (vs[q] - vsS[q]) * idy
            b.append(jnp.where(cell, rho_dt * div, jnp.zeros_like(div)))
        return [us, vs, b], None, [jnp.abs(a) for a in b]

    call, _ = _make_quad_slab_kernel(
        shape, n_qin=2, n_qout=3, compute=compute, tile_rows=tile_rows,
        interpret=interpret, halo=8, scalar_reduce="max",
        vmem_bytes_per_cell=260,
        scalar_params=1 if traced_dt else 0)
    return call


def make_quad_corrector(shape, coeffs, lid_velocity: float = 1.0,
                        tile_rows: int = 128, interpret: bool = False,
                        traced_dt: bool = False):
    """(us4, vs4, p4, p_prev4) -> (u4, v4, guess4): rho-multiplied cavity
    projection + ghost BCs rebuilt from the corrected interior (the slim
    convention of kernels.projection.make_corrector) + the next step's
    extrapolated warm-start guess 2p - p_prev.

    ``traced_dt``: leading traced dt scalar (see make_quad_predictor_source)."""
    H, Wp = shape
    ny, nx = H - 2, Wp - 2
    lid = lid_velocity

    def compute(s, qins, fin, consts, scalars=None):
        us, vs, p, p_prev = qins
        slab, W = us[0].shape
        if traced_dt:
            cu = scalars[0] * (coeffs.density / coeffs.dx)
            cv = scalars[0] * (coeffs.density / coeffs.dy)
        else:
            cu = coeffs.dt / coeffs.dx * coeffs.density
            cv = coeffs.dt / coeffs.dy * coeffs.density
        grow, gcol = _qiota(s, slab, W)
        pE, pN = _qshift(p, 0, 1), _qshift(p, 1, 0)
        u2, v2, guess = [], [], []
        for q in range(4):
            g, c = grow[q], gcol[q]
            u_valid = (g >= 1) & (g <= ny) & (c >= 1) & (c <= nx - 1)
            v_valid = (g >= 1) & (g <= ny - 1) & (c >= 1) & (c <= nx)
            zero = jnp.zeros_like(us[q])
            u2.append(jnp.where(u_valid, us[q] - cu * (pE[q] - p[q]), zero))
            v2.append(jnp.where(v_valid, vs[q] - cv * (pN[q] - p[q]), zero))
            guess.append(2.0 * p[q] - p_prev[q])
        u2, v2 = _cavity_bc_quad(u2, v2, grow, gcol, ny, nx, lid)
        return [u2, v2, guess], None, None

    call, _ = _make_quad_slab_kernel(
        shape, n_qin=4, n_qout=3, compute=compute, tile_rows=tile_rows,
        interpret=interpret, halo=8, vmem_bytes_per_cell=260,
        scalar_params=1 if traced_dt else 0)
    return call


def _plane_weight_vectors(problem, shape, rows_len: int | None = None,
                          row_prefix: int = 0):
    """Split a separable PoissonProblem's coupling vectors into per-parity
    plane vectors (host numpy — striding is free here): returns
    (wE[2](1,Wqa), wW[2], wN[2](L,1), wS[2]) with L = rows_len or Hq8.

    ``rows_len``/``row_prefix``: the sharded variant's row vectors are
    GLOBALLY indexed with a DEV_HALO-row zero prefix, so a kernel slicing
    at (global slab start + DEV_HALO) >= 0 reads the right parity rows."""
    Hq, Wq, Hq8, Wqa = quad_dims(shape)
    H, W = shape

    def col_vec(w_full):
        v = np.zeros(W)
        v[1 : problem.nx + 1] = w_full[1, 1 : problem.nx + 1]
        out = []
        for s in range(2):
            vp = np.zeros(Wqa)
            part = v[s::2]
            vp[: part.size] = part
            out.append(jnp.asarray(vp, jnp.float32).reshape(1, Wqa))
        return out

    def row_vec(w_full):
        v = np.zeros(H)
        v[1 : problem.ny + 1] = w_full[1 : problem.ny + 1, 1]
        out = []
        L = rows_len if rows_len is not None else Hq8
        for r in range(2):
            vp = np.zeros(L)
            part = v[r::2]
            vp[row_prefix : row_prefix + part.size] = part
            out.append(jnp.asarray(vp, jnp.float32).reshape(L, 1))
        return out

    return col_vec(problem.wE), col_vec(problem.wW), row_vec(problem.wN), row_vec(problem.wS)


def _smooth_pairs_quad(p, b, n_pairs, omega, idx2, idy2, wE, wW, wN, wS,
                       masks, bands):
    """n_pairs red(planes 0,3)+black(planes 1,2) dense Gauss-Seidel pairs.
    ``masks[q]``: interior mask per plane; ``bands(lo)``: valid-row band
    (same shrink bookkeeping as kernels.rb_smoother)."""
    inv = []
    for q in range(4):
        r, sp = q >> 1, q & 1
        denom = idx2 * (wE[sp] + wW[sp]) + idy2 * (wN[r] + wS[r])
        denom = jnp.broadcast_to(denom, p[q].shape)
        inv.append(jnp.where(masks[q], 1.0 / jnp.where(denom > 0, denom, 1.0), 0.0))

    def half(p, upd, band):
        E, Wm = _qshift(p, 0, 1), _qshift(p, 0, -1)
        N, S = _qshift(p, 1, 0), _qshift(p, -1, 0)
        out = list(p)
        for q in upd:
            r, sp = q >> 1, q & 1
            gs = (idx2 * (wE[sp] * E[q] + wW[sp] * Wm[q])
                  + idy2 * (wN[r] * N[q] + wS[r] * S[q]) - b[q]) * inv[q]
            upd_v = p[q] + omega * (gs - p[q])
            out[q] = jnp.where(masks[q] & band, upd_v, p[q])
        return out

    for k in range(n_pairs):
        p = half(p, (0, 3), bands(2 * k + 1))
        p = half(p, (1, 2), bands(2 * k + 2))
    return p


def _residual_quad(p, b, idx2, idy2, wE, wW, wN, wS, masks):
    E, Wm = _qshift(p, 0, 1), _qshift(p, 0, -1)
    N, S = _qshift(p, 1, 0), _qshift(p, -1, 0)
    out = []
    for q in range(4):
        r, sp = q >> 1, q & 1
        ap = (idx2 * (wE[sp] * (E[q] - p[q]) + wW[sp] * (Wm[q] - p[q]))
              + idy2 * (wN[r] * (N[q] - p[q]) + wS[r] * (S[q] - p[q])))
        out.append(jnp.where(masks[q], b[q] - ap, jnp.zeros_like(b[q])))
    return out


def _band_maker(s, slab, W, ny):
    """Valid-band helper: the band shrinks one plane row per side per
    half-sweep except where the slab touches a physical edge (ghost rows
    terminate the dependency chain, as in kernels.rb_smoother)."""
    local = jax.lax.broadcasted_iota(jnp.int32, (slab, W), 0)
    # <= 0: the sharded variant's bottom device has its slab start at the
    # NEGATIVE global row -DEV_HALO (dead halo rows below the physical
    # ghost); same termination semantics as s == 0 on a single device.
    at_bottom = s <= 0
    at_top = s + slab >= (ny + 1) // 2 + 1

    def band(lo):
        lo_eff = jnp.where(at_bottom, 0, lo)
        hi_eff = jnp.where(at_top, slab, slab - lo)
        return (local >= lo_eff) & (local < hi_eff)

    return band


def make_quad_pre_smooth_restrict(shape, problem, omega: float, n_pairs: int,
                                  coarse_shape: tuple[int, int],
                                  tile_rows: int = 128, interpret: bool = False,
                                  shard: tuple[int, int] | None = None):
    """(p4, b4) -> (p4, rc): n_pairs exact red/black pairs on the finest
    level, then the residual restricted (full-weighting) STRAIGHT to the
    aligned coarse source array — the V-cycle's pre-smooth + residual +
    restriction in one HBM round trip.

    ``coarse_shape``: the aligned (Hc8, Wc) level-1 array shape; its rows
    coincide 1:1 with plane rows (Hc8 == Hq8, Wc == Wqa is asserted).

    ``shard``: (P, mdy) for the SPMD variant (see _make_quad_slab_kernel):
    arrays are local (4, P+16, Wqa) blocks, coarse_shape is the LOCAL
    (P+16, Wqa), and the call takes a leading row_base scalar."""
    H, Wp = shape
    ny, nx = H - 2, Wp - 2
    nyc, nxc = ny // 2, nx // 2
    Hq, Wq, Hq8, Wqa = quad_dims(shape)
    if shard is not None:
        P, mdy = shard
        expect = (P + 16, Wqa)
        vec_len, voff = mdy * P + 16, 8
    else:
        expect = (Hq8, Wqa)
        vec_len, voff = None, 0
    assert coarse_shape == expect, (coarse_shape, expect)
    idx2 = 1.0 / (problem.dx * problem.dx)
    idy2 = 1.0 / (problem.dy * problem.dy)
    wEc, wWc, wNc, wSc = _plane_weight_vectors(problem, shape,
                                               rows_len=vec_len,
                                               row_prefix=voff)

    def compute(s, qins, fin, consts):
        p, b = qins
        slab, W = p[0].shape
        sv = pl.multiple_of((s + voff).astype(jnp.int32), 8)
        wE = [consts[0][:], consts[1][:]]
        wW = [consts[2][:], consts[3][:]]
        wNs = [consts[4][pl.ds(sv, slab), :], consts[5][pl.ds(sv, slab), :]]
        wSs = [consts[6][pl.ds(sv, slab), :], consts[7][pl.ds(sv, slab), :]]
        grow, gcol = _qiota(s, slab, W)
        masks = [(g >= 1) & (g <= ny) & (c >= 1) & (c <= nx)
                 for g, c in zip(grow, gcol)]
        band = _band_maker(s, slab, W, ny)
        p = _smooth_pairs_quad(p, b, n_pairs, omega, idx2, idy2,
                               wE, wW, wNs, wSs, masks, band)
        r = _residual_quad(p, b, idx2, idy2, wE, wW, wNs, wSs, masks)
        # coarse cell (Jc, Ic) children: planes (1,1)@(Jc-1,Ic-1),
        # (1,0)@(Jc-1,Ic), (0,1)@(Jc,Ic-1), (0,0)@(Jc,Ic)
        rc = 0.25 * (r[0]
                     + jnp.roll(r[1], 1, axis=1)
                     + jnp.roll(r[2], 1, axis=0)
                     + jnp.roll(jnp.roll(r[3], 1, axis=0), 1, axis=1))
        Jc = s + jax.lax.broadcasted_iota(jnp.int32, (slab, W), 0)
        Ic = jax.lax.broadcasted_iota(jnp.int32, (slab, W), 1)
        cmask = (Jc >= 1) & (Jc <= nyc) & (Ic >= 1) & (Ic <= nxc)
        rc = jnp.where(cmask, rc, jnp.zeros_like(rc))
        return [p], rc, None

    halo = _round_up(2 * n_pairs + 3, 8)
    call, _ = _make_quad_slab_kernel(
        shape, n_qin=2, n_qout=1, compute=compute, tile_rows=tile_rows,
        interpret=interpret, halo=halo, flat_out_shape=coarse_shape,
        const_inputs=(*wEc, *wWc, *wNc, *wSc),
        vmem_bytes_per_cell=230,
        shard=None if shard is None else shard[0])
    return call


def make_quad_post_prolong_smooth(shape, problem, omega: float, n_pairs: int,
                                  coarse_shape: tuple[int, int],
                                  tile_rows: int = 128, interpret: bool = False,
                                  shard: tuple[int, int] | None = None):
    """(p4, b4, ec) -> (p4, res_inf): bilinear prolongation of the coarse
    correction fused with the post-smooth pairs and the tolerance-check
    residual — the V-cycle's coarse-correction + post-smooth + max|r| in
    one HBM round trip (replacing the stack/reshape interleave chain).

    ``shard``: (P, mdy) SPMD variant; res_inf is the per-device partial
    max (caller pmaxes)."""
    H, Wp = shape
    ny, nx = H - 2, Wp - 2
    nyc, nxc = ny // 2, nx // 2
    Hq, Wq, Hq8, Wqa = quad_dims(shape)
    if shard is not None:
        P, mdy = shard
        expect = (P + 16, Wqa)
        vec_len, voff = mdy * P + 16, 8
    else:
        expect = (Hq8, Wqa)
        vec_len, voff = None, 0
    assert coarse_shape == expect, (coarse_shape, expect)
    idx2 = 1.0 / (problem.dx * problem.dx)
    idy2 = 1.0 / (problem.dy * problem.dy)
    wEc, wWc, wNc, wSc = _plane_weight_vectors(problem, shape,
                                               rows_len=vec_len,
                                               row_prefix=voff)

    def compute(s, qins, ec, consts):
        p, b = qins
        slab, W = p[0].shape
        sv = pl.multiple_of((s + voff).astype(jnp.int32), 8)
        wE = [consts[0][:], consts[1][:]]
        wW = [consts[2][:], consts[3][:]]
        wNs = [consts[4][pl.ds(sv, slab), :], consts[5][pl.ds(sv, slab), :]]
        wSs = [consts[6][pl.ds(sv, slab), :], consts[7][pl.ds(sv, slab), :]]
        grow, gcol = _qiota(s, slab, W)
        masks = [(g >= 1) & (g <= ny) & (c >= 1) & (c <= nx)
                 for g, c in zip(grow, gcol)]

        # bilinear prolongation at coarse size: fine plane (r, s) is a
        # (0.75, 0.25)-weighted 2x2 combination of ec rows (J, J+1) and
        # cols (I, I+1), with edge-clamped coarse ghosts (the quad twin of
        # poisson.multigrid._prolong's pad-edge).
        Jc = s + jax.lax.broadcasted_iota(jnp.int32, (slab, W), 0)
        Ic = jax.lax.broadcasted_iota(jnp.int32, (slab, W), 1)
        ecJ1 = jnp.roll(ec, -1, axis=0)
        ecJ0 = jnp.where(Jc == 0, ecJ1, ec)        # clamp J=0 ghost -> row 1
        ecJ1 = jnp.where(Jc == nyc, ec, ecJ1)      # clamp J+1 > nyc -> row nyc
        rowmix = [0.75 * ecJ0 + 0.25 * ecJ1,       # r = 0: hi child of Jc
                  0.25 * ecJ0 + 0.75 * ecJ1]       # r = 1: lo child of Jc+1
        corr = []
        for r in range(2):
            m1 = jnp.roll(rowmix[r], -1, axis=1)
            m0 = jnp.where(Ic == 0, m1, rowmix[r])
            m1 = jnp.where(Ic == nxc, rowmix[r], m1)
            corr.append([0.75 * m0 + 0.25 * m1,    # s = 0
                         0.25 * m0 + 0.75 * m1])   # s = 1
        p = [jnp.where(masks[q], p[q] + corr[q >> 1][q & 1], p[q])
             for q in range(4)]

        band = _band_maker(s, slab, W, ny)
        # the prolongation's roll(-1) wraps at the slab top: one extra row
        # of top shrink before the sweeps (band offset starts at 2)
        p = _smooth_pairs_quad(p, b, n_pairs, omega, idx2, idy2,
                               wE, wW, wNs, wSs, masks,
                               lambda lo: band(lo + 1))
        r = _residual_quad(p, b, idx2, idy2, wE, wW, wNs, wSs, masks)
        return [p], None, [jnp.abs(a) for a in r]

    halo = _round_up(2 * n_pairs + 4, 8)
    call, _ = _make_quad_slab_kernel(
        shape, n_qin=2, n_qout=1, compute=compute, tile_rows=tile_rows,
        interpret=interpret, halo=halo, flat_in_shape=coarse_shape,
        scalar_reduce="max", const_inputs=(*wEc, *wWc, *wNc, *wSc),
        vmem_bytes_per_cell=230,
        shard=None if shard is None else shard[0])
    return call


def _channel_bc_quad(u, v, grow, gcol, ny: int, nx: int, uin: float):
    """kernels.projection._channel_bc_slab in quad form (channel-01.cpp:
    513-529): the reference's exact update order — ghost rows read the
    already-updated inlet/outlet columns."""
    u = _where4([(c == 0) & (g >= 1) & (g <= ny) for g, c in zip(grow, gcol)],
                [jnp.full_like(a, uin) for a in u], u)
    v = _where4([(c == 0) & (g <= ny) for g, c in zip(grow, gcol)],
                [jnp.zeros_like(a) for a in v], v)
    uW = _qshift(u, 0, -1)
    u = _where4([(c == nx) & (g >= 1) & (g <= ny) for g, c in zip(grow, gcol)],
                uW, u)
    vW = _qshift(v, 0, -1)
    v = _where4([(c == nx + 1) & (g <= ny) for g, c in zip(grow, gcol)],
                vW, v)
    v = _where4([(g == 0) & (c >= 1) & (c <= nx) for g, c in zip(grow, gcol)],
                [jnp.zeros_like(a) for a in v], v)
    uN = _qshift(u, 1, 0)
    u = _where4([(g == 0) & (c <= nx) for g, c in zip(grow, gcol)],
                [-a for a in uN], u)
    v = _where4([(g == ny) & (c >= 1) & (c <= nx) for g, c in zip(grow, gcol)],
                [jnp.zeros_like(a) for a in v], v)
    uS = _qshift(u, -1, 0)
    u = _where4([(g == ny + 1) & (c <= nx) for g, c in zip(grow, gcol)],
                [-a for a in uS], u)
    return u, v


def _predictor_quad(u, v, coeffs, dt=None):
    """Shared MAC predictor math over quad planes (cavity-01.cpp:548-603 /
    channel-01.cpp:546-603, anisotropic). ``dt`` optionally overrides the
    static coefficient with a TRACED scalar (adaptive stepping)."""
    nu = coeffs.viscosity
    dt = coeffs.dt if dt is None else dt
    idx, idy = coeffs.idx, coeffs.idy
    idx2, idy2 = coeffs.idx2, coeffs.idy2
    uE, uW = _qshift(u, 0, 1), _qshift(u, 0, -1)
    uN, uS = _qshift(u, 1, 0), _qshift(u, -1, 0)
    vE, vW = _qshift(v, 0, 1), _qshift(v, 0, -1)
    vN, vS = _qshift(v, 1, 0), _qshift(v, -1, 0)
    vSE = _qshift(v, -1, 1)
    uNW = _qshift(u, 1, -1)
    us, vs = [], []
    for q in range(4):
        lap_u = (uE[q] - 2.0 * u[q] + uW[q]) * idx2 + (uN[q] - 2.0 * u[q] + uS[q]) * idy2
        u_e = 0.5 * (u[q] + uE[q])
        u_w = 0.5 * (uW[q] + u[q])
        conv_ux = (u_e * u_e - u_w * u_w) * idx
        v_n = 0.5 * (v[q] + vE[q])
        v_s = 0.5 * (vS[q] + vSE[q])
        u_n = 0.5 * (uN[q] + u[q])
        u_s = 0.5 * (uS[q] + u[q])
        conv_uy = (v_n * u_n - v_s * u_s) * idy
        us.append(u[q] + dt * (nu * lap_u - conv_ux - conv_uy))
        lap_v = (vE[q] - 2.0 * v[q] + vW[q]) * idx2 + (vN[q] - 2.0 * v[q] + vS[q]) * idy2
        v_nn = 0.5 * (v[q] + vN[q])
        v_ss = 0.5 * (vS[q] + v[q])
        conv_vy = (v_nn * v_nn - v_ss * v_ss) * idy
        u_e2 = 0.5 * (u[q] + uN[q])
        u_w2 = 0.5 * (uW[q] + uNW[q])
        v_e2 = 0.5 * (v[q] + vE[q])
        v_w2 = 0.5 * (vW[q] + v[q])
        conv_vx = (u_e2 * v_e2 - u_w2 * v_w2) * idx
        vs.append(v[q] + dt * (nu * lap_v - conv_vy - conv_vx))
    return us, vs


def make_quad_channel_predictor_source(shape, coeffs,
                                       inlet_velocity: float = 1.0,
                                       tile_rows: int = 128,
                                       interpret: bool = False):
    """(u4, v4) -> (us4, vs4, b4, sum_b) for the channel ordering
    (channel-01.cpp:365-376): predictor on the BC'd carried state, channel
    BCs on the TENTATIVE fields, raw source + its interior sum (the caller
    subtracts the mean — channel-01.cpp:620-628)."""
    H, Wp = shape
    ny, nx = H - 2, Wp - 2
    idx, idy = coeffs.idx, coeffs.idy
    rho_dt = coeffs.density / coeffs.dt
    uin = inlet_velocity

    def compute(s, qins, fin, consts):
        u, v = qins
        slab, W = u[0].shape
        grow, gcol = _qiota(s, slab, W)
        us_raw, vs_raw = _predictor_quad(u, v, coeffs)
        us, vs = [], []
        for q in range(4):
            g, c = grow[q], gcol[q]
            u_valid = (g >= 1) & (g <= ny) & (c >= 1) & (c <= nx - 1)
            v_valid = (g >= 1) & (g <= ny - 1) & (c >= 1) & (c <= nx)
            zero = jnp.zeros_like(u[q])
            us.append(jnp.where(u_valid, us_raw[q], zero))
            vs.append(jnp.where(v_valid, vs_raw[q], zero))
        us, vs = _channel_bc_quad(us, vs, grow, gcol, ny, nx, uin)
        usW = _qshift(us, 0, -1)
        vsS = _qshift(vs, -1, 0)
        b = []
        for q in range(4):
            g, c = grow[q], gcol[q]
            cell = (g >= 1) & (g <= ny) & (c >= 1) & (c <= nx)
            div = (us[q] - usW[q]) * idx + (vs[q] - vsS[q]) * idy
            b.append(jnp.where(cell, rho_dt * div, jnp.zeros_like(div)))
        return [us, vs, b], None, list(b)

    call, _ = _make_quad_slab_kernel(
        shape, n_qin=2, n_qout=3, compute=compute, tile_rows=tile_rows,
        interpret=interpret, halo=8, scalar_reduce="sum",
        vmem_bytes_per_cell=260)
    return call


def make_quad_channel_corrector(shape, coeffs, inlet_velocity: float = 1.0,
                                tile_rows: int = 128,
                                interpret: bool = False,
                                traced_dt: bool = False):
    """(us4, vs4, p4, p_prev4) -> (u2_4, v2_4, guess4): rho-DIVIDED
    projection (channel-01.cpp:693-702) on valid faces (invalid -> 0, the
    slim-ghost convention), channel BCs on the corrected fields, plus the
    extrapolated warm-start guess.

    ``traced_dt``: leading traced dt scalar (the dt that built the carried
    tentative fields — see make_quad_corrector)."""
    H, Wp = shape
    ny, nx = H - 2, Wp - 2
    cu_s = coeffs.dt / (coeffs.density * coeffs.dx)
    cv_s = coeffs.dt / (coeffs.density * coeffs.dy)
    uin = inlet_velocity

    def compute(s, qins, fin, consts, scalars=None):
        us, vs, p, p_prev = qins
        slab, W = us[0].shape
        if traced_dt:
            cu = scalars[0] / (coeffs.density * coeffs.dx)
            cv = scalars[0] / (coeffs.density * coeffs.dy)
        else:
            cu, cv = cu_s, cv_s
        grow, gcol = _qiota(s, slab, W)
        pE, pN = _qshift(p, 0, 1), _qshift(p, 1, 0)
        u2, v2, guess = [], [], []
        for q in range(4):
            g, c = grow[q], gcol[q]
            u_valid = (g >= 1) & (g <= ny) & (c >= 1) & (c <= nx - 1)
            v_valid = (g >= 1) & (g <= ny - 1) & (c >= 1) & (c <= nx)
            zero = jnp.zeros_like(us[q])
            u2.append(jnp.where(u_valid, us[q] - cu * (pE[q] - p[q]), zero))
            v2.append(jnp.where(v_valid, vs[q] - cv * (pN[q] - p[q]), zero))
            guess.append(2.0 * p[q] - p_prev[q])
        u2, v2 = _channel_bc_quad(u2, v2, grow, gcol, ny, nx, uin)
        return [u2, v2, guess], None, None

    call, _ = _make_quad_slab_kernel(
        shape, n_qin=4, n_qout=3, compute=compute, tile_rows=tile_rows,
        interpret=interpret, halo=8, vmem_bytes_per_cell=260,
        scalar_params=1 if traced_dt else 0)
    return call


def make_quad_corr_predictor_source(shape, coeffs, lid_velocity: float = 1.0,
                                    tile_rows: int = 128,
                                    interpret: bool = False,
                                    shard: tuple[int, int] | None = None,
                                    traced_dt: bool = False,
                                    emit_courant: bool = False):
    """Tentative-state cavity step stage: (us, vs, p, p_prev) ->
    (us', vs', b', guess, max|b'|).

    The carried state is the TENTATIVE velocity (u*, v*) plus the solved
    pressure — the corrector (cavity-01.cpp:695-711) runs at the START of
    the next step, entirely in VMEM, feeding the ghost BCs + MAC predictor
    + Poisson source without the corrected u/v ever existing in HBM
    (4 full-field passes/step saved vs the split corrector+predictor
    kernels; stats/export recompute u/v at print cadence via
    make_quad_corrector). ``guess`` = 2 p - p_prev is the next solve's
    extrapolated warm start.

    ``traced_dt``: the call gains a leading (dt_corr, dt_pred) scalar pair
    (SMEM) — the CARRY structure entangles two time steps: the corrector
    must undo the pressure gradient with the dt that BUILT the carried
    tentative fields (dt_corr = the previous step's dt), while the
    predictor and source advance with this step's dt_pred. Both stay
    traced, so the adaptive controller never recompiles.

    ``emit_courant``: additionally reduce max|u| and max|v| of the
    corrected+BC'd fields (they exist only in VMEM here) and return them
    after max|b'| — the Courant feedback for the lagged adaptive
    controller (cfd_tpu.adaptive), measured on the state the corrector
    just produced (one step stale by construction: the global max cannot
    complete before this same kernel's predictor consumes the fields).

    Stencil radius: corrector (1) + ghost BCs (1) + predictor (2) + source
    (1) = 5 rows < halo 8."""
    compute = cavity_carry_compute(shape, coeffs, lid_velocity,
                                   traced_dt=traced_dt,
                                   emit_courant=emit_courant)
    call, _ = _make_quad_slab_kernel(
        shape, n_qin=4, n_qout=4, compute=compute, tile_rows=tile_rows,
        interpret=interpret, halo=8,
        scalar_reduce=("max", "max", "max") if emit_courant else "max",
        vmem_bytes_per_cell=390,
        shard=None if shard is None else shard[0],
        scalar_params=2 if traced_dt else 0)
    return call


def make_quad_corr_predictor_source_fused_pre(shape, problem, coeffs,
                                              omega: float, n_pairs: int,
                                              coarse_shape: tuple[int, int],
                                              lid_velocity: float = 1.0,
                                              tile_rows: int = 128,
                                              interpret: bool = False):
    """The round-5 headline fusion: the tentative-carry cavity stage WITH
    the first V-cycle's pre-smooth + residual + restriction folded in —
    (us, vs, p, p_prev) -> (us', vs', b', p1, rc, max|b'|).

    At the 2048^2 headline the solver runs 1.0 V-cycles/step steady-state
    (extrapolated warm start), so the per-kernel composition's separate
    pre kernel re-reads the guess and b this kernel just produced — a full
    52 MB level-0 HBM round trip per step whose inputs were ALREADY in
    VMEM here. Folding it in removes that pass entirely: the guess
    (2p - p_prev) never exists in HBM, smoothing runs on it in-slab, and
    the kernel emits the pre-smoothed iterate ``p1`` plus the restricted
    residual ``rc`` for the coarse levels. The tolerance loop's first
    cycle then starts at the coarse stage
    (make_multigrid_poisson(first_cycle_rc=True)); cycles >= 2 (startup
    transient only) use the regular pre kernel. Only the per-kernel
    fallback path uses this — at whole_solve sizes the fused solve already
    owns the V-cycle (cases/cavity.py gating).

    Stencil radius: carry stages 5 (see make_quad_corr_predictor_source)
    + 2*n_pairs half-sweeps + residual 1 + restriction roll 1; halo is
    rounded up to cover it (16 at the V(2,1) default)."""
    H, Wp = shape
    ny, nx = H - 2, Wp - 2
    nyc, nxc = ny // 2, nx // 2
    Hq, Wq, Hq8, Wqa = quad_dims(shape)
    assert coarse_shape == (Hq8, Wqa), (coarse_shape, (Hq8, Wqa))
    idx2 = 1.0 / (problem.dx * problem.dx)
    idy2 = 1.0 / (problem.dy * problem.dy)
    wEc, wWc, wNc, wSc = _plane_weight_vectors(problem, shape)
    carry = cavity_carry_compute(shape, coeffs, lid_velocity)
    CARRY_RADIUS = 5  # corrector + ghost BCs + predictor + source rows

    def compute(s, qins, fin, consts):
        [us2, vs2, b, guess], _, sarr = carry(s, qins, None, ())
        slab, W = b[0].shape
        sv = pl.multiple_of(s.astype(jnp.int32), 8)
        wE = [consts[0][:], consts[1][:]]
        wW = [consts[2][:], consts[3][:]]
        wNs = [consts[4][pl.ds(sv, slab), :], consts[5][pl.ds(sv, slab), :]]
        wSs = [consts[6][pl.ds(sv, slab), :], consts[7][pl.ds(sv, slab), :]]
        grow, gcol = _qiota(s, slab, W)
        masks = [(g >= 1) & (g <= ny) & (c >= 1) & (c <= nx)
                 for g, c in zip(grow, gcol)]
        band = _band_maker(s, slab, W, ny)
        # b carries the carry stages' slab-edge staleness: every smoothing
        # band starts CARRY_RADIUS rows further in than the plain pre
        # kernel's (same shrink bookkeeping otherwise)
        p1 = _smooth_pairs_quad(guess, b, n_pairs, omega, idx2, idy2,
                                wE, wW, wNs, wSs, masks,
                                lambda lo: band(CARRY_RADIUS + lo))
        r = _residual_quad(p1, b, idx2, idy2, wE, wW, wNs, wSs, masks)
        rc = 0.25 * (r[0]
                     + jnp.roll(r[1], 1, axis=1)
                     + jnp.roll(r[2], 1, axis=0)
                     + jnp.roll(jnp.roll(r[3], 1, axis=0), 1, axis=1))
        Jc = s + jax.lax.broadcasted_iota(jnp.int32, (slab, W), 0)
        Ic = jax.lax.broadcasted_iota(jnp.int32, (slab, W), 1)
        cmask = (Jc >= 1) & (Jc <= nyc) & (Ic >= 1) & (Ic <= nxc)
        rc = jnp.where(cmask, rc, jnp.zeros_like(rc))
        return [us2, vs2, b, p1], rc, sarr

    halo = _round_up(CARRY_RADIUS + 2 * n_pairs + 3, 8)
    call, _ = _make_quad_slab_kernel(
        shape, n_qin=4, n_qout=4, compute=compute, tile_rows=tile_rows,
        interpret=interpret, halo=halo, flat_out_shape=coarse_shape,
        scalar_reduce="max",
        const_inputs=(*wEc, *wWc, *wNc, *wSc),
        vmem_bytes_per_cell=440)
    return call


def cavity_carry_compute(shape, coeffs, lid_velocity: float = 1.0,
                         traced_dt: bool = False,
                         emit_courant: bool = False):
    """``compute(s, qins, fin, consts, scalars)`` of the tentative-carry
    cavity stage (make_quad_corr_predictor_source) — shared by the slab
    kernel factory and kernels.whole_step's whole-array embedding."""
    H, Wp = shape
    ny, nx = H - 2, Wp - 2
    idx, idy = coeffs.idx, coeffs.idy
    cu_s = coeffs.dt / coeffs.dx * coeffs.density
    cv_s = coeffs.dt / coeffs.dy * coeffs.density
    rho_dt_s = coeffs.density / coeffs.dt
    lid = lid_velocity

    def compute(s, qins, fin, consts, scalars=None):
        us, vs, p, p_prev = qins
        slab, W = us[0].shape
        if traced_dt:
            cu = scalars[0] * (coeffs.density / coeffs.dx)
            cv = scalars[0] * (coeffs.density / coeffs.dy)
            dt_pred = scalars[1]
            rho_dt = coeffs.density / dt_pred
        else:
            cu, cv, rho_dt, dt_pred = cu_s, cv_s, rho_dt_s, None
        grow, gcol = _qiota(s, slab, W)
        pE, pN = _qshift(p, 0, 1), _qshift(p, 1, 0)
        u, v, guess = [], [], []
        for q in range(4):
            g, c = grow[q], gcol[q]
            u_valid = (g >= 1) & (g <= ny) & (c >= 1) & (c <= nx - 1)
            v_valid = (g >= 1) & (g <= ny - 1) & (c >= 1) & (c <= nx)
            zero = jnp.zeros_like(us[q])
            u.append(jnp.where(u_valid, us[q] - cu * (pE[q] - p[q]), zero))
            v.append(jnp.where(v_valid, vs[q] - cv * (pN[q] - p[q]), zero))
            guess.append(2.0 * p[q] - p_prev[q])
        u, v = _cavity_bc_quad(u, v, grow, gcol, ny, nx, lid)
        us_raw, vs_raw = _predictor_quad(u, v, coeffs, dt=dt_pred)
        us2, vs2 = [], []
        for q in range(4):
            g, c = grow[q], gcol[q]
            u_valid = (g >= 1) & (g <= ny) & (c >= 1) & (c <= nx - 1)
            v_valid = (g >= 1) & (g <= ny - 1) & (c >= 1) & (c <= nx)
            zero = jnp.zeros_like(u[q])
            us2.append(jnp.where(u_valid, us_raw[q], zero))
            vs2.append(jnp.where(v_valid, vs_raw[q], zero))
        usW = _qshift(us2, 0, -1)
        vsS = _qshift(vs2, -1, 0)
        b = []
        for q in range(4):
            g, c = grow[q], gcol[q]
            cell = (g >= 1) & (g <= ny) & (c >= 1) & (c <= nx)
            div = (us2[q] - usW[q]) * idx + (vs2[q] - vsS[q]) * idy
            b.append(jnp.where(cell, rho_dt * div, jnp.zeros_like(div)))
        if emit_courant:
            sarr = [[jnp.abs(a) for a in b],
                    [jnp.abs(a) for a in u],
                    [jnp.abs(a) for a in v]]
        else:
            sarr = [jnp.abs(a) for a in b]
        return [us2, vs2, b, guess], None, sarr

    return compute


def make_quad_channel_corr_predictor_source(shape, coeffs,
                                            inlet_velocity: float = 1.0,
                                            tile_rows: int = 128,
                                            interpret: bool = False,
                                            shard: tuple[int, int] | None = None,
                                            traced_dt: bool = False,
                                            emit_courant: bool = False):
    """Tentative-state channel step stage: (us, vs, p, p_prev) ->
    (us', vs', b', guess, sum_b').

    Channel ordering (channel-01.cpp:365-386) with the corrector shifted to
    the start of the next step: rho-DIVIDED projection on valid faces,
    channel BCs on the corrected fields, predictor, channel BCs on the
    tentative fields, raw source + interior sum (mean removed by the
    caller; in the sharded variant the sum is the device's own-row PARTIAL
    and the caller psums it).

    ``traced_dt``/``emit_courant``: the lagged-adaptive contract of
    make_quad_corr_predictor_source — a leading (dt_corr, dt_pred) SMEM
    scalar pair, and max|u2|/max|v2| of the corrected+BC'd fields appended
    after sum_b'."""
    compute = channel_carry_compute(shape, coeffs, inlet_velocity,
                                    traced_dt=traced_dt,
                                    emit_courant=emit_courant)
    call, _ = _make_quad_slab_kernel(
        shape, n_qin=4, n_qout=4, compute=compute, tile_rows=tile_rows,
        interpret=interpret, halo=8,
        scalar_reduce=("sum", "max", "max") if emit_courant else "sum",
        vmem_bytes_per_cell=500,
        shard=None if shard is None else shard[0],
        scalar_params=2 if traced_dt else 0)
    return call


def channel_carry_compute(shape, coeffs, inlet_velocity: float = 1.0,
                          traced_dt: bool = False,
                          emit_courant: bool = False):
    """``compute(s, qins, fin, consts, scalars)`` of the tentative-carry
    channel stage (make_quad_channel_corr_predictor_source) — shared by
    the slab kernel factory and kernels.whole_step."""
    H, Wp = shape
    ny, nx = H - 2, Wp - 2
    idx, idy = coeffs.idx, coeffs.idy
    cu_s = coeffs.dt / (coeffs.density * coeffs.dx)
    cv_s = coeffs.dt / (coeffs.density * coeffs.dy)
    rho_dt_s = coeffs.density / coeffs.dt
    uin = inlet_velocity

    def compute(s, qins, fin, consts, scalars=None):
        us, vs, p, p_prev = qins
        slab, W = us[0].shape
        if traced_dt:
            cu = scalars[0] / (coeffs.density * coeffs.dx)
            cv = scalars[0] / (coeffs.density * coeffs.dy)
            dt_pred = scalars[1]
            rho_dt = coeffs.density / dt_pred
        else:
            cu, cv, rho_dt, dt_pred = cu_s, cv_s, rho_dt_s, None
        grow, gcol = _qiota(s, slab, W)
        pE, pN = _qshift(p, 0, 1), _qshift(p, 1, 0)
        u, v, guess = [], [], []
        for q in range(4):
            g, c = grow[q], gcol[q]
            u_valid = (g >= 1) & (g <= ny) & (c >= 1) & (c <= nx - 1)
            v_valid = (g >= 1) & (g <= ny - 1) & (c >= 1) & (c <= nx)
            zero = jnp.zeros_like(us[q])
            u.append(jnp.where(u_valid, us[q] - cu * (pE[q] - p[q]), zero))
            v.append(jnp.where(v_valid, vs[q] - cv * (pN[q] - p[q]), zero))
            guess.append(2.0 * p[q] - p_prev[q])
        u, v = _channel_bc_quad(u, v, grow, gcol, ny, nx, uin)
        us_raw, vs_raw = _predictor_quad(u, v, coeffs, dt=dt_pred)
        us2, vs2 = [], []
        for q in range(4):
            g, c = grow[q], gcol[q]
            u_valid = (g >= 1) & (g <= ny) & (c >= 1) & (c <= nx - 1)
            v_valid = (g >= 1) & (g <= ny - 1) & (c >= 1) & (c <= nx)
            zero = jnp.zeros_like(u[q])
            us2.append(jnp.where(u_valid, us_raw[q], zero))
            vs2.append(jnp.where(v_valid, vs_raw[q], zero))
        us2, vs2 = _channel_bc_quad(us2, vs2, grow, gcol, ny, nx, uin)
        usW = _qshift(us2, 0, -1)
        vsS = _qshift(vs2, -1, 0)
        b = []
        for q in range(4):
            g, c = grow[q], gcol[q]
            cell = (g >= 1) & (g <= ny) & (c >= 1) & (c <= nx)
            div = (us2[q] - usW[q]) * idx + (vs2[q] - vsS[q]) * idy
            b.append(jnp.where(cell, rho_dt * div, jnp.zeros_like(div)))
        if emit_courant:
            sarr = [list(b),
                    [jnp.abs(a) for a in u],
                    [jnp.abs(a) for a in v]]
        else:
            sarr = list(b)
        return [us2, vs2, b, guess], None, sarr

    return compute


def uncorrect_quad(u, v, p, shape, coeffs, cavity_form: bool, dt=None):
    """Inverse of the pressure correction on NATURAL-layout arrays (XLA,
    checkpoint-resume boundary only): us = u + c*(pE - p) on valid faces, 0
    elsewhere — so that correct(uncorrect(u, v, p), p) == (u, v) up to one
    f32 rounding. Used by the tentative-state carry's align_state.

    ``dt`` overrides ``coeffs.dt`` (adaptive carry resume: any dt round-
    trips as long as the next kernel call re-corrects with the SAME dt)."""
    H, Wp = shape
    ny, nx = H - 2, Wp - 2
    dt_ = coeffs.dt if dt is None else dt
    if cavity_form:
        cu = dt_ / coeffs.dx * coeffs.density
        cv = dt_ / coeffs.dy * coeffs.density
    else:
        cu = dt_ / (coeffs.density * coeffs.dx)
        cv = dt_ / (coeffs.density * coeffs.dy)
    jj = jax.lax.broadcasted_iota(jnp.int32, (H, Wp), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (H, Wp), 1)
    u_valid = (jj >= 1) & (jj <= ny) & (ii >= 1) & (ii <= nx - 1)
    v_valid = (jj >= 1) & (jj <= ny - 1) & (ii >= 1) & (ii <= nx)
    pE = jnp.roll(p, -1, axis=1)
    pN = jnp.roll(p, -1, axis=0)
    zero = jnp.zeros_like(u)
    us = jnp.where(u_valid, u + cu * (pE - p), zero)
    vs = jnp.where(v_valid, v + cv * (pN - p), zero)
    return us, vs
