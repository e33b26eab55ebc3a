"""Pallas TPU kernels: quad-layout (2x2 block-parity) backward-facing step.

The round-2 verdict's item 2b: the masked fine level gets the same quad
treatment as the cavity/channel (kernels.quad) — dense red/black plane
smoothing, fused restriction/prolongation, tentative-state carry — with the
step rectangle's geometry (``solid = {i <= step_i and j > inlet_j}``,
backwards_step-01.cpp:499-520) expressed as per-plane iota conditions:

* fluid(g, c)        = in-range & ~(c <= step_i & g > inlet_j)
* u_valid            = u-range & ~((c < step_i) & (g > inlet_j))
                       (faces whose BOTH cells are solid; the reference's
                       ``is_fluid[j][i] || is_fluid[j][i+1]``,
                       backwards_step-01.cpp:755-757, simplified for the
                       rectangle)
* v_valid            = v-range & fluid  (both-rows-solid test collapses)
* u-zero interface   = (c == step_i) & (inlet_j < g <= ny)   [east faces of
                       the solid column, backwards_step-01.cpp:655-683]
* v-zero interface   = (g == inlet_j) & (1 <= c <= step_i)   [faces under
                       the solid block]
* solid-cell ghosts: east-weight at c == step_i (< nx), south-weight at
  g == inlet_j + 1 (> 1), averaged (backwards_step-01.cpp:708-739) — the
  quad twin of kernels.step_smoother's iota weights.

Arbitrary rasters stay on the XLA masked path (poisson.multigrid
make_masked_multigrid_poisson); semantics here match that path to f32
roundoff (asserted in tests/test_step_quad.py in interpret mode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cfd_tpu.kernels.quad import (
    _band_maker,
    _make_quad_slab_kernel,
    _predictor_quad,
    _qiota,
    _qshift,
    _round_up,
    _where4,
    quad_dims,
)


def _step_masks(grow, gcol, ny: int, nx: int, step_i: int, inlet_j: int):
    """(fluid, u_valid, v_valid) per plane from the global iotas."""
    fluid, u_valid, v_valid = [], [], []
    for g, c in zip(grow, gcol):
        in_range = (g >= 1) & (g <= ny) & (c >= 1) & (c <= nx)
        solid = (c <= step_i) & (g > inlet_j)
        fluid.append(in_range & ~solid)
        u_rng = (g >= 1) & (g <= ny) & (c >= 1) & (c <= nx - 1)
        u_valid.append(u_rng & ~((c < step_i) & (g > inlet_j)))
        v_rng = (g >= 1) & (g <= ny - 1) & (c >= 1) & (c <= nx)
        v_valid.append(v_rng & ~((c <= step_i) & (g > inlet_j)))
    return fluid, u_valid, v_valid


def _step_bc_quad(u, v, grow, gcol, ny: int, nx: int, step_i: int,
                  inlet_j: int, uin: float):
    """step_bc (backwards_step-01.cpp:616-683) in quad form: channel BCs
    with the inlet restricted to rows g <= inlet_j, then the solid-interface
    face zeroing — the reference's exact update order (bc.step_bc)."""
    u = _where4([(c == 0) & (g >= 1) & (g <= inlet_j)
                 for g, c in zip(grow, gcol)],
                [jnp.full_like(a, uin) for a in u], u)
    u = _where4([(c == 0) & (g > inlet_j) & (g <= ny)
                 for g, c in zip(grow, gcol)],
                [jnp.zeros_like(a) for a in u], u)
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
    # solid-interface face zeroing (grid.u_zero_mask / v_zero_mask for the
    # rectangle), applied last as in bc.step_bc
    u = _where4([(c == step_i) & (g > inlet_j) & (g <= ny)
                 for g, c in zip(grow, gcol)],
                [jnp.zeros_like(a) for a in u], u)
    v = _where4([(g == inlet_j) & (c >= 1) & (c <= step_i)
                 for g, c in zip(grow, gcol)],
                [jnp.zeros_like(a) for a in v], v)
    return u, v


def make_quad_step_corr_predictor_source(shape, coeffs, step_i: int,
                                         inlet_j: int,
                                         inlet_velocity: float = 1.0,
                                         tile_rows: int = 128,
                                         interpret: bool = False,
                                         traced_dt: bool = False,
                                         emit_courant: bool = False,
                                         shard: tuple[int, int] | None = None):
    """Tentative-state step stage: (us, vs, p) -> (us', vs', b', sum_b').

    Channel ordering with the corrector shifted to the start of the next
    step (the quad twin of solver.py's masked channel path): rho-DIVIDED
    projection on VALID faces (invalid -> 0, slim-ghost convention), step
    BCs, masked predictor, step BCs on the tentative fields, fluid-only
    source + its sum (mean removed by the caller over n_fluid).

    No extrapolated-guess output: the step case warm-starts from the plain
    previous p — MEASURED on TPU at 2048x256, the 2p - p_prev extrapolation
    RAISES the masked defect-correction cycle count (4.0 -> 5.75 V-cycles/
    step on the natural path, 6.85 on this quad path) instead of lowering
    it as it does for the cavity/channel; dropping it also saves one quad
    field read (p_prev) and one write (guess) per step.

    ``traced_dt``/``emit_courant``: the lagged-adaptive contract of
    kernels.quad.make_quad_corr_predictor_source — a leading
    (dt_corr, dt_pred) SMEM scalar pair, and max|u2|/max|v2| of the
    corrected+BC'd fields appended after sum_b'.

    ``shard``: (P, mdy) for the SPMD variant (the kernels.quad sharded
    contract: local (4, P+16, W) blocks, leading traced row_base scalar,
    own-row partial reductions)."""
    compute = step_carry_compute(shape, coeffs, step_i, inlet_j,
                                 inlet_velocity, traced_dt=traced_dt,
                                 emit_courant=emit_courant)
    call, _ = _make_quad_slab_kernel(
        shape, n_qin=3, n_qout=3, compute=compute, tile_rows=tile_rows,
        interpret=interpret, halo=8,
        scalar_reduce=("sum", "max", "max") if emit_courant else "sum",
        vmem_bytes_per_cell=420, vmem_headroom=24e6,
        shard=None if shard is None else shard[0],
        scalar_params=2 if traced_dt else 0)
    return call


def step_carry_compute(shape, coeffs, step_i: int, inlet_j: int,
                       inlet_velocity: float = 1.0,
                       traced_dt: bool = False,
                       emit_courant: bool = False):
    """``compute(s, qins, fin, consts, scalars)`` of the tentative-carry
    masked step stage (make_quad_step_corr_predictor_source) — shared by
    the slab kernel factory and kernels.whole_step."""
    H, Wp = shape
    ny, nx = H - 2, Wp - 2
    idx, idy = coeffs.idx, coeffs.idy
    cu_s = coeffs.dt / (coeffs.density * coeffs.dx)
    cv_s = coeffs.dt / (coeffs.density * coeffs.dy)
    rho_dt_s = coeffs.density / coeffs.dt
    uin = inlet_velocity

    def compute(s, qins, fin, consts, scalars=None):
        us, vs, p = qins
        slab, W = us[0].shape
        if traced_dt:
            cu = scalars[0] / (coeffs.density * coeffs.dx)
            cv = scalars[0] / (coeffs.density * coeffs.dy)
            dt_pred = scalars[1]
            rho_dt = coeffs.density / dt_pred
        else:
            cu, cv, rho_dt, dt_pred = cu_s, cv_s, rho_dt_s, None
        grow, gcol = _qiota(s, slab, W)
        fluid, u_valid, v_valid = _step_masks(grow, gcol, ny, nx,
                                              step_i, inlet_j)
        pE, pN = _qshift(p, 0, 1), _qshift(p, 1, 0)
        u, v = [], []
        for q in range(4):
            zero = jnp.zeros_like(us[q])
            u.append(jnp.where(u_valid[q], us[q] - cu * (pE[q] - p[q]), zero))
            v.append(jnp.where(v_valid[q], vs[q] - cv * (pN[q] - p[q]), zero))
        u, v = _step_bc_quad(u, v, grow, gcol, ny, nx, step_i, inlet_j, uin)
        us_raw, vs_raw = _predictor_quad(u, v, coeffs, dt=dt_pred)
        us2, vs2 = [], []
        for q in range(4):
            zero = jnp.zeros_like(u[q])
            us2.append(jnp.where(u_valid[q], us_raw[q], zero))
            vs2.append(jnp.where(v_valid[q], vs_raw[q], zero))
        us2, vs2 = _step_bc_quad(us2, vs2, grow, gcol, ny, nx, step_i,
                                 inlet_j, uin)
        usW = _qshift(us2, 0, -1)
        vsS = _qshift(vs2, -1, 0)
        b = []
        for q in range(4):
            div = (us2[q] - usW[q]) * idx + (vs2[q] - vsS[q]) * idy
            b.append(jnp.where(fluid[q], rho_dt * div, jnp.zeros_like(div)))
        if emit_courant:
            sarr = [list(b),
                    [jnp.abs(a) for a in u],
                    [jnp.abs(a) for a in v]]
        else:
            sarr = list(b)
        return [us2, vs2, b], None, sarr

    return compute


def make_quad_step_corrector(shape, coeffs, step_i: int, inlet_j: int,
                             inlet_velocity: float = 1.0,
                             tile_rows: int = 128, interpret: bool = False,
                             traced_dt: bool = False):
    """(us4, vs4, p4) -> (u2_4, v2_4): the stats/export (unalign)
    corrector — rho-divided projection on valid faces + step BCs.
    ``traced_dt``: leading dt SMEM scalar (the dt that built the carried
    tentative fields)."""
    H, Wp = shape
    ny, nx = H - 2, Wp - 2
    cu_s = coeffs.dt / (coeffs.density * coeffs.dx)
    cv_s = coeffs.dt / (coeffs.density * coeffs.dy)
    uin = inlet_velocity

    def compute(s, qins, fin, consts, scalars=None):
        us, vs, p = qins
        slab, W = us[0].shape
        if traced_dt:
            cu = scalars[0] / (coeffs.density * coeffs.dx)
            cv = scalars[0] / (coeffs.density * coeffs.dy)
        else:
            cu, cv = cu_s, cv_s
        grow, gcol = _qiota(s, slab, W)
        _, u_valid, v_valid = _step_masks(grow, gcol, ny, nx, step_i, inlet_j)
        pE, pN = _qshift(p, 0, 1), _qshift(p, 1, 0)
        u2, v2 = [], []
        for q in range(4):
            zero = jnp.zeros_like(us[q])
            u2.append(jnp.where(u_valid[q], us[q] - cu * (pE[q] - p[q]), zero))
            v2.append(jnp.where(v_valid[q], vs[q] - cv * (pN[q] - p[q]), zero))
        u2, v2 = _step_bc_quad(u2, v2, grow, gcol, ny, nx, step_i, inlet_j, uin)
        return [u2, v2], None, None

    call, _ = _make_quad_slab_kernel(
        shape, n_qin=3, n_qout=2, compute=compute, tile_rows=tile_rows,
        interpret=interpret, halo=8, vmem_bytes_per_cell=260,
        scalar_params=1 if traced_dt else 0)
    return call


def uncorrect_step_quad(u, v, p, shape, coeffs, step_i: int, inlet_j: int,
                        dt=None):
    """Inverse of the masked pressure correction on NATURAL-LAYOUT arrays
    (checkpoint/resume boundary only): us = u + c*(pE - p) on VALID faces,
    0 elsewhere, so corr(uncorrect(u, v, p), p) == (u, v) up to one f32
    rounding (the masked twin of kernels.quad.uncorrect_quad). ``dt``
    overrides coeffs.dt (adaptive carry resume)."""
    H, Wp = shape
    ny, nx = H - 2, Wp - 2
    dt = coeffs.dt if dt is None else dt
    cu = dt / (coeffs.density * coeffs.dx)
    cv = dt / (coeffs.density * coeffs.dy)
    jj = jax.lax.broadcasted_iota(jnp.int32, (H, Wp), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (H, Wp), 1)
    u_valid = ((jj >= 1) & (jj <= ny) & (ii >= 1) & (ii <= nx - 1)
               & ~((ii < step_i) & (jj > inlet_j)))
    v_valid = ((jj >= 1) & (jj <= ny - 1) & (ii >= 1) & (ii <= nx)
               & ~((ii <= step_i) & (jj > inlet_j)))
    pE = jnp.roll(p, -1, axis=1)
    pN = jnp.roll(p, -1, axis=0)
    zero = jnp.zeros_like(u)
    us = jnp.where(u_valid, u + cu * (pE - p), zero)
    vs = jnp.where(v_valid, v + cv * (pN - p), zero)
    return us, vs


def _step_ghosts_quad(p, grow, gcol, ny: int, nx: int, step_i: int,
                      inlet_j: int):
    """kernels.step_smoother's exact ghost refresh in quad form: channel
    domain ghosts + solid-cell pressure = mean of fluid neighbors."""
    row_in = [(g >= 1) & (g <= ny) for g in grow]
    col_in = [(c >= 1) & (c <= nx) for c in gcol]
    pE = _qshift(p, 0, 1)
    p = _where4([(c == 0) & r for c, r in zip(gcol, row_in)], pE, p)
    p = _where4([(c == nx + 1) & r for c, r in zip(gcol, row_in)],
                [jnp.zeros_like(a) for a in p], p)
    pN = _qshift(p, 1, 0)
    p = _where4([(g == 0) & ci for g, ci in zip(grow, col_in)], pN, p)
    pS = _qshift(p, -1, 0)
    p = _where4([(g == ny + 1) & ci for g, ci in zip(grow, col_in)], pS, p)
    # solid-cell averaging: east weight at the solid column's last column,
    # south weight at the solid block's bottom row (reference predicates:
    # east needs i < i_max, south j > 1 — step_smoother.py:129-133)
    pE = _qshift(p, 0, 1)
    pS = _qshift(p, -1, 0)
    out = []
    for q in range(4):
        g, c = grow[q], gcol[q]
        solid = row_in[q] & col_in[q] & (c <= step_i) & (g > inlet_j)
        eastw = solid & (c == step_i) & (c < nx)
        southw = solid & (g == inlet_j + 1) & (g > 1)
        cnt = eastw.astype(p[q].dtype) + southw.astype(p[q].dtype)
        has = cnt > 0
        inv = jnp.where(has, 1.0 / jnp.where(has, cnt, 1.0), 0.0)
        zero = jnp.zeros_like(p[q])
        avg = (jnp.where(eastw, pE[q], zero)
               + jnp.where(southw, pS[q], zero)) * inv
        out.append(jnp.where(has, avg, p[q]))
    return out


def _smooth_stage_quad(p, b, grow, gcol, fluid, band_at, k0: int,
                       n_pairs: int, omega, idx2, idy2, ny, nx,
                       step_i, inlet_j):
    """n_pairs exact (ghosts + red planes + black planes) iterations with
    the band staged exactly like kernels.step_smoother (3 stages/pair);
    returns (p, k) with k the consumed-row count."""
    denom = 2.0 * (idx2 + idy2)
    k = k0
    for _ in range(n_pairs):
        k += 1
        pg = _step_ghosts_quad(p, grow, gcol, ny, nx, step_i, inlet_j)
        p = [jnp.where(band_at(k), g_, p_) for g_, p_ in zip(pg, p)]

        def half(p, upd, kk):
            E, Wm = _qshift(p, 0, 1), _qshift(p, 0, -1)
            N, S = _qshift(p, 1, 0), _qshift(p, -1, 0)
            out = list(p)
            for q in upd:
                gs = (idx2 * (E[q] + Wm[q]) + idy2 * (N[q] + S[q])
                      - b[q]) / denom
                val = (1.0 - omega) * p[q] + omega * gs
                out[q] = jnp.where(fluid[q] & band_at(kk), val, p[q])
            return out

        k += 1
        p = half(p, (0, 3), k)  # red: parity (r+s) even
        k += 1
        p = half(p, (1, 2), k)
    k += 1
    pg = _step_ghosts_quad(p, grow, gcol, ny, nx, step_i, inlet_j)
    p = [jnp.where(band_at(k), g_, p_) for g_, p_ in zip(pg, p)]
    return p, k


def _exact_residual_quad(p, b, grow, gcol, fluid, band_at, k, idx2, idy2,
                         ny, nx, step_i, inlet_j):
    """residual0 composition: ghosts re-applied, then where(fluid, b-lap, 0)."""
    pg = _step_ghosts_quad(p, grow, gcol, ny, nx, step_i, inlet_j)
    pg = [jnp.where(band_at(k + 1), g_, p_) for g_, p_ in zip(pg, p)]
    E, Wm = _qshift(pg, 0, 1), _qshift(pg, 0, -1)
    N, S = _qshift(pg, 1, 0), _qshift(pg, -1, 0)
    out = []
    for q in range(4):
        lap = ((E[q] - 2.0 * pg[q] + Wm[q]) * idx2
               + (N[q] - 2.0 * pg[q] + S[q]) * idy2)
        out.append(jnp.where(fluid[q], b[q] - lap, jnp.zeros_like(b[q])))
    return out


def make_quad_step_pre_smooth_restrict(shape, step_i: int, inlet_j: int,
                                       idx2: float, idy2: float,
                                       omega: float, n_pairs: int,
                                       coarse_shape: tuple[int, int],
                                       tile_rows: int = 128,
                                       interpret: bool = False,
                                       shard: tuple[int, int] | None = None):
    """(p4, b4) -> (p4, rc): n_pairs exact masked iterations + the exact
    residual restricted (full-weighting) to the aligned coarse source — the
    masked V-cycle's pre block in one HBM round trip (the quad twin of
    kernels.step_smoother with_residual_field + poisson.multigrid._restrict).

    ``shard``: (P, mdy) for the SPMD variant; coarse_shape is then the
    LOCAL (P+16, Wqa). The exact masked smoother consumes 3 rows per pair
    (ghost stage + red + black) + residual ghosts, so only n_pairs=1 fits
    the 8-row device halo — V(1,1) is the sharded masked maximum."""
    H, Wp = shape
    ny, nx = H - 2, Wp - 2
    nyc, nxc = ny // 2, nx // 2
    Hq, Wq, Hq8, Wqa = quad_dims(shape)
    if shard is not None:
        if n_pairs > 1:
            raise ValueError(
                f"sharded masked pre-smoother: n_pairs={n_pairs} consumes "
                f"{3 * n_pairs + 5} rows > the 8-row device halo (V(1,1) "
                "only)")
        expect = (shard[0] + 16, Wqa)
    else:
        expect = (Hq8, Wqa)
    assert coarse_shape == expect, (coarse_shape, expect)

    def compute(s, qins, fin, consts):
        p, b = qins
        slab, W = p[0].shape
        grow, gcol = _qiota(s, slab, W)
        fluid, _, _ = _step_masks(grow, gcol, ny, nx, step_i, inlet_j)
        band = _band_maker(s, slab, W, ny)
        p, k = _smooth_stage_quad(p, b, grow, gcol, fluid, band, 0, n_pairs,
                                  omega, idx2, idy2, ny, nx, step_i, inlet_j)
        r = _exact_residual_quad(p, b, grow, gcol, fluid, band, k, idx2,
                                 idy2, ny, nx, step_i, inlet_j)
        rc = 0.25 * (r[0]
                     + jnp.roll(r[1], 1, axis=1)
                     + jnp.roll(r[2], 1, axis=0)
                     + jnp.roll(jnp.roll(r[3], 1, axis=0), 1, axis=1))
        Jc = s + jax.lax.broadcasted_iota(jnp.int32, (slab, W), 0)
        Ic = jax.lax.broadcasted_iota(jnp.int32, (slab, W), 1)
        cmask = (Jc >= 1) & (Jc <= nyc) & (Ic >= 1) & (Ic <= nxc)
        rc = jnp.where(cmask, rc, jnp.zeros_like(rc))
        return [p], rc, None

    # 3 stages/pair + trailing ghosts + residual's (ghosts + apply) + the
    # restriction roll
    halo = _round_up(3 * n_pairs + 1 + 2 + 1 + 1, 8)
    # the exact-ghost stages keep more Mosaic stack live than the cavity
    # smoother (measured 47.73 MiB at a 40 MB budget for the post twin):
    # size slabs for it and leave a wide hard-limit slack
    call, _ = _make_quad_slab_kernel(
        shape, n_qin=2, n_qout=1, compute=compute, tile_rows=tile_rows,
        interpret=interpret, halo=halo, flat_out_shape=coarse_shape,
        vmem_bytes_per_cell=300, vmem_headroom=24e6,
        shard=None if shard is None else shard[0])
    return call


def make_quad_step_post_prolong_smooth(shape, step_i: int, inlet_j: int,
                                       idx2: float, idy2: float,
                                       omega: float, n_pairs: int,
                                       coarse_shape: tuple[int, int],
                                       tile_rows: int = 128,
                                       interpret: bool = False,
                                       shard: tuple[int, int] | None = None):
    """(p4, b4, ec) -> (p4, res_inf): bilinear prolongation of the coarse
    correction (added on FLUID cells — the masked level's
    _inline_masks-equivalent) fused with the exact post iterations and the
    tolerance residual max.

    ``shard``: (P, mdy) for the SPMD variant; coarse_shape is then the
    LOCAL (P+16, Wqa) and n_pairs must be 1 (see the pre twin)."""
    H, Wp = shape
    ny, nx = H - 2, Wp - 2
    nyc, nxc = ny // 2, nx // 2
    Hq, Wq, Hq8, Wqa = quad_dims(shape)
    if shard is not None:
        if n_pairs > 1:
            raise ValueError(
                f"sharded masked post-smoother: n_pairs={n_pairs} consumes "
                f"{1 + 3 * n_pairs + 4} rows > the 8-row device halo "
                "(V(1,1) only)")
        expect = (shard[0] + 16, Wqa)
    else:
        expect = (Hq8, Wqa)
    assert coarse_shape == expect, (coarse_shape, expect)

    def compute(s, qins, ec, consts):
        p, b = qins
        slab, W = p[0].shape
        grow, gcol = _qiota(s, slab, W)
        fluid, _, _ = _step_masks(grow, gcol, ny, nx, step_i, inlet_j)

        # bilinear 9-3-3-1 prolongation at coarse size (same construction
        # as kernels.quad.make_quad_post_prolong_smooth)
        Jc = s + jax.lax.broadcasted_iota(jnp.int32, (slab, W), 0)
        Ic = jax.lax.broadcasted_iota(jnp.int32, (slab, W), 1)
        ecJ1 = jnp.roll(ec, -1, axis=0)
        ecJ0 = jnp.where(Jc == 0, ecJ1, ec)
        ecJ1 = jnp.where(Jc == nyc, ec, ecJ1)
        rowmix = [0.75 * ecJ0 + 0.25 * ecJ1,
                  0.25 * ecJ0 + 0.75 * ecJ1]
        corr = []
        for r_ in range(2):
            m1 = jnp.roll(rowmix[r_], -1, axis=1)
            m0 = jnp.where(Ic == 0, m1, rowmix[r_])
            m1 = jnp.where(Ic == nxc, rowmix[r_], m1)
            corr.append([0.75 * m0 + 0.25 * m1,
                         0.25 * m0 + 0.75 * m1])
        p = [jnp.where(fluid[q], p[q] + corr[q >> 1][q & 1], p[q])
             for q in range(4)]

        band = _band_maker(s, slab, W, ny)
        # the prolongation roll(-1) wraps at the slab top: start the band
        # ledger at 1
        p, k = _smooth_stage_quad(p, b, grow, gcol, fluid,
                                  lambda lo: band(lo + 1), 0, n_pairs,
                                  omega, idx2, idy2, ny, nx, step_i, inlet_j)
        r = _exact_residual_quad(p, b, grow, gcol, fluid,
                                 lambda lo: band(lo + 1), k, idx2, idy2,
                                 ny, nx, step_i, inlet_j)
        return [p], None, [jnp.abs(a) for a in r]

    halo = _round_up(1 + 3 * n_pairs + 1 + 2 + 1, 8)
    call, _ = _make_quad_slab_kernel(
        shape, n_qin=2, n_qout=1, compute=compute, tile_rows=tile_rows,
        interpret=interpret, halo=halo, flat_in_shape=coarse_shape,
        scalar_reduce="max", vmem_bytes_per_cell=300, vmem_headroom=24e6,
        shard=None if shard is None else shard[0])
    return call
