"""Pallas TPU kernels: quad-layout fused Rayleigh-Benard (Boussinesq) step.

Round-2 verdict item 3: the RB custom step (physics.boussinesq) was the one
case with zero Pallas coverage. Here the whole per-step dataflow outside
the Poisson solve fuses into ONE tentative-carry kernel (plus a small
stats-boundary corrector), the exact analog of the cavity/channel quad
tentative carry (kernels.quad.make_quad_channel_corr_predictor_source):

    carried (us*, vs*, p, T) at step n+1 entry
      -> corrector (rho-divided, invalid faces KEEP the tentative value —
         boussinesq.py's u_else=us convention) + box no-slip BC
      -> T' = flux-form advect + diffuse with the corrected u2/v2 + T BC
         (Dirichlet bottom/top via ghost reflection, adiabatic sides)
      -> predictor(u2, v2) + buoyancy dt*T'_face on v-faces + BC
      -> Poisson source + interior sum (mean removed by the caller)

The orderings are equivalent to the unfused step: the original computes
T_{n+1} from (u2_n, T_n) at the END of step n and uses it in step n+1's
buoyancy; the carry computes the same T_{n+1} at the START of step n+1.

No reference code exists for RB (README.md:79-94, SURVEY.md component #35);
semantics match physics.boussinesq's XLA step to f32 roundoff (asserted in
tests/test_rb_quad.py in interpret mode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cfd_tpu.kernels.quad import (
    _make_quad_slab_kernel,
    _predictor_quad,
    _qiota,
    _qshift,
    _where4,
)


def _box_noslip_bc_quad(u, v, grow, gcol, ny: int, nx: int):
    """physics.boussinesq.box_noslip_bc in quad form (same update order)."""
    uN = _qshift(u, 1, 0)
    u = _where4([(g == 0) & (c <= nx) for g, c in zip(grow, gcol)],
                [-a for a in uN], u)
    uS = _qshift(u, -1, 0)
    u = _where4([(g == ny + 1) & (c <= nx) for g, c in zip(grow, gcol)],
                [-a for a in uS], u)
    zero = [jnp.zeros_like(a) for a in u]
    u = _where4([((c == 0) | (c == nx)) & (g >= 1) & (g <= ny)
                 for g, c in zip(grow, gcol)], zero, u)
    vE = _qshift(v, 0, 1)
    v = _where4([(c == 0) & (g <= ny) for g, c in zip(grow, gcol)],
                [-a for a in vE], v)
    vW = _qshift(v, 0, -1)
    v = _where4([(c == nx + 1) & (g <= ny) for g, c in zip(grow, gcol)],
                [-a for a in vW], v)
    v = _where4([((g == 0) | (g == ny)) & (c >= 1) & (c <= nx)
                 for g, c in zip(grow, gcol)], zero, v)
    return u, v


def _temperature_bc_quad(T, grow, gcol, ny: int, nx: int,
                         t_bottom: float, t_top: float):
    """physics.boussinesq.temperature_bc in quad form."""
    TN = _qshift(T, 1, 0)
    T = _where4([(g == 0) & (c >= 1) & (c <= nx) for g, c in zip(grow, gcol)],
                [2.0 * t_bottom - a for a in TN], T)
    TS = _qshift(T, -1, 0)
    T = _where4([(g == ny + 1) & (c >= 1) & (c <= nx)
                 for g, c in zip(grow, gcol)],
                [2.0 * t_top - a for a in TS], T)
    TE = _qshift(T, 0, 1)
    T = _where4([(c == 0) & (g >= 1) & (g <= ny) for g, c in zip(grow, gcol)],
                TE, T)
    TW = _qshift(T, 0, -1)
    T = _where4([(c == nx + 1) & (g >= 1) & (g <= ny)
                 for g, c in zip(grow, gcol)], TW, T)
    return T


def make_quad_rb_step_kernel(shape, coeffs, kappa: float,
                             t_bottom: float = 1.0, t_top: float = 0.0,
                             buoyancy: float = 1.0,
                             tile_rows: int = 128, interpret: bool = False,
                             traced_dt: bool = False,
                             emit_courant: bool = False,
                             emit_guess: bool = False,
                             shard: tuple[int, int] | None = None):
    """(us, vs, p, T) -> (us', vs', T', b, sum_b): the fused tentative-carry
    RB stage (see module docstring).

    ``emit_guess``: the call gains a trailing ``p_prev`` quad input and a
    ``guess`` = 2 p - p_prev quad output after ``b`` — the extrapolated
    Poisson warm start fused into the carry kernel, the exact analog of
    the cavity/channel carry kernels (kernels.quad
    make_quad_corr_predictor_source).

    ``traced_dt``: the call gains a leading (dt_corr, dt_pred) SMEM scalar
    pair. The carry entangles two steps: the corrector AND the T transport
    belong to the step that built the carried tentative fields (they
    complete step n with dt_corr = that step's dt), while the predictor,
    buoyancy and Poisson source advance step n+1 with dt_pred. Both stay
    traced, so the adaptive controller never recompiles.

    ``emit_courant``: additionally reduce max|u2| / max|v2| of the
    corrected+BC'd fields (they exist only in VMEM here) and return them
    after sum_b — the one-step-stale Courant feedback for the lagged
    adaptive controller (cfd_tpu.adaptive), same contract as
    kernels.quad.make_quad_corr_predictor_source.

    ``shard``: (P, mdy) for the SPMD variant — local (4, P+16, W) blocks
    with a leading traced ``row_base`` SMEM scalar, exactly the
    kernels.quad sharded contract (scalar reductions become own-row
    per-device partials the caller psums/pmaxes)."""
    compute = rb_carry_compute(shape, coeffs, kappa, t_bottom, t_top,
                               buoyancy, traced_dt=traced_dt,
                               emit_courant=emit_courant,
                               emit_guess=emit_guess)
    nq = 5 if emit_guess else 4
    call, _ = _make_quad_slab_kernel(
        shape, n_qin=nq, n_qout=nq, compute=compute, tile_rows=tile_rows,
        interpret=interpret, halo=8,
        scalar_reduce=("sum", "max", "max") if emit_courant else "sum",
        vmem_bytes_per_cell=690 if emit_guess else 550, vmem_headroom=24e6,
        shard=None if shard is None else shard[0],
        scalar_params=2 if traced_dt else 0)
    return call


def rb_carry_compute(shape, coeffs, kappa: float, t_bottom: float = 1.0,
                     t_top: float = 0.0, buoyancy: float = 1.0,
                     traced_dt: bool = False, emit_courant: bool = False,
                     emit_guess: bool = False):
    """``compute(s, qins, fin, consts, scalars)`` of the fused
    tentative-carry Rayleigh-Benard stage (make_quad_rb_step_kernel) —
    shared by the slab kernel factory and kernels.whole_step."""
    H, Wp = shape
    ny, nx = H - 2, Wp - 2
    idx, idy = coeffs.idx, coeffs.idy
    idx2, idy2 = coeffs.idx2, coeffs.idy2
    dt_s = coeffs.dt
    cu_s = coeffs.dt / (coeffs.density * coeffs.dx)
    cv_s = coeffs.dt / (coeffs.density * coeffs.dy)
    rho_dt_s = coeffs.density / coeffs.dt

    def compute(s, qins, fin, consts, scalars=None):
        if emit_guess:
            us, vs, p, T, p_prev = qins
        else:
            us, vs, p, T = qins
            p_prev = None
        slab, W = us[0].shape
        if traced_dt:
            dt = scalars[0]  # completes step n: corrector + T transport
            cu = scalars[0] / (coeffs.density * coeffs.dx)
            cv = scalars[0] / (coeffs.density * coeffs.dy)
            dt_pred = scalars[1]  # advances step n+1
            rho_dt = coeffs.density / dt_pred
        else:
            dt, cu, cv, rho_dt = dt_s, cu_s, cv_s, rho_dt_s
            dt_pred = None
        grow, gcol = _qiota(s, slab, W)
        u_valid, v_valid, cell = [], [], []
        for g, c in zip(grow, gcol):
            u_valid.append((g >= 1) & (g <= ny) & (c >= 1) & (c <= nx - 1))
            v_valid.append((g >= 1) & (g <= ny - 1) & (c >= 1) & (c <= nx))
            cell.append((g >= 1) & (g <= ny) & (c >= 1) & (c <= nx))

        # corrector: u_else = us (invalid faces keep the tentative value)
        pE, pN = _qshift(p, 0, 1), _qshift(p, 1, 0)
        u2 = [jnp.where(u_valid[q], us[q] - cu * (pE[q] - p[q]), us[q])
              for q in range(4)]
        v2 = [jnp.where(v_valid[q], vs[q] - cv * (pN[q] - p[q]), vs[q])
              for q in range(4)]
        u2, v2 = _box_noslip_bc_quad(u2, v2, grow, gcol, ny, nx)

        # T advect-diffuse with the corrected fields + T BC
        TE, TW = _qshift(T, 0, 1), _qshift(T, 0, -1)
        TN, TS = _qshift(T, 1, 0), _qshift(T, -1, 0)
        fe = [u2[q] * 0.5 * (T[q] + TE[q]) for q in range(4)]
        fn = [v2[q] * 0.5 * (T[q] + TN[q]) for q in range(4)]
        feW = _qshift(fe, 0, -1)
        fnS = _qshift(fn, -1, 0)
        T2 = []
        for q in range(4):
            adv = (fe[q] - feW[q]) * idx + (fn[q] - fnS[q]) * idy
            lap = ((TE[q] - 2.0 * T[q] + TW[q]) * idx2
                   + (TN[q] - 2.0 * T[q] + TS[q]) * idy2)
            T2.append(jnp.where(cell[q], T[q] + dt * (kappa * lap - adv),
                                T[q]))
        T2 = _temperature_bc_quad(T2, grow, gcol, ny, nx, t_bottom, t_top)

        # predictor + buoyancy on v-faces + BC on the tentative fields
        # (step n+1: dt_pred when traced)
        bdt = dt_pred if traced_dt else dt_s
        us_raw, vs_raw = _predictor_quad(u2, v2, coeffs, dt=dt_pred)
        T2N = _qshift(T2, 1, 0)
        us2, vs2 = [], []
        for q in range(4):
            us2.append(jnp.where(u_valid[q], us_raw[q], u2[q]))
            buoy_q = vs_raw[q] + bdt * buoyancy * 0.5 * (T2[q] + T2N[q])
            vs2.append(jnp.where(v_valid[q], buoy_q, v2[q]))
        us2, vs2 = _box_noslip_bc_quad(us2, vs2, grow, gcol, ny, nx)

        usW = _qshift(us2, 0, -1)
        vsS = _qshift(vs2, -1, 0)
        b = []
        for q in range(4):
            div = (us2[q] - usW[q]) * idx + (vs2[q] - vsS[q]) * idy
            b.append(jnp.where(cell[q], rho_dt * div, jnp.zeros_like(div)))
        if emit_courant:
            sarr = [list(b),
                    [jnp.abs(a) for a in u2],
                    [jnp.abs(a) for a in v2]]
        else:
            sarr = list(b)
        outs = [us2, vs2, T2, b]
        if emit_guess:
            outs.append([2.0 * p[q] - p_prev[q] for q in range(4)])
        return outs, None, sarr

    return compute


def make_quad_rb_corrector(shape, coeffs, tile_rows: int = 128,
                           interpret: bool = False,
                           traced_dt: bool = False):
    """(us4, vs4, p4) -> (u2_4, v2_4): the stats/export (unalign) corrector
    with the u_else=us convention + box no-slip BC. ``traced_dt``: leading
    dt SMEM scalar (the dt that built the carried tentative fields)."""
    H, Wp = shape
    ny, nx = H - 2, Wp - 2
    cu_s = coeffs.dt / (coeffs.density * coeffs.dx)
    cv_s = coeffs.dt / (coeffs.density * coeffs.dy)

    def compute(s, qins, fin, consts, scalars=None):
        us, vs, p = qins
        slab, W = us[0].shape
        if traced_dt:
            cu = scalars[0] / (coeffs.density * coeffs.dx)
            cv = scalars[0] / (coeffs.density * coeffs.dy)
        else:
            cu, cv = cu_s, cv_s
        grow, gcol = _qiota(s, slab, W)
        pE, pN = _qshift(p, 0, 1), _qshift(p, 1, 0)
        u2, v2 = [], []
        for q in range(4):
            g, c = grow[q], gcol[q]
            u_valid = (g >= 1) & (g <= ny) & (c >= 1) & (c <= nx - 1)
            v_valid = (g >= 1) & (g <= ny - 1) & (c >= 1) & (c <= nx)
            u2.append(jnp.where(u_valid, us[q] - cu * (pE[q] - p[q]), us[q]))
            v2.append(jnp.where(v_valid, vs[q] - cv * (pN[q] - p[q]), vs[q]))
        u2, v2 = _box_noslip_bc_quad(u2, v2, grow, gcol, ny, nx)
        return [u2, v2], None, None

    call, _ = _make_quad_slab_kernel(
        shape, n_qin=3, n_qout=2, compute=compute, tile_rows=tile_rows,
        interpret=interpret, halo=8, vmem_bytes_per_cell=260,
        scalar_params=1 if traced_dt else 0)
    return call


def uncorrect_rb_quad(u, v, p, shape, coeffs, dt=None):
    """Inverse correction on NATURAL-layout arrays (resume boundary):
    us = u + c*(pE - p) on valid faces, u elsewhere (the u_else=us
    convention's inverse), so corr(uncorrect(u, v, p), p) == (u, v) up to
    one f32 rounding. ``dt`` overrides the baked coeffs.dt (adaptive
    resume: the dt that built the carried tentative fields)."""
    H, Wp = shape
    ny, nx = H - 2, Wp - 2
    dt = coeffs.dt if dt is None else dt
    cu = dt / (coeffs.density * coeffs.dx)
    cv = dt / (coeffs.density * coeffs.dy)
    jj = jax.lax.broadcasted_iota(jnp.int32, (H, Wp), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (H, Wp), 1)
    u_valid = (jj >= 1) & (jj <= ny) & (ii >= 1) & (ii <= nx - 1)
    v_valid = (jj >= 1) & (jj <= ny - 1) & (ii >= 1) & (ii <= nx)
    pE = jnp.roll(p, -1, axis=1)
    pN = jnp.roll(p, -1, axis=0)
    us = jnp.where(u_valid, u + cu * (pE - p), u)
    vs = jnp.where(v_valid, v + cv * (pN - p), v)
    return us, vs
