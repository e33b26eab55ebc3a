"""Adaptive time stepping (Courant-limited), the reference's documented
OpenFOAM workflow knob (`adjustTimeStep yes; maxCo 0.7`, README.md:112-114)
brought to the solver cases.

TPU-native design: dt enters the jitted step as a TRACED scalar, so changing
it never recompiles (the same trick the vmapped ensembles use for per-member
viscosity). The controller runs host-side between dispatches:

    dt_next = dt * min(growth, max_co / Co_n)

with the Courant number Co = dt * max(|u|/dx + |v|/dy) estimated from the
face-velocity maxima already produced by the statistics pass.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from cfd_tpu.ops.stencil import StencilCoeffs, poisson_source, predictor, pressure_correction
from cfd_tpu.state import State, StepDiagnostics


def make_adaptive_step(case) -> Callable:
    """step(state, dt) -> (state, diag, courant_per_dt) with dt traced.

    Supports the plain projection orderings (cavity/channel); cases with a
    custom_step (Boussinesq) would need their own adaptive variant.
    """
    if case.custom_step is not None:
        raise ValueError("adaptive stepping supports the built-in orderings only")
    grid, c0 = case.grid, case.coeffs
    bc = case.velocity_bc
    u_valid = jnp.asarray(grid.u_valid_mask)
    v_valid = jnp.asarray(grid.v_valid_mask)
    u_range = jnp.asarray(grid.u_range_mask)
    v_range = jnp.asarray(grid.v_range_mask)
    cell = jnp.asarray(grid.cell_mask)
    n_fluid = grid.n_fluid
    extrap = case.extrapolate_warm_start

    def courant_per_dt(u, v):
        """Co/dt = max over faces of |u|/dx + |v|/dy (conservative bound)."""
        return (jnp.max(jnp.abs(u)) / c0.dx + jnp.max(jnp.abs(v)) / c0.dy)

    def step(state: State, dt):
        c = StencilCoeffs(dx=c0.dx, dy=c0.dy, dt=dt, viscosity=c0.viscosity,
                          density=c0.density)
        if case.ordering == "cavity":
            u, v = bc(state.u, state.v)
            us, vs = predictor(u, v, c, u_valid, v_valid)
            b = poisson_source(us, vs, c, cell, remove_mean=False, n_cells=n_fluid)
            guess = 2.0 * state.p - state.p_prev if extrap else state.p
            p, iters, res = case.poisson_solve(guess, b)
            u2, v2 = pressure_correction(us, vs, p, c, u_valid, v_valid,
                                         u_else=u, v_else=v, cavity_form=True)
            new = State(u2, v2, p, state.T, state.p if extrap else None)
        elif case.ordering == "channel":
            us, vs = predictor(state.u, state.v, c, u_valid, v_valid)
            us, vs = bc(us, vs)
            b = poisson_source(us, vs, c, cell,
                               remove_mean=case.remove_source_mean, n_cells=n_fluid)
            guess = 2.0 * state.p - state.p_prev if extrap else state.p
            p, iters, res = case.poisson_solve(guess, b)
            zu = jnp.zeros_like(state.u)
            u_else = jnp.where(u_range, zu, state.u)
            v_else = jnp.where(v_range, zu, state.v)
            u2, v2 = pressure_correction(us, vs, p, c, u_valid, v_valid,
                                         u_else=u_else, v_else=v_else,
                                         cavity_form=case.cavity_corrector)
            u2, v2 = bc(u2, v2)
            new = State(u2, v2, p, state.T, state.p if extrap else None)
        else:
            raise ValueError(f"unknown ordering: {case.ordering}")
        return new, StepDiagnostics(iters, res), courant_per_dt(new.u, new.v)

    return jax.jit(step)


def _run_adaptive_sharded(sim, max_courant, n_steps, final_time, dt0,
                          growth, state, log, spc):
    """Multi-chip lagged-controller loop: the engine's shard_map adaptive
    chunk (ShardedQuadProjection.make_adaptive) with the same host-side
    bookkeeping as the single-chip lagged branch — controller state stays
    device-resident between chunks, synced at print/checkpoint cadence."""
    case = sim.case
    engine = sim._engine
    dt = float(dt0 if dt0 is not None else case.dt)
    dt_used = dt
    t = 0.0
    k = 0
    if case.print_interval % spc:
        raise ValueError(f"steps_per_call={spc} must divide "
                         f"the print interval ({case.print_interval})")
    ckpt_iv = sim.checkpointer.interval if sim.checkpointer else 0
    if ckpt_iv and ckpt_iv % spc:
        raise ValueError(f"steps_per_call={spc} must divide "
                         f"the checkpoint interval ({ckpt_iv})")
    logical0 = None
    if state is None:
        resumed = None
        if sim.checkpointer is not None:
            resumed, k0, extras = sim.checkpointer.restore_latest(
                case, with_extras=True)
        if resumed is not None and "dt" in extras:
            logical0, k = resumed, k0
            dt, t = extras["dt"], extras["t"]
            dt_used = extras.get("dt_used", dt)
            log(f"resumed adaptive run at step {k} (t={t:.6g}, dt={dt:.6e})")
        elif case.initial_state_fn is not None:
            logical0 = case.initial_state_fn()
        else:
            s = State.zeros(case.grid.shape, dtype=case.dtype)
            u, v = case.velocity_bc(s.u, s.v)
            logical0 = State(u, v, s.p, s.T, None)
    else:
        logical0 = state
    if case.unalign_state is not None \
            and logical0.u.shape != case.grid.shape:
        logical0 = case.unalign_state(logical0)
    diffusivity = (case.adaptive_diffusivity
                   if case.adaptive_diffusivity is not None
                   else case.coeffs.viscosity)
    dt_ceiling = 0.25 * min(case.coeffs.dx, case.coeffs.dy) ** 2 \
        / max(diffusivity, 1e-300)
    chunk, from_logical_a, to_logical_s = engine.make_adaptive(
        max_courant, growth, dt_ceiling, spc)
    st = from_logical_a(logical0, dt_used)
    n_carry = engine.n_carry
    du_dev = jnp.asarray(dt_used, case.dtype)
    d_dev = jnp.asarray(dt, case.dtype)
    t_dev = jnp.asarray(t, case.dtype)
    rows = []
    dt_last = dt
    co_last = it_last = res_last = 0.0
    while True:
        if n_steps is not None and k >= n_steps:
            break
        if final_time is not None and t >= final_time:
            break
        out = chunk(*st, du_dev, d_dev, t_dev)
        st = out[:n_carry]
        du_dev, d_dev, t_dev, packed = out[n_carry:]
        k += spc
        sync = (final_time is not None or k % case.print_interval == 0
                or (ckpt_iv and k % ckpt_iv == 0)
                or (n_steps is not None and k >= n_steps))
        if sync:
            du_h, d_h, t, dt_last, co_last, it_last, res_last = \
                map(float, np.asarray(packed))
            dt_used, dt = du_h, d_h
        if k % case.print_interval == 0:
            row = sim.statistics(to_logical_s(st, dt_used))
            row.update(step=k, time=t, dt=dt_last, courant=co_last,
                       poisson_iters=int(it_last),
                       poisson_residual=res_last)
            rows.append(row)
            log(f"Step {k:6d} | t={t:8.4f} | dt={dt_last:.3e}"
                f" | Co={co_last:.3f}"
                f" | max(div)={row['max_divergence']:10.2e}"
                f" | avg_KE={row['avg_kinetic_energy']:10.6f}")
        if ckpt_iv and k % ckpt_iv == 0:
            sim.checkpointer.maybe_save(
                to_logical_s(st, dt_used), k,
                extras={"dt": dt, "t": t, "dt_used": dt_used})
    dt_used = float(du_dev)
    return to_logical_s(st, dt_used), rows


def run_adaptive(sim, max_courant: float = 0.7, n_steps: int | None = None,
                 final_time: float | None = None, dt0: float | None = None,
                 growth: float = 1.2, state: State | None = None,
                 log=None, steps_per_call: int = 1,
                 controller: str = "exact"):
    """Advance with Courant-limited dt until ``n_steps`` or ``final_time``.

    The diffusive stability bound from the case's construction-time dt rule
    is kept as a hard ceiling (explicit diffusion does not relax as the flow
    slows). Returns (state, history rows).

    ``steps_per_call`` > 1 runs the CONTROLLER ON DEVICE: dt is a traced
    scan-carry scalar and the Courant feedback (dt' = min(dt*min(growth,
    max_co/Co), ceiling)) updates inside one jitted lax.scan of N steps —
    no host sync per step, so adaptive throughput approaches the fixed-dt
    scan-chunked rate (round-3 item 5). The controller arithmetic then runs
    in the case dtype (f32 on the perf path) instead of host float64, so
    the dt sequence matches the host loop to roundoff, not bitwise.

    ``controller``:

    * "exact" (default) — Courant measured on the state the step just
      produced feeds the very next dt (the non-carry kernels; corrected
      fields exist in HBM each step).
    * "lagged" — the TENTATIVE-CARRY fused kernel (Case.adaptive_impl_carry)
      with (dt_corr, dt_pred) traced SMEM scalars and max|u|/max|v| fused
      into its reductions: the corrected fields exist only inside the
      kernel that also consumes them for the next predictor, so the global
      Courant maximum cannot gate that same predictor — the feedback is
      one step stale. This is OpenFOAM's adjustTimeStep semantics (CoNum
      of the last completed step sets the next dt, reference
      README.md:112-114) and the fastest path: the step is the SAME fused
      kernel as the fixed-dt carry. Growth-limiting bounds the transient
      overshoot of a stale step to the ``growth`` factor.

    Checkpoint/resume: when ``sim.checkpointer`` is set, the controller's
    full dynamical state (State, step, dt, t — and for "lagged" the dt that
    built the carried tentative fields) is checkpointed as npz extras and
    resumed from exactly (bitwise-identical continuation for the host-loop
    path; the kernel-carry paths re-enter through the logical boundary at
    one f32 rounding).
    """
    case = sim.case
    log = log if log is not None else sim.log
    if controller not in ("exact", "lagged"):
        raise ValueError(f"unknown controller: {controller!r}")
    use_carry = controller == "lagged"
    engine = getattr(sim, "_engine", None)
    if engine is not None and getattr(engine, "delegated", False):
        # 1-device mesh delegation (quad_sharded mdy==1): the engine's state
        # IS the single-device carry, so the single-device controller
        # branches below apply unchanged — no sharded adaptive chunk needed
        engine = None
    if engine is not None:
        # multi-chip: the sharded quad engine runs the lagged controller
        # (the exact controller's non-carry kernels have no sharded story)
        if not use_carry:
            raise ValueError("sharded adaptive runs the lagged controller: "
                             "pass controller='lagged' "
                             "(--adaptive-controller lagged)")
        return _run_adaptive_sharded(
            sim, max_courant=max_courant, n_steps=n_steps,
            final_time=final_time, dt0=dt0, growth=growth, state=state,
            log=log, spc=max(1, steps_per_call))
    to_aligned = to_logical = None
    if use_carry:
        if case.adaptive_impl_carry is None:
            raise ValueError(
                "controller='lagged' needs Case.adaptive_impl_carry (the "
                "f32 quad kernel path: layout='quad', poisson='multigrid')")
        step_impl, to_aligned_c, to_logical_c = case.adaptive_impl_carry()
        # jitted: the logical-boundary conversion runs a Pallas corrector
        # op-by-op otherwise (~0.3 s per print row at 2048^2, measured)
        to_logical_c = jax.jit(to_logical_c)
    elif case.adaptive_impl is not None:
        # factory-provided traced-dt kernel path (round-3 item 5: the
        # quad/Pallas step with dt as an SMEM scalar — adaptive runs no
        # longer forfeit the fast path)
        step_impl, to_aligned, to_logical = case.adaptive_impl()
        step = jax.jit(step_impl)
        to_logical = jax.jit(to_logical)  # same print-cadence cost note
        # as the lagged branch
    else:
        if case.custom_step is not None and case.adaptive_impl_carry is not None:
            raise ValueError(
                f"case {case.name!r} has a custom step with no exact-"
                "controller adaptive variant; run it with "
                "controller='lagged' (the tentative-carry fused kernel)")
        step_impl = step = make_adaptive_step(case)
    dt = float(dt0 if dt0 is not None else case.dt)
    dt_used = dt  # lagged: dt that built the carried tentative fields
    t = 0.0
    k = 0
    if state is None:
        resumed = None
        if sim.checkpointer is not None:
            resumed, k0, extras = sim.checkpointer.restore_latest(
                case, with_extras=True)
        if resumed is not None and "dt" in extras:
            state, k = resumed, k0
            dt, t = extras["dt"], extras["t"]
            dt_used = extras.get("dt_used", dt)
            log(f"resumed adaptive run at step {k} (t={t:.6g}, dt={dt:.6e})")
        else:
            state = sim.initial_state()
    # normalize to the logical layout first (initial/resumed states may be
    # in the fixed-dt carry layout), then enter the adaptive layout
    if case.unalign_state is not None and state.u.shape != case.grid.shape:
        state = case.unalign_state(state)
    if use_carry:
        # uncorrect with dt_used: the first kernel call re-corrects with
        # dt_corr = dt_used, so the roundtrip is exact (one f32 rounding)
        state = to_aligned_c(state, dt_used)
    elif to_aligned is not None:
        state = to_aligned(state)
    diffusivity = (case.adaptive_diffusivity
                   if case.adaptive_diffusivity is not None
                   else case.coeffs.viscosity)
    dt_ceiling_diffusive = 0.25 * min(case.coeffs.dx, case.coeffs.dy) ** 2 \
        / max(diffusivity, 1e-300)
    rows = []

    if use_carry:
        spc = max(1, steps_per_call)
        if case.print_interval % spc:
            raise ValueError(f"steps_per_call={spc} must divide "
                             f"the print interval ({case.print_interval})")
        ckpt_iv = sim.checkpointer.interval if sim.checkpointer else 0
        if ckpt_iv and ckpt_iv % spc:
            raise ValueError(f"steps_per_call={spc} must divide "
                             f"the checkpoint interval ({ckpt_iv})")

        @jax.jit
        def chunk_lag(state, du, d, t_dev):
            def body(carry, _):
                st, du_, d_, t_ = carry
                st2, diag, co_per_dt = step_impl(st, du_, d_)
                # Courant of the step the kernel just CORRECTED (its
                # fields evolved over du_) — one step stale by design
                co_prev = du_ * co_per_dt
                scale = jnp.minimum(growth, max_courant
                                    / jnp.maximum(co_prev, 1e-12))
                d2 = jnp.minimum(d_ * scale, dt_ceiling_diffusive)
                return (st2, d_, d2, t_ + d_), (diag.poisson_iters,
                                                diag.poisson_residual,
                                                d_, co_prev)

            (state, du2, d2, t2), (iters, res, dts, cos) = jax.lax.scan(
                body, (state, du, d, t_dev), None, length=spc)
            # packed print/checkpoint scalars — fetched at PRINT cadence
            # only: every device->host scalar sync is a ~15 ms tunnel
            # roundtrip on this chip, and the controller state (du, d, t)
            # stays device-resident between chunks
            packed = jnp.stack([
                du2.astype(jnp.float32), d2.astype(jnp.float32),
                t2.astype(jnp.float32),
                dts[-1].astype(jnp.float32), cos[-1].astype(jnp.float32),
                iters[-1].astype(jnp.float32),
                res[-1].astype(jnp.float32)])
            return state, du2, d2, t2, packed

        du_dev = jnp.asarray(dt_used, case.dtype)
        d_dev = jnp.asarray(dt, case.dtype)
        t_dev = jnp.asarray(t, case.dtype)
        ckpt_iv = sim.checkpointer.interval if sim.checkpointer else 0
        while True:
            if n_steps is not None and k >= n_steps:
                break
            if final_time is not None and t >= final_time:
                break
            state, du_dev, d_dev, t_dev, packed = \
                chunk_lag(state, du_dev, d_dev, t_dev)
            k += spc
            sync = (final_time is not None or k % case.print_interval == 0
                    or (ckpt_iv and k % ckpt_iv == 0)
                    or (n_steps is not None and k >= n_steps))
            if sync:
                du_h, d_h, t, dt_last, co_last, it_last, res_last = \
                    map(float, np.asarray(packed))
                dt_used, dt = du_h, d_h
            if k % case.print_interval == 0:
                row = sim.statistics(to_logical_c(state, dt_used))
                row.update(step=k, time=t, dt=dt_last, courant=co_last,
                           poisson_iters=int(it_last),
                           poisson_residual=res_last)
                rows.append(row)
                log(f"Step {k:6d} | t={t:8.4f} | dt={dt_last:.3e}"
                    f" | Co={co_last:.3f}"
                    f" | max(div)={row['max_divergence']:10.2e}"
                    f" | avg_KE={row['avg_kinetic_energy']:10.6f}")
            if ckpt_iv and k % ckpt_iv == 0:
                sim.checkpointer.maybe_save(
                    to_logical_c(state, dt_used), k,
                    extras={"dt": dt, "t": t, "dt_used": dt_used})
        dt_used = float(du_dev)
        return to_logical_c(state, dt_used), rows

    if steps_per_call > 1:
        if case.print_interval % steps_per_call:
            raise ValueError(f"steps_per_call={steps_per_call} must divide "
                             f"the print interval ({case.print_interval})")
        ckpt_iv = sim.checkpointer.interval if sim.checkpointer else 0
        if ckpt_iv and ckpt_iv % steps_per_call:
            raise ValueError(f"steps_per_call={steps_per_call} must divide "
                             f"the checkpoint interval ({ckpt_iv})")

        @jax.jit
        def chunk(state, dt):
            def body(carry, _):
                st, d = carry
                st, diag, co_per_dt = step_impl(st, d)
                co = d * co_per_dt
                scale = jnp.minimum(growth, max_courant
                                    / jnp.maximum(co, 1e-12))
                d2 = jnp.minimum(d * scale, dt_ceiling_diffusive)
                return (st, d2), (diag.poisson_iters, diag.poisson_residual,
                                  d, co)

            (state, dt2), (iters, res, dts, cos) = jax.lax.scan(
                body, (state, jnp.asarray(dt, case.dtype)), None,
                length=steps_per_call)
            # one packed scalar vector per chunk (see the lagged branch)
            packed = jnp.stack([
                dt2.astype(jnp.float32), jnp.sum(dts).astype(jnp.float32),
                dts[-1].astype(jnp.float32), cos[-1].astype(jnp.float32),
                iters[-1].astype(jnp.float32), res[-1].astype(jnp.float32)])
            return state, packed

        while True:
            if n_steps is not None and k >= n_steps:
                break
            if final_time is not None and t >= final_time:
                break
            state, packed = chunk(state, dt)
            k += steps_per_call
            d_h, t_inc, dt_last, co_last, it_last, res_last = \
                map(float, np.asarray(packed))
            t += t_inc
            dt = d_h
            if k % case.print_interval == 0:
                row = sim.statistics(to_logical(state)
                                     if to_logical is not None else state)
                row.update(step=k, time=t, dt=dt_last, courant=co_last,
                           poisson_iters=int(it_last),
                           poisson_residual=res_last)
                rows.append(row)
                log(f"Step {k:6d} | t={t:8.4f} | dt={dt_last:.3e}"
                    f" | Co={co_last:.3f}"
                    f" | max(div)={row['max_divergence']:10.2e}"
                    f" | avg_KE={row['avg_kinetic_energy']:10.6f}")
            if sim.checkpointer is not None:
                sim.checkpointer.maybe_save(
                    to_logical(state) if to_logical is not None else state,
                    k, extras={"dt": dt, "t": t})
        if to_logical is not None:
            state = to_logical(state)
        return state, rows

    while True:
        if n_steps is not None and k >= n_steps:
            break
        if final_time is not None and t >= final_time:
            break
        state, diag, co_per_dt = step(state, dt)
        k += 1
        t += dt
        co = dt * float(co_per_dt)
        if k % case.print_interval == 0:
            row = sim.statistics(to_logical(state) if to_logical is not None
                                 else state)
            row.update(step=k, time=t, dt=dt, courant=co,
                       poisson_iters=int(diag.poisson_iters),
                       poisson_residual=float(diag.poisson_residual))
            rows.append(row)
            log(f"Step {k:6d} | t={t:8.4f} | dt={dt:.3e} | Co={co:.3f}"
                f" | max(div)={row['max_divergence']:10.2e}"
                f" | avg_KE={row['avg_kinetic_energy']:10.6f}")
        # controller: approach max_courant from below, never exceed the
        # diffusive ceiling; shrink immediately when over the target
        scale = min(growth, max_courant / max(co, 1e-12))
        dt = min(dt * scale, dt_ceiling_diffusive)
        if sim.checkpointer is not None:
            # saved AFTER the controller update: the resumed run's first
            # step uses exactly the dt the uninterrupted run would
            sim.checkpointer.maybe_save(
                to_logical(state) if to_logical is not None else state,
                k, extras={"dt": dt, "t": t})
    if to_logical is not None:
        state = to_logical(state)
    return state, rows
