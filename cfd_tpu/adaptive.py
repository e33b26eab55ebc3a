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


def run_adaptive(sim, max_courant: float = 0.7, n_steps: int | None = None,
                 final_time: float | None = None, dt0: float | None = None,
                 growth: float = 1.2, state: State | None = None,
                 log=None, steps_per_call: int = 1):
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

    Checkpoint/resume: when ``sim.checkpointer`` is set, the controller's
    full dynamical state (State, step, dt, t) is checkpointed — dt and t as
    extras in the npz — and a latest checkpoint is resumed from exactly
    (bitwise-identical continuation for the host-loop path; the dt history
    is what the fixed-dt path never needed, round-1 gap in PARITY.md).
    """
    case = sim.case
    log = log if log is not None else sim.log
    if case.adaptive_impl is not None:
        # factory-provided traced-dt kernel path (round-3 item 5: the
        # quad/Pallas step with dt as an SMEM scalar — adaptive runs no
        # longer forfeit the fast path)
        step_impl, to_aligned, to_logical = case.adaptive_impl()
        step = jax.jit(step_impl)
    else:
        step_impl = step = make_adaptive_step(case)
        to_aligned = to_logical = None
    dt = float(dt0 if dt0 is not None else case.dt)
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
            log(f"resumed adaptive run at step {k} (t={t:.6g}, dt={dt:.6e})")
        else:
            state = sim.initial_state()
    # normalize to the logical layout first (initial/resumed states may be
    # in the fixed-dt carry layout), then enter the adaptive layout
    if case.unalign_state is not None and state.u.shape != case.grid.shape:
        state = case.unalign_state(state)
    if to_aligned is not None:
        state = to_aligned(state)
    dt_ceiling_diffusive = 0.25 * min(case.coeffs.dx, case.coeffs.dy) ** 2 \
        / max(case.coeffs.viscosity, 1e-300)
    rows = []

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

            (state, dt2), hist = jax.lax.scan(
                body, (state, jnp.asarray(dt, case.dtype)), None,
                length=steps_per_call)
            return state, dt2, hist

        while True:
            if n_steps is not None and k >= n_steps:
                break
            if final_time is not None and t >= final_time:
                break
            state, dt_dev, (iters, res, dts, cos) = chunk(state, dt)
            k += steps_per_call
            t += float(jnp.sum(dts))
            dt = float(dt_dev)
            if k % case.print_interval == 0:
                row = sim.statistics(to_logical(state)
                                     if to_logical is not None else state)
                co = float(cos[-1])
                row.update(step=k, time=t, dt=float(dts[-1]), courant=co,
                           poisson_iters=int(iters[-1]),
                           poisson_residual=float(res[-1]))
                rows.append(row)
                log(f"Step {k:6d} | t={t:8.4f} | dt={float(dts[-1]):.3e}"
                    f" | Co={co:.3f}"
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
