"""Projection-method time integration (L3 driver).

One solver core parameterized by (grid/mask, BC set, Poisson flavor, step
ordering) replaces the reference's three monolithic solver classes. Two
per-step orderings exist in the reference and both are kept for exact
behavioral parity:

* ``cavity`` ordering (cavity-01.cpp:387-390):
  BC(u,v) -> predictor -> Poisson (cold start) -> corrector.
* ``channel`` ordering (channel-01.cpp:365-386, backwards_step-01.cpp:409-430):
  predictor -> BC(u*,v*) -> source (mean removed) -> Poisson (warm start,
  ghosts refreshed per sweep) -> corrector -> BC(u,v).

The step is a pure jitted function State -> (State, StepDiagnostics); the
SOR solve runs as a device-resident while_loop, so a whole time step is one
XLA program with no host syncs.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cfd_tpu.bc import VelocityBC
from cfd_tpu.grid import Grid
from cfd_tpu.ops.stencil import (
    StencilCoeffs,
    poisson_source,
    predictor,
    pressure_correction,
)
from cfd_tpu.ops.reductions import flow_statistics
from cfd_tpu.state import State, StepDiagnostics

PoissonSolve = Callable[[jnp.ndarray, jnp.ndarray], tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]


@dataclasses.dataclass(frozen=True)
class Case:
    """Full static description of a simulation case (L5 config layer).

    The reference hardcodes these as ``static constexpr`` blocks
    (cavity-01.cpp:309-320, channel-01.cpp:287-300,
    backwards_step-01.cpp:319-334); here they are data.
    """

    name: str
    grid: Grid
    coeffs: StencilCoeffs
    ordering: str  # "cavity" | "channel"
    velocity_bc: VelocityBC
    poisson_solve: PoissonSolve
    remove_source_mean: bool
    cavity_corrector: bool  # rho-multiplied gradient (cavity-01.cpp:701)
    ke_divisor: int
    final_time: float
    total_steps: int
    print_interval: int
    save_interval: int
    dtype: jnp.dtype = jnp.float32
    vtk_basename: str = "flow"
    vtk_title: str = "Flow Data"
    # Extension hooks for physics beyond the plain projection step (e.g.
    # Boussinesq): a step-builder taking the Case and returning the step
    # function, extra jitted per-state scalars for the stats row, an initial
    # state override, and extra exported VTK fields.
    # Extrapolated Poisson warm start (p_guess = 2 p_n - p_{n-1}): fewer
    # multigrid cycles to the same tolerance; the SOR cavity flavor ignores
    # warm starts entirely (reference cold-starts, cavity-01.cpp:610).
    extrapolate_warm_start: bool = False
    # Iteration cap of the pressure solver (SOR max_iters or multigrid
    # max_cycles); when a step's Poisson solve hits it, Simulation.run logs
    # the reference's non-convergence warning and continues
    # (cavity-01.cpp:681-684, channel-01.cpp:683-685,
    # backwards_step-01.cpp:933-935).
    poisson_max_iters: Optional[int] = None
    # Optional fused Pallas stage kernels (predictor_source, corrector) for
    # the cavity ordering on rectangle f32 TPU runs (kernels.projection);
    # built by the case factory, which knows the BC parameters they bake in.
    step_kernels: Optional[tuple] = None
    # Tentative-state carry (kernels.quad corr_predictor_source family):
    # the State's u/v slots hold the TENTATIVE (u*, v*) fields and
    # step_kernels[0] is one fused corrector+BC+predictor+source kernel run
    # at the START of each step — the corrected u/v never exist in HBM on
    # the hot path (unalign_state recomputes them for stats/export).
    carry_tentative: bool = False
    # Round-5 headline fusion (cavity per-kernel quad path only): the carry
    # kernel also runs the FIRST V-cycle's pre-smooth+residual+restriction
    # (kernels.quad make_quad_corr_predictor_source_fused_pre) and
    # poisson_solve has the quad_first_rc signature
    # solve(p1, b, rc0, max_b) — at 1.0 cycles/step steady state this
    # removes the pre kernel's full level-0 HBM round trip from the step.
    carry_fused_pre: bool = False
    # With step_kernels the state is carried in the Mosaic-ALIGNED layout
    # (rows rounded to 8, cols to 128, zeros beyond the logical grid) across
    # the whole scan — align_state/unalign_state convert at the boundaries
    # (init/resume in; stats/export/checkpoint out). Eliminates the per-step
    # pad/slice layout copies (~0.2 ms/step at 2048^2).
    align_state: Optional[Callable] = None
    unalign_state: Optional[Callable] = None
    custom_step: Optional[Callable] = None
    # Whole-time-step kernel (kernels.whole_step, MGConfig.whole_step):
    # ONE Pallas call running carry + mean removal + the entire pressure
    # solve; replaces the fused-kernel + poisson_solve composition on the
    # hot path (step_kernels stay for stats/export/adaptive).
    whole_step_kernel: Optional[Callable] = None
    # Optional body-force (momentum source) arrays on the u-/v-faces,
    # applied as +dt*f in the predictor — framework extension (no reference
    # analog): gravity-style sources and MMS verification forcing
    # (cfd_tpu.validation.manufactured_solution). XLA step paths only.
    forcing: Optional[tuple] = None
    # Adaptive-dt fast path (round-3 item 5): a factory-provided builder
    # returning (step(state, dt) -> (state, diag, courant_per_dt),
    # to_aligned(logical_state), to_logical(state)) with dt TRACED into the
    # quad kernels (SMEM scalar) — adaptive.run_adaptive prefers it over
    # rebuilding the plain XLA step.
    adaptive_impl: Optional[Callable] = None
    # Lagged-controller adaptive builder on the tentative-carry kernels:
    # () -> (step(st, dt_corr, dt_pred) -> (st, diag, co_per_dt),
    #        to_aligned(st, dt), to_logical(st, dt_used)) — see
    # cfd_tpu.adaptive (the Courant feedback is one step stale because the
    # corrected fields exist only inside the fused kernel that also
    # consumes them for the next predictor).
    adaptive_impl_carry: Optional[Callable] = None
    # Diffusivity for the adaptive controller's stability ceiling
    # dt <= 0.25 h^2 / D: defaults to coeffs.viscosity; cases transporting
    # additional diffusive scalars set the binding one (Rayleigh-Benard:
    # max(nu, kappa) — kappa binds at Pr < 1).
    adaptive_diffusivity: Optional[float] = None
    # Banner scalars for io.console.print_banner (the reference
    # printSimulationInfo block, cavity-01.cpp:501-518): reynolds, cfl,
    # omega, length/height, banner_title, ... — display-only.
    info: Optional[dict] = None
    extra_stats: Optional[Callable] = None  # (State) -> dict[str, scalar]
    initial_state_fn: Optional[Callable] = None  # () -> State
    vtk_extra_fields: Optional[Callable] = None  # (State) -> dict[str, array]

    @property
    def dt(self) -> float:
        return self.coeffs.dt


def make_step(case: Case) -> Callable[[State], tuple[State, StepDiagnostics]]:
    """Build the pure per-step function for a case (not yet jitted)."""
    if case.custom_step is not None:
        return case.custom_step(case)
    grid, c = case.grid, case.coeffs
    bc = case.velocity_bc
    if grid.has_solids:
        _consts = (jnp.asarray(grid.cell_mask), jnp.asarray(grid.u_valid_mask),
                   jnp.asarray(grid.v_valid_mask), jnp.asarray(grid.u_range_mask),
                   jnp.asarray(grid.v_range_mask))

        def masks():
            return _consts
    else:
        # rectangle grids: iota-derived masks, built INSIDE the traced step
        # so they fuse to in-register compares instead of streaming constant
        # arrays from HBM (ops.stencil.iota_masks)
        from cfd_tpu.ops.stencil import iota_masks

        def masks():
            cell, u_valid, v_valid = iota_masks(grid)
            return cell, u_valid, v_valid, u_valid, v_valid
    n_fluid = grid.n_fluid

    extrap = case.extrapolate_warm_start

    def remove_mean_quad(b, sum_b):
        """Mean removal over the quad-plane layout (cell mask from the
        per-plane global iotas; fluid-only for the step rectangle — the
        kernel emits b = 0 on solid cells and the mean must not disturb
        them, backwards_step-01.cpp:843-865)."""
        q = jax.lax.broadcasted_iota(jnp.int32, b.shape, 0)
        jj = 2 * jax.lax.broadcasted_iota(jnp.int32, b.shape, 1) + (q >> 1)
        ii = 2 * jax.lax.broadcasted_iota(jnp.int32, b.shape, 2) + (q & 1)
        cell = (jj >= 1) & (jj <= grid.ny) & (ii >= 1) & (ii <= grid.nx)
        if grid.has_solids:
            from cfd_tpu.poisson.multigrid import step_rect_params

            step_i, inlet_j = step_rect_params(grid)  # quad path => rect
            cell = cell & ~((ii <= step_i) & (jj > inlet_j))
        return jnp.where(cell, b - sum_b / n_fluid, b)

    if case.carry_tentative and case.step_kernels is not None:
        fused = case.step_kernels[0]

        if case.whole_step_kernel is not None:
            ws = case.whole_step_kernel
            if case.ordering == "cavity" or extrap:
                # extrapolated 2p - p_prev warm start computed in-kernel;
                # the p_prev slot keeps carrying the pre-solve p
                def step(state: State) -> tuple[State, StepDiagnostics]:
                    us2, vs2, p, iters, res = ws(state.u, state.v,
                                                 state.p, state.p_prev)
                    return State(us2, vs2, p, state.T, state.p), \
                        StepDiagnostics(iters, res)

            else:  # masked step flavor: plain previous-p warm start
                def step(state: State) -> tuple[State, StepDiagnostics]:
                    us2, vs2, p, iters, res = ws(state.u, state.v, state.p)
                    return State(us2, vs2, p, state.T, None), \
                        StepDiagnostics(iters, res)

        elif case.ordering == "cavity" and case.carry_fused_pre:

            def step(state: State) -> tuple[State, StepDiagnostics]:
                # carry + the first cycle's pre-smooth/residual/restrict in
                # ONE kernel; the solve starts at the coarse stage
                us2, vs2, b, p1, rc, max_b = fused(
                    state.u, state.v, state.p, state.p_prev)
                p, iters, res = case.poisson_solve(p1, b, rc, max_b)
                return State(us2, vs2, p, state.T, state.p), \
                    StepDiagnostics(iters, res)

        elif case.ordering == "cavity":

            def step(state: State) -> tuple[State, StepDiagnostics]:
                us2, vs2, b, guess, max_b = fused(
                    state.u, state.v, state.p, state.p_prev)
                p, iters, res = case.poisson_solve(guess, b, max_b)
                return State(us2, vs2, p, state.T, state.p), \
                    StepDiagnostics(iters, res)

        elif extrap:  # channel ordering, extrapolated warm start

            def step(state: State) -> tuple[State, StepDiagnostics]:
                us2, vs2, b, guess, sum_b = fused(
                    state.u, state.v, state.p, state.p_prev)
                if case.remove_source_mean:
                    b = remove_mean_quad(b, sum_b)
                p, iters, res = case.poisson_solve(guess, b)
                return State(us2, vs2, p, state.T, state.p), \
                    StepDiagnostics(iters, res)

        else:  # channel ordering, plain previous-p warm start (the step
            # case: extrapolation MEASURED to raise the masked
            # defect-correction cycle count — kernels.step_quad docstring)

            def step(state: State) -> tuple[State, StepDiagnostics]:
                us2, vs2, b, sum_b = fused(state.u, state.v, state.p)
                if case.remove_source_mean:
                    b = remove_mean_quad(b, sum_b)
                p, iters, res = case.poisson_solve(state.p, b)
                return State(us2, vs2, p, state.T, None), \
                    StepDiagnostics(iters, res)

    elif case.ordering == "cavity" and case.step_kernels is not None:
        pred_src, corr = case.step_kernels

        # The state's p_prev slot carries the NEXT step's extrapolated warm
        # start guess (2 p - p_prev), emitted by the corrector kernel in the
        # same pass that reads the fresh p — no separate whole-array
        # extrapolation op. Initial guess = zeros = the extrapolation of two
        # zero pressures, matching the XLA path's first step exactly.
        def step(state: State) -> tuple[State, StepDiagnostics]:
            # fused BC+predictor+source (+ the tolerance base max|b|)
            us, vs, b, max_b = pred_src(state.u, state.v)
            p, iters, res = case.poisson_solve(state.p_prev, b, max_b)
            # slim corrector: ghosts rebuilt from the corrected interior, so
            # the carried u/v never stream through the kernel
            u2, v2, guess = corr(us, vs, p, state.p)
            return State(u2, v2, p, state.T, guess), \
                StepDiagnostics(iters, res)

    elif case.ordering == "channel" and case.step_kernels is not None:
        pred_src, corr = case.step_kernels
        ny_i, nx_i = grid.ny, grid.nx

        def step(state: State) -> tuple[State, StepDiagnostics]:
            # fused predictor + BC(u*,v*) + raw source + interior sum
            us, vs, b, sum_b = pred_src(state.u, state.v)
            if case.remove_source_mean:
                if b.ndim == 3:  # quad-plane layout (kernels.quad)
                    q = jax.lax.broadcasted_iota(jnp.int32, b.shape, 0)
                    jj = 2 * jax.lax.broadcasted_iota(jnp.int32, b.shape, 1) \
                        + (q >> 1)
                    ii = 2 * jax.lax.broadcasted_iota(jnp.int32, b.shape, 2) \
                        + (q & 1)
                else:
                    jj = jax.lax.broadcasted_iota(jnp.int32, b.shape, 0)
                    ii = jax.lax.broadcasted_iota(jnp.int32, b.shape, 1)
                cell = (jj >= 1) & (jj <= ny_i) & (ii >= 1) & (ii <= nx_i)
                b = jnp.where(cell, b - sum_b / n_fluid, b)
            p, iters, res = case.poisson_solve(state.p_prev, b)
            u2, v2, guess = corr(us, vs, p, state.p)
            return State(u2, v2, p, state.T, guess), \
                StepDiagnostics(iters, res)

    elif case.ordering == "cavity":
        fx, fy = (jnp.asarray(case.forcing[0]), jnp.asarray(case.forcing[1])) \
            if case.forcing is not None else (None, None)

        def step(state: State) -> tuple[State, StepDiagnostics]:
            cell, u_valid, v_valid, u_range, v_range = masks()
            u, v = bc(state.u, state.v)
            us, vs = predictor(u, v, c, u_valid, v_valid, fx=fx, fy=fy)
            b = poisson_source(us, vs, c, cell, remove_mean=False, n_cells=n_fluid)
            guess = 2.0 * state.p - state.p_prev if extrap else state.p
            p, iters, res = case.poisson_solve(guess, b)
            u2, v2 = pressure_correction(
                us, vs, p, c, u_valid, v_valid, u_else=u, v_else=v, cavity_form=True
            )
            return State(u2, v2, p, state.T, state.p if extrap else None), \
                StepDiagnostics(iters, res)

    elif case.ordering == "channel":
        zero_else = True  # invalid in-range faces are zeroed (backwards_step-01.cpp:956,972)
        fx, fy = (jnp.asarray(case.forcing[0]), jnp.asarray(case.forcing[1])) \
            if case.forcing is not None else (None, None)

        def step(state: State) -> tuple[State, StepDiagnostics]:
            cell, u_valid, v_valid, u_range, v_range = masks()
            us, vs = predictor(state.u, state.v, c, u_valid, v_valid,
                               fx=fx, fy=fy)
            us, vs = bc(us, vs)
            b = poisson_source(
                us, vs, c, cell, remove_mean=case.remove_source_mean, n_cells=n_fluid
            )
            guess = 2.0 * state.p - state.p_prev if extrap else state.p
            p, iters, res = case.poisson_solve(guess, b)
            zu = jnp.zeros_like(state.u)
            u_else = jnp.where(u_range, zu, state.u) if zero_else else state.u
            v_else = jnp.where(v_range, zu, state.v) if zero_else else state.v
            u2, v2 = pressure_correction(
                us, vs, p, c, u_valid, v_valid, u_else=u_else, v_else=v_else,
                cavity_form=case.cavity_corrector,
            )
            u2, v2 = bc(u2, v2)
            return State(u2, v2, p, state.T, state.p if extrap else None), \
                StepDiagnostics(iters, res)

    else:
        raise ValueError(f"unknown ordering: {case.ordering}")

    return step


class Simulation:
    """Host-side time-loop driver with periodic diagnostics and export
    (equivalent of the reference ``run()`` loops)."""

    def __init__(self, case: Case, exporter=None, log=print, metrics=None,
                 mesh=None, sharded_kwargs: Optional[dict] = None):
        """``mesh``: a jax.sharding.Mesh — runs the case MULTI-CHIP on the
        sharded quad fast path (parallel.quad_sharded.ShardedQuadProjection;
        f32 multigrid, all four physics flavors). The time loop, stats rows,
        VTK export and checkpointing are unchanged: the sharded engine's
        state is gathered to the logical layout at print/save cadence only.
        The TPU-native answer to the reference's OpenFOAM decomposePar +
        mpirun workflow (README.md:129-131)."""
        self.case = case
        self.exporter = exporter  # callable (state, step_idx, time) or None
        self.log = log
        self.metrics = metrics  # io.MetricsLog or None
        self._engine = None
        if mesh is not None:
            from cfd_tpu.parallel.quad_sharded import ShardedQuadProjection

            kw = dict(sharded_kwargs or {})
            # Pallas kernels need interpret mode off-TPU (virtual CPU meshes)
            kw.setdefault("interpret",
                          mesh.devices.flat[0].platform == "cpu")
            engine = ShardedQuadProjection(case, mesh, **kw)
            self._engine = engine

            def _estep(state):
                st, d = engine.step(state)
                return st, StepDiagnostics(d["poisson_iters"],
                                           d["poisson_residual"])

            self._step = _estep
        else:
            self._step = jax.jit(make_step(case))
        self._stats = jax.jit(
            lambda u, v: flow_statistics(
                u, v, case.coeffs, jnp.asarray(case.grid.cell_mask), case.ke_divisor
            )
        )
        self._extra_stats = jax.jit(case.extra_stats) if case.extra_stats else None
        # jitted unalign: the carried-layout -> logical conversion runs a
        # Pallas corrector + layout ops — op-by-op dispatch costs ~0.3 s
        # per call at 2048^2 (measured), turning every print/export row
        # into the dominant cost of a 100-step chunk; jitted it is ~ms
        self._unalign = (jax.jit(case.unalign_state)
                         if case.unalign_state is not None else None)
        self._multi_cache: dict[int, Callable] = {}
        self.history: list[dict] = []
        self.checkpointer = None  # io.checkpoint.CheckpointManager or None
        # Failure detection (SURVEY.md section 5.3): the reference continues
        # after SOR non-convergence and has no NaN guards; here a NaN/Inf
        # or a KE blowup aborts the run with a diagnosable error.
        self.blowup_ke_threshold = 1e6

    def initial_state(self) -> State:
        if self._engine is not None:
            return self._engine.initial_state()
        if self.case.initial_state_fn is not None:
            return self.case.initial_state_fn()
        s = State.zeros(self.case.grid.shape, dtype=self.case.dtype)
        u, v = self.case.velocity_bc(s.u, s.v)
        p_prev = s.p if self.case.extrapolate_warm_start else None
        st = State(u, v, s.p, s.T, p_prev)
        if self.case.align_state is not None:
            st = self.case.align_state(st)
        return st

    def _logical(self, state: State) -> State:
        """State in the logical (ny+2, nx+2) layout for stats/export/
        checkpoint (identity unless the case carries an aligned state or
        the run is sharded)."""
        if (self._engine is not None and isinstance(state, tuple)
                and not isinstance(state, State)):  # State is a NamedTuple
            return self._engine.logical(state)
        if (self._unalign is not None
                and state.u.shape != self.case.grid.shape):
            return self._unalign(state)
        return state

    def statistics(self, state: State) -> dict[str, float]:
        state = self._logical(state)
        vals = self._stats(state.u, state.v)
        if self._extra_stats is not None:
            vals.update(self._extra_stats(state))
        # ONE device->host transfer for the whole row: per-scalar float()
        # costs a ~15 ms tunnel roundtrip each on this chip (measured —
        # the stats row was 0.08 s, dominating a 100-step print chunk)
        keys = list(vals)
        flat = np.asarray(jnp.stack([jnp.asarray(vals[k], jnp.float32)
                                     for k in keys]))
        return dict(zip(keys, map(float, flat)))

    def _multi_step(self, spc: int):
        """jitted scan of ``spc`` steps per dispatch (amortizes host->device
        dispatch latency on large grids; ~1 ms per call over this TPU
        tunnel)."""
        if spc not in self._multi_cache:
            if self._engine is not None:
                engine = self._engine

                def multi(state, _spc=spc):
                    st, d = engine.run_chunk(state, _spc)
                    return st, StepDiagnostics(d["poisson_iters"],
                                               d["poisson_residual"])

                self._multi_cache[spc] = multi
            else:
                step = make_step(self.case)

                def body(s, _):
                    s2, d = step(s)
                    return s2, d

                self._multi_cache[spc] = jax.jit(
                    lambda s: jax.lax.scan(body, s, None, length=spc))
        return self._multi_cache[spc]

    def run(self, state: Optional[State] = None, n_steps: Optional[int] = None,
            start_step: int = 0, steps_per_call: int = 1) -> State:
        case = self.case
        if steps_per_call > 1:
            intervals = {"print": case.print_interval, "save": case.save_interval}
            if self.checkpointer is not None:
                intervals["checkpoint"] = self.checkpointer.interval
            for name, iv in intervals.items():
                if iv % steps_per_call:
                    raise ValueError(
                        f"steps_per_call={steps_per_call} must divide the "
                        f"{name} interval ({iv})")
        if state is None:
            state = self.initial_state()
            if self.exporter is not None and start_step == 0:
                # t=0 snapshot: the reference's CHANNEL solver writes it
                # from the constructor (channel-01.cpp:351-355) while
                # cavity/step write from run(); exporting uniformly here is
                # output-identical (byte-tested in test_vtk.py) — only the
                # call site differs.
                self.exporter(self._logical(state), 0, 0.0)
        elif self._engine is not None and isinstance(state, State):
            # resumed from a checkpoint (stored in the logical layout)
            state = self._engine.from_logical(state)
        elif (case.align_state is not None
              and state.u.shape == case.grid.shape):
            # resumed from a checkpoint (stored in the logical layout)
            state = case.align_state(state)
        n = case.total_steps if n_steps is None else start_step + n_steps
        n_cells = case.grid.n_fluid
        t_wall0 = time.perf_counter()
        prev_k, prev_wall = start_step, t_wall0
        cap = case.poisson_max_iters
        # Per-chunk max Poisson iteration counts, kept as lazy device scalars
        # and only pulled to host at print cadence, so the non-convergence
        # check adds no extra host syncs to the hot loop.
        pending_iter_max: list = []

        def after_step(k: int, state: State, diag: StepDiagnostics) -> None:
            nonlocal prev_k, prev_wall
            t = k * case.dt
            last = k == n
            if k % case.print_interval == 0 or last:
                now = time.perf_counter()
                row = self.statistics(state)
                interval_steps = k - prev_k
                interval_wall = max(now - prev_wall, 1e-12)
                row.update(
                    step=k, time=t,
                    poisson_iters=int(diag.poisson_iters),
                    poisson_residual=float(diag.poisson_residual),
                    wall_seconds=now - t_wall0,
                    cell_updates_per_sec=n_cells * interval_steps / interval_wall,
                )
                prev_k, prev_wall = k, now
                self.history.append(row)
                if self.metrics is not None:
                    self.metrics.append(row)
                ke = row["avg_kinetic_energy"]
                if not (ke == ke) or ke > self.blowup_ke_threshold:  # NaN or blowup
                    raise RuntimeError(
                        f"solver diverged at step {k}: avg_KE={ke} "
                        f"(max_div={row['max_divergence']}, "
                        f"poisson_residual={row['poisson_residual']}); "
                        "reduce dt/CFL or check boundary conditions")
                self.log(
                    f"Step {k:6d}/{case.total_steps} | t={t:8.3f}"
                    f" | max(div)={row['max_divergence']:10.2e}"
                    f" | avg_KE={row['avg_kinetic_energy']:10.6f}"
                    f" | PPE iters={row['poisson_iters']:4d}"
                    f" | res={row['poisson_residual']:10.2e}"
                )
                # Reference-parity non-convergence warning
                # (cavity-01.cpp:681-684): warn-and-continue when any step
                # since the last print hit the pressure-solver cap.
                if cap is not None and pending_iter_max:
                    worst = max(int(x) for x in pending_iter_max)
                    pending_iter_max.clear()
                    if worst >= cap:
                        self.log(
                            f"Warning: SOR solver did not converge in {cap} "
                            f"iterations. Final residual: "
                            f"{row['poisson_residual']:.6e}")
            if self.exporter is not None and (k % case.save_interval == 0 or last):
                self.exporter(self._logical(state), k, t)
            if self.checkpointer is not None:
                self.checkpointer.maybe_save(self._logical(state), k)

        multi = self._multi_step(steps_per_call) if steps_per_call > 1 else None
        # main chunked loop + single-step tail when steps_per_call does not
        # divide the range; both paths share the full diagnostics/export/
        # checkpoint bookkeeping (after_step).
        main_end = start_step + ((n - start_step) // steps_per_call) * steps_per_call
        for k in range(start_step + steps_per_call, main_end + 1, steps_per_call):
            if multi is not None:
                state, diags = multi(state)
                diag = StepDiagnostics(diags.poisson_iters[-1],
                                       diags.poisson_residual[-1])
                if cap is not None:
                    pending_iter_max.append(jnp.max(diags.poisson_iters))
            else:
                state, diag = self._step(state)
                if cap is not None:
                    pending_iter_max.append(diag.poisson_iters)
            after_step(k, state, diag)
        for k in range(main_end + 1, n + 1):
            state, diag = self._step(state)
            if cap is not None:
                pending_iter_max.append(diag.poisson_iters)
            after_step(k, state, diag)
        if self.exporter is not None and hasattr(self.exporter, "write_collection"):
            self.exporter.write_collection()
        return state
