"""Data-parallel ensembles: batched independent simulations via vmap.

The DP row of the parallelism inventory (SURVEY.md section 2.3): parameter
sweeps (Reynolds number, lid speed) run as ONE vmapped step over a stacked
state batch — one XLA program advancing every member per call — optionally
sharded over a mesh axis so members ride separate chips.

The per-member physics parameter (viscosity) is a traced scalar, so a single
compiled program serves the whole sweep; dt is shared across the batch (the
most restrictive member's CFL bound, as stability demands anyway).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cfd_tpu.bc import lid_cavity_bc
from cfd_tpu.grid import Grid, cfl_time_step, optimal_omega
from cfd_tpu.ops.stencil import StencilCoeffs, poisson_source, predictor, pressure_correction
from cfd_tpu.poisson.sor import SORConfig, make_eps_neumann_poisson
from cfd_tpu.state import State


def make_cavity_ensemble_step(
    grid: Grid,
    dt: float,
    lid_velocity: float = 1.0,
    tolerance_factor: float = 1e-9,
    max_iters: int = 10000,
    dtype=jnp.float64,
) -> Callable:
    """Returns step(states, viscosities) -> (states, iters, residuals), all
    batched on the leading axis. ``viscosities`` is a (B,) array — each
    member integrates its own Reynolds number through one shared program."""
    bc = lid_cavity_bc(grid, lid_velocity)
    u_valid = jnp.asarray(grid.u_valid_mask)
    v_valid = jnp.asarray(grid.v_valid_mask)
    cell = jnp.asarray(grid.cell_mask)
    omega = optimal_omega(grid.nx)
    sor = SORConfig(omega=omega, tol_factor=tolerance_factor, max_iters=max_iters)

    def one(state: State, viscosity):
        # StencilCoeffs is a plain container: traced viscosity flows through
        c = StencilCoeffs(dx=grid.dx, dy=grid.dy, dt=dt, viscosity=viscosity)
        u, v = bc(state.u, state.v)
        us, vs = predictor(u, v, c, u_valid, v_valid)
        b = poisson_source(us, vs, c, cell, remove_mean=False, n_cells=grid.n_fluid)
        solve = make_eps_neumann_poisson(grid, c, sor)
        p, iters, res = solve(state.p, b)
        u2, v2 = pressure_correction(us, vs, p, c, u_valid, v_valid,
                                     u_else=u, v_else=v, cavity_form=True)
        return State(u2, v2, p, state.T), iters, res

    return jax.jit(jax.vmap(one, in_axes=(0, 0)))


def ensemble_cavity_sweep(
    reynolds_numbers,
    n_interior: int = 63,
    lid_velocity: float = 1.0,
    cfl: float = 0.5,
    dtype=jnp.float64,
    mesh: Mesh | None = None,
):
    """Build (step, initial_states, dt) for a Reynolds sweep.

    dt uses the most restrictive (lowest-Re, highest-viscosity) member's CFL
    rule (cavity-01.cpp:359-360) so every member is stable. With ``mesh``
    given, the batch axis is sharded over its first axis (pure data
    parallelism: zero cross-member communication)."""
    res = np.asarray(reynolds_numbers, dtype=np.float64)
    grid = Grid.regular(n_interior, n_interior)
    viscosities = lid_velocity * 1.0 / res  # nu = U*L/Re, L=1 (cavity-01.cpp:356)
    dt = min(cfl_time_step(grid.dx, grid.dy, float(nu), lid_velocity, cfl)
             for nu in viscosities)
    step = make_cavity_ensemble_step(grid, dt, lid_velocity, dtype=dtype)

    b = len(res)
    z = jnp.zeros((b, grid.ny + 2, grid.nx + 2), dtype=dtype)
    bc = lid_cavity_bc(grid, lid_velocity)
    u0, v0 = jax.vmap(bc)(z, z)
    states = State(u=u0, v=v0, p=z, T=None)
    nus = jnp.asarray(viscosities, dtype=dtype)
    if mesh is not None:
        axis = list(mesh.axis_names)[0]
        batch_sharding = NamedSharding(mesh, P(axis))
        states = State(*(None if x is None else jax.device_put(x, batch_sharding)
                         for x in states))
        nus = jax.device_put(nus, NamedSharding(mesh, P(axis)))
    return step, states, nus, dt
