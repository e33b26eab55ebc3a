"""Vectorized ghost-cell boundary conditions.

TPU-native equivalent of the reference's L2 boundary layer: each BC is a pure
function ``(u, v) -> (u, v)`` (or ``p -> p`` for pressure ghosts) made of
``.at[].set`` index updates, applied in the reference's exact sequence so the
produced arrays match the C++ loops bit-for-bit (up to dtype).

Reference code: cavity-01.cpp:523-543, channel-01.cpp:513-541,
backwards_step-01.cpp:616-740.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from cfd_tpu.grid import Grid

VelocityBC = Callable[[jnp.ndarray, jnp.ndarray], tuple[jnp.ndarray, jnp.ndarray]]
PressureBC = Callable[[jnp.ndarray], jnp.ndarray]


def lid_cavity_bc(grid: Grid, lid_velocity: float) -> VelocityBC:
    """Moving-lid + no-slip ghost BCs (cavity-01.cpp:523-543).

    North lid u-ghost = 2*U_lid - u_interior; south u-ghost antisymmetric;
    east/west v-ghosts antisymmetric. Wall-normal face velocities (u at
    i=0/i_max, v at j=0/j_max) are never written — they stay 0 from init.
    """
    nx, ny = grid.nx, grid.ny

    def bc(u: jnp.ndarray, v: jnp.ndarray):
        u = u.at[ny + 1, 0 : nx + 1].set(2.0 * lid_velocity - u[ny, 0 : nx + 1])
        u = u.at[0, 0 : nx + 1].set(-u[1, 0 : nx + 1])
        v = v.at[0 : ny + 1, nx + 1].set(-v[0 : ny + 1, nx])
        v = v.at[0 : ny + 1, 0].set(-v[0 : ny + 1, 1])
        return u, v

    return bc


def channel_bc(grid: Grid, inlet_velocity: float) -> VelocityBC:
    """Inflow/outflow channel BCs (channel-01.cpp:513-529), in the
    reference's update order: inlet u/v, outlet u/v (zero-gradient), bottom
    wall v/u, top wall v/u."""
    nx, ny = grid.nx, grid.ny

    def bc(u: jnp.ndarray, v: jnp.ndarray):
        u = u.at[1 : ny + 1, 0].set(inlet_velocity)
        v = v.at[0 : ny + 1, 0].set(0.0)
        u = u.at[1 : ny + 1, nx].set(u[1 : ny + 1, nx - 1])
        v = v.at[0 : ny + 1, nx + 1].set(v[0 : ny + 1, nx])
        v = v.at[0, 1 : nx + 1].set(0.0)
        u = u.at[0, 0 : nx + 1].set(-u[1, 0 : nx + 1])
        v = v.at[ny, 1 : nx + 1].set(0.0)
        u = u.at[ny + 1, 0 : nx + 1].set(-u[ny, 0 : nx + 1])
        return u, v

    return bc


def step_bc(grid: Grid, inlet_velocity: float, inlet_j_max: int) -> VelocityBC:
    """Channel BCs restricted to the inlet rows plus solid-interface
    face zeroing (backwards_step-01.cpp:616-683).

    The interface sweep is precomputed into face masks (grid.u_zero_mask /
    v_zero_mask) and applied as a single vectorized select.
    """
    nx, ny = grid.nx, grid.ny
    u_zero = jnp.asarray(grid.u_zero_mask)
    v_zero = jnp.asarray(grid.v_zero_mask)

    def bc(u: jnp.ndarray, v: jnp.ndarray):
        u = u.at[1 : inlet_j_max + 1, 0].set(inlet_velocity)
        u = u.at[inlet_j_max + 1 : ny + 1, 0].set(0.0)
        v = v.at[0 : ny + 1, 0].set(0.0)
        u = u.at[1 : ny + 1, nx].set(u[1 : ny + 1, nx - 1])
        v = v.at[0 : ny + 1, nx + 1].set(v[0 : ny + 1, nx])
        v = v.at[0, 1 : nx + 1].set(0.0)
        u = u.at[0, 0 : nx + 1].set(-u[1, 0 : nx + 1])
        v = v.at[ny, 1 : nx + 1].set(0.0)
        u = u.at[ny + 1, 0 : nx + 1].set(-u[ny, 0 : nx + 1])
        u = jnp.where(u_zero, jnp.zeros_like(u), u)
        v = jnp.where(v_zero, jnp.zeros_like(v), v)
        return u, v

    return bc


def channel_pressure_ghosts(grid: Grid) -> PressureBC:
    """Inlet Neumann, outlet Dirichlet p=0 in the ghost column (the
    reference pressure pin), wall Neumann (channel-01.cpp:531-541)."""
    nx, ny = grid.nx, grid.ny

    def ghosts(p: jnp.ndarray) -> jnp.ndarray:
        p = p.at[1 : ny + 1, 0].set(p[1 : ny + 1, 1])
        p = p.at[1 : ny + 1, nx + 1].set(0.0)
        p = p.at[0, 1 : nx + 1].set(p[1, 1 : nx + 1])
        p = p.at[ny + 1, 1 : nx + 1].set(p[ny, 1 : nx + 1])
        return p

    return ghosts


def step_pressure_ghosts(grid: Grid) -> PressureBC:
    """Channel domain ghosts plus solid-cell pressure = mean of fluid
    neighbors (Neumann across internal walls, backwards_step-01.cpp:685-740).

    The solid-cell averaging reads only fluid-cell values, so it is
    sweep-order independent and vectorizes exactly.
    """
    nx, ny = grid.nx, grid.ny
    base = channel_pressure_ghosts(grid)
    wE, wW, wN, wS, count = (jnp.asarray(w) for w in grid.solid_neighbor_weights)
    update_mask = jnp.asarray(grid.solid_interior_mask) & (count > 0)
    safe_count = jnp.where(count > 0, count, 1.0)

    def ghosts(p: jnp.ndarray) -> jnp.ndarray:
        p = base(p)
        pE = jnp.roll(p, -1, axis=1)
        pW = jnp.roll(p, 1, axis=1)
        pN = jnp.roll(p, -1, axis=0)
        pS = jnp.roll(p, 1, axis=0)
        avg = (wE * pE + wW * pW + wN * pN + wS * pS) / safe_count
        return jnp.where(update_mask, avg.astype(p.dtype), p)

    return ghosts
