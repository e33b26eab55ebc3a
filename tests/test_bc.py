import numpy as np
import jax.numpy as jnp

import oracle
from cfd_tpu.bc import (
    channel_bc,
    channel_pressure_ghosts,
    lid_cavity_bc,
    step_bc,
    step_pressure_ghosts,
)
from cfd_tpu.cases.backwards_step import make_backwards_step_case
from cfd_tpu.grid import Grid

RNG = np.random.default_rng(1)


def test_cavity_bc_matches_loops():
    g = Grid.regular(7, 7)
    u = RNG.normal(size=g.shape)
    v = RNG.normal(size=g.shape)
    bu, bv = lid_cavity_bc(g, 1.5)(jnp.asarray(u), jnp.asarray(v))
    ou, ov = oracle.cavity_bc_loops(u, v, g.nx, g.ny, 1.5)
    np.testing.assert_allclose(np.asarray(bu), ou, atol=1e-15)
    np.testing.assert_allclose(np.asarray(bv), ov, atol=1e-15)


def test_channel_bc_matches_loops():
    g = Grid.regular(9, 5, 3.0, 1.0)
    u = RNG.normal(size=g.shape)
    v = RNG.normal(size=g.shape)
    bu, bv = channel_bc(g, 2.0)(jnp.asarray(u), jnp.asarray(v))
    ou, ov = oracle.channel_bc_loops(u, v, g.nx, g.ny, 2.0)
    np.testing.assert_allclose(np.asarray(bu), ou, atol=1e-15)
    np.testing.assert_allclose(np.asarray(bv), ov, atol=1e-15)


def test_step_bc_matches_loops():
    case = make_backwards_step_case(nx=24, ny=12)
    g = case.grid
    inlet_j_max = int(1.0 / g.dy)
    u = RNG.normal(size=g.shape)
    v = RNG.normal(size=g.shape)
    bu, bv = step_bc(g, 1.0, inlet_j_max)(jnp.asarray(u), jnp.asarray(v))
    ou, ov = oracle.step_bc_loops(u, v, g.nx, g.ny, 1.0, inlet_j_max, g.fluid)
    np.testing.assert_allclose(np.asarray(bu), ou, atol=1e-15)
    np.testing.assert_allclose(np.asarray(bv), ov, atol=1e-15)


def test_channel_pressure_ghosts_match_loops():
    g = Grid.regular(9, 5, 3.0, 1.0)
    p = RNG.normal(size=g.shape)
    gp = channel_pressure_ghosts(g)(jnp.asarray(p))
    op = oracle.channel_pressure_ghosts_loops(p.copy(), g.nx, g.ny)
    np.testing.assert_allclose(np.asarray(gp), op, atol=1e-15)


def test_step_pressure_ghosts_match_loops():
    case = make_backwards_step_case(nx=24, ny=12)
    g = case.grid
    p = RNG.normal(size=g.shape)
    gp = step_pressure_ghosts(g)(jnp.asarray(p))
    op = oracle.step_pressure_ghosts_loops(p.copy(), g.nx, g.ny, g.fluid)
    np.testing.assert_allclose(np.asarray(gp), op, atol=1e-15)
