import numpy as np
import jax.numpy as jnp

import oracle
from cfd_tpu.bc import channel_pressure_ghosts, step_pressure_ghosts
from cfd_tpu.cases.backwards_step import make_backwards_step_case
from cfd_tpu.grid import Grid, optimal_omega
from cfd_tpu.ops.stencil import StencilCoeffs
from cfd_tpu.poisson.sor import SORConfig, make_eps_neumann_poisson, make_ghost_poisson

RNG = np.random.default_rng(2)


def interior_source(grid, remove_mean=False):
    b = np.zeros(grid.shape)
    b[1 : grid.ny + 1, 1 : grid.nx + 1] = RNG.normal(size=(grid.ny, grid.nx))
    if remove_mean:
        b[1 : grid.ny + 1, 1 : grid.nx + 1] -= b[1 : grid.ny + 1, 1 : grid.nx + 1].mean()
    return b


def test_eps_neumann_converges_to_lexicographic_fixed_point():
    n = 15
    g = Grid.regular(n, n)
    c = StencilCoeffs(dx=g.dx, dy=g.dy, dt=1.0, viscosity=0.0)
    omega = optimal_omega(n)
    cfg = SORConfig(omega=omega, tol_factor=1e-12, max_iters=20000)
    b = interior_source(g)
    solve = make_eps_neumann_poisson(g, c, cfg)
    p, iters, res = solve(jnp.zeros(g.shape), jnp.asarray(b))
    assert float(res) <= 1e-12 * np.abs(b).max()
    p_o, _, _ = oracle.sor_eps_lexicographic(b, g.dx, omega, 1e-12, 20000, n, n)
    # same linear system -> same fixed point, independent of sweep ordering
    np.testing.assert_allclose(np.asarray(p), p_o, atol=1e-9)


def test_ghost_poisson_matches_lexicographic_fixed_point():
    nx, ny = 12, 8
    g = Grid.regular(nx, ny, 3.0, 1.0)
    c = StencilCoeffs(dx=g.dx, dy=g.dy, dt=1.0, viscosity=0.0)
    omega = optimal_omega(nx, ny)
    cfg = SORConfig(omega=omega, tol_factor=1e-12, abs_tol=1e-13, max_iters=50000)
    b = interior_source(g)
    solve = make_ghost_poisson(g, c, cfg, channel_pressure_ghosts(g))
    p, iters, res = solve(jnp.zeros(g.shape), jnp.asarray(b))
    p_o, _, _ = oracle.sor_ghost_lexicographic(
        np.zeros(g.shape), b, g.dx, g.dy, omega, 1e-12, 1e-13, 50000, nx, ny,
        lambda q: oracle.channel_pressure_ghosts_loops(q, nx, ny),
    )
    np.testing.assert_allclose(np.asarray(p), p_o, atol=1e-8)


def test_masked_ghost_poisson_matches_lexicographic():
    case = make_backwards_step_case(nx=24, ny=12)
    g, c = case.grid, case.coeffs
    omega = optimal_omega(g.nx, g.ny)
    cfg = SORConfig(omega=omega, tol_factor=1e-12, abs_tol=1e-13, max_iters=50000)
    b = np.zeros(g.shape)
    m = g.cell_mask
    b[m] = RNG.normal(size=m.sum())
    b[m] -= b[m].mean()
    solve = make_ghost_poisson(g, c, cfg, step_pressure_ghosts(g))
    p, iters, res = solve(jnp.zeros(g.shape), jnp.asarray(b))
    p_o, _, _ = oracle.sor_ghost_lexicographic(
        np.zeros(g.shape), b, g.dx, g.dy, omega, 1e-12, 1e-13, 50000, g.nx, g.ny,
        lambda q: oracle.step_pressure_ghosts_loops(q, g.nx, g.ny, g.fluid),
        fluid=g.fluid,
    )
    # compare on fluid cells (solid-cell values are extrapolation artifacts)
    np.testing.assert_allclose(np.asarray(p)[m], p_o[m], atol=1e-8)


def test_warm_start_reduces_iterations():
    nx, ny = 12, 8
    g = Grid.regular(nx, ny, 3.0, 1.0)
    c = StencilCoeffs(dx=g.dx, dy=g.dy, dt=1.0, viscosity=0.0)
    cfg = SORConfig(omega=optimal_omega(nx, ny), tol_factor=1e-10, abs_tol=1e-12, max_iters=50000)
    b = interior_source(g)
    solve = make_ghost_poisson(g, c, cfg, channel_pressure_ghosts(g))
    p, it_cold, _ = solve(jnp.zeros(g.shape), jnp.asarray(b))
    _, it_warm, _ = solve(p, jnp.asarray(b))
    assert int(it_warm) < int(it_cold)


def test_check_every_amortization_same_solution():
    n = 15
    g = Grid.regular(n, n)
    c = StencilCoeffs(dx=g.dx, dy=g.dy, dt=1.0, viscosity=0.0)
    b = interior_source(g)
    cfg1 = SORConfig(omega=optimal_omega(n), tol_factor=1e-10, max_iters=20000, check_every=1)
    cfg8 = SORConfig(omega=optimal_omega(n), tol_factor=1e-10, max_iters=20000, check_every=8)
    p1, _, r1 = make_eps_neumann_poisson(g, c, cfg1)(jnp.zeros(g.shape), jnp.asarray(b))
    p8, _, r8 = make_eps_neumann_poisson(g, c, cfg8)(jnp.zeros(g.shape), jnp.asarray(b))
    tol = 1e-10 * np.abs(b).max()
    assert float(r1) <= tol and float(r8) <= tol
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=1e-7)
