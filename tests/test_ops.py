import numpy as np
import jax.numpy as jnp

import oracle
from cfd_tpu.cases.backwards_step import make_backwards_step_case
from cfd_tpu.grid import Grid
from cfd_tpu.ops.stencil import (
    StencilCoeffs,
    divergence,
    interpolate_to_centers,
    poisson_source,
    predictor,
    pressure_correction,
    vorticity_centers,
)

RNG = np.random.default_rng(0)


def rand_fields(shape):
    u = RNG.normal(size=shape)
    v = RNG.normal(size=shape)
    # structural padding invariants: u col nx+1, v row ny+1 are zero
    u[:, -1] = 0.0
    v[-1, :] = 0.0
    return u, v


def test_predictor_matches_loops():
    nx, ny = 12, 9
    g = Grid.regular(nx, ny, 3.0, 1.0)
    c = StencilCoeffs(dx=g.dx, dy=g.dy, dt=1e-3, viscosity=0.01)
    u, v = rand_fields(g.shape)
    us, vs = predictor(jnp.asarray(u), jnp.asarray(v), c,
                       jnp.asarray(g.u_valid_mask), jnp.asarray(g.v_valid_mask))
    us_o, vs_o = oracle.predictor_loops(u, v, g.dx, g.dy, c.dt, c.viscosity, nx, ny)
    np.testing.assert_allclose(np.asarray(us), us_o, atol=1e-13)
    np.testing.assert_allclose(np.asarray(vs), vs_o, atol=1e-13)


def test_predictor_masked_matches_loops():
    case = make_backwards_step_case(nx=24, ny=12)
    g, c = case.grid, case.coeffs
    u, v = rand_fields(g.shape)
    us, vs = predictor(jnp.asarray(u), jnp.asarray(v), c,
                       jnp.asarray(g.u_valid_mask), jnp.asarray(g.v_valid_mask))
    us_o, vs_o = oracle.predictor_loops(u, v, g.dx, g.dy, c.dt, c.viscosity,
                                        g.nx, g.ny, fluid=g.fluid)
    np.testing.assert_allclose(np.asarray(us), us_o, atol=1e-13)
    np.testing.assert_allclose(np.asarray(vs), vs_o, atol=1e-13)


def test_source_and_divergence_match_loops():
    nx, ny = 10, 7
    g = Grid.regular(nx, ny, 2.0, 1.0)
    c = StencilCoeffs(dx=g.dx, dy=g.dy, dt=2e-3, viscosity=0.01, density=1.3)
    u, v = rand_fields(g.shape)
    cell = jnp.asarray(g.cell_mask)
    b = poisson_source(jnp.asarray(u), jnp.asarray(v), c, cell,
                       remove_mean=True, n_cells=g.n_fluid)
    b_o = oracle.source_loops(u, v, g.dx, g.dy, c.dt, c.density, nx, ny, remove_mean=True)
    np.testing.assert_allclose(np.asarray(b), b_o, atol=1e-12)

    d = divergence(jnp.asarray(u), jnp.asarray(v), c, cell)
    d_o = oracle.source_loops(u, v, g.dx, g.dy, 1.0, 1.0, nx, ny)
    np.testing.assert_allclose(np.asarray(d), d_o, atol=1e-12)


def test_corrector_matches_loops():
    nx, ny = 11, 8
    g = Grid.regular(nx, ny, 1.0, 1.0)
    c = StencilCoeffs(dx=g.dx, dy=g.dy, dt=1e-3, viscosity=0.01, density=0.9)
    us, vs = rand_fields(g.shape)
    p = RNG.normal(size=g.shape)
    for cavity_form in (False, True):
        u2, v2 = pressure_correction(
            jnp.asarray(us), jnp.asarray(vs), jnp.asarray(p), c,
            jnp.asarray(g.u_valid_mask), jnp.asarray(g.v_valid_mask),
            u_else=jnp.zeros(g.shape), v_else=jnp.zeros(g.shape),
            cavity_form=cavity_form,
        )
        u_o, v_o = oracle.corrector_loops(us, vs, p, g.dx, g.dy, c.dt, c.density,
                                          nx, ny, cavity_form)
        np.testing.assert_allclose(np.asarray(u2), u_o, atol=1e-13)
        np.testing.assert_allclose(np.asarray(v2), v_o, atol=1e-13)


def test_interpolation_matches_loops():
    nx, ny = 9, 6
    g = Grid.regular(nx, ny)
    u, v = rand_fields(g.shape)
    uc, vc = interpolate_to_centers(jnp.asarray(u), jnp.asarray(v), jnp.asarray(g.cell_mask))
    uc_o = np.zeros(g.shape)
    vc_o = np.zeros(g.shape)
    for j in range(1, ny + 1):
        for i in range(1, nx + 1):
            uc_o[j, i] = 0.5 * (u[j, i - 1] + u[j, i])
            vc_o[j, i] = 0.5 * (v[j - 1, i] + v[j, i])
    np.testing.assert_allclose(np.asarray(uc), uc_o, atol=1e-14)
    np.testing.assert_allclose(np.asarray(vc), vc_o, atol=1e-14)


def test_vorticity_matches_loops():
    nx, ny = 8, 8
    g = Grid.regular(nx, ny)
    c = StencilCoeffs(dx=g.dx, dy=g.dy, dt=1.0, viscosity=0.0)
    uc = RNG.normal(size=g.shape)
    vc = RNG.normal(size=g.shape)
    w = vorticity_centers(jnp.asarray(uc), jnp.asarray(vc), g, c)
    # loop transcription of the writer's vorticity (cavity-01.cpp:184-224)
    idx = 1.0 / g.dx
    idy = 1.0 / g.dy
    w_o = np.zeros(g.shape)
    for j in range(1, ny + 1):
        for i in range(1, nx + 1):
            if i == 1:
                dvdx = (vc[j, i + 1] - vc[j, i]) * idx
            elif i == nx:
                dvdx = (vc[j, i] - vc[j, i - 1]) * idx
            else:
                dvdx = (vc[j, i + 1] - vc[j, i - 1]) * idx * 0.5
            if j == 1:
                dudy = (uc[j + 1, i] - uc[j, i]) * idy
            elif j == ny:
                dudy = (uc[j, i] - uc[j - 1, i]) * idy
            else:
                dudy = (uc[j + 1, i] - uc[j - 1, i]) * idy * 0.5
            w_o[j, i] = dvdx - dudy
    np.testing.assert_allclose(np.asarray(w), w_o, atol=1e-13)
