"""MGConfig.corr_opt — line-searched coarse-grid correction steplength on
the masked defect-correction hierarchies (VERDICT round-3 item 4b hunt).

The masked coarse operator is a non-Galerkin approximation (Neumann-through-
solids weights) of the exact fine operator
(/root/reference/backwards_step-01.cpp:685-739 ghost semantics), so the
correction amplitude along the slowest mode is systematically off; scaling by
alpha = <rc, A1 ec>/<A1 ec, A1 ec> cannot move the fixed point (the update is
residual-driven) but improves the contraction rate. These tests pin the
fixed-point invariance, the quad/XLA seam equivalence, the cycle-count
direction, and the loud guards on paths that don't take the knob."""

import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu.bc import step_pressure_ghosts
from cfd_tpu.cases import make_backwards_step_case
from cfd_tpu.kernels.quad import from_quad, to_quad
from cfd_tpu.poisson import multigrid as M


def _rand_b(g, dtype, seed=0, zero_mean=False):
    rng = np.random.default_rng(seed)
    inter = np.asarray(g.cell_mask)
    b = jnp.asarray(np.where(inter, rng.standard_normal(g.shape), 0), dtype)
    if zero_mean:
        b = b - jnp.where(jnp.asarray(inter), jnp.sum(b) / g.n_fluid, 0.0)
    return b


def test_corr_opt_same_fixed_point_and_not_slower():
    """corr_opt converges to the masked SOR fixed point (the exact
    operator's solution) and does not cost cycles on the step geometry."""
    case = make_backwards_step_case(nx=64, ny=16, final_time=1.0,
                                    tolerance_factor=1e-11, abs_tol=1e-12,
                                    poisson="sor")
    g, c = case.grid, case.coeffs
    cfg = M.MGConfig(tol_factor=1e-11, abs_tol=1e-12)
    mk = lambda cf: M.make_masked_multigrid_poisson(
        g, c, cf, step_pressure_ghosts(g), jnp.float64)
    b = _rand_b(g, jnp.float64)
    p_off, it_off, _ = mk(cfg)(jnp.zeros(g.shape), b)
    import dataclasses

    p_on, it_on, _ = mk(dataclasses.replace(cfg, corr_opt=True))(
        jnp.zeros(g.shape), b)
    p_sor, _, _ = case.poisson_solve(jnp.zeros(g.shape), b)
    fl = np.asarray(g.fluid)
    assert np.abs(np.asarray(p_on - p_sor))[fl].max() < 1e-8
    assert int(it_on) <= int(it_off) + 1


def test_corr_opt_quad_seam_matches_xla_seam():
    """The quad masked builder's corr_opt seam (alpha on the pre-kernel's
    restricted residual, GLOBAL level 1) reproduces the XLA masked path's
    corr_opt seam: same cycles +-1, same iterate to f32 roundoff (the
    corr_opt twin of test_step_quad.test_masked_quad_solve_matches_xla...)."""
    case = make_backwards_step_case(nx=64, ny=16, dtype=jnp.float32,
                                    poisson="multigrid",
                                    tolerance_factor=1e-5,
                                    smoother_mode="off")
    g = case.grid
    cfg = M.MGConfig(tol_factor=1e-5, abs_tol=1e-10, post_sweeps=1,
                     corr_opt=True)
    solve_q = M.make_masked_quad_multigrid_poisson(g, case.coeffs, cfg,
                                                   interpret=True)
    solve_x = M.make_masked_multigrid_poisson(
        g, case.coeffs, cfg, step_pressure_ghosts(g), dtype=jnp.float32,
        smoother_mode="off")
    b = _rand_b(g, jnp.float32, seed=7, zero_mean=True)
    guess = jnp.zeros(g.shape, jnp.float32)
    p_x, it_x, res_x = solve_x(guess, b)
    p4, it_q, res_q = solve_q(to_quad(guess, g.shape), to_quad(b, g.shape))
    p_q = from_quad(p4, g.shape)
    assert abs(int(it_q) - int(it_x)) <= 1
    np.testing.assert_allclose(np.asarray(p_q), np.asarray(p_x), atol=5e-5)
    assert abs(float(res_q) - float(res_x)) < 0.5 * max(float(res_x), 1e-30)


def test_corr_opt_guards():
    """Separable hierarchies and the sharded builders reject corr_opt
    loudly; the MASKED fused whole_solve honors it (the production step
    size auto-fuses, so the knob must live in-kernel to matter)."""
    from cfd_tpu.cases import make_cavity_case

    with pytest.raises(ValueError, match="corr_opt"):
        make_cavity_case(n_interior=32, poisson="multigrid",
                         mg_overrides={"corr_opt": True})
    case = make_backwards_step_case(nx=64, ny=16, dtype=jnp.float32,
                                    poisson="multigrid",
                                    tolerance_factor=1e-5,
                                    smoother_mode="off")
    cfg = M.MGConfig(tol_factor=1e-5, corr_opt=True)
    from cfd_tpu.kernels.whole_solve import (make_quad_step_whole_solve,
                                             make_quad_whole_solve)

    # masked fused builder ACCEPTS the knob (equivalence pinned below)
    assert make_quad_step_whole_solve(case.grid, case.coeffs, cfg,
                                      interpret=True) is not None
    # separable fused builder rejects it
    prob = M.cavity_problem(32, 32, 1 / 32, 1 / 32)
    with pytest.raises(ValueError, match="corr_opt"):
        make_quad_whole_solve((34, 34), prob, cfg)


def test_corr_opt_fused_matches_per_kernel_quad():
    """The fused masked whole_solve's in-kernel corr_opt (alpha at the
    exact/weighted seam) reproduces the per-kernel quad builder's corr_opt
    trajectory: same cycles +-1, same iterate to f32 roundoff."""
    case = make_backwards_step_case(nx=64, ny=16, dtype=jnp.float32,
                                    poisson="multigrid",
                                    tolerance_factor=1e-5,
                                    smoother_mode="off")
    g = case.grid
    cfg = M.MGConfig(tol_factor=1e-5, abs_tol=1e-10, post_sweeps=1,
                     corr_opt=True)
    from cfd_tpu.kernels.whole_solve import make_quad_step_whole_solve

    solve_f = make_quad_step_whole_solve(g, case.coeffs, cfg, interpret=True)
    solve_q = M.make_masked_quad_multigrid_poisson(g, case.coeffs, cfg,
                                                   interpret=True)
    b = _rand_b(g, jnp.float32, seed=7, zero_mean=True)
    guess4 = to_quad(jnp.zeros(g.shape, jnp.float32), g.shape)
    b4 = to_quad(b, g.shape)
    p4_q, it_q, res_q = solve_q(guess4, b4)
    p4_f, it_f, res_f = solve_f(guess4, b4)
    assert abs(int(it_f) - int(it_q)) <= 1
    np.testing.assert_allclose(np.asarray(from_quad(p4_f, g.shape)),
                               np.asarray(from_quad(p4_q, g.shape)),
                               atol=5e-5)


def test_corr_opt_auto_whole_solve_fuses():
    """corr_opt is NOT a manual fusion knob: the masked fused path honors
    it in-kernel, so auto_whole_solve may still auto-enable the fused solve
    when only corr_opt is overridden."""
    from cfd_tpu.kernels.whole_solve import auto_whole_solve

    solve, mg = auto_whole_solve(
        M.MGConfig(tol_factor=1e-5, corr_opt=True), {"corr_opt": True},
        False,
        build=lambda: "fused",
        fallback=lambda: (_ for _ in ()).throw(AssertionError("fell back")))
    assert solve == "fused" and mg.whole_solve

    # and the quad step factory end-to-end: corr_opt override builds
    case = make_backwards_step_case(nx=64, ny=16, dtype=jnp.float32,
                                    poisson="multigrid",
                                    tolerance_factor=1e-5,
                                    layout="quad", smoother_mode="interpret",
                                    mg_overrides={"corr_opt": True})
    assert case.step_kernels is not None
