"""Quad-layout backward-facing step fast path (VERDICT round-2 item 2b):
interpret-mode equivalence of the fused masked quad kernels and the
tentative-carry step against the XLA masked path."""

import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu.cases.backwards_step import make_backwards_step_case
from cfd_tpu.kernels.quad import from_quad, quad_dims, to_quad
from cfd_tpu.poisson import multigrid as M
from cfd_tpu.solver import Simulation, make_step

KW = dict(nx=64, ny=16, dtype=jnp.float32, poisson="multigrid",
          tolerance_factor=1e-5)


def quad_case(**extra):
    return make_backwards_step_case(layout="quad", smoother_mode="interpret",
                                    **KW, **extra)


def xla_case(**extra):
    return make_backwards_step_case(smoother_mode="off", **KW, **extra)


def test_factory_gates():
    """layout='auto' on CPU keeps the XLA/natural path; layout='quad'
    without the interpret opt-in raises off-TPU."""
    c = make_backwards_step_case(**KW)
    assert c.step_kernels is None and not c.carry_tentative
    with pytest.raises(ValueError, match="layout"):
        make_backwards_step_case(layout="quad", **KW)
    q = quad_case()
    assert q.carry_tentative and q.step_kernels is not None


def test_masked_quad_solve_matches_xla_solver():
    """make_masked_quad_multigrid_poisson reproduces the XLA
    defect-correction solver: same cycle counts, same iterate (the masked
    twin of test_kernels.test_masked_mg_fused_smoother_matches_xla_solver)."""
    off = xla_case()
    g = off.grid
    mg = M.MGConfig(tol_factor=1e-5, abs_tol=1e-10, post_sweeps=1)
    solve_q = M.make_masked_quad_multigrid_poisson(g, off.coeffs, mg,
                                                   interpret=True)
    # XLA reference with the SAME V(2,1) config
    from cfd_tpu.bc import step_pressure_ghosts

    solve_x = M.make_masked_multigrid_poisson(
        g, off.coeffs, mg, step_pressure_ghosts(g), dtype=jnp.float32,
        smoother_mode="off")

    rng = np.random.default_rng(7)
    inter = np.asarray(g.cell_mask)
    b = jnp.asarray(np.where(inter, rng.standard_normal(g.shape), 0),
                    jnp.float32)
    b = b - jnp.where(jnp.asarray(inter), jnp.sum(b) / g.n_fluid, 0.0)
    guess = jnp.zeros(g.shape, jnp.float32)
    p_x, it_x, res_x = solve_x(guess, b)

    b4 = to_quad(b, g.shape)
    p4, it_q, res_q = solve_q(to_quad(guess, g.shape), b4)
    p_q = from_quad(p4, g.shape)
    # +-1 cycle: cross-program FMA contraction ulps at the f32 stall exit
    # (see tests/test_quad_sharded.py) — the iterates still agree
    assert abs(int(it_q) - int(it_x)) <= 1
    np.testing.assert_allclose(np.asarray(p_q), np.asarray(p_x), atol=5e-5)
    assert abs(float(res_q) - float(res_x)) < 0.5 * max(float(res_x), 1e-30)


@pytest.mark.parametrize("steps", [5])
def test_step_quad_trajectory_matches_xla(steps):
    """The tentative-carry quad step trajectory matches the masked XLA step
    to f32 roundoff accumulation (same contract as the cavity/channel quad
    tests), including the fluid-only source mean removal."""
    cq = quad_case()
    cx = xla_case()
    simq = Simulation(cq, log=lambda *a: None)
    simx = Simulation(cx, log=lambda *a: None)
    sq = simq.initial_state()
    sx = simx.initial_state()
    for _ in range(steps):
        sq, dq = simq._step(sq)
        sx, dx = simx._step(sx)
    lq = simq._logical(sq)
    for name in ("u", "v", "p"):
        a = np.asarray(getattr(sx, name))
        b = np.asarray(getattr(lq, name))
        scale = max(1.0, float(np.abs(a).max()))
        np.testing.assert_allclose(b, a, rtol=0, atol=5e-5 * scale,
                                   err_msg=name)
    # statistics agree (fluid-masked reductions)
    rq = simq.statistics(sq)
    rx = simx.statistics(sx)
    for k in ("max_divergence", "avg_kinetic_energy"):
        assert abs(rq[k] - rx[k]) <= 1e-4 * max(1.0, abs(rx[k])), (k, rq, rx)


def test_step_quad_resume_roundtrip():
    """unalign (corrector) then align (inverse correction on valid faces)
    keeps the resumed trajectory on the original one to f32 roundoff — the
    resume contract (the step twin of
    test_quad.test_quad_tentative_resume_roundtrip; raw carried ghost
    entries are not compared — the fused kernel only reads valid faces)."""
    case = quad_case()
    sim = Simulation(case, log=lambda *a: None)
    s = sim.initial_state()
    for _ in range(3):
        s, _ = sim._step(s)
    s_resumed = case.align_state(case.unalign_state(s))
    for _ in range(2):
        s, _ = sim._step(s)
        s_resumed, _ = sim._step(s_resumed)
    a = case.unalign_state(s)
    b = case.unalign_state(s_resumed)
    np.testing.assert_allclose(np.asarray(b.u), np.asarray(a.u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(b.v), np.asarray(a.v), atol=1e-5)
    np.testing.assert_allclose(np.asarray(b.p), np.asarray(a.p), atol=1e-4)
