"""Fused quad Rayleigh-Benard step (VERDICT round-2 item 3): interpret-mode
equivalence of the tentative-carry kernel + pin-mean quad Poisson against
the whole-array XLA custom step."""

import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu.physics.boussinesq import make_rayleigh_benard_case
from cfd_tpu.solver import Simulation

KW = dict(nx=48, ny=16, rayleigh=1e5, dtype=jnp.float32,
          tolerance_factor=1e-5, abs_tol=1e-7)


def test_factory_gates():
    c = make_rayleigh_benard_case(**KW)  # CPU auto -> XLA path
    assert not c.carry_tentative
    q = make_rayleigh_benard_case(step_kernel_mode="interpret",
                                  layout="quad", **KW)
    assert q.carry_tentative and q.align_state is not None


@pytest.mark.parametrize("steps", [5])
def test_rb_quad_trajectory_matches_xla(steps):
    """Quad tentative-carry trajectory (u, v, p, T) == XLA custom step to
    f32 roundoff accumulation; Poisson cycle counts within the stall-exit
    ulp band."""
    cx = make_rayleigh_benard_case(**KW)
    cq = make_rayleigh_benard_case(step_kernel_mode="interpret",
                                   layout="quad", **KW)
    simx = Simulation(cx, log=lambda *a: None)
    simq = Simulation(cq, log=lambda *a: None)
    sx = simx.initial_state()
    sq = simq.initial_state()
    for _ in range(steps):
        sx, dx = simx._step(sx)
        sq, dq = simq._step(sq)
        assert abs(int(dq.poisson_iters) - int(dx.poisson_iters)) <= 1
    lq = simq._logical(sq)
    for name in ("u", "v", "p", "T"):
        a = np.asarray(getattr(sx, name))
        b = np.asarray(getattr(lq, name))
        scale = max(1.0, float(np.abs(a).max()))
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-4 * scale,
                                   err_msg=name)
    # Nusselt diagnostics agree through the logical conversion
    rx = simx.statistics(sx)
    rq = simq.statistics(sq)
    for k in ("nusselt_volume", "avg_kinetic_energy", "temperature_max"):
        assert abs(rq[k] - rx[k]) <= 1e-3 * max(1.0, abs(rx[k])), (k, rq, rx)


@pytest.mark.parametrize("quad", [False, True])
def test_rb_extrapolated_warm_start_matches_plain(quad):
    """extrapolate_warm_start only changes the Poisson INITIAL GUESS (the
    solve stays tolerance-enforced), so the trajectory must track the
    plain-warm-start case to solver tolerance. (Cycle counts are NOT
    asserted: in the noise-seeded early transient the extrapolation can
    cost a cycle — e.g. 12 vs 9 over 6 steps at this 48x16 config — which
    is why the factory default stays False until the production-size TPU
    measurement says otherwise.)"""
    mk = dict(KW)
    if quad:
        mk.update(step_kernel_mode="interpret", layout="quad")
    cp = make_rayleigh_benard_case(**mk)
    ce = make_rayleigh_benard_case(extrapolate_warm_start=True, **mk)
    assert ce.extrapolate_warm_start
    simp = Simulation(cp, log=lambda *a: None)
    sime = Simulation(ce, log=lambda *a: None)
    sp = simp.initial_state()
    se = sime.initial_state()
    for _ in range(6):
        sp, _ = simp._step(sp)
        se, _ = sime._step(se)
    lp, le = simp._logical(sp), sime._logical(se)
    assert le.p_prev is not None
    for name in ("u", "v", "p", "T"):
        a = np.asarray(getattr(lp, name))
        b = np.asarray(getattr(le, name))
        scale = max(1.0, float(np.abs(a).max()))
        np.testing.assert_allclose(b, a, rtol=0, atol=2e-4 * scale,
                                   err_msg=name)


def test_rb_warm_start_resume_roundtrip():
    """unalign/align roundtrips the p_prev slot (previous pressure on both
    sides of the boundary, ADVICE round-2 item 3 convention)."""
    case = make_rayleigh_benard_case(step_kernel_mode="interpret",
                                     layout="quad",
                                     extrapolate_warm_start=True, **KW)
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
    for name in ("u", "v", "p", "T", "p_prev"):
        np.testing.assert_allclose(np.asarray(getattr(b, name)),
                                   np.asarray(getattr(a, name)),
                                   rtol=0, atol=2e-4, err_msg=name)


def test_rb_warm_start_whole_step_rejected():
    with pytest.raises(ValueError, match="whole_step"):
        make_rayleigh_benard_case(step_kernel_mode="interpret",
                                  layout="quad", extrapolate_warm_start=True,
                                  mg_overrides={"whole_step": True}, **KW)


def test_rb_quad_resume_roundtrip():
    """unalign/align keeps the resumed trajectory on the original one."""
    case = make_rayleigh_benard_case(step_kernel_mode="interpret",
                                     layout="quad", **KW)
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
    for name in ("u", "v", "p", "T"):
        np.testing.assert_allclose(np.asarray(getattr(b, name)),
                                   np.asarray(getattr(a, name)),
                                   rtol=0, atol=2e-4, err_msg=name)
