"""Whole-TIME-STEP-in-VMEM (kernels.whole_step) vs the composed quad path
(interpret mode on host CPU).

One Pallas call per step must reproduce the tentative-carry kernel + mean
removal + tolerance-driven solve composition: same cycle counts (+-1
stall-exit cycle from f32 contraction-order differences) and fields to f32
roundoff, for all four physics flavors."""

import jax.numpy as jnp
import numpy as np
import pytest


def _compare_quad_vs_whole_step(make, kw, steps=3, names=("u", "v", "p"),
                                atol=1e-4):
    from cfd_tpu.solver import Simulation

    ref_case = make(**kw)
    ov = dict(kw.pop("mg_overrides", {}), whole_step=True)
    ws_case = make(mg_overrides=ov, **kw)
    assert ws_case.whole_step_kernel is not None or ws_case.custom_step
    sim_a = Simulation(ref_case, log=lambda *a: None)
    sim_b = Simulation(ws_case, log=lambda *a: None)
    sa, sb = sim_a.initial_state(), sim_b.initial_state()
    for k in range(steps):
        sa, da = sim_a._step(sa)
        sb, db = sim_b._step(sb)
        ia, ib = int(da.poisson_iters), int(db.poisson_iters)
        # see test_whole_solve._compare_quad_vs_whole: floor-terminated
        # f32 solves may exit a couple of cycles apart across programs
        assert abs(ib - ia) <= max(2, round(0.25 * max(ia, ib))), (k, ia, ib)
    la, lb = sim_a._logical(sa), sim_b._logical(sb)
    for name in names:
        a, b = np.asarray(getattr(la, name)), np.asarray(getattr(lb, name))
        scale = max(1.0, np.abs(a).max())
        np.testing.assert_allclose(b, a, rtol=0, atol=atol * scale,
                                   err_msg=name)


def test_cavity_whole_step_matches_quad():
    from cfd_tpu.cases.cavity import make_cavity_case

    _compare_quad_vs_whole_step(
        make_cavity_case,
        dict(n_interior=32, dtype=jnp.float32, poisson="multigrid",
             tolerance_factor=1e-5, final_time=1.0,
             step_kernel_mode="interpret", layout="quad"))


def test_channel_whole_step_matches_quad():
    from cfd_tpu.cases.channel import make_channel_case

    _compare_quad_vs_whole_step(
        make_channel_case,
        dict(nx=64, ny=32, dtype=jnp.float32, poisson="multigrid",
             tolerance_factor=1e-5, layout="quad",
             step_kernel_mode="interpret"))


def test_rb_whole_step_matches_quad():
    """Pure-Neumann flavor: carry + T transport + pinned solve in one
    kernel."""
    from cfd_tpu.physics.boussinesq import make_rayleigh_benard_case

    _compare_quad_vs_whole_step(
        make_rayleigh_benard_case,
        dict(nx=48, ny=16, rayleigh=1e5, dtype=jnp.float32,
             tolerance_factor=1e-5, abs_tol=1e-7,
             step_kernel_mode="interpret", layout="quad"),
        names=("u", "v", "p", "T"))


def test_step_whole_step_matches_quad():
    """Masked flavor: masked carry + fluid-mean removal + the exact masked
    defect-correction solve in one kernel."""
    from cfd_tpu.cases.backwards_step import make_backwards_step_case

    _compare_quad_vs_whole_step(
        make_backwards_step_case,
        dict(nx=64, ny=16, dtype=jnp.float32, poisson="multigrid",
             tolerance_factor=1e-5, layout="quad",
             smoother_mode="interpret"))


def test_whole_step_resume_roundtrip(tmp_path):
    """Checkpoint written by the whole-step path resumes bitwise on the
    whole-step path (the carried state layout is the plain quad carry)."""
    from cfd_tpu.cases.cavity import make_cavity_case
    from cfd_tpu.io.checkpoint import CheckpointManager
    from cfd_tpu.solver import Simulation

    kw = dict(n_interior=32, dtype=jnp.float32, poisson="multigrid",
              tolerance_factor=1e-5, final_time=1.0,
              step_kernel_mode="interpret", layout="quad",
              mg_overrides={"whole_step": True})
    case = make_cavity_case(**kw)
    sim = Simulation(case, log=lambda *a: None)
    st = sim.initial_state()
    for _ in range(2):
        st, _ = sim._step(st)
    mgr = CheckpointManager(tmp_path)
    mgr.save(sim._logical(st), step=2)
    st2, step = mgr.restore_latest(case)
    assert step == 2
    # drive both two more steps through a fresh whole-step sim
    case2 = make_cavity_case(**kw)
    sim2 = Simulation(case2, log=lambda *a: None)
    stb = case2.align_state(st2)
    for _ in range(2):
        st, _ = sim._step(st)
        stb, _ = sim2._step(stb)
    la, lb = sim._logical(st), sim2._logical(stb)
    np.testing.assert_allclose(np.asarray(lb.u), np.asarray(la.u),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lb.p), np.asarray(la.p),
                               rtol=0, atol=1e-5)


def test_whole_step_guard_off_quad_path():
    from cfd_tpu.cases.cavity import make_cavity_case

    with pytest.raises(ValueError, match="whole_step"):
        make_cavity_case(n_interior=32, dtype=jnp.float64,
                         poisson="multigrid",
                         mg_overrides={"whole_step": True})


def test_whole_step_size_ceiling_native():
    """The probe-derived toolchain ceiling (VERDICT round-3 item 5): a
    native whole-step build past 512^2 must raise at FACTORY time instead
    of crashing the TPU compile helper (tools/wstep_probe.py measured the
    axon tpu_compile_helper dying with HTTP 500 at >= 768^2)."""
    from cfd_tpu.cases.cavity import make_cavity_case
    from cfd_tpu.kernels.whole_step import (WHOLE_STEP_MAX_PADDED_CELLS,
                                            make_quad_whole_step_cavity)
    from cfd_tpu.poisson.multigrid import MGConfig, cavity_problem

    case = make_cavity_case(n_interior=768, dtype=jnp.float32,
                            poisson="multigrid", layout="quad",
                            step_kernel_mode="interpret")
    g = case.grid
    problem = cavity_problem(g.nx, g.ny, g.dx, g.dy)
    cfg = MGConfig(tol_factor=1e-6, abs_tol=0.0, post_sweeps=1)
    with pytest.raises(ValueError, match="compile helper"):
        make_quad_whole_step_cavity(g.shape, problem, case.coeffs, cfg,
                                    interpret=False)
    # interpret mode has no native toolchain and no ceiling
    make_quad_whole_step_cavity(g.shape, problem, case.coeffs, cfg,
                                interpret=True)
    # the measured-good 512^2 size sits exactly at the enforced ceiling
    case512 = make_cavity_case(n_interior=512, dtype=jnp.float32,
                               poisson="multigrid", layout="quad",
                               step_kernel_mode="interpret")
    g5 = case512.grid
    from cfd_tpu.kernels.quad import quad_dims

    _, _, hq8, wqa = quad_dims(g5.shape)
    assert 4 * hq8 * wqa <= WHOLE_STEP_MAX_PADDED_CELLS
    make_quad_whole_step_cavity(
        g5.shape, cavity_problem(g5.nx, g5.ny, g5.dx, g5.dy),
        case512.coeffs, cfg, interpret=False)
