"""Whole-Poisson-solve-in-VMEM (kernels.whole_solve) vs the per-kernel quad
composition (interpret mode on host CPU).

One Pallas call must reproduce the entire tolerance-driven solve that
make_multigrid_poisson(quad_level0=...) runs as pre-kernel + coarse levels +
post-kernel under a lax.while_loop: same cycle counts (+-1 stall-exit cycle
from f32 contraction-order differences in the tail's transfer matmuls) and
fields to f32 roundoff."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu.poisson import multigrid as M


def _interior_noise(shape, ny, nx, seed):
    rng = np.random.default_rng(seed)
    b = np.zeros(shape, np.float32)
    b[1:ny + 1, 1:nx + 1] = rng.standard_normal((ny, nx)).astype(np.float32)
    return b


def test_whole_solve_matches_per_kernel_channel_flavor():
    """Direct solver-level comparison on the channel operator: same
    tolerance criterion, cycle counts within +-1, converged iterate to
    f32 roundoff."""
    from cfd_tpu.kernels.quad import (
        make_quad_post_prolong_smooth,
        make_quad_pre_smooth_restrict,
        quad_dims,
        to_quad,
    )
    from cfd_tpu.kernels.whole_solve import make_quad_whole_solve

    n = 64
    cfg = M.MGConfig(pre_sweeps=2, post_sweeps=1, tol_factor=1e-4)
    problem = M.channel_problem(n, n, 1.0 / n, 1.0 / n)
    shape = (n + 2, n + 2)
    _, _, Hq8, Wqa = quad_dims(shape)
    quad_l0 = (
        make_quad_pre_smooth_restrict(shape, problem, cfg.omega,
                                      cfg.pre_sweeps, (Hq8, Wqa),
                                      interpret=True),
        make_quad_post_prolong_smooth(shape, problem, cfg.omega,
                                      cfg.post_sweeps, (Hq8, Wqa),
                                      interpret=True),
    )
    solve_ref = M.make_multigrid_poisson(
        problem, cfg, dtype=jnp.float32, aligned_io=True, use_pallas=True,
        pallas_interpret=True, quad_level0=quad_l0)
    solve_ws = make_quad_whole_solve(shape, problem, cfg, interpret=True)

    b = to_quad(jnp.asarray(_interior_noise(shape, n, n, seed=5)), shape)
    p0 = jnp.zeros_like(b)
    pa, ita, resa = solve_ref(p0, b)
    pb, itb, resb = solve_ws(p0, b)
    tol = 1e-4 * float(jnp.max(jnp.abs(b)))
    assert float(resa) <= tol and float(resb) <= tol
    assert abs(int(ita) - int(itb)) <= 1, (int(ita), int(itb))
    np.testing.assert_allclose(np.asarray(pb), np.asarray(pa), atol=50 * tol)


def _compare_quad_vs_whole(make, kw, steps=3, names=("u", "v", "p"),
                           atol=1e-4):
    """Trajectory of the quad case with mg_overrides whole_solve=True vs
    the plain quad case (the test_mg_tail comparison harness shape)."""
    from cfd_tpu.solver import Simulation

    ref_case = make(**kw)
    ov = dict(kw.pop("mg_overrides", {}), whole_solve=True)
    ws_case = make(mg_overrides=ov, **kw)
    sim_a = Simulation(ref_case, log=lambda *a: None)
    sim_b = Simulation(ws_case, log=lambda *a: None)
    sa, sb = sim_a.initial_state(), sim_b.initial_state()
    for k in range(steps):
        sa, da = sim_a._step(sa)
        sb, db = sim_b._step(sb)
        ia, ib = int(da.poisson_iters), int(db.poisson_iters)
        # floor-terminated f32 solves of differently-compiled programs
        # legitimately exit a couple of cycles apart: near the roundoff
        # floor the per-cycle contraction hovers at the stall threshold
        # and ulp differences flip exit decisions (honest-stall regime,
        # MGConfig.stall_ratio note) — the contract is the TRAJECTORY
        # below, the cycle band only catches gross divergence
        assert abs(ib - ia) <= max(2, round(0.25 * max(ia, ib))), (k, ia, ib)
    la, lb = sim_a._logical(sa), sim_b._logical(sb)
    for name in names:
        a, b = np.asarray(getattr(la, name)), np.asarray(getattr(lb, name))
        scale = max(1.0, np.abs(a).max())
        np.testing.assert_allclose(b, a, rtol=0, atol=atol * scale,
                                   err_msg=name)


def test_channel_quad_whole_solve_matches_quad():
    from cfd_tpu.cases.channel import make_channel_case

    _compare_quad_vs_whole(
        make_channel_case,
        dict(nx=64, ny=32, dtype=jnp.float32, poisson="multigrid",
             tolerance_factor=1e-5, layout="quad",
             step_kernel_mode="interpret"))


def test_cavity_quad_whole_solve_matches_quad():
    from cfd_tpu.cases.cavity import make_cavity_case

    _compare_quad_vs_whole(
        make_cavity_case,
        dict(n_interior=32, dtype=jnp.float32, poisson="multigrid",
             tolerance_factor=1e-5, final_time=1.0,
             step_kernel_mode="interpret", layout="quad"))


def test_rb_quad_whole_solve_matches_quad():
    """Pure-Neumann flavor: the in-kernel per-cycle mean pin must compose
    with the fused residual exactly as multigrid.solve's pin_mean does."""
    from cfd_tpu.physics.boussinesq import make_rayleigh_benard_case

    _compare_quad_vs_whole(
        make_rayleigh_benard_case,
        dict(nx=48, ny=16, rayleigh=1e5, dtype=jnp.float32,
             tolerance_factor=1e-5, abs_tol=1e-7,
             step_kernel_mode="interpret", layout="quad"),
        names=("u", "v", "p", "T"))


def test_step_quad_whole_solve_matches_quad():
    """Masked flavor: exact masked fine level + full-2D-weight hierarchy
    in-kernel must reproduce make_masked_quad_multigrid_poisson's
    defect-correction trajectory."""
    from cfd_tpu.cases.backwards_step import make_backwards_step_case

    _compare_quad_vs_whole(
        make_backwards_step_case,
        dict(nx=64, ny=16, dtype=jnp.float32, poisson="multigrid",
             tolerance_factor=1e-5, layout="quad",
             smoother_mode="interpret"))


def test_step_whole_solve_requires_quad_path():
    """whole_solve off the quad fast path fails loudly (the masked XLA
    path has no whole-solve twin)."""
    from cfd_tpu.cases.backwards_step import make_backwards_step_case

    with pytest.raises(ValueError, match="quad fast path"):
        make_backwards_step_case(
            nx=64, ny=16, dtype=jnp.float32, poisson="multigrid",
            mg_overrides={"whole_solve": True})


def test_whole_solve_guards_off_quad_path():
    """The separable factories reject whole_solve when the quad kernel
    branch is inactive (f64 / CPU natural path) instead of silently
    running the per-kernel solve — the ADVICE round-2 layout pattern."""
    from cfd_tpu.cases.cavity import make_cavity_case
    from cfd_tpu.physics.boussinesq import make_rayleigh_benard_case

    with pytest.raises(ValueError, match="whole_solve"):
        make_cavity_case(n_interior=32, dtype=jnp.float64,
                         poisson="multigrid",
                         mg_overrides={"whole_solve": True})
    with pytest.raises(ValueError, match="whole_solve"):
        make_rayleigh_benard_case(nx=48, ny=16, dtype=jnp.float64,
                                  mg_overrides={"whole_solve": True})


def test_whole_solve_rejects_shallow_hierarchy():
    """A grid that coarsens only once has no tail to fuse."""
    from cfd_tpu.kernels.whole_solve import make_quad_whole_solve

    n = 16
    cfg = M.MGConfig(min_coarse=4)
    problem = M.cavity_problem(n, n, 1.0 / n, 1.0 / n)
    with pytest.raises(ValueError, match="coarse levels"):
        make_quad_whole_solve((n + 2, n + 2), problem,
                              dataclasses.replace(cfg, min_coarse=8),
                              interpret=True)


def test_auto_whole_solve_policy():
    """The round-3 measured-default policy (auto_whole_solve): whole-solve
    wherever the build succeeds on the real-TPU path, per-kernel fallback
    for interpret mode / manual fusion knobs / build-time rejections, and
    the returned MGConfig reflects the chosen path."""
    from cfd_tpu.kernels.whole_solve import auto_whole_solve

    cfg = M.MGConfig()
    built = object()
    fell_back = object()
    build = lambda: built
    fallback = lambda: fell_back

    def reject():
        raise ValueError("mg whole-solve VMEM estimate too large")

    # Real-TPU default: build wins and the config records it.
    solve, out = auto_whole_solve(cfg, None, False, build, fallback)
    assert solve is built and out.whole_solve

    # Build-time rejection (VMEM cap) falls back, config unchanged.
    solve, out = auto_whole_solve(cfg, None, False, reject, fallback)
    assert solve is fell_back and not out.whole_solve

    # Interpret mode keeps the per-kernel default.
    solve, out = auto_whole_solve(cfg, None, True, build, fallback)
    assert solve is fell_back and not out.whole_solve

    # Any explicit fusion-knob override takes manual control.
    for knob in ({"whole_solve": False}, {"tail_from": 1},
                 {"whole_step": False}):
        solve, out = auto_whole_solve(cfg, knob, False, build, fallback)
        assert solve is fell_back and not out.whole_solve
    # ... but unrelated overrides don't.
    solve, out = auto_whole_solve(cfg, {"pre_sweeps": 3}, False, build,
                                  fallback)
    assert solve is built and out.whole_solve

    # whole_solve=True forced: always the whole kernel (build errors
    # propagate — explicit requests fail loudly).
    solve, out = auto_whole_solve(
        dataclasses.replace(cfg, whole_solve=True),
        {"whole_solve": True}, False, build, fallback)
    assert solve is built and out.whole_solve

    # An active whole_step or tail_from set on the config itself (not via
    # overrides) also keeps manual control.
    solve, out = auto_whole_solve(
        dataclasses.replace(cfg, tail_from=1), None, False, build, fallback)
    assert solve is fell_back


def test_auto_whole_solve_build_reduced():
    """The round-5 composition rung: when the f32 fused build VMEM-rejects,
    auto_whole_solve tries ``build_reduced`` (the bf16-hierarchy whole-solve,
    VERDICT round-4 item 1) before falling back to per-kernel, and the
    returned MGConfig records BOTH the fusion and the coarse dtype. Manual
    knobs and interpret mode never reach the reduced build."""
    from cfd_tpu.kernels.whole_solve import auto_whole_solve

    cfg = M.MGConfig()
    built = object()
    reduced = object()
    fell_back = object()

    def reject():
        raise ValueError("mg whole-solve VMEM estimate too large")

    # f32 rejects -> bf16 fused wins, config records whole_solve + bf16.
    solve, out = auto_whole_solve(cfg, None, False, reject, lambda: fell_back,
                                  build_reduced=lambda: reduced)
    assert solve is reduced
    assert out.whole_solve and out.coarse_dtype == "bfloat16"

    # Both fused builds reject -> per-kernel fallback, config unchanged.
    solve, out = auto_whole_solve(cfg, None, False, reject, lambda: fell_back,
                                  build_reduced=reject)
    assert solve is fell_back and not out.whole_solve
    assert out.coarse_dtype is None

    # f32 build succeeds -> reduced never consulted.
    solve, out = auto_whole_solve(cfg, None, False, lambda: built,
                                  lambda: fell_back,
                                  build_reduced=lambda: reduced)
    assert solve is built and out.coarse_dtype is None

    # Manual fusion knob / interpret mode -> straight to fallback, the
    # reduced build is not silently auto-applied against an explicit ask.
    for kwargs in ({"mg_overrides": {"whole_solve": False}, "interp": False},
                   {"mg_overrides": None, "interp": True}):
        solve, out = auto_whole_solve(cfg, kwargs["mg_overrides"],
                                      kwargs["interp"], reject,
                                      lambda: fell_back,
                                      build_reduced=lambda: reduced)
        assert solve is fell_back and not out.whole_solve
