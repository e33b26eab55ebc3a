"""Fused multigrid coarse tail (kernels.mg_tail) vs the per-level path
(interpret mode on host CPU).

The tail must reproduce the recursion it replaces — ``vcycle(k, zeros, b)``
over the covered levels — up to f32 contraction order (the lane transfer
matmuls sum in a different order than reduce_window / the stack+reshape
interleave)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu.kernels.mg_tail import make_mg_tail
from cfd_tpu.poisson import multigrid as M


def _aligned_levels(problem, cfg):
    probs = [problem]
    while (probs[-1].nx % 2 == 0 and probs[-1].ny % 2 == 0
           and probs[-1].nx // 2 >= cfg.min_coarse
           and probs[-1].ny // 2 >= cfg.min_coarse):
        probs.append(M.coarsen_problem(probs[-1]))
    levels = [M._build_level(p, jnp.float32, aligned=True, allow_full=True)
              for p in probs]
    pinv = M._dense_pinv(probs[-1])
    return levels, pinv


def _ref_tail(levels, cfg, pinv, b):
    """The recursion mg_tail replaces, built from the module's own
    per-level helpers (smooth_pair fori + _residual/_restrict/_prolong +
    dense coarsest solve)."""
    import jax

    bot = levels[-1]

    def smooth(level, p, b, n):
        interior, red, black = M._inline_masks(level)
        inv = M._inv_diag(level, interior)

        def body(_, p):
            p = M._smooth(level, p, b, cfg.omega, red, inv)
            return M._smooth(level, p, b, cfg.omega, black, inv)

        return jax.lax.fori_loop(0, n, body, p)

    def coarse_solve(b):
        vec = b[1:bot.ny + 1, 1:bot.nx + 1].reshape(-1)
        e = (jnp.asarray(pinv, b.dtype) @ vec).reshape(bot.ny, bot.nx)
        out = jnp.zeros(bot.shape, dtype=b.dtype)
        return out.at[1:bot.ny + 1, 1:bot.nx + 1].set(e)

    def vcycle(k, b):
        if k == len(levels) - 1:
            return coarse_solve(b)
        level = levels[k]
        p = smooth(level, jnp.zeros(level.shape, b.dtype), b, cfg.pre_sweeps)
        r = M._residual(level, p, b)
        rc = M._restrict(level, levels[k + 1], r)
        ec = vcycle(k + 1, rc)
        p = p + M._prolong(levels[k + 1], level, ec)
        return smooth(level, p, b, cfg.post_sweeps)

    return vcycle(0, b)


def _interior_noise(level, seed):
    rng = np.random.default_rng(seed)
    b = np.zeros(level.shape, np.float32)
    b[1:level.ny + 1, 1:level.nx + 1] = rng.standard_normal(
        (level.ny, level.nx)).astype(np.float32)
    return jnp.asarray(b)


@pytest.mark.parametrize("flavor,n", [
    (M.cavity_problem, 64), (M.channel_problem, 64), (M.neumann_problem, 32),
])
def test_tail_matches_recursion(flavor, n):
    cfg = M.MGConfig(pre_sweeps=2, post_sweeps=1, min_coarse=4)
    problem = flavor(n, n, 1.0 / n, 1.0 / n)
    levels, pinv = _aligned_levels(problem, cfg)
    assert len(levels) >= 3
    b = _interior_noise(levels[0], seed=3)
    want = np.asarray(_ref_tail(levels, cfg, pinv, b))
    tail = make_mg_tail(levels, cfg.omega, cfg.pre_sweeps, cfg.post_sweeps,
                        pinv, interpret=True)
    got = np.asarray(tail(b))
    scale = max(1e-30, np.abs(want).max())
    np.testing.assert_allclose(got, want, atol=2e-5 * scale)


def test_tail_matches_recursion_masked_full_weights():
    """Backwards-step coarse hierarchy: full 2D weights + decoupled-cell
    exclusion (the masked defect-correction tail)."""
    from cfd_tpu.cases.backwards_step import make_backwards_step_case

    case = make_backwards_step_case(nx=64, ny=16, poisson="multigrid",
                                    dtype=jnp.float32, smoother_mode="off")
    grid, coeffs = case.grid, case.coeffs
    cfg = M.MGConfig(pre_sweeps=2, post_sweeps=1, min_coarse=4)
    probs = [M.masked_channel_problem(grid, coeffs.dx, coeffs.dy)]
    while (probs[-1].nx % 2 == 0 and probs[-1].ny % 2 == 0
           and probs[-1].nx // 2 >= cfg.min_coarse
           and probs[-1].ny // 2 >= cfg.min_coarse):
        probs.append(M.coarsen_problem(probs[-1]))
    # the tail covers the COARSE hierarchy (below the exact fine level)
    levels = [M._build_level(p, jnp.float32, aligned=True, allow_full=True)
              for p in probs[1:]]
    assert len(levels) >= 2 and not levels[0].separable
    pinv = M._dense_pinv(probs[-1])
    b = _interior_noise(levels[0], seed=7)
    want = np.asarray(_ref_tail(levels, cfg, pinv, b))
    tail = make_mg_tail(levels, cfg.omega, cfg.pre_sweeps, cfg.post_sweeps,
                        pinv, interpret=True)
    got = np.asarray(tail(b))
    scale = max(1e-30, np.abs(want).max())
    np.testing.assert_allclose(got, want, atol=2e-5 * scale)


def test_solve_with_tail_matches_without():
    """End-to-end multigrid solve: cfg.tail_from plugs the fused tail into
    the production vcycle; the converged iterate and cycle count must match
    the per-level path (same tolerance criterion)."""
    n = 64
    # 1e-4 relative: comfortably above the f32 stall floor for a rough
    # random source, so BOTH paths exit on the tolerance (not the stall)
    cfg = M.MGConfig(pre_sweeps=2, post_sweeps=1, tol_factor=1e-4)
    problem = M.cavity_problem(n, n, 1.0 / n, 1.0 / n)
    kw = dict(dtype=jnp.float32, aligned_io=True, use_pallas=True,
              pallas_interpret=True)
    solve_ref = M.make_multigrid_poisson(problem, cfg, **kw)
    solve_tail = M.make_multigrid_poisson(
        problem, dataclasses.replace(cfg, tail_from=1), **kw)
    lv0 = M._build_level(problem, jnp.float32, aligned=True)
    b = _interior_noise(lv0, seed=11)
    p0 = jnp.zeros(lv0.shape, jnp.float32)
    pa, ita, resa = solve_ref(p0, b)
    pb, itb, resb = solve_tail(p0, b)
    tol = 1e-4 * float(jnp.max(jnp.abs(b)))
    assert float(resa) <= tol and float(resb) <= tol
    assert abs(int(ita) - int(itb)) <= 1
    np.testing.assert_allclose(np.asarray(pb), np.asarray(pa),
                               atol=50 * tol)


def _compare_quad_vs_tail(make, kw, steps=3, names=("u", "v", "p"),
                          atol=1e-4):
    """Trajectory of the quad case WITH mg_overrides tail_from==1 vs the
    same quad case without: cycle counts within +-1 (f32 contraction-order
    difference in the tail's transfer matmuls vs reduce_window can flip a
    stall-exit cycle), fields to f32 roundoff accumulation."""
    from cfd_tpu.solver import Simulation

    ref_case = make(**kw)
    ov = dict(kw.pop("mg_overrides", {}), tail_from=1)
    tail_case = make(mg_overrides=ov, **kw)
    sim_a = Simulation(ref_case, log=lambda *a: None)
    sim_b = Simulation(tail_case, log=lambda *a: None)
    sa, sb = sim_a.initial_state(), sim_b.initial_state()
    for k in range(steps):
        sa, da = sim_a._step(sa)
        sb, db = sim_b._step(sb)
        ia, ib = int(da.poisson_iters), int(db.poisson_iters)
        # floor-terminated f32 solves of differently-compiled programs
        # legitimately exit a couple of cycles apart (honest-stall regime,
        # MGConfig.stall_ratio note; the test_whole_solve harness band) —
        # the contract is the TRAJECTORY below
        assert abs(ib - ia) <= max(2, round(0.25 * max(ia, ib))), (k, ia, ib)
    la, lb = sim_a._logical(sa), sim_b._logical(sb)
    for name in names:
        a, b = np.asarray(getattr(la, name)), np.asarray(getattr(lb, name))
        scale = max(1.0, np.abs(a).max())
        np.testing.assert_allclose(b, a, rtol=0, atol=atol * scale,
                                   err_msg=name)


def test_step_quad_with_tail_matches_quad():
    """Masked backwards-step quad path: cfg.tail_from fuses the full-2D-
    weight coarse hierarchy (cvcycle) into one kernel."""
    from cfd_tpu.cases.backwards_step import make_backwards_step_case

    _compare_quad_vs_tail(
        make_backwards_step_case,
        dict(nx=64, ny=16, dtype=jnp.float32, poisson="multigrid",
             tolerance_factor=1e-5, layout="quad",
             smoother_mode="interpret"))


def test_rb_quad_with_tail_matches_quad():
    """Rayleigh-Benard quad path: the tail composes with the pure-Neumann
    pin_mean (applied at level 0, outside the tail) and the singular
    coarsest pinv."""
    from cfd_tpu.physics.boussinesq import make_rayleigh_benard_case

    _compare_quad_vs_tail(
        make_rayleigh_benard_case,
        dict(nx=48, ny=16, rayleigh=1e5, dtype=jnp.float32,
             tolerance_factor=1e-5, abs_tol=1e-7,
             step_kernel_mode="interpret", layout="quad"),
        names=("u", "v", "p", "T"))


def test_channel_quad_with_tail_matches_quad():
    from cfd_tpu.cases.channel import make_channel_case

    _compare_quad_vs_tail(
        make_channel_case,
        dict(nx=64, ny=32, dtype=jnp.float32, poisson="multigrid",
             tolerance_factor=1e-5, layout="quad",
             step_kernel_mode="interpret"))


def test_sharded_quad_tail_matches_single_device():
    """Sharded cavity with the fused replicated tail (mg_overrides
    tail_from) == the single-device quad trajectory to f32 roundoff,
    V-cycle counts within +-1 (same bound as the non-tail sharded tests:
    cross-program FMA contraction at the stall floor)."""
    import jax
    from jax.sharding import Mesh

    from cfd_tpu.cases import make_cavity_case
    from cfd_tpu.parallel.quad_sharded import ShardedQuadCavity
    from cfd_tpu.solver import Simulation

    case = make_cavity_case(n_interior=64, dtype=jnp.float32,
                            poisson="multigrid",
                            step_kernel_mode="interpret", layout="quad")
    sim = Simulation(case, log=lambda *a: None)
    st = sim.initial_state()
    single_iters = []
    for _ in range(3):
        st, d = sim._step(st)
        single_iters.append(int(d.poisson_iters))
    ref = sim._logical(st)

    mesh = Mesh(np.array(jax.devices("cpu")[:4]), ("dy",))
    sq = ShardedQuadCavity(case, mesh, interpret=True,
                           mg_overrides={"tail_from": 1})
    state = sq.initial_state()
    shard_iters = []
    for _ in range(3):
        state, d = sq.step(state)
        shard_iters.append(int(d["poisson_iters"]))
    got = sq.logical(state)

    assert all(abs(a - b) <= 1 for a, b in zip(shard_iters, single_iters)), \
        (shard_iters, single_iters)
    for name in ("u", "v", "p"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(got, name))
        np.testing.assert_allclose(b, a, rtol=0, atol=2e-5 * max(
            1.0, float(np.abs(a).max())), err_msg=name)


def test_cavity_quad_step_with_tail_matches_quad():
    """Full production integration: the quad cavity f32 step with
    mg_overrides={'tail_from': 1} reproduces the plain quad step's
    trajectory and cycle counts."""
    from cfd_tpu.cases.cavity import make_cavity_case
    from cfd_tpu.solver import Simulation

    kw = dict(n_interior=32, dtype=jnp.float32, poisson="multigrid",
              tolerance_factor=1e-5, final_time=1.0,
              step_kernel_mode="interpret", layout="quad")
    ref_case = make_cavity_case(**kw)
    tail_case = make_cavity_case(mg_overrides={"tail_from": 1,
                                               "post_sweeps": 1}, **kw)
    sim_a = Simulation(ref_case, log=lambda *a: None)
    sim_b = Simulation(tail_case, log=lambda *a: None)
    sa, sb = sim_a.initial_state(), sim_b.initial_state()
    for k in range(3):
        sa, da = sim_a._step(sa)
        sb, db = sim_b._step(sb)
        assert abs(int(db.poisson_iters) - int(da.poisson_iters)) <= 1, k
    la = ref_case.unalign_state(sa)
    lb = tail_case.unalign_state(sb)
    np.testing.assert_allclose(np.asarray(lb.u), np.asarray(la.u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lb.v), np.asarray(la.v), atol=1e-5)
    np.testing.assert_allclose(np.asarray(lb.p), np.asarray(la.p), atol=1e-4)
