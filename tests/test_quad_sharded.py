"""Sharded quad fast path == single-device quad path (VERDICT round-2
item 1): the flagship kernels under shard_map on the 8-device CPU mesh,
interpret mode, compared to the single-device quad tentative-carry step to
f32 roundoff, with exact V-cycle-count agreement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu.cases import make_cavity_case
from cfd_tpu.parallel.mesh import make_mesh
from cfd_tpu.parallel.quad_sharded import DEV_HALO, ShardedQuadCavity
from cfd_tpu.solver import Simulation
from jax.sharding import Mesh


def cpu_mesh_1d(n: int) -> Mesh:
    devs = np.array(jax.devices("cpu")[:n])
    return Mesh(devs, ("dy",))


def make_case(n):
    # tolerance 1e-5: REACHABLE in f32, so every solve converges BY
    # TOLERANCE and cycle counts are deterministic. At the default 1e-9
    # every f32 solve floor-terminates via the stall exit, where a 1-ulp
    # cross-program difference (XLA version / FMA contraction) flips
    # counts by 2+ — measured drifting across toolchain updates with NO
    # repo change (round 5: [10,8,5] vs [8,8,6] at the round-4 commit).
    # fuse_pre=False: the sharded path has no fused-pre carry; compare
    # like-for-like per-kernel compositions.
    return make_cavity_case(n_interior=n, dtype=jnp.float32,
                            poisson="multigrid", tolerance_factor=1e-5,
                            fuse_pre=False,
                            step_kernel_mode="interpret", layout="quad")


def test_extend_collapse_roundtrip():
    case = make_case(64)
    sq = ShardedQuadCavity(case, cpu_mesh_1d(4), interpret=True)
    rng = np.random.default_rng(0)
    q = rng.normal(size=(4, sq.Hq8s, sq.W)).astype(np.float32)
    x = sq._extend(q)
    assert x.shape == (4, sq.mdy * (sq.P + 2 * DEV_HALO), sq.W)
    np.testing.assert_array_equal(sq._collapse(x), q)
    # halo strips hold the neighbor's adjacent global rows
    E = sq.P + 2 * DEV_HALO
    np.testing.assert_array_equal(
        x[:, E : E + DEV_HALO, :],  # device 1's bottom halo
        q[:, sq.P - DEV_HALO : sq.P, :])


@pytest.mark.parametrize("n,mdy,steps", [
    (64, 4, 3),
    pytest.param(256, 8, 2, marks=pytest.mark.slow),
])
def test_sharded_quad_matches_single_device(n, mdy, steps):
    """Sharded quad step trajectory == single-device quad trajectory on
    owned rows to f32 roundoff.

    V-cycle counts may differ by at most 1 per step: the iterates agree to
    ~1 ulp (measured: identical max-residuals, scattered 1-ulp field
    differences from cross-program FMA contraction choices), and the f32
    stall-exit (MGConfig.stall_ratio) sits exactly at the roundoff floor,
    so an ulp can flip one extra contraction cycle. Bitwise equality across
    differently-compiled XLA programs is not a meaningful target; the
    trajectory bound below is."""
    case = make_case(n)
    sim = Simulation(case, log=lambda *a: None)
    st = sim.initial_state()
    single_iters = []
    for _ in range(steps):
        st, d = sim._step(st)
        single_iters.append(int(d.poisson_iters))
    ref = sim._logical(st)

    sq = ShardedQuadCavity(case, cpu_mesh_1d(mdy), interpret=True,
                           tol_factor=1e-5)
    state = sq.initial_state()
    shard_iters = []
    for _ in range(steps):
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


def test_sharded_single_vcycle_ulp_level():
    """One forced V-cycle: the fused predictor/source outputs are BITWISE
    equal to the single-device kernels and the solved pressure agrees to
    ~1 ulp (the strongest cross-program bound available under FMA
    contraction differences)."""
    from cfd_tpu.kernels.quad import quad_dims

    ov = {"max_cycles": 1}
    case = make_cavity_case(n_interior=64, dtype=jnp.float32,
                            poisson="multigrid",
                            step_kernel_mode="interpret", layout="quad",
                            mg_overrides=ov)
    sim = Simulation(case, log=lambda *a: None)
    st, d1 = sim._step(sim.initial_state())

    sq = ShardedQuadCavity(case, cpu_mesh_1d(4), interpret=True,
                           mg_overrides=ov)
    state, d2 = sq.step(sq.initial_state())
    assert int(d1.poisson_iters) == int(d2["poisson_iters"]) == 1
    assert float(d1.poisson_residual) == float(d2["poisson_residual"])

    Hq8 = quad_dims(case.grid.shape)[2]
    collapse = lambda x: sq._collapse(x)[:, :Hq8, :]
    np.testing.assert_array_equal(collapse(state[0]), np.asarray(st.u))
    np.testing.assert_array_equal(collapse(state[1]), np.asarray(st.v))
    np.testing.assert_allclose(collapse(state[2]), np.asarray(st.p),
                               rtol=0, atol=1e-7)


def test_sharded_quad_chunk_scan():
    """scan-of-steps inside shard_map (the production dispatch shape)
    matches per-step dispatch."""
    case = make_case(64)
    sq = ShardedQuadCavity(case, cpu_mesh_1d(4), interpret=True)
    s1 = sq.initial_state()
    for _ in range(3):
        s1, _ = sq.step(s1)
    s2 = sq.initial_state()
    s2, d = sq.run_chunk(s2, 3)
    for a, b in zip(s1, s2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)
    assert d["poisson_iters"].shape == (3,)


def test_sharded_quad_stats_match_single_device_p8():
    """mdy=8 at 64^2 exercises the minimum P=8 ownership; the gathered
    statistics must equal the single-device quad path's (the absolute
    max-divergence at step 5 is ~0.084 on EVERY path — the impulsive-lid
    transient under the reference's eps_s-quirk operator, which the golden
    traces confirm matches the C++ binary — so equality, not a small-div
    threshold, is the meaningful check)."""
    case = make_case(64)
    sim = Simulation(case, log=lambda *a: None)
    st = sim.initial_state()
    for _ in range(5):
        st, _ = sim._step(st)
    ref = sim.statistics(st)

    sq = ShardedQuadCavity(case, cpu_mesh_1d(8), interpret=True)
    state = sq.initial_state()
    state, _ = sq.run_chunk(state, 5)
    lg = sq.logical(state)
    got = {k: float(v) for k, v in sim._stats(lg.u, lg.v).items()}
    for k in ("max_divergence", "avg_kinetic_energy"):
        assert abs(got[k] - ref[k]) <= 1e-5 * max(1.0, abs(ref[k])), (k, got, ref)


@pytest.mark.parametrize("nx,ny,mdy,steps", [
    (96, 32, 4, 3),
    pytest.param(768, 256, 8, 2, marks=pytest.mark.slow),
])
def test_sharded_quad_channel_matches_single_device(nx, ny, mdy, steps):
    """Channel flavor of the sharded quad fast path == single-device quad
    channel step (round-3: ShardedQuadProjection): same psummed source
    mean, same V-cycle counts (±1 for the knife-edge ulp, as the cavity
    test), trajectories to f32 roundoff."""
    from cfd_tpu.cases import make_channel_case
    from cfd_tpu.parallel.quad_sharded import ShardedQuadProjection

    # tolerance 1e-5: reachable in f32 so both programs converge BY
    # TOLERANCE with deterministic cycle counts (the 1e-7 floor regime
    # drifted ±2 across toolchain updates with no repo change — see
    # make_case above)
    # no mg_overrides: the channel factory default V(1,2) matches the
    # sharded builder's channel flavor (1,2) — the stale post_sweeps=1
    # override made the single side V(1,1) vs the sharded V(1,2), which
    # the 1e-7 floor regime masked
    case = make_channel_case(nx=nx, ny=ny, dtype=jnp.float32,
                             poisson="multigrid", tolerance_factor=1e-5,
                             abs_tol=0.0, step_kernel_mode="interpret",
                             layout="quad")
    sim = Simulation(case, log=lambda *a: None)
    st = sim.initial_state()
    single_iters = []
    for _ in range(steps):
        st, d = sim._step(st)
        single_iters.append(int(d.poisson_iters))
    ref = sim._logical(st)

    sq = ShardedQuadProjection(case, cpu_mesh_1d(mdy), interpret=True,
                               tol_factor=1e-5)
    assert sq.flavor == "channel"
    state = sq.initial_state()
    shard_iters = []
    for _ in range(steps):
        state, d = sq.step(state)
        shard_iters.append(int(d["poisson_iters"]))
    got = sq.logical(state)

    assert all(abs(a - b) <= 1 for a, b in zip(shard_iters, single_iters)), \
        (shard_iters, single_iters)
    for name in ("u", "v", "p"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(got, name))
        # p's looser bound is the f32 SOURCE-MEAN roundoff, not sharding:
        # the startup source sum is ~-6.87e8 (f32 ulp 64), so ANY f32
        # accumulation order carries >=ulp-scale error (measured at
        # 768x256: kernel sum -687194944 vs exact f64 -687194728 -> mean
        # delta 1.1e-3), and with the outlet-Dirichlet operator a mean
        # shift delta in b shows up in p as the delta*A^-1*1 response
        # (~delta*L^2/2 = 0.0049 here, peaked at the inlet — exactly the
        # observed diff, bitwise independent of solver tolerance). The
        # single-device kernel's per-tile order and the sharded psum order
        # are just two such roundings; u/v (driven by grad p) hold 2e-5.
        # p's factor carries the tolerance-convergence slack on top: at
        # 1e-5 rel both solves legitimately stop with residual ~tol*|b|
        # apart (measured 0.0157 vs the 0.0146 mean-roundoff-only bound).
        atol = (5e-4 if name == "p" else 2e-5) * max(
            1.0, float(np.abs(a).max()))
        np.testing.assert_allclose(b, a, rtol=0, atol=atol, err_msg=name)


@pytest.mark.parametrize("nx,ny,mdy,steps", [
    (64, 16, 4, 3),       # 2 coarse levels: level-1 band-smooths SPMD
    (32, 8, 2, 3),        # 1 coarse level: the level-1 coarse-switch fallback
    pytest.param(256, 32, 8, 2, marks=pytest.mark.slow),  # the reference grid
])
def test_sharded_quad_step_matches_single_device(nx, ny, mdy, steps):
    """Backwards-step flavor of the sharded quad fast path == the
    single-device masked quad path at the same V(1,1) (the sharded halo
    budget of the exact masked smoother): fused masked tentative-carry
    kernel + quad exact fine level SPMD, full-2D-weight coarse hierarchy
    replicated; same cycle counts (+-1 knife-edge ulp), trajectories to
    f32 roundoff, solid region untouched."""
    from cfd_tpu.cases.backwards_step import make_backwards_step_case
    from cfd_tpu.parallel.quad_sharded import ShardedQuadProjection

    case = make_backwards_step_case(
        nx=nx, ny=ny, dtype=jnp.float32, poisson="multigrid",
        tolerance_factor=1e-5, smoother_mode="interpret", layout="quad",
        mg_overrides={"pre_sweeps": 1, "post_sweeps": 1})
    sim = Simulation(case, log=lambda *a: None)
    st = sim.initial_state()
    single_iters = []
    for _ in range(steps):
        st, d = sim._step(st)
        single_iters.append(int(d.poisson_iters))
    ref = sim._logical(st)

    sq = ShardedQuadProjection(case, cpu_mesh_1d(mdy), interpret=True,
                               tol_factor=1e-5,
                               mg_overrides={"abs_tol": 1e-10})
    assert sq.flavor == "backwards_step"
    assert sq.n_carry == 3
    state = sq.initial_state()
    shard_iters = []
    for _ in range(steps):
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
    # solid-block interior u-faces stay exactly zero through the carry
    from cfd_tpu.poisson.multigrid import step_rect_params

    step_i, inlet_j = step_rect_params(case.grid)
    u = np.asarray(got.u)
    assert np.all(u[inlet_j + 1:-1, 1:step_i] == 0.0)


@pytest.mark.parametrize("nx,ny,mdy,steps", [
    (48, 16, 4, 3),
    pytest.param(192, 64, 8, 2, marks=pytest.mark.slow),
])
def test_sharded_quad_rb_matches_single_device(nx, ny, mdy, steps):
    """Rayleigh-Benard flavor of the sharded quad fast path == the
    single-device quad RB step (round-3: the last rectangle-grid physics
    flavor without a kernel-speed sharded story): the fused tentative-carry
    RB kernel under shard_map with the pure-Neumann pinned V-cycle (psummed
    per-cycle mean), same V-cycle counts (+-1 knife-edge ulp as the
    cavity/channel tests), (u, v, p, T) trajectories to f32 roundoff."""
    from cfd_tpu.parallel.quad_sharded import ShardedQuadProjection
    from cfd_tpu.physics.boussinesq import make_rayleigh_benard_case

    case = make_rayleigh_benard_case(
        nx=nx, ny=ny, rayleigh=1e5, dtype=jnp.float32,
        tolerance_factor=1e-5, abs_tol=1e-7,
        step_kernel_mode="interpret", layout="quad")
    sim = Simulation(case, log=lambda *a: None)
    st = sim.initial_state()
    single_iters = []
    for _ in range(steps):
        st, d = sim._step(st)
        single_iters.append(int(d.poisson_iters))
    ref = sim._logical(st)

    sq = ShardedQuadProjection(case, cpu_mesh_1d(mdy), interpret=True,
                               tol_factor=1e-5,
                               mg_overrides={"abs_tol": 1e-7})
    assert sq.flavor == "rayleigh_benard"
    state = sq.initial_state()
    shard_iters = []
    for _ in range(steps):
        state, d = sq.step(state)
        shard_iters.append(int(d["poisson_iters"]))
    got = sq.logical(state)

    assert all(abs(a - b) <= 1 for a, b in zip(shard_iters, single_iters)), \
        (shard_iters, single_iters)
    for name in ("u", "v", "p", "T"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(got, name))
        np.testing.assert_allclose(b, a, rtol=0, atol=2e-5 * max(
            1.0, float(np.abs(a).max())), err_msg=name)


def test_mesh_size_bound_rejects_past_validated(monkeypatch):
    """VERDICT round-3 item 6b: the factory refuses meshes past the
    validated/modeled 1-D decomposition bound (tools/comm_model.py) with a
    loud error instead of silently scaling badly; the escape hatch works."""
    from cfd_tpu.parallel.quad_sharded import ShardedQuadProjection

    case = make_case(64)
    monkeypatch.setattr(ShardedQuadProjection, "MAX_VALIDATED_MESH", 4)
    with pytest.raises(ValueError, match="validated/modeled bound"):
        ShardedQuadProjection(case, cpu_mesh_1d(8), interpret=True)
    sq = ShardedQuadProjection(case, cpu_mesh_1d(8), interpret=True,
                               allow_unvalidated_mesh=True)
    assert sq.mdy == 8


class TestMdy1Delegation:
    """A knob-free 1-device mesh delegates every entry point to the case's
    single-device fast path (VERDICT round-4 item 5: the sharded program's
    band bookkeeping measured 21-35% overhead on a mesh that never
    communicates). Delegated trajectories are BITWISE equal to the
    meshless run — they are the same jitted program."""

    def test_delegates_and_matches_single_device_bitwise(self):
        case = make_case(64)
        sim = Simulation(case, log=lambda *a: None)
        st = sim.initial_state()
        iters = []
        for _ in range(3):
            st, d = sim._step(st)
            iters.append(int(d.poisson_iters))
        ref = sim._logical(st)

        sq = ShardedQuadCavity(case, cpu_mesh_1d(1), interpret=True)
        assert sq.delegated
        state = sq.initial_state()
        got_iters = []
        for _ in range(3):
            state, d = sq.step(state)
            got_iters.append(int(d["poisson_iters"]))
        got = sq.logical(state)
        assert got_iters == iters
        for name in ("u", "v", "p"):
            np.testing.assert_array_equal(
                np.asarray(getattr(got, name)),
                np.asarray(getattr(ref, name)), err_msg=name)

    def test_run_chunk_and_from_logical_roundtrip(self):
        case = make_case(64)
        sq = ShardedQuadCavity(case, cpu_mesh_1d(1), interpret=True)
        state = sq.initial_state()
        state, d = sq.run_chunk(state, 2)
        assert d["poisson_iters"].shape == (2,)
        logical = sq.logical(state)
        assert logical.u.shape == case.grid.shape
        back = sq.from_logical(logical)
        state2, d2 = sq.run_chunk(back, 1)
        assert np.isfinite(np.asarray(sq.logical(state2).u)).all()

    def test_solver_knobs_keep_the_sharded_program(self):
        # explicit tol_factor/mg_overrides configure the SHARDED solve;
        # force_sharded_path preserves the lowering-evidence mode
        case = make_case(64)
        sq = ShardedQuadCavity(case, cpu_mesh_1d(1), interpret=True,
                               tol_factor=1e-5)
        assert not sq.delegated
        sq2 = ShardedQuadCavity(case, cpu_mesh_1d(1), interpret=True,
                                force_sharded_path=True)
        assert not sq2.delegated
        state, d = sq2.step(sq2.initial_state())
        assert np.isfinite(float(d["poisson_residual"]))

    def test_delegated_make_adaptive_points_to_run_adaptive(self):
        case = make_case(64)
        sq = ShardedQuadCavity(case, cpu_mesh_1d(1), interpret=True)
        with pytest.raises(ValueError, match="delegates"):
            sq.make_adaptive(0.7, 1.2, 1.0, 1)
