"""Quad-split (2x2 block-parity) kernels vs the XLA/natural paths
(interpret mode on host CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu.kernels.quad import (
    _qshift,
    from_quad,
    quad_dims,
    to_quad,
)
from cfd_tpu.poisson import multigrid as M


@pytest.mark.parametrize("shape", [(34, 34), (65, 65), (18, 130)])
def test_quad_roundtrip(shape):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    q = to_quad(a, shape)
    _, _, Hq8, Wqa = quad_dims(shape)
    assert q.shape == (4, Hq8, Wqa)
    np.testing.assert_array_equal(np.asarray(from_quad(q, shape)), np.asarray(a))


@pytest.mark.parametrize("dj,di", [(0, 1), (0, -1), (1, 0), (-1, 0),
                                   (-1, 1), (1, -1)])
def test_qshift_matches_natural_roll(dj, di):
    """merge(qshift(split(a), dj, di)) == a[j+dj, i+di] away from edges."""
    shape = (34, 34)
    rng = np.random.default_rng(1)
    a = np.asarray(rng.standard_normal(shape), np.float32)
    q = to_quad(jnp.asarray(a), shape)
    planes = [q[k] for k in range(4)]
    shifted = jnp.stack(_qshift(planes, dj, di))
    got = np.asarray(from_quad(shifted, shape))
    want = np.roll(np.roll(a, -dj, axis=0), -di, axis=1)
    np.testing.assert_array_equal(got[2:-2, 2:-2], want[2:-2, 2:-2])


def _cavity_setup(n=48, seed=5):
    from cfd_tpu.cases.cavity import make_cavity_case

    case = make_cavity_case(n_interior=n, dtype=jnp.float32)
    g = case.grid
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.standard_normal(g.shape) * 0.1, jnp.float32)
    v = jnp.asarray(rng.standard_normal(g.shape) * 0.1, jnp.float32)
    p = jnp.asarray(rng.standard_normal(g.shape) * 0.1, jnp.float32)
    return case, g, u, v, p


@pytest.mark.parametrize("tile_rows", [8, 512])
def test_quad_predictor_source_matches_xla(tile_rows):
    """Quad BC+predictor+source+max|b| == the XLA path, tiled and
    whole-array (the quad twin of test_fused_predictor_source)."""
    from cfd_tpu.bc import lid_cavity_bc
    from cfd_tpu.kernels.quad import make_quad_predictor_source
    from cfd_tpu.ops.stencil import iota_masks, poisson_source, predictor

    case, g, u, v, _ = _cavity_setup()
    bc = lid_cavity_bc(g, 1.0)
    cell, u_valid, v_valid = iota_masks(g)
    uP, vP = bc(u, v)
    us_ref, vs_ref = predictor(uP, vP, case.coeffs, u_valid, v_valid)
    b_ref = poisson_source(us_ref, vs_ref, case.coeffs, cell,
                           remove_mean=False, n_cells=g.n_fluid)

    k = make_quad_predictor_source(g.shape, case.coeffs, 1.0,
                                   tile_rows=tile_rows, interpret=True)
    us, vs, b, max_b = k(to_quad(u, g.shape), to_quad(v, g.shape))
    np.testing.assert_allclose(np.asarray(from_quad(us, g.shape)),
                               np.asarray(us_ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(from_quad(vs, g.shape)),
                               np.asarray(vs_ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(from_quad(b, g.shape)),
                               np.asarray(b_ref), atol=2e-3)
    want_max = float(jnp.max(jnp.abs(b_ref)))
    assert abs(float(max_b) - want_max) < 1e-3 * max(want_max, 1.0)


@pytest.mark.parametrize("tile_rows", [8, 512])
def test_quad_corrector_matches_xla(tile_rows):
    from cfd_tpu.bc import lid_cavity_bc
    from cfd_tpu.kernels.quad import make_quad_corrector
    from cfd_tpu.ops.stencil import iota_masks, predictor, pressure_correction

    case, g, u, v, p = _cavity_setup(seed=6)
    bc = lid_cavity_bc(g, 1.0)
    cell, u_valid, v_valid = iota_masks(g)
    uP, vP = bc(u, v)
    us, vs = predictor(uP, vP, case.coeffs, u_valid, v_valid)
    zero = jnp.zeros_like(us)
    u2_ref, v2_ref = pressure_correction(us, vs, p, case.coeffs, u_valid,
                                         v_valid, u_else=zero, v_else=zero,
                                         cavity_form=True)
    u2_ref, v2_ref = bc(u2_ref, v2_ref)
    p_prev = 0.5 * p

    k = make_quad_corrector(g.shape, case.coeffs, 1.0, tile_rows=tile_rows,
                            interpret=True)
    u2, v2, guess = k(to_quad(us, g.shape), to_quad(vs, g.shape),
                      to_quad(p, g.shape), to_quad(p_prev, g.shape))
    np.testing.assert_allclose(np.asarray(from_quad(u2, g.shape)),
                               np.asarray(u2_ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(from_quad(v2, g.shape)),
                               np.asarray(v2_ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(from_quad(guess, g.shape)),
                               np.asarray(2.0 * p - p_prev), atol=2e-6)


def _poisson_setup(n, seed=3):
    prob = M.cavity_problem(n, n, 1.0 / n, 1.0 / n)
    levels, _ = M.build_hierarchy(prob, M.MGConfig(), jnp.float32)
    top = levels[0]
    rng = np.random.default_rng(seed)
    inter = M._interior_mask(n, n)
    p = jnp.asarray(np.where(inter, rng.standard_normal((n + 2, n + 2)), 0),
                    jnp.float32)
    b = jnp.asarray(np.where(inter, rng.standard_normal((n + 2, n + 2)), 0),
                    jnp.float32)
    return prob, levels, top, p, b


def _jnp_pairs(top, p, b, n_pairs):
    interior, red, black = M._inline_masks(top)
    inv = M._inv_diag(top, interior)
    for _ in range(n_pairs):
        p = M._smooth(top, p, b, 1.0, red, inv)
        p = M._smooth(top, p, b, 1.0, black, inv)
    return p


@pytest.mark.parametrize("tile_rows", [8, 512])
@pytest.mark.parametrize("n_pairs", [1, 2])
def test_quad_pre_smooth_restrict_matches_xla(tile_rows, n_pairs):
    """Fused quad pre-smooth + residual + restriction == XLA smooth pairs
    then full-weighting restriction into the aligned coarse layout."""
    from cfd_tpu.kernels.quad import make_quad_pre_smooth_restrict

    n = 64
    prob, levels, top, p, b = _poisson_setup(n)
    shape = (n + 2, n + 2)
    coarse_shape = M._round_up8_128((n // 2 + 2, n // 2 + 2))

    k = make_quad_pre_smooth_restrict(shape, prob, 1.0, n_pairs, coarse_shape,
                                      tile_rows=tile_rows, interpret=True)
    pq, rc = k(to_quad(p, shape), to_quad(b, shape))

    want_p = _jnp_pairs(top, p, b, n_pairs)
    r = M._residual(top, want_p, b)
    rc_want = np.zeros(coarse_shape, np.float32)
    rn = np.asarray(r)[1 : n + 1, 1 : n + 1]
    rc_want[1 : n // 2 + 1, 1 : n // 2 + 1] = 0.25 * (
        rn[0::2, 0::2] + rn[0::2, 1::2] + rn[1::2, 0::2] + rn[1::2, 1::2])

    np.testing.assert_allclose(np.asarray(from_quad(pq, shape)),
                               np.asarray(want_p), atol=5e-7)
    # residual values are O(idx2) ~ thousands: f32 roundoff scales with them
    np.testing.assert_allclose(np.asarray(rc), rc_want, atol=1e-3, rtol=1e-5)


@pytest.mark.parametrize("tile_rows", [8, 512])
@pytest.mark.parametrize("n_pairs", [1, 2])
def test_quad_post_prolong_smooth_matches_xla(tile_rows, n_pairs):
    """Fused prolongation + post-smooth + max-residual == XLA _prolong then
    smooth pairs then the residual max."""
    from cfd_tpu.kernels.quad import make_quad_post_prolong_smooth

    n = 64
    prob, levels, top, p, b = _poisson_setup(n, seed=7)
    shape = (n + 2, n + 2)
    coarse_shape = M._round_up8_128((n // 2 + 2, n // 2 + 2))
    rng = np.random.default_rng(8)
    ec_nat = np.zeros((n // 2 + 2, n // 2 + 2), np.float32)
    ec_nat[1 : n // 2 + 1, 1 : n // 2 + 1] = rng.standard_normal(
        (n // 2, n // 2)).astype(np.float32)
    ec_aligned = np.zeros(coarse_shape, np.float32)
    ec_aligned[: n // 2 + 2, : n // 2 + 2] = ec_nat

    want_p = p + M._prolong(levels[1], top, jnp.asarray(ec_nat))
    want_p = _jnp_pairs(top, want_p, b, n_pairs)
    want_res = float(jnp.max(jnp.abs(M._residual(top, want_p, b))))

    k = make_quad_post_prolong_smooth(shape, prob, 1.0, n_pairs, coarse_shape,
                                      tile_rows=tile_rows, interpret=True)
    pq, res = k(to_quad(p, shape), to_quad(b, shape), jnp.asarray(ec_aligned))
    np.testing.assert_allclose(np.asarray(from_quad(pq, shape)),
                               np.asarray(want_p), atol=2e-6)
    assert abs(float(res) - want_res) < 1e-3 * max(want_res, 1.0)


def test_quad_full_step_matches_xla_path():
    """The full quad-layout fused cavity step (quad BC+predictor+source ->
    quad-level-0 multigrid -> quad corrector, state carried as 4 planes)
    reproduces the plain XLA step's trajectory (the quad twin of
    test_aligned_fused_step_matches_xla_path)."""
    from cfd_tpu.cases.cavity import make_cavity_case
    from cfd_tpu.solver import Simulation

    kw = dict(n_interior=32, dtype=jnp.float32, poisson="multigrid",
              tolerance_factor=1e-5, final_time=1.0)
    ref_case = make_cavity_case(step_kernel_mode="off",
                                mg_overrides={"post_sweeps": 1}, **kw)
    quad_case = make_cavity_case(step_kernel_mode="interpret", layout="quad",
                                 **kw)
    assert quad_case.step_kernels is not None
    assert quad_case.align_state is not None

    sim_a = Simulation(ref_case, log=lambda *a: None)
    sim_b = Simulation(quad_case, log=lambda *a: None)
    sa, sb = sim_a.initial_state(), sim_b.initial_state()
    assert sb.u.ndim == 3 and sb.u.shape[0] == 4  # quad planes in the state
    for k in range(3):
        sa, da = sim_a._step(sa)
        sb, db = sim_b._step(sb)
        assert int(db.poisson_iters) == int(da.poisson_iters), k
    sb_log = quad_case.unalign_state(sb)
    ua, va = ref_case.velocity_bc(sa.u, sa.v)
    ub, vb = ref_case.velocity_bc(sb_log.u, sb_log.v)
    np.testing.assert_allclose(np.asarray(ub), np.asarray(ua), atol=5e-6)
    np.testing.assert_allclose(np.asarray(vb), np.asarray(va), atol=5e-6)
    np.testing.assert_allclose(np.asarray(sb_log.p), np.asarray(sa.p), atol=5e-5)
    row_a = sim_a.statistics(sa)
    row_b = sim_b.statistics(sb)
    assert abs(row_a["avg_kinetic_energy"] - row_b["avg_kinetic_energy"]) < 1e-7


@pytest.mark.parametrize("tile_rows", [8, 512])
def test_quad_channel_predictor_source_matches_xla(tile_rows):
    """Quad channel predictor+BC(u*,v*)+source+sum == the XLA path."""
    from cfd_tpu.bc import channel_bc
    from cfd_tpu.cases.channel import make_channel_case
    from cfd_tpu.kernels.quad import make_quad_channel_predictor_source
    from cfd_tpu.ops.stencil import iota_masks, poisson_source, predictor

    case = make_channel_case(nx=32, ny=16, dtype=jnp.float32,
                             poisson="multigrid", step_kernel_mode="off")
    g = case.grid
    rng = np.random.default_rng(11)
    u = jnp.asarray(rng.standard_normal(g.shape) * 0.1, jnp.float32)
    v = jnp.asarray(rng.standard_normal(g.shape) * 0.1, jnp.float32)
    bc = channel_bc(g, 1.0)
    cell, u_valid, v_valid = iota_masks(g)
    us_ref, vs_ref = predictor(u, v, case.coeffs, u_valid, v_valid)
    us_ref, vs_ref = bc(us_ref, vs_ref)
    b_raw = poisson_source(us_ref, vs_ref, case.coeffs, cell,
                           remove_mean=False, n_cells=g.n_fluid)

    k = make_quad_channel_predictor_source(g.shape, case.coeffs, 1.0,
                                           tile_rows=tile_rows, interpret=True)
    us, vs, b, sum_b = k(to_quad(u, g.shape), to_quad(v, g.shape))
    np.testing.assert_allclose(np.asarray(from_quad(us, g.shape)),
                               np.asarray(us_ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(from_quad(vs, g.shape)),
                               np.asarray(vs_ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(from_quad(b, g.shape)),
                               np.asarray(b_raw), atol=2e-3)
    want_sum = float(jnp.sum(b_raw))
    assert abs(float(sum_b) - want_sum) < 2e-3 * max(abs(want_sum), 1.0)


def test_quad_channel_full_step_matches_xla_path():
    """The full quad channel step (quad predictor+BC+source-sum ->
    quad-level-0 multigrid -> quad corrector+BC) reproduces the XLA
    channel step's trajectory."""
    from cfd_tpu.cases.channel import make_channel_case
    from cfd_tpu.solver import Simulation

    kw = dict(nx=32, ny=16, dtype=jnp.float32, poisson="multigrid",
              tolerance_factor=1e-5, abs_tol=0.0, final_time=1.0)
    # the fused channel perf path defaults to V(1,2) (cases/channel.py
    # sweep note); pin the XLA reference to the same cycle shape so
    # iteration counts compare exactly
    ref_case = make_channel_case(step_kernel_mode="off",
                                 mg_overrides={"pre_sweeps": 1,
                                               "post_sweeps": 2}, **kw)
    quad_case = make_channel_case(step_kernel_mode="interpret", layout="quad",
                                  **kw)
    assert quad_case.step_kernels is not None

    sim_a = Simulation(ref_case, log=lambda *a: None)
    sim_b = Simulation(quad_case, log=lambda *a: None)
    sa, sb = sim_a.initial_state(), sim_b.initial_state()
    assert sb.u.ndim == 3 and sb.u.shape[0] == 4
    for k in range(3):
        sa, da = sim_a._step(sa)
        sb, db = sim_b._step(sb)
        # the fused per-tile source sum's fp order differs from jnp.sum, so
        # b differs by ulps and the V-cycle count can sit one to either
        # side of the tolerance knife edge (observed: 7 vs 6 with an
        # IDENTICAL final residual)
        assert abs(int(db.poisson_iters) - int(da.poisson_iters)) <= 1, k
    sb_log = quad_case.unalign_state(sb)
    ua, va = ref_case.velocity_bc(sa.u, sa.v)
    ub, vb = ref_case.velocity_bc(sb_log.u, sb_log.v)
    np.testing.assert_allclose(np.asarray(ub), np.asarray(ua), atol=1e-5)
    np.testing.assert_allclose(np.asarray(vb), np.asarray(va), atol=1e-5)
    # p agrees to within the Poisson tolerance (same caveat as the aligned
    # channel test)
    np.testing.assert_allclose(np.asarray(sb_log.p), np.asarray(sa.p), atol=3e-4)


def test_quad_fused_corr_predictor_matches_split_kernels():
    """The tentative-state fused corrector+BC+predictor+source kernel ==
    the split quad corrector then quad predictor composition."""
    from cfd_tpu.kernels.quad import (
        make_quad_corr_predictor_source,
        make_quad_corrector,
        make_quad_predictor_source,
    )

    case, g, u, v, p = _cavity_setup(seed=9)
    us = to_quad(u, g.shape)
    vs = to_quad(v, g.shape)
    pq = to_quad(p, g.shape)
    p_prev = to_quad(0.5 * p, g.shape)

    corr = make_quad_corrector(g.shape, case.coeffs, 1.0, interpret=True)
    pred = make_quad_predictor_source(g.shape, case.coeffs, 1.0, interpret=True)
    u2, v2, guess_ref = corr(us, vs, pq, p_prev)
    us_ref, vs_ref, b_ref, maxb_ref = pred(u2, v2)

    fused = make_quad_corr_predictor_source(g.shape, case.coeffs, 1.0,
                                            tile_rows=8, interpret=True)
    us2, vs2, b, guess, max_b = fused(us, vs, pq, p_prev)
    np.testing.assert_allclose(np.asarray(us2), np.asarray(us_ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(vs2), np.asarray(vs_ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(b), np.asarray(b_ref), atol=2e-3)
    np.testing.assert_allclose(np.asarray(guess), np.asarray(guess_ref),
                               atol=2e-6)
    assert abs(float(max_b) - float(maxb_ref)) < 2e-3 * max(float(maxb_ref), 1.0)


@pytest.mark.parametrize("case_kind", ["cavity", "channel"])
def test_quad_tentative_resume_roundtrip(case_kind):
    """Checkpoint-resume on the tentative carry: unalign (corrector) then
    align (exact inverse correction) reproduces the trajectory to f32
    roundoff — the resume contract for the quad perf path."""
    from cfd_tpu.solver import Simulation

    if case_kind == "cavity":
        from cfd_tpu.cases.cavity import make_cavity_case
        case = make_cavity_case(n_interior=32, dtype=jnp.float32,
                                poisson="multigrid", tolerance_factor=1e-5,
                                step_kernel_mode="interpret", layout="quad")
    else:
        from cfd_tpu.cases.channel import make_channel_case
        case = make_channel_case(nx=32, ny=16, dtype=jnp.float32,
                                 poisson="multigrid", tolerance_factor=1e-5,
                                 abs_tol=0.0, step_kernel_mode="interpret",
                                 layout="quad")
    sim = Simulation(case, log=lambda *a: None)
    s = sim.initial_state()
    for _ in range(3):
        s, _ = sim._step(s)
    logical = case.unalign_state(s)
    s_resumed = case.align_state(logical)
    for _ in range(2):
        s, _ = sim._step(s)
        s_resumed, _ = sim._step(s_resumed)
    a = case.unalign_state(s)
    b = case.unalign_state(s_resumed)
    np.testing.assert_allclose(np.asarray(b.u), np.asarray(a.u), atol=1e-5)
    np.testing.assert_allclose(np.asarray(b.v), np.asarray(a.v), atol=1e-5)
    np.testing.assert_allclose(np.asarray(b.p), np.asarray(a.p), atol=1e-4)


def test_quad_channel_fused_corr_predictor_matches_split_kernels():
    """The channel tentative-state fused kernel == split quad channel
    corrector then quad channel predictor composition."""
    from cfd_tpu.cases.channel import make_channel_case
    from cfd_tpu.kernels.quad import (
        make_quad_channel_corr_predictor_source,
        make_quad_channel_corrector,
        make_quad_channel_predictor_source,
    )

    case = make_channel_case(nx=32, ny=16, dtype=jnp.float32,
                             poisson="multigrid", step_kernel_mode="off")
    g = case.grid
    rng = np.random.default_rng(12)
    u = jnp.asarray(rng.standard_normal(g.shape) * 0.1, jnp.float32)
    v = jnp.asarray(rng.standard_normal(g.shape) * 0.1, jnp.float32)
    p = jnp.asarray(rng.standard_normal(g.shape) * 0.1, jnp.float32)
    us = to_quad(u, g.shape)
    vs = to_quad(v, g.shape)
    pq = to_quad(p, g.shape)
    p_prev = to_quad(0.5 * p, g.shape)

    corr = make_quad_channel_corrector(g.shape, case.coeffs, 1.0,
                                       interpret=True)
    pred = make_quad_channel_predictor_source(g.shape, case.coeffs, 1.0,
                                              interpret=True)
    u2, v2, guess_ref = corr(us, vs, pq, p_prev)
    us_ref, vs_ref, b_ref, sumb_ref = pred(u2, v2)

    fused = make_quad_channel_corr_predictor_source(
        g.shape, case.coeffs, 1.0, tile_rows=8, interpret=True)
    us2, vs2, b, guess, sum_b = fused(us, vs, pq, p_prev)
    np.testing.assert_allclose(np.asarray(us2), np.asarray(us_ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(vs2), np.asarray(vs_ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(b), np.asarray(b_ref), atol=2e-3)
    np.testing.assert_allclose(np.asarray(guess), np.asarray(guess_ref),
                               atol=2e-6)
    assert abs(float(sum_b) - float(sumb_ref)) < 2e-3 * max(abs(float(sumb_ref)), 1.0)


def test_fused_pre_carry_matches_plain_composition():
    """Round-5 headline fusion: the carry kernel with the first V-cycle's
    pre-smooth+residual+restriction folded in
    (make_quad_corr_predictor_source_fused_pre + multigrid quad_first_rc)
    reproduces the plain carry + per-kernel solve BITWISE in interpret
    mode — identical cycle counts and fields over a 5-step trajectory
    (same jnp ops in the same order, only kernel boundaries move)."""
    import jax.numpy as jnp
    import numpy as np

    from cfd_tpu.cases.cavity import make_cavity_case
    from cfd_tpu.solver import Simulation, make_step

    kw = dict(n_interior=64, poisson="multigrid", dtype=jnp.float32,
              tolerance_factor=1e-5, step_kernel_mode="interpret",
              layout="quad")
    ca = make_cavity_case(fuse_pre=True, **kw)
    cb = make_cavity_case(fuse_pre=False, **kw)
    assert ca.carry_fused_pre and not cb.carry_fused_pre
    sa = Simulation(ca, log=lambda *a: None)
    sb = Simulation(cb, log=lambda *a: None)
    st_a, st_b = sa.initial_state(), sb.initial_state()
    step_a, step_b = make_step(ca), make_step(cb)
    for _ in range(5):
        st_a, da = step_a(st_a)
        st_b, db = step_b(st_b)
        assert int(da.poisson_iters) == int(db.poisson_iters)
        assert float(jnp.max(jnp.abs(st_a.p - st_b.p))) == 0.0
        assert float(jnp.max(jnp.abs(st_a.u - st_b.u))) == 0.0
        assert float(jnp.max(jnp.abs(st_a.v - st_b.v))) == 0.0
