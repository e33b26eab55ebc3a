"""Mixed-precision coarse hierarchy (MGConfig.coarse_dtype="bfloat16").

The correction path (restricted residual, every level below the finest,
prolonged correction) stores bf16 while level 0, the outer residual and the
tolerance check stay f32 — iterative-refinement structure: reduced coarse
precision perturbs the CONTRACTION RATE, never the convergence floor, so a
bf16-coarse solve must reach the SAME f32 tolerance as the full-precision
solve, in a comparable number of cycles, and the production trajectories
must agree to solver-tolerance scale. Guards: the knob is per-kernel
aligned/quad f32 only — f64, unaligned, fused-tail/whole-solve/whole-step,
masked and sharded builders all reject loudly."""

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


def _aligned_noise(n, seed):
    """Noise source in the Mosaic-aligned layout (8-row/128-lane f32)."""
    H8, W = M._round_up8_128((n + 2, n + 2))
    b = np.zeros((H8, W), np.float32)
    rng = np.random.default_rng(seed)
    b[1:n + 1, 1:n + 1] = rng.standard_normal((n, n)).astype(np.float32)
    return jnp.asarray(b)


@pytest.mark.parametrize("flavor", [M.cavity_problem, M.channel_problem])
def test_bf16_coarse_reaches_f32_tolerance(flavor):
    """Aligned per-kernel path: bf16 coarse hierarchy converges to the same
    f32 tolerance as full precision, within a small cycle-count band, and
    the converged iterates agree to solver-tolerance scale."""
    n = 64
    problem = flavor(n, n, 1.0 / n, 1.0 / n)
    cfg = M.MGConfig(tol_factor=1e-5)
    mk = lambda c: M.make_multigrid_poisson(
        problem, c, dtype=jnp.float32, aligned_io=True, use_pallas=True,
        pallas_interpret=True)
    solve_f32 = mk(cfg)
    solve_bf16 = mk(dataclasses.replace(cfg, coarse_dtype="bfloat16"))

    b = _aligned_noise(n, seed=3)
    p0 = jnp.zeros_like(b)
    pa, ita, resa = solve_f32(p0, b)
    pb, itb, resb = solve_bf16(p0, b)
    tol = 1e-5 * float(jnp.max(jnp.abs(b)))
    assert float(resa) <= tol
    assert float(resb) <= tol, (float(resb), tol)
    # bf16 coarse correction may cost a couple of extra cycles (weaker
    # per-cycle contraction), never an order more
    assert int(itb) <= int(ita) + 3, (int(ita), int(itb))
    scale = max(1.0, float(jnp.max(jnp.abs(pa))))
    np.testing.assert_allclose(np.asarray(pb), np.asarray(pa),
                               rtol=0, atol=100 * tol * scale)


def test_bf16_coarse_quad_cavity_trajectory():
    """Quad fast path (the 2048^2 headline composition): coarse_dtype
    through the case factory — same trajectory as full precision to
    solver-tolerance scale, comparable cycle counts."""
    from cfd_tpu.cases.cavity import make_cavity_case
    from cfd_tpu.solver import Simulation

    kw = dict(n_interior=32, dtype=jnp.float32, poisson="multigrid",
              tolerance_factor=1e-5, final_time=1.0,
              step_kernel_mode="interpret", layout="quad")
    ref_case = make_cavity_case(**kw)
    bf_case = make_cavity_case(mg_overrides={"coarse_dtype": "bfloat16"},
                               **kw)
    sim_a = Simulation(ref_case, log=lambda *a: None)
    sim_b = Simulation(bf_case, log=lambda *a: None)
    sa, sb = sim_a.initial_state(), sim_b.initial_state()
    for k in range(3):
        sa, da = sim_a._step(sa)
        sb, db = sim_b._step(sb)
        ia, ib = int(da.poisson_iters), int(db.poisson_iters)
        assert ib <= ia + 3, (k, ia, ib)
    la, lb = sim_a._logical(sa), sim_b._logical(sb)
    for name in ("u", "v", "p"):
        a, b = np.asarray(getattr(la, name)), np.asarray(getattr(lb, name))
        scale = max(1.0, np.abs(a).max())
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-3 * scale,
                                   err_msg=name)


def test_bf16_coarse_channel_quad_trajectory():
    """Channel flavor (warm-started solves + source-mean removal) through
    the quad factory with the bf16 coarse hierarchy."""
    from cfd_tpu.cases.channel import make_channel_case
    from cfd_tpu.solver import Simulation

    kw = dict(nx=64, ny=32, dtype=jnp.float32, poisson="multigrid",
              tolerance_factor=1e-5, layout="quad",
              step_kernel_mode="interpret")
    ref_case = make_channel_case(**kw)
    bf_case = make_channel_case(mg_overrides={"coarse_dtype": "bfloat16"},
                                **kw)
    sim_a = Simulation(ref_case, log=lambda *a: None)
    sim_b = Simulation(bf_case, log=lambda *a: None)
    sa, sb = sim_a.initial_state(), sim_b.initial_state()
    for k in range(3):
        sa, da = sim_a._step(sa)
        sb, db = sim_b._step(sb)
        assert int(db.poisson_iters) <= int(da.poisson_iters) + 3
    la, lb = sim_a._logical(sa), sim_b._logical(sb)
    for name in ("u", "v", "p"):
        a, b = np.asarray(getattr(la, name)), np.asarray(getattr(lb, name))
        scale = max(1.0, np.abs(a).max())
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-3 * scale,
                                   err_msg=name)


# ---------------------------------------------------------------- guards

def _cfg_bf16(**kw):
    return M.MGConfig(coarse_dtype="bfloat16", **kw)


def test_rejects_f64():
    n = 32
    problem = M.cavity_problem(n, n, 1.0 / n, 1.0 / n)
    with pytest.raises(ValueError, match="float32"):
        M.make_multigrid_poisson(problem, _cfg_bf16(), dtype=jnp.float64)


def test_rejects_unaligned():
    n = 32
    problem = M.cavity_problem(n, n, 1.0 / n, 1.0 / n)
    with pytest.raises(ValueError, match="aligned"):
        M.make_multigrid_poisson(problem, _cfg_bf16(), dtype=jnp.float32,
                                 use_pallas=True, pallas_interpret=True)


def test_rejects_fused_tail():
    n = 64
    problem = M.cavity_problem(n, n, 1.0 / n, 1.0 / n)
    with pytest.raises(ValueError, match="tail_from"):
        M.make_multigrid_poisson(problem, _cfg_bf16(tail_from=1),
                                 dtype=jnp.float32, aligned_io=True,
                                 use_pallas=True, pallas_interpret=True)


def test_rejects_unknown_dtype():
    n = 32
    problem = M.cavity_problem(n, n, 1.0 / n, 1.0 / n)
    with pytest.raises(ValueError, match="coarse_dtype"):
        M.make_multigrid_poisson(
            problem, M.MGConfig(coarse_dtype="float16"), dtype=jnp.float32,
            aligned_io=True, use_pallas=True, pallas_interpret=True)


def test_whole_solve_bf16_hierarchy_matches_f32():
    """Round-5 composition (VERDICT round-4 item 1): the fused whole-solve
    kernel with its IN-VMEM hierarchy stored bf16 must reach the same f32
    tolerance as the f32-hierarchy kernel, within a cycle of it, with the
    converged iterate close — the iterative-refinement argument, now inside
    one Pallas call (kernels/whole_solve.py separable_vcycle_ctx)."""
    from cfd_tpu.kernels.quad import to_quad
    from cfd_tpu.kernels.whole_solve import make_quad_whole_solve

    n = 64
    tol_factor = 1e-4
    problem = M.channel_problem(n, n, 1.0 / n, 1.0 / n)
    shape = (n + 2, n + 2)
    cfg = M.MGConfig(pre_sweeps=2, post_sweeps=1, tol_factor=tol_factor)
    solve_f32 = make_quad_whole_solve(shape, problem, cfg, interpret=True)
    solve_bf16 = make_quad_whole_solve(shape, problem, _cfg_bf16(
        pre_sweeps=2, post_sweeps=1, tol_factor=tol_factor), interpret=True)

    rng = np.random.default_rng(7)
    b_np = np.zeros(shape, np.float32)
    b_np[1:n + 1, 1:n + 1] = rng.standard_normal((n, n)).astype(np.float32)
    b = to_quad(jnp.asarray(b_np), shape)
    p0 = jnp.zeros_like(b)
    pa, ita, resa = solve_f32(p0, b)
    pb, itb, resb = solve_bf16(p0, b)
    tol = tol_factor * float(jnp.max(jnp.abs(b)))
    assert float(resa) <= tol and float(resb) <= tol
    # bf16 correction path may cost a cycle (contraction-rate shift only)
    assert int(itb) <= int(ita) + 1, (int(ita), int(itb))
    np.testing.assert_allclose(np.asarray(pb), np.asarray(pa), atol=80 * tol)


def test_masked_whole_solve_bf16_hierarchy_matches_f32():
    """Same composition on the masked (backwards-step) whole-solve: exact
    f32 fine level + bf16-stored defect-correction hierarchy."""
    from cfd_tpu.cases.backwards_step import make_backwards_step_case
    from cfd_tpu.kernels.whole_solve import make_quad_step_whole_solve

    case = make_backwards_step_case(nx=64, ny=16, dtype=jnp.float32,
                                    poisson="multigrid",
                                    tolerance_factor=1e-4,
                                    smoother_mode="off")
    tol_factor = 1e-4
    mk = lambda cfg: make_quad_step_whole_solve(case.grid, case.coeffs, cfg,
                                                interpret=True)
    solve_f32 = mk(M.MGConfig(pre_sweeps=2, post_sweeps=1,
                              tol_factor=tol_factor))
    solve_bf16 = mk(_cfg_bf16(pre_sweeps=2, post_sweeps=1,
                              tol_factor=tol_factor))

    from cfd_tpu.kernels.quad import to_quad

    rng = np.random.default_rng(11)
    b_np = np.zeros(case.grid.shape, np.float32)
    fl = np.asarray(case.grid.fluid)
    b_np[fl] = rng.standard_normal(int(fl.sum())).astype(np.float32)
    b = to_quad(jnp.asarray(b_np), case.grid.shape)
    p0 = jnp.zeros_like(b)
    pa, ita, resa = solve_f32(p0, b)
    pb, itb, resb = solve_bf16(p0, b)
    tol = tol_factor * float(jnp.max(jnp.abs(b)))
    assert float(resa) <= tol and float(resb) <= tol
    assert int(itb) <= int(ita) + 1, (int(ita), int(itb))
    np.testing.assert_allclose(np.asarray(pb), np.asarray(pa), atol=80 * tol)


def test_auto_whole_solve_falls_back_to_per_kernel():
    """coarse_dtype counts as a manual fusion override: auto_whole_solve
    routes to the per-kernel fallback instead of the (rejecting) fused
    build."""
    from cfd_tpu.kernels.whole_solve import auto_whole_solve

    solve, mg = auto_whole_solve(
        _cfg_bf16(), {"coarse_dtype": "bfloat16"}, False,
        build=lambda: (_ for _ in ()).throw(AssertionError("not manual")),
        fallback=lambda: "fallback")
    assert solve == "fallback" and not mg.whole_solve


def test_masked_builder_rejects():
    from cfd_tpu.cases.backwards_step import make_backwards_step_case

    off = make_backwards_step_case(nx=64, ny=16, dtype=jnp.float32,
                                   poisson="multigrid",
                                   tolerance_factor=1e-5,
                                   smoother_mode="off")
    with pytest.raises(ValueError, match="masked"):
        M.make_masked_quad_multigrid_poisson(off.grid, off.coeffs,
                                             _cfg_bf16(), interpret=True)


def test_sharded_builder_rejects():
    import jax
    from jax.sharding import Mesh

    from cfd_tpu.parallel.quad_sharded import ShardedQuadProjection
    from cfd_tpu.cases.cavity import make_cavity_case

    case = make_cavity_case(n_interior=64, dtype=jnp.float32,
                            poisson="multigrid", layout="quad",
                            step_kernel_mode="interpret")
    mesh = Mesh(np.array(jax.devices("cpu")[:2]), ("dy",))
    with pytest.raises(ValueError, match="sharded"):
        ShardedQuadProjection(case, mesh, interpret=True,
                              mg_overrides={"coarse_dtype": "bfloat16"})


def test_cli_parses_string_mg_value():
    """--mg coarse_dtype=bfloat16 must survive the typed K=V parser as a
    string (non-numeric values used to crash on float()); the parsed value
    then reaches MGConfig and trips the factory's own loud guard (CPU
    factory = unaligned XLA path)."""
    from cfd_tpu.cli import build_parser, make_case_from_args

    args = build_parser().parse_args(
        ["cavity", "--Nx", "128", "--Ny", "128", "--poisson", "multigrid",
         "--precision", "f32", "--mg", "coarse_dtype=bfloat16"])
    with pytest.raises(ValueError, match="coarse_dtype requires"):
        make_case_from_args(args)


def test_auto_bf16_predicate():
    """The fully-auto bf16 flip condition and the 'float32' opt-out strip
    are pure helpers (poisson/multigrid.py) so a regression is caught
    off-TPU (ADVICE round-4 low: the factory gate is real-TPU-only)."""
    cfg = M.MGConfig(tol_factor=1e-6)

    # opt-out normalization: strip + report, other keys survive
    assert M.normalize_coarse_dtype_optout(None) == (False, None)
    assert M.normalize_coarse_dtype_optout({}) == (False, {})
    f32, ov = M.normalize_coarse_dtype_optout(
        {"coarse_dtype": "float32", "pre_sweeps": 2})
    assert f32 and ov == {"pre_sweeps": 2}
    f32, ov = M.normalize_coarse_dtype_optout({"coarse_dtype": "f32"})
    assert f32 and ov == {}
    f32, ov = M.normalize_coarse_dtype_optout({"coarse_dtype": "bfloat16"})
    assert not f32 and ov == {"coarse_dtype": "bfloat16"}

    # fully-auto case flips
    assert M.auto_bf16_coarse(False, False, cfg, None)
    assert M.auto_bf16_coarse(False, False, cfg, {"pre_sweeps": 2})
    # interpret mode, explicit opt-out, manual fusion knobs all keep f32
    assert not M.auto_bf16_coarse(True, False, cfg, None)
    assert not M.auto_bf16_coarse(False, True, cfg, None)
    assert not M.auto_bf16_coarse(False, False, cfg,
                                  {"whole_solve": False})
    assert not M.auto_bf16_coarse(False, False, cfg,
                                  {"coarse_dtype": "bfloat16"})
    assert not M.auto_bf16_coarse(
        False, False, dataclasses.replace(cfg, whole_step=True), None)
    assert not M.auto_bf16_coarse(
        False, False, dataclasses.replace(cfg, tail_from=1), None)
    assert not M.auto_bf16_coarse(
        False, False, dataclasses.replace(cfg, coarse_dtype="bfloat16"),
        None)
