"""Multi-chip lagged-controller adaptive dt (round-3): the sharded quad
engine's adaptive chunk (ShardedQuadProjection.make_adaptive) == the
single-device lagged controller (cfd_tpu.adaptive run_adaptive
controller='lagged') to f32 roundoff — same (dt_corr, dt_pred) SMEM-pair
kernels, Courant partials pmaxed, controller replicated on every device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu.adaptive import run_adaptive
from cfd_tpu.cases import make_cavity_case
from cfd_tpu.solver import Simulation
from jax.sharding import Mesh


def cpu_mesh_1d(n: int) -> Mesh:
    devs = np.array(jax.devices("cpu")[:n])
    return Mesh(devs, ("dy",))


def _compare(ref_state, ref_rows, got_state, got_rows, fields=("u", "v", "p")):
    assert len(got_rows) == len(ref_rows)
    for got_row, ref_row in zip(got_rows, ref_rows):
        assert got_row["step"] == ref_row["step"]
        np.testing.assert_allclose(got_row["dt"], ref_row["dt"],
                                   rtol=1e-5, err_msg="dt")
        np.testing.assert_allclose(got_row["courant"], ref_row["courant"],
                                   rtol=1e-4, atol=1e-7, err_msg="courant")
    for name in fields:
        a = np.asarray(getattr(ref_state, name))
        b = np.asarray(getattr(got_state, name))
        np.testing.assert_allclose(b, a, rtol=0, atol=3e-5 * max(
            1.0, float(np.abs(a).max())), err_msg=name)


def test_sharded_adaptive_cavity_matches_single_device():
    case = make_cavity_case(n_interior=64, dtype=jnp.float32,
                            poisson="multigrid",
                            step_kernel_mode="interpret", layout="quad",
                            print_interval=2)

    ref_sim = Simulation(case, log=lambda *a: None)
    ref_state, ref_rows = run_adaptive(
        ref_sim, max_courant=0.5, n_steps=4, steps_per_call=2,
        controller="lagged")

    sim = Simulation(case, log=lambda *a: None, mesh=cpu_mesh_1d(4))
    state, rows = run_adaptive(
        sim, max_courant=0.5, n_steps=4, steps_per_call=2,
        controller="lagged")

    # both paths end at the logical layout (to_logical of the carry)
    _compare(ref_state, ref_rows, state, rows)


def test_sharded_adaptive_rb_matches_single_device():
    """4-array carry (T), pure-Neumann pinned V-cycle, kappa-aware
    diffusive ceiling — the RB flavor of the sharded adaptive chunk."""
    from cfd_tpu.physics.boussinesq import make_rayleigh_benard_case

    case = make_rayleigh_benard_case(
        nx=48, ny=16, rayleigh=1e5, dtype=jnp.float32,
        tolerance_factor=1e-5, abs_tol=1e-7,
        step_kernel_mode="interpret", layout="quad", print_interval=2)

    ref_sim = Simulation(case, log=lambda *a: None)
    ref_state, ref_rows = run_adaptive(
        ref_sim, max_courant=0.5, n_steps=4, steps_per_call=2,
        controller="lagged")

    sim = Simulation(case, log=lambda *a: None, mesh=cpu_mesh_1d(4))
    state, rows = run_adaptive(
        sim, max_courant=0.5, n_steps=4, steps_per_call=2,
        controller="lagged")

    _compare(ref_state, ref_rows, state, rows, fields=("u", "v", "p", "T"))


def test_sharded_adaptive_channel_matches_single_device():
    """Channel branch: psummed source-mean removal + post-removal max|b|
    tolerance base under the adaptive chunk."""
    from cfd_tpu.cases import make_channel_case

    case = make_channel_case(nx=64, ny=16, dtype=jnp.float32,
                             poisson="multigrid", tolerance_factor=1e-5,
                             step_kernel_mode="interpret", layout="quad",
                             print_interval=2)

    ref_sim = Simulation(case, log=lambda *a: None)
    ref_state, ref_rows = run_adaptive(
        ref_sim, max_courant=0.5, n_steps=4, steps_per_call=2,
        controller="lagged")

    sim = Simulation(case, log=lambda *a: None, mesh=cpu_mesh_1d(4))
    state, rows = run_adaptive(
        sim, max_courant=0.5, n_steps=4, steps_per_call=2,
        controller="lagged")

    _compare(ref_state, ref_rows, state, rows)


def test_sharded_adaptive_checkpoint_resume(tmp_path):
    """Sharded adaptive checkpoint (dt/t/dt_used extras) resumes to the
    uninterrupted sharded trajectory (one f32 rounding at the logical
    boundary, as the single-device lagged path)."""
    from cfd_tpu.io.checkpoint import CheckpointManager

    case = make_cavity_case(n_interior=64, dtype=jnp.float32,
                            poisson="multigrid",
                            step_kernel_mode="interpret", layout="quad",
                            print_interval=2)
    mesh = cpu_mesh_1d(4)

    full = Simulation(case, log=lambda *a: None, mesh=mesh)
    want, _ = run_adaptive(full, max_courant=0.5, n_steps=4,
                           steps_per_call=2, controller="lagged")

    sim1 = Simulation(case, log=lambda *a: None, mesh=mesh)
    sim1.checkpointer = CheckpointManager(tmp_path, interval=2)
    run_adaptive(sim1, max_courant=0.5, n_steps=2, steps_per_call=2,
                 controller="lagged")

    sim2 = Simulation(case, log=lambda *a: None, mesh=mesh)
    sim2.checkpointer = CheckpointManager(tmp_path, interval=2)
    got, _ = run_adaptive(sim2, max_courant=0.5, n_steps=4,
                          steps_per_call=2, controller="lagged")

    for name in ("u", "v", "p"):
        a = np.asarray(getattr(want, name))
        b = np.asarray(getattr(got, name))
        np.testing.assert_allclose(b, a, rtol=0, atol=3e-5 * max(
            1.0, float(np.abs(a).max())), err_msg=name)


@pytest.mark.slow
def test_sharded_adaptive_step_matches_single_device():
    """Masked 3-array carry + fluid-only mean + defect-correction solve."""
    from cfd_tpu.cases.backwards_step import make_backwards_step_case

    case = make_backwards_step_case(
        nx=64, ny=16, dtype=jnp.float32, poisson="multigrid",
        tolerance_factor=1e-5, smoother_mode="interpret", layout="quad",
        mg_overrides={"pre_sweeps": 1, "post_sweeps": 1}, print_interval=2)

    ref_sim = Simulation(case, log=lambda *a: None)
    ref_state, ref_rows = run_adaptive(
        ref_sim, max_courant=0.5, n_steps=4, steps_per_call=2,
        controller="lagged")

    sim = Simulation(case, log=lambda *a: None, mesh=cpu_mesh_1d(4))
    state, rows = run_adaptive(
        sim, max_courant=0.5, n_steps=4, steps_per_call=2,
        controller="lagged")

    _compare(ref_state, ref_rows, state, rows)
