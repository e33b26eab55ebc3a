"""Multi-chip Simulation/CLI integration (round-3): ``Simulation(case,
mesh=...)`` drives the sharded quad fast path through the SAME time loop,
stats rows, export and checkpoint machinery as single-chip runs — the
TPU-native answer to the reference's OpenFOAM decomposePar + mpirun
workflow (reference README.md:129-131)."""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu.cases import make_cavity_case
from cfd_tpu.solver import Simulation
from jax.sharding import Mesh


def cpu_mesh_1d(n: int) -> Mesh:
    devs = np.array(jax.devices("cpu")[:n])
    return Mesh(devs, ("dy",))


def make_case(n=64):
    return make_cavity_case(n_interior=n, dtype=jnp.float32,
                            poisson="multigrid",
                            step_kernel_mode="interpret", layout="quad")


def test_sharded_simulation_matches_single_device():
    """Simulation(mesh=4-device) history rows and final state == the
    single-device quad Simulation (stats gathered at print cadence)."""
    case = make_case(64)

    ref = Simulation(case, log=lambda *a: None)
    ref_state = ref.run(n_steps=4, steps_per_call=2)
    ref_logical = ref._logical(ref_state)

    sim = Simulation(case, log=lambda *a: None, mesh=cpu_mesh_1d(4))
    state = sim.run(n_steps=4, steps_per_call=2)
    got = sim._logical(state)

    assert len(sim.history) == len(ref.history)
    for got_row, ref_row in zip(sim.history, ref.history):
        assert got_row["step"] == ref_row["step"]
        for key in ("max_divergence", "avg_kinetic_energy"):
            np.testing.assert_allclose(got_row[key], ref_row[key],
                                       rtol=1e-4, atol=1e-7, err_msg=key)
    for name in ("u", "v", "p"):
        a = np.asarray(getattr(ref_logical, name))
        b = np.asarray(getattr(got, name))
        np.testing.assert_allclose(b, a, rtol=0, atol=2e-5 * max(
            1.0, float(np.abs(a).max())), err_msg=name)


def test_sharded_simulation_checkpoint_resume(tmp_path):
    """Checkpoint written by a sharded run resumes (engine.from_logical)
    to the same trajectory as the uninterrupted sharded run."""
    from cfd_tpu.io.checkpoint import CheckpointManager

    case = make_case(64)
    mesh = cpu_mesh_1d(4)

    full = Simulation(case, log=lambda *a: None, mesh=mesh)
    full_state = full.run(n_steps=4, steps_per_call=2)
    want = full._logical(full_state)

    sim1 = Simulation(case, log=lambda *a: None, mesh=mesh)
    sim1.checkpointer = CheckpointManager(tmp_path, interval=2)
    sim1.run(n_steps=2, steps_per_call=2)

    sim2 = Simulation(case, log=lambda *a: None, mesh=mesh)
    restored, start = CheckpointManager(tmp_path, interval=2).restore_latest(case)
    assert start == 2
    state = sim2.run(state=restored, n_steps=2, start_step=start,
                     steps_per_call=2)
    got = sim2._logical(state)

    # resume passes the logical state through uncorrect_quad/to_quad — one
    # f32 rounding at the involution boundary, not bitwise
    for name in ("u", "v", "p"):
        a = np.asarray(getattr(want, name))
        b = np.asarray(getattr(got, name))
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-5 * max(
            1.0, float(np.abs(a).max())), err_msg=name)


def test_cli_mesh_guards():
    """--mesh guards fail fast with actionable messages."""
    from cfd_tpu import cli

    with pytest.raises(SystemExit, match="precision f32"):
        cli.main(["cavity", "--mesh", "2", "--steps", "1", "--no-vtk",
                  "--no-color"])
    with pytest.raises(SystemExit, match="lagged"):
        cli.main(["cavity", "--mesh", "2", "--precision", "f32",
                  "--adaptive-dt", "0.5", "--steps", "1", "--no-vtk",
                  "--no-color"])


@pytest.mark.slow
def test_cli_mesh_smoke(tmp_path):
    """`cfd_tpu.cli cavity --mesh 2 --precision f32` runs end-to-end on the
    virtual CPU mesh and prints stats rows."""
    import os

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    out = subprocess.run(
        [sys.executable, "-m", "cfd_tpu.cli", "cavity", "--mesh", "2",
         "--precision", "f32", "--poisson", "multigrid", "--Nx", "32",
         "--Ny", "32", "--steps", "2", "--print-interval", "1",
         "--no-vtk", "--no-color"],
        capture_output=True, text=True, env=env, timeout=1200)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "mesh: 2x1 plane-row decomposition" in out.stdout
    assert "Step      2/" in out.stdout
