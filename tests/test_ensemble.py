"""Data-parallel ensemble sweeps: vmapped batch == individual runs."""

import jax
import numpy as np

from cfd_tpu.cases import make_cavity_case
from cfd_tpu.parallel.ensemble import ensemble_cavity_sweep
from cfd_tpu.parallel import make_mesh
from cfd_tpu.solver import Simulation


def quiet(*a, **k):
    pass


def test_ensemble_matches_individual_runs():
    res = [100.0, 400.0]
    n = 15
    step, states, nus, dt = ensemble_cavity_sweep(res, n_interior=n)
    for _ in range(3):
        states, iters, residuals = step(states, nus)

    for k, re in enumerate(res):
        case = make_cavity_case(n_interior=n, reynolds_number=re, dt=dt,
                                final_time=1.0)
        sim = Simulation(case, log=quiet)
        st = sim.initial_state()
        for _ in range(3):
            st, diag = sim._step(st)
        np.testing.assert_allclose(np.asarray(states.u[k]), np.asarray(st.u),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(states.p[k]), np.asarray(st.p),
                                   atol=1e-11)


def test_ensemble_sharded_over_mesh_batch_axis():
    mesh = make_mesh(8, shape=(8, 1), devices=jax.devices("cpu"))
    step, states, nus, dt = ensemble_cavity_sweep(
        [100, 200, 300, 400, 500, 600, 700, 800], n_interior=8, mesh=mesh)
    states2, iters, residuals = step(states, nus)
    assert states2.u.shape == (8, 10, 10)
    # members with higher Re (lower viscosity) develop less smoothed fields;
    # all stay finite and distinct
    u = np.asarray(states2.u)
    assert np.isfinite(u).all()
    assert not np.allclose(u[0], u[-1])
