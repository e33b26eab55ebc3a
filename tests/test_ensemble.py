"""Data-parallel ensemble sweeps: vmapped batch == individual runs."""

import jax
import numpy as np
import pytest

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
        # the sweep's shared dt trips the factory's CFL advisory for the
        # low-Re members (higher viscosity -> tighter diffusive number);
        # expected here — the run is only 3 steps
        with pytest.warns(UserWarning, match="stability limit"):
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


@pytest.mark.slow
def test_nu_vs_ra_scaling_band():
    """The reference README's own RB TODO (README.md:91): Nu(Ra) from the
    vmapped Rayleigh-number ensemble must land in the classical 2D band —
    Nu ~ C*Ra^beta with beta ~ 0.25-0.3 — and the wall/volume Nusselt
    numbers must agree (global heat-flux balance).

    Measured steady values at 96x32 (aspect 3): Nu = 2.505 / 4.68 / ~8.0 at
    Ra = 1e4 / 1e5 / 1e6."""
    from cfd_tpu.parallel.ensemble import make_rb_ensemble

    ras = [1e4, 1e5, 1e6]
    step, states, ras_j, dt, nusselt = make_rb_ensemble(ras)
    for _ in range(12000):
        states, iters, res = step(states, ras_j)
    nu = {k: np.asarray(v) for k, v in nusselt(states, ras_j).items()}
    vol = nu["nusselt_volume"]
    assert 2.2 < vol[0] < 2.9, vol
    assert 4.2 < vol[1] < 5.2, vol
    assert 6.3 < vol[2] < 9.5, vol
    assert vol[0] < vol[1] < vol[2], "Nu must increase with Ra"
    slope = np.polyfit(np.log10(ras), np.log10(vol), 1)[0]
    assert 0.20 < slope < 0.33, slope
    # wall flux consistency (steady members; Ra=1e6 fluctuates more)
    assert abs(nu["nusselt_bottom"][0] / vol[0] - 1) < 0.05
    assert abs(nu["nusselt_bottom"][1] / vol[1] - 1) < 0.10
