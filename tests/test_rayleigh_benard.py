"""Rayleigh-Benard (Boussinesq) case and FTLE diagnostics."""

import jax.numpy as jnp
import numpy as np
import pytest

from cfd_tpu.cases import make_rayleigh_benard_case
from cfd_tpu.grid import Grid
from cfd_tpu.physics.boussinesq import streamfunction
from cfd_tpu.physics.ftle import ftle_field
from cfd_tpu.solver import Simulation


def quiet(*a, **k):
    pass


def test_subcritical_rayleigh_stays_conductive():
    """Below Ra_c = 1708 perturbations decay: KE -> 0, wall Nu -> 1."""
    case = make_rayleigh_benard_case(nx=32, ny=16, aspect=2.0, rayleigh=1000.0,
                                     perturbation=1e-3, final_time=1.0)
    sim = Simulation(case, log=quiet)
    state = sim.initial_state()
    for _ in range(400):
        state, _ = sim._step(state)
    stats = sim.statistics(state)
    assert stats["avg_kinetic_energy"] < 1e-6
    assert abs(stats["nusselt_bottom"] - 1.0) < 0.05
    assert abs(stats["nusselt_top"] - 1.0) < 0.05


def test_supercritical_rayleigh_convects():
    """Ra=1e6: convection grows from the seeded perturbation, temperature
    stays within the maximum-principle bounds, heat transport exceeds
    conduction."""
    case = make_rayleigh_benard_case(nx=96, ny=32, final_time=100.0)
    sim = Simulation(case, log=quiet)
    state = sim.initial_state()
    for _ in range(1500):
        state, _ = sim._step(state)
    stats = sim.statistics(state)
    assert stats["avg_kinetic_energy"] > 1e-3  # O(0.05) free-fall units
    assert stats["nusselt_bottom"] > 2.0
    assert stats["nusselt_top"] > 2.0
    assert -0.05 < stats["temperature_min"] < stats["temperature_max"] < 1.05
    assert stats["max_divergence"] < 1e-4


@pytest.mark.slow
def test_nusselt_approaches_benchmark_band():
    """Quasi-steady Ra=1e6, Pr=0.71 heat transport lands in the classical 2D
    band (Nu ~ 5-12 across aspect ratios / BCs at moderate resolution) with
    top/bottom walls in balance."""
    case = make_rayleigh_benard_case(nx=96, ny=32, final_time=100.0)
    sim = Simulation(case, log=quiet)
    state = sim.initial_state()
    for _ in range(4000):
        state, _ = sim._step(state)
    # average over a window to smooth plume oscillations
    nub, nut = [], []
    for _ in range(20):
        for _ in range(25):
            state, _ = sim._step(state)
        s = sim.statistics(state)
        nub.append(s["nusselt_bottom"])
        nut.append(s["nusselt_top"])
    nub, nut = np.mean(nub), np.mean(nut)
    assert 5.0 < nub < 12.0, (nub, nut)
    assert 5.0 < nut < 12.0, (nub, nut)
    assert abs(nub - nut) / nub < 0.2


def test_streamfunction_of_uniform_flow_is_linear_in_y():
    g = Grid.regular(8, 8)
    u = jnp.ones((10, 10))
    psi = np.asarray(streamfunction(u, g))
    y = (np.arange(1, 9) - 0.5) * g.dy
    np.testing.assert_allclose(psi[1:9, 4], y, rtol=1e-6)


def test_ftle_of_linear_saddle_flow_recovers_strain_rate():
    """u = a(x - cx), v = -a(y - cy): the flow map is diag(e^{aT}, e^{-aT}),
    so FTLE = a everywhere (the analytic oracle for the whole pipeline)."""
    g = Grid.regular(64, 64)
    a = 0.8
    jj, ii = np.mgrid[0:66, 0:66]
    xc = (ii - 0.5) * g.dx
    yc = (jj - 0.5) * g.dy
    u = a * (xc - 0.5)
    v = -a * (yc - 0.5)
    frames_u = jnp.asarray(np.stack([u] * 5))
    frames_v = jnp.asarray(np.stack([v] * 5))
    times = jnp.linspace(0.0, 0.5, 5)
    ftle, xs, ys = ftle_field(frames_u, frames_v, times, g,
                              n_seed_x=32, n_seed_y=32, n_sub=4)
    inner = np.asarray(ftle)[8:24, 8:24]  # away from clipped boundaries
    np.testing.assert_allclose(inner, a, atol=0.05)


def test_ftle_backward_of_saddle_swaps_axes():
    """Backward FTLE of the same saddle also equals a (symmetric exponents),
    exercising the frame/sign reversal path."""
    g = Grid.regular(32, 32)
    a = 0.5
    jj, ii = np.mgrid[0:34, 0:34]
    xc = (ii - 0.5) * g.dx
    yc = (jj - 0.5) * g.dy
    u = a * (xc - 0.5)
    v = -a * (yc - 0.5)
    frames_u = jnp.asarray(np.stack([u] * 3))
    frames_v = jnp.asarray(np.stack([v] * 3))
    times = jnp.linspace(0.0, 0.4, 3)
    ftle, _, _ = ftle_field(frames_u, frames_v, times, g,
                            n_seed_x=16, n_seed_y=16, n_sub=4, backward=True)
    inner = np.asarray(ftle)[5:11, 5:11]
    np.testing.assert_allclose(inner, a, atol=0.06)


def test_rb_vtk_export_includes_temperature_and_streamfunction(tmp_path):
    from cfd_tpu.io.vtk import exporter_for_case

    case = make_rayleigh_benard_case(nx=32, ny=16, aspect=2.0, final_time=1.0)
    sim = Simulation(case, log=quiet)
    state = sim.initial_state()
    exp = exporter_for_case(case, out_dir=tmp_path)
    p = exp(state, 0, 0.0)
    text = p.read_text()
    assert "SCALARS temperature double 1" in text
    assert "SCALARS streamfunction double 1" in text
    # vorticity rides the standard writer path (computed from center
    # velocities exactly as the reference writers do, cavity-01.cpp:184-224)
    assert "SCALARS vorticity double 1" in text
