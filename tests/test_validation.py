"""Physics validation: Ghia centerlines, Poiseuille + friction factor,
step reattachment length (the reference's claimed checks, README.md:27-75)."""

import os

import numpy as np
import pytest

from cfd_tpu.cases import make_backwards_step_case, make_cavity_case, make_channel_case
from cfd_tpu.solver import Simulation
from cfd_tpu.validation import (
    fanning_friction_factor,
    ghia_errors,
    poiseuille_profile_error,
    reattachment_length,
)


def quiet(*a, **k):
    pass


@pytest.mark.slow
def test_cavity_re100_matches_ghia():
    """Re=100 cavity at 64^2 to steady state vs Ghia et al. (1982).

    64^2 vs Ghia's 129^2: discretization error dominates; 0.03 RMS is the
    standard acceptance band at this resolution."""
    case = make_cavity_case(n_interior=64, reynolds_number=100.0,
                            final_time=15.0, poisson="multigrid",
                            tolerance_factor=1e-8)
    sim = Simulation(case, log=quiet)
    state = sim.initial_state()
    for _ in range(case.total_steps):
        state, _ = sim._step(state)
    errs = ghia_errors(state.u, state.v, case.grid, 100)
    assert errs["u_rms"] < 0.03, errs
    assert errs["v_rms"] < 0.03, errs
    assert errs["u_max"] < 0.06, errs


@pytest.mark.slow
def test_channel_poiseuille_and_friction_factor():
    """Developed profile at x=0.8L vs analytic parabola; Fanning f vs 12/Re.

    Run at Re=20: the reference's own Re=100 config cannot fully develop in
    its L=3H domain (entrance length ~0.05*Re*H = 5H; its steady avg KE
    0.538 < 0.6 developed value confirms it), so the README's Poiseuille
    claim is only reachable at lower Re or longer domains. At Re=20 the
    entrance length is ~1H and x=2.4 is fully developed. The discrete
    parabola is an exact steady solution of the central scheme, so the
    remaining error measures development, not discretization."""
    re = 20.0
    case = make_channel_case(nx=48, ny=16, reynolds_number=re, final_time=8.0)
    sim = Simulation(case, log=quiet)
    state = sim.initial_state()
    for _ in range(case.total_steps):
        state, _ = sim._step(state)
    g = case.grid
    errs = poiseuille_profile_error(state.u, g, x_station=0.8 * g.lx)
    # shape: peak/mean -> 1.5 for the parabola (normalized per station; the
    # scheme's residual divergence decays the absolute flux downstream)
    assert abs(errs["peak_ratio"] - 1.5) < 0.01, errs
    assert errs["rms"] < 0.02 * errs["u_mean"], errs
    # flux loss stays bounded (reference-scheme artifact, not a regression)
    assert errs["u_mean"] > 0.85
    f = fanning_friction_factor(state.u, g, case.coeffs.viscosity,
                                case.coeffs.density, x_station=0.8 * g.lx,
                                u_mean=errs["u_mean"])
    f_exact = 12.0 / re
    assert abs(f - f_exact) / f_exact < 0.08, (f, f_exact)


@pytest.mark.slow
def test_backwards_step_reattachment_length():
    """Re=100 step: reattachment settles in the literature band.

    With the reference geometry (expansion ratio 2, Re = U*h_inlet/nu = 100)
    laminar benchmarks put x_r/h_step between 2.5 and 4.5 at moderate
    resolution; exact value is grid-dependent at 128x16."""
    case = make_backwards_step_case(nx=128, ny=16, final_time=15.0)
    sim = Simulation(case, log=quiet)
    state = sim.initial_state()
    for _ in range(case.total_steps):
        state, _ = sim._step(state)
    xr = reattachment_length(state.u, case.grid, step_x=2.0)
    h_step = 1.0  # upper-half channel height
    assert 2.0 < xr / h_step < 5.0, xr
    # steadiness: another 50 steps move x_r by <1%
    for _ in range(50):
        state, _ = sim._step(state)
    xr2 = reattachment_length(state.u, case.grid, step_x=2.0)
    assert abs(xr2 - xr) < 0.01 * xr


def test_ghia_tables_are_consistent():
    """Sanity on the transcribed benchmark tables: endpoints and signs."""
    from cfd_tpu.validation import GHIA_U, GHIA_V, GHIA_X, GHIA_Y

    for re in (100, 1000):
        assert GHIA_U[re][0] == 0.0 and GHIA_U[re][-1] == 1.0
        assert GHIA_V[re][0] == 0.0 and GHIA_V[re][-1] == 0.0
        assert GHIA_U[re][len(GHIA_Y) // 2] < 0  # return flow below center
    assert len(GHIA_Y) == 17 and len(GHIA_X) == 17


@pytest.mark.slow
def test_cavity_re1000_matches_ghia():
    """Re=1000 (the reference's headline config, README.md:27) at 64^2 to
    t=30 vs Ghia et al.; measured RMS ~0.015 at this resolution."""
    case = make_cavity_case(n_interior=64, reynolds_number=1000.0,
                            final_time=30.0, poisson="multigrid",
                            tolerance_factor=1e-8)
    sim = Simulation(case, log=quiet)
    state = sim.initial_state()
    for _ in range(case.total_steps):
        state, _ = sim._step(state)
    errs = ghia_errors(state.u, state.v, case.grid, 1000)
    assert errs["u_rms"] < 0.03, errs
    assert errs["v_rms"] < 0.03, errs
    assert errs["u_max"] < 0.05, errs


@pytest.mark.slow
@pytest.mark.skipif(os.environ.get("CFD_TPU_FULL_TRACE") != "1",
                    reason="set CFD_TPU_FULL_TRACE=1 (thorough tier, ~10 min)")
def test_cavity_re100_matches_ghia_128():
    """Thorough-tier Ghia check at 128^2 (>= Ghia's own 129^2 spacing):
    pins the headline validation claim at full fidelity. Measured at this
    resolution (f64, multigrid, t=15): u_rms 0.0022, v_rms 0.0047,
    u_max 0.0049 — an order tighter than the 0.03 band at 64^2."""
    case = make_cavity_case(n_interior=128, reynolds_number=100.0,
                            final_time=15.0, poisson="multigrid",
                            tolerance_factor=1e-8)
    sim = Simulation(case, log=quiet)
    state = sim.initial_state()
    for _ in range(case.total_steps):
        state, _ = sim._step(state)
    errs = ghia_errors(state.u, state.v, case.grid, 100)
    assert errs["u_rms"] < 0.005, errs
    assert errs["v_rms"] < 0.008, errs
    assert errs["u_max"] < 0.012, errs


@pytest.mark.slow
@pytest.mark.skipif(os.environ.get("CFD_TPU_FULL_TRACE") != "1",
                    reason="set CFD_TPU_FULL_TRACE=1 (thorough tier)")
def test_cavity_re1000_matches_ghia_128():
    """Thorough-tier Re=1000 (the reference's headline config) at 128^2 to
    t=25. Measured: u_rms 0.0116, v_rms 0.0101, u_max 0.0227 — consistent
    with 2nd-order discretization of the Re=1000 boundary layers at this
    resolution (Ghia's own table is 129^2)."""
    case = make_cavity_case(n_interior=128, reynolds_number=1000.0,
                            final_time=25.0, poisson="multigrid",
                            tolerance_factor=1e-8)
    sim = Simulation(case, log=quiet)
    state = sim.initial_state()
    for _ in range(case.total_steps):
        state, _ = sim._step(state)
    errs = ghia_errors(state.u, state.v, case.grid, 1000)
    assert errs["u_rms"] < 0.02, errs
    assert errs["v_rms"] < 0.02, errs
    assert errs["u_max"] < 0.04, errs
