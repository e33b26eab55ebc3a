"""Determinism (SURVEY.md section 5.2): same seed -> bitwise-equal runs."""

import numpy as np

from cfd_tpu.cases import make_cavity_case, make_rayleigh_benard_case
from cfd_tpu.solver import Simulation


def quiet(*a, **k):
    pass


def _run(case_factory, steps, **kw):
    case = case_factory(**kw)
    sim = Simulation(case, log=quiet)
    st = sim.initial_state()
    for _ in range(steps):
        st, _ = sim._step(st)
    return st


def test_cavity_runs_are_bitwise_deterministic():
    a = _run(make_cavity_case, 5, n_interior=15, final_time=1.0)
    b = _run(make_cavity_case, 5, n_interior=15, final_time=1.0)
    np.testing.assert_array_equal(np.asarray(a.u), np.asarray(b.u))
    np.testing.assert_array_equal(np.asarray(a.p), np.asarray(b.p))


def test_rb_seeded_perturbation_is_deterministic():
    a = _run(make_rayleigh_benard_case, 20, nx=32, ny=16, aspect=2.0,
             final_time=1.0, seed=7)
    b = _run(make_rayleigh_benard_case, 20, nx=32, ny=16, aspect=2.0,
             final_time=1.0, seed=7)
    np.testing.assert_array_equal(np.asarray(a.T), np.asarray(b.T))
    # a different seed must diverge
    c = _run(make_rayleigh_benard_case, 20, nx=32, ny=16, aspect=2.0,
             final_time=1.0, seed=8)
    assert not np.array_equal(np.asarray(a.T), np.asarray(c.T))
