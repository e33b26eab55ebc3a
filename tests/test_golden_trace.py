"""Stats-trace parity vs the reference binaries' stdout (golden/).

The per-interval stats row is the reference's de-facto regression signal
(SURVEY.md section 4.2). Field snapshots can agree while the *trajectory*
diverges later (e.g. the zero-cycle f64-on-TPU Poisson bug showed up only in
the running trace), so these tests march each case and compare max(div) and
avg_KE against the parsed golden rows at the reference's print intervals,
at the reference's printed precision.
"""

import re
from pathlib import Path

import pytest

from cfd_tpu.cases import make_backwards_step_case, make_cavity_case, make_channel_case
from cfd_tpu.solver import Simulation

GOLDEN = Path(__file__).resolve().parent.parent / "golden"

ROW_RE = re.compile(
    r"Step\s+(\d+)/\d+ \| t=\s*[\d.]+ \| max\(div\)=\s*([\d.e+-]+) "
    r"\| avg_KE=\s*([\d.-]+)")


def golden_rows(name: str) -> dict[int, tuple[float, float]]:
    rows = {}
    for line in (GOLDEN / name / "stdout.log").read_text().splitlines():
        m = ROW_RE.search(line)
        if m:
            rows[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))
    return rows


def march_and_compare(case, name, n_steps, interval):
    gold = golden_rows(name)
    sim = Simulation(case, log=lambda *a: None)
    st = sim.initial_state()
    compared = 0
    for k in range(1, n_steps + 1):
        st, _ = sim._step(st)
        if k % interval == 0 and k in gold:
            s = sim.statistics(st)
            gd, gke = gold[k]
            # golden prints div as %.2e and KE as %.6f
            assert abs(s["max_divergence"] - gd) <= 0.005 * abs(gd) + 1e-12, \
                (k, s["max_divergence"], gd)
            assert abs(s["avg_kinetic_energy"] - gke) <= 5e-6, \
                (k, s["avg_kinetic_energy"], gke)
            compared += 1
    assert compared == n_steps // interval


@pytest.mark.slow
def test_cavity_trace_matches_golden():
    march_and_compare(make_cavity_case(), "cavity", 300, 100)


@pytest.mark.slow
def test_channel_trace_matches_golden():
    march_and_compare(make_channel_case(), "channel", 300, 100)


@pytest.mark.slow
@pytest.mark.parametrize("poisson", ["sor", "multigrid"])
def test_backwards_step_trace_matches_golden(poisson):
    """Both the reference-faithful SOR and the masked multigrid trajectory
    reproduce the golden trace (the reference's own early Poisson solves hit
    the 10000-iteration cap without converging; the stats still agree at
    printed precision)."""
    march_and_compare(make_backwards_step_case(poisson=poisson),
                      "backwards_step", 50, 10)
