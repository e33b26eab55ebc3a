"""Generate checkpoint seeds for the golden-trace tail-window tests.

Marches the full cavity (2520 steps) and channel (1537 steps) trajectories
on host CPU in f64, asserting EVERY golden stats row on the way (so the seed
is only written if the complete trajectory matches the C++ reference), and
saves the framework state at the tail-window start steps into
golden/<case>/ckpt_XXXXXXXX.npz. tests/test_golden_trace.py restores these
to regression-test the final print intervals without re-marching the prefix.

Usage: python tools/make_trace_seeds.py [cavity] [channel] [backwards_step]
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_default_device", jax.devices("cpu")[0])
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pathlib import Path  # noqa: E402

from cfd_tpu.cases import (  # noqa: E402
    make_backwards_step_case, make_cavity_case, make_channel_case)
from cfd_tpu.io.checkpoint import CheckpointManager  # noqa: E402
from cfd_tpu.solver import Simulation  # noqa: E402
from test_golden_trace import golden_rows  # noqa: E402

GOLDEN = Path(__file__).resolve().parent.parent / "golden"


def march(case, name: str, seed_steps: set[int]):
    gold = golden_rows(name)
    last = max(gold)
    ckpt = CheckpointManager(GOLDEN / name, interval=0, keep=10**6)
    sim = Simulation(case, log=lambda *a: None)
    st = sim.initial_state()
    mismatches = 0
    for k in range(1, last + 1):
        st, _ = sim._step(st)
        if k in seed_steps:
            path = ckpt.save(st, k)
            print(f"[{name}] seed saved: {path}")
        if k in gold:
            s = sim.statistics(st)
            gd, gke = gold[k]
            ok = (abs(s["max_divergence"] - gd) <= 0.005 * abs(gd) + 1e-12
                  and abs(s["avg_kinetic_energy"] - gke) <= 5e-6)
            if not ok:
                mismatches += 1
                print(f"[{name}] MISMATCH step {k}: div {s['max_divergence']}"
                      f" vs {gd}, KE {s['avg_kinetic_energy']} vs {gke}")
            if k % 500 < case.print_interval:
                print(f"[{name}] step {k}/{last} ok", flush=True)
    print(f"[{name}] done: {len(gold)} rows compared, {mismatches} mismatches")
    if mismatches:
        sys.exit(1)


if __name__ == "__main__":
    wanted = sys.argv[1:] or ["cavity", "channel"]
    if "cavity" in wanted:
        march(make_cavity_case(), "cavity", {2400})
    if "channel" in wanted:
        march(make_channel_case(), "channel", {1400})
    if "backwards_step" in wanted:
        march(make_backwards_step_case(), "backwards_step", {3000})
