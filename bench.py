"""Benchmark: cavity projection steps at scale on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "cell-updates/sec", "vs_baseline": N}

Metric definition (BASELINE.json: "cell-updates/sec/chip at 2048^2 cavity"):
one cell-update = one stencil update of one cell. Per projection step the
solver performs
  predictor (u*, v*)            2 updates/cell
  divergence source             1
  corrector (u, v)              2
  Poisson V(2,2) cycles         (2 pre + 2 post + 1 residual) updates/cell
                                 x 4/3 (geometric level sum) per cycle
so updates/step/cell = 5 + (16/3) * cycles, with the cycle count read back
from the solver's diagnostics. Wall time is measured over timed steps after
a compile+warmup phase, with block_until_ready fencing.

Env knobs: BENCH_N (default 2048), BENCH_STEPS (default 300),
BENCH_DTYPE (f32|bf16, default f32; bf16 is a validated ~5%-KE-band
throughput mode, tests/test_bf16.py — not a validation mode),
BENCH_TOL (default 1e-6 relative),
BENCH_CHUNK (steps per dispatch via lax.scan, default 100 = the reference print cadence — amortizes the
host->device dispatch latency the way a production driver would).
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    from cfd_tpu.cases import make_cavity_case
    from cfd_tpu.solver import Simulation, make_step

    n = int(os.environ.get("BENCH_N", 2048))
    steps = int(os.environ.get("BENCH_STEPS", 300))
    tol = float(os.environ.get("BENCH_TOL", 1e-6))
    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[
        os.environ.get("BENCH_DTYPE", "f32")]

    chunk = int(os.environ.get("BENCH_CHUNK", 100))
    case = make_cavity_case(n_interior=n, poisson="multigrid", dtype=dtype,
                            tolerance_factor=tol)
    step_fn = make_step(case)

    @jax.jit
    def multi(state):
        def body(s, _):
            s2, d = step_fn(s)
            return s2, d.poisson_iters

        return jax.lax.scan(body, state, None, length=chunk)

    state = Simulation(case, log=lambda *a: None).initial_state()

    # compile + warmup (also spins the flow up so cycle counts are typical)
    t0 = time.perf_counter()
    state, iters = multi(state)
    jax.block_until_ready(state.u)
    compile_s = time.perf_counter() - t0

    n_chunks = max(1, steps // chunk)
    steps = n_chunks * chunk
    cycles = []
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, iters = multi(state)
        cycles.append(iters)
    jax.block_until_ready(state.u)
    wall = time.perf_counter() - t0

    mean_cycles = float(sum(int(c.sum()) for c in cycles)) / steps
    updates_per_cell_step = 5.0 + (16.0 / 3.0) * mean_cycles
    cells = n * n
    value = cells * updates_per_cell_step * steps / wall
    steps_per_sec = steps / wall

    result = {
        "metric": f"cell-updates/sec/chip, {n}^2 cavity f32 multigrid "
                  f"(tol {tol:g} rel, {mean_cycles:.1f} V-cycles/step, "
                  f"{steps_per_sec:.2f} steps/s, compile {compile_s:.0f}s)",
        "value": round(value, 0),
        "unit": "cell-updates/sec",
        "vs_baseline": round(value / 5e9, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
