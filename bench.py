"""Benchmark: projection steps at scale on one TPU chip.

Prints one JSON line per secondary case (channel, backwards step,
Rayleigh-Benard) followed by the headline line LAST (the driver contract —
the final line is the recorded result):
  {"metric": ..., "value": N, "unit": "cell-updates/sec", "vs_baseline": N}

Headline metric definition (BASELINE.json: "cell-updates/sec/chip at 2048^2
cavity"): one cell-update = one stencil update of one cell. Per projection
step the solver performs
  predictor (u*, v*)            2 updates/cell
  divergence source             1
  corrector (u, v)              2
  Poisson V(2,1) cycles         (2 pre + 1 post smoothing pairs + 1
                                 residual) = 4 updates/cell per level visit
                                 x 4/3 (geometric level sum) per cycle
so updates/step/cell = 5 + (16/3) * cycles, with the cycle count read back
from the solver's diagnostics. (The f32 kernel path runs V(2,1) —
cases/cavity.py post_sweeps=1 — and fuses the residual into the smoother
kernels, so 16/3 is if anything conservative.) Wall time is measured over
timed steps after a compile+warmup phase, with block_until_ready fencing.

Secondary-case lines use the scheme-agnostic cell-steps/sec metric
(fluid cells x steps / wall) like benchmarks/case_bench.py; their
vs_baseline compares like with like: channel/step against the round-4
DRIVER captures (BENCH_r04.json — protocol- and context-identical), RB
against the round-5 reconciled 2682 (BASELINE.md round-5 RB row; r4's
driver RB was an environmental dip and round 3's 3675/2845 channel/step
rows timed unconverged false-stall runs — neither is a baseline).

Env knobs: BENCH_N (default 2048), BENCH_STEPS (default 300),
BENCH_WARMUP_STEPS (default 400 — past the measured post-compile
whole-solve transient AND the startup V-cycle transient),
BENCH_DTYPE (f32|bf16, default f32; bf16 is a validated ~5%-KE-band
throughput mode, tests/test_bf16.py — not a validation mode),
BENCH_TOL (default 1e-6 relative),
BENCH_CHUNK (steps per dispatch via lax.scan, default 100 = the reference
print cadence — amortizes the host->device dispatch latency the way a
production driver would),
BENCH_CASES (comma list or "none"; default "channel,step,rb" at
BENCH_N=2048, "none" otherwise — the secondary lines only make sense at the
recorded scales).
"""

from __future__ import annotations

import json
import os
import time


def _timed_steps(step_fn, state, steps: int, chunk: int,
                 warmup_steps: int | None = None):
    """(state, mean_cycles, wall_s, compile_s, timed_steps) for a case."""
    import jax

    @jax.jit
    def multi(state):
        def body(s, _):
            s2, d = step_fn(s)
            return s2, d.poisson_iters

        return jax.lax.scan(body, state, None, length=chunk)

    t0 = time.perf_counter()
    state, iters = multi(state)
    jax.block_until_ready(jax.tree.leaves(state)[0])
    compile_s = time.perf_counter() - t0
    # Warm past BOTH measured transients before timing: (a) the startup
    # V-cycle transient (the step case runs ~4.3 cycles/step over its first
    # ~50 steps vs 2.0 sustained), and (b) the post-compile throughput tail
    # of the whole-solve default, which runs ~2-3x slow for a few hundred
    # steps after compiling (tools/wstep_bench_small.py; BASELINE.md round-3
    # warmup-tail row). Round 3's 100-step warmup under-reported the
    # secondary cases by 10-16% (VERDICT round-3 weak item 2).
    if warmup_steps is None:
        warmup_steps = int(os.environ.get("BENCH_WARMUP_STEPS", 400))
    for _ in range(max(1, -(-warmup_steps // chunk) - 1)):
        state, iters = multi(state)
    jax.block_until_ready(jax.tree.leaves(state)[0])

    n_chunks = max(1, steps // chunk)
    steps = n_chunks * chunk
    cycles = []
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, iters = multi(state)
        cycles.append(iters)
    jax.block_until_ready(jax.tree.leaves(state)[0])
    wall = time.perf_counter() - t0
    mean_cycles = float(sum(int(c.sum()) for c in cycles)) / steps
    # NaN throughput is not throughput: the round-3 channel capture timed a
    # diverged run (the false-stall bug, poisson/multigrid.py stall_ratio
    # note) because nothing here looked at the fields. Scalar-only transfer.
    import jax.numpy as jnp

    for leaf in jax.tree.leaves(state):
        if not bool(jnp.isfinite(leaf).all()):
            raise RuntimeError(
                "benchmark state is non-finite after the timed steps — "
                "refusing to record throughput for a diverged run")
    return state, mean_cycles, wall, compile_s, steps


def _secondary_cases(names: list[str]) -> None:
    """One JSON line per non-flagship case (VERDICT round-2 item 8)."""
    import jax.numpy as jnp

    from cfd_tpu.solver import Simulation, make_step

    # chunk 50: at the secondary-case sizes the ~1 ms dispatch latency is a
    # first-order cost (RB measured 1014 steps/s at chunk 10 vs 1735 at 50)
    steps = int(os.environ.get("BENCH_CASE_STEPS", 150))
    chunk = int(os.environ.get("BENCH_CASE_CHUNK", 50))
    # vs_baseline = this run / the ROUND-4 DRIVER CAPTURE (BENCH_r04.json):
    # protocol-identical AND context-identical (same in-process sequence),
    # so the ratio is auditable against the permanent record. Session-level
    # tunnel/machine variance is real (RB read 2038 in the r4 driver run vs
    # 2594-2682 in every round-5 capture — the r4 dip was environmental;
    # BASELINE.md round-5 RB reconciliation row) and quiet-ALONE numbers
    # run higher for step (2363 alone vs ~1960 in-context, BASELINE.md
    # round-5 step row) — BASELINE.md carries those; this dict carries the
    # like-for-like reference. Cycles/step in the metric string is the
    # context-immune solver-efficiency signal.
    # (RB uses the round-5 reconciled 2682, NOT r4's 2038.4: that capture
    # was the environmental dip — baselining on it would fake a +27% gain)
    baseline_steps = {"channel": 2652.3, "step": 1870.9, "rb": 2682.0}

    for name in names:
        # configs identical to benchmarks/case_bench.py (the source of the
        # BASELINE.md round-2 numbers the vs_baseline ratios refer to)
        if name == "channel":
            from cfd_tpu.cases import make_channel_case

            case = make_channel_case(nx=1536, ny=512, poisson="multigrid",
                                     tolerance_factor=1e-6, abs_tol=0.0,
                                     dtype=jnp.float32)
        elif name == "step":
            from cfd_tpu.cases import make_backwards_step_case

            case = make_backwards_step_case(nx=2048, ny=256,
                                            poisson="multigrid",
                                            tolerance_factor=1e-6,
                                            abs_tol=0.0, dtype=jnp.float32)
        elif name == "rb":
            from cfd_tpu.physics.boussinesq import make_rayleigh_benard_case

            case = make_rayleigh_benard_case(nx=1536, ny=512, rayleigh=1e6,
                                             dtype=jnp.float32)
        else:
            continue
        state = Simulation(case, log=lambda *a: None).initial_state()
        _, cyc, wall, compile_s, n = _timed_steps(make_step(case), state,
                                                  steps, chunk)
        sps = n / wall
        cells = case.grid.n_fluid
        print(json.dumps({
            "metric": f"cell-steps/sec/chip, {name} "
                      f"{case.grid.nx}x{case.grid.ny} f32 "
                      f"({cyc:.1f} cycles/step, {sps:.1f} steps/s, "
                      f"compile {compile_s:.0f}s)",
            "value": round(cells * sps, 0),
            "unit": "cell-steps/sec",
            "vs_baseline": round(sps / baseline_steps[name], 3),
        }), flush=True)


def main() -> None:
    import jax.numpy as jnp

    from cfd_tpu.cases import make_cavity_case
    from cfd_tpu.solver import Simulation, make_step

    n = int(os.environ.get("BENCH_N", 2048))
    steps = int(os.environ.get("BENCH_STEPS", 300))
    tol = float(os.environ.get("BENCH_TOL", 1e-6))
    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[
        os.environ.get("BENCH_DTYPE", "f32")]
    chunk = int(os.environ.get("BENCH_CHUNK", 100))
    cases_env = os.environ.get(
        "BENCH_CASES", "channel,step,rb" if n == 2048 else "none")

    # The headline is MEASURED FIRST in the process and PRINTED LAST (the
    # driver records the final line). Measuring it after the secondary
    # cases polluted the process read 1081 steps/s vs 1214 clean in
    # back-to-back round-5 captures (-11%: three extra compiled programs +
    # their retained buffers change the allocator/VMEM-staging picture);
    # execution order is measurement hygiene, print order is the contract.
    case = make_cavity_case(n_interior=n, poisson="multigrid", dtype=dtype,
                            tolerance_factor=tol)
    state = Simulation(case, log=lambda *a: None).initial_state()
    _, mean_cycles, wall, compile_s, steps = _timed_steps(
        make_step(case), state, steps, chunk)
    del case, state

    if cases_env not in ("", "none"):
        _secondary_cases([c.strip() for c in cases_env.split(",")])

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
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
