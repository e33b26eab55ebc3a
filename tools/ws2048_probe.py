"""On-chip probe of the round-5 composition: bf16-hierarchy WHOLE-SOLVE at
the 2048^2 cavity headline size (VERDICT round-4 item 1).

The f32 whole-solve kernel VMEM-build-rejects at 2048^2 (119 MB estimate);
the bf16 in-VMEM hierarchy + input/output aliasing brings the itemized
estimate to ~80 MB (kernels/whole_solve.py _solve_from_ctx), which the
admission arithmetic accepts. The estimate is linear slab accounting —
Mosaic's real allocation (liveness, stack) is the arbiter, so this tool is
the validation the gate comment points at: it builds the production cavity
case fully-auto (which now selects the fused bf16 path), runs the bench.py
protocol, and A/Bs against the round-4 headline config (per-kernel bf16,
mg_overrides={'coarse_dtype': 'bfloat16'}).

Each variant is exception-isolated: a Mosaic OOM at compile shows up as a
recorded failure line, not a dead probe.

Usage: python tools/ws2048_probe.py [N ...]   (default: 2048)
Emits one JSON line per (size, variant).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

VARIANTS = {
    # fully-auto: f32 fused rejects at 2048^2 -> bf16 fused (the probe)
    "auto": None,
    # round-4 headline config: manual knob -> per-kernel bf16 path
    "perkernel_bf16": {"coarse_dtype": "bfloat16"},
}


def run(n: int, name: str, ov, steps: int, chunk: int,
        warmup_steps: int) -> dict:
    import jax
    import jax.numpy as jnp

    from cfd_tpu.cases import make_cavity_case
    from cfd_tpu.solver import Simulation, make_step

    case = make_cavity_case(n_interior=n, poisson="multigrid",
                            dtype=jnp.float32, tolerance_factor=1e-6,
                            mg_overrides=dict(ov) if ov else None)
    mg = case.info["mg"]
    state = Simulation(case, log=lambda *a: None).initial_state()
    step_fn = make_step(case)

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
    for _ in range(max(1, -(-warmup_steps // chunk) - 1)):
        state, iters = multi(state)
    jax.block_until_ready(jax.tree.leaves(state)[0])

    n_chunks = max(1, steps // chunk)
    timed = n_chunks * chunk
    cycles = []
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, iters = multi(state)
        cycles.append(iters)
    jax.block_until_ready(jax.tree.leaves(state)[0])
    wall = time.perf_counter() - t0
    for leaf in jax.tree.leaves(state):
        if not bool(jnp.isfinite(leaf).all()):
            raise RuntimeError(f"non-finite state (n={n}, variant={name})")
    mean_cycles = float(sum(int(c.sum()) for c in cycles)) / timed
    return {
        "n": n,
        "variant": name,
        "whole_solve": bool(mg.whole_solve),
        "coarse_dtype": mg.coarse_dtype or "f32",
        "steps_per_s": round(timed / wall, 1),
        "cycles_per_step": round(mean_cycles, 2),
        "compile_s": round(compile_s, 1),
        "timed_steps": timed,
    }


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [2048]
    steps = int(os.environ.get("BENCH_STEPS", 300))
    chunk = int(os.environ.get("BENCH_CHUNK", 100))
    warmup = int(os.environ.get("BENCH_WARMUP_STEPS", 400))
    for n in sizes:
        for name, ov in VARIANTS.items():
            try:
                print(json.dumps(run(n, name, ov, steps, chunk, warmup)),
                      flush=True)
            except Exception as e:  # Mosaic OOM etc. — record, keep going
                print(json.dumps({"n": n, "variant": name, "error":
                                  f"{type(e).__name__}: {str(e)[:300]}"}),
                      flush=True)


if __name__ == "__main__":
    main()
