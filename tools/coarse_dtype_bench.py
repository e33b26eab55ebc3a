"""A/B the mixed-precision coarse hierarchy (MGConfig.coarse_dtype) on TPU.

The round-3 verdict's named headline lever: the 2048^2 cavity roofline showed
the V-cycle's coarse-path traffic (restricted residual, coarse levels,
prolonged correction + XLA's VMEM staging copies) as the remaining
non-carry-kernel time. coarse_dtype='bfloat16' stores that correction path in
bf16 (poisson/multigrid.py round-4 note) — this tool measures whether it buys
steps/s at the production cavity sizes, where the per-kernel path runs
(whole_solve is VMEM-build-rejected at 2048^2+).

Protocol matches bench.py: scan chunks, warmup past the startup V-cycle
transient, finite-state check, device-side cycle counts. Both variants run in
one process — compile_s of the second variant benefits from XLA cache reuse
and is informational only.

Usage: python tools/coarse_dtype_bench.py [N ...]   (default: 2048)
Emits one JSON line per (size, variant).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def run(n: int, coarse_dtype: str | None, steps: int, chunk: int,
        warmup_steps: int) -> dict:
    import jax
    import jax.numpy as jnp

    from cfd_tpu.cases import make_cavity_case
    from cfd_tpu.solver import Simulation, make_step

    ov = {"coarse_dtype": coarse_dtype} if coarse_dtype else None
    case = make_cavity_case(n_interior=n, poisson="multigrid",
                            dtype=jnp.float32, tolerance_factor=1e-6,
                            mg_overrides=ov)
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
            raise RuntimeError(f"non-finite state (n={n}, "
                               f"coarse_dtype={coarse_dtype})")
    mean_cycles = float(sum(int(c.sum()) for c in cycles)) / timed
    return {
        "n": n,
        "coarse_dtype": coarse_dtype or "f32",
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
        for cd in (None, "bfloat16"):
            print(json.dumps(run(n, cd, steps, chunk, warmup)), flush=True)


if __name__ == "__main__":
    main()
