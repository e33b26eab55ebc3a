"""On-chip A/B of the round-5 headline fusion: the tentative-carry kernel
with the first V-cycle's pre-smooth+residual+restriction folded in
(make_quad_corr_predictor_source_fused_pre + multigrid quad_first_rc)
vs the round-4 composition (plain carry + separate pre kernel).

At the 2048^2 headline the solver runs 1.0 V-cycles/step steady-state, so
the separate pre kernel is a full 52 MB level-0 HBM round trip per step
whose inputs the carry kernel had in VMEM moments earlier. Both variants
run the bench.py protocol (400-step warmup, finiteness-checked); the fused
variant is bitwise-equal to the plain one in interpret mode
(tests/test_quad.py::test_fused_pre_carry_matches_plain_composition), so
this tool measures pure kernel-boundary savings.

Usage: python tools/fused_pre_bench.py [N ...]   (default: 2048)
Emits one JSON line per (size, variant).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

VARIANTS = {"fused_pre": True, "plain": False}


def run(n: int, name: str, fuse: bool, steps: int, chunk: int,
        warmup_steps: int) -> dict:
    import jax
    import jax.numpy as jnp

    from cfd_tpu.cases import make_cavity_case
    from cfd_tpu.solver import Simulation, make_step

    case = make_cavity_case(n_interior=n, poisson="multigrid",
                            dtype=jnp.float32, tolerance_factor=1e-6,
                            fuse_pre=fuse)
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
        if leaf is not None and not bool(jnp.isfinite(leaf).all()):
            raise RuntimeError(f"non-finite state (n={n}, variant={name})")
    mean_cycles = float(sum(int(c.sum()) for c in cycles)) / timed
    return {
        "n": n,
        "variant": name,
        "carry_fused_pre": bool(case.carry_fused_pre),
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
        for name, fuse in VARIANTS.items():
            try:
                print(json.dumps(run(n, name, fuse, steps, chunk, warmup)),
                      flush=True)
            except Exception as e:
                print(json.dumps({"n": n, "variant": name, "error":
                                  f"{type(e).__name__}: {str(e)[:300]}"}),
                      flush=True)


if __name__ == "__main__":
    main()
