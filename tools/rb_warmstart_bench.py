"""Production-size decision measurement for the Rayleigh-Benard
extrapolated Poisson warm start (emit_guess on the fused RB carry kernel).

At the 48x16 test config the 2p - p_prev guess COSTS a cycle in the
noise-seeded transient; this measures the real regime — 1536x512 Ra=1e6
f32 on the TPU, steady-state protocol (warmup chunks before timing, same
as BASELINE.md round-3 numbers) — to decide the factory default.

Usage: python tools/rb_warmstart_bench.py [steps] [chunk] [warmup_chunks]
Prints one JSON line per variant. The per-chunk mean cycle list
(``cycles_per_chunk``) makes the steady-state plateau visible — the
decision reads the TAIL of that list, not the overall mean, so a
still-decaying transient can't masquerade as the steady state (advisor
round-3 finding). ``compile_s`` is only meaningful for the FIRST variant
printed: both run in one process, so the second benefits from XLA
compilation-cache reuse.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def bench(case, steps: int, chunk: int, warmup_chunks: int):
    import jax

    from cfd_tpu.solver import Simulation, make_step

    step_fn = make_step(case)

    @jax.jit
    def multi(state):
        def body(s, _):
            s2, d = step_fn(s)
            return s2, d.poisson_iters

        return jax.lax.scan(body, state, None, length=chunk)

    state = Simulation(case, log=lambda *a: None).initial_state()
    t0 = time.perf_counter()
    state, _ = multi(state)
    jax.block_until_ready(jax.tree.leaves(state)[0])
    compile_s = time.perf_counter() - t0
    for _ in range(warmup_chunks):
        state, _ = multi(state)
    jax.block_until_ready(jax.tree.leaves(state)[0])

    n_chunks = max(1, steps // chunk)
    cycles = []
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, iters = multi(state)
        cycles.append(iters)
    jax.block_until_ready(jax.tree.leaves(state)[0])
    wall = time.perf_counter() - t0
    sps = n_chunks * chunk / wall
    per_chunk = [float(int(c.sum())) / chunk for c in cycles]
    mc = sum(per_chunk) / len(per_chunk)
    return sps, mc, per_chunk, compile_s


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    warmup = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    import jax.numpy as jnp

    from cfd_tpu.physics.boussinesq import make_rayleigh_benard_case

    first = True
    for extrap in (False, True):
        case = make_rayleigh_benard_case(
            nx=1536, ny=512, rayleigh=1e6, dtype=jnp.float32,
            extrapolate_warm_start=extrap)
        sps, mc, per_chunk, cs = bench(case, steps, chunk, warmup)
        print(json.dumps({
            "case": "rayleigh_benard", "grid": "1536x512",
            "extrapolate_warm_start": extrap,
            "steps_per_sec": round(sps, 2),
            "mean_poisson_cycles": round(mc, 3),
            "cycles_per_chunk": [round(c, 2) for c in per_chunk],
            "compile_s": round(cs, 1),
            "compile_s_comparable": first,
        }), flush=True)
        first = False


if __name__ == "__main__":
    main()
