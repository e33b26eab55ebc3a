"""Sweep the quad-kernel VMEM slab budget at a given cavity size on the
real TPU (round-3 item 4: per-size budget tuning).

Usage: python tools/quad_vmem_sweep.py [N] [budgets_mb...]
e.g.:  python tools/quad_vmem_sweep.py 4096 40 64 80 100

Each variant rebuilds the case with CFD_TPU_VMEM_BUDGET_MB set (the knob is
read at kernel build time), compiles, and reports steps/s + V-cycles/step.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import os
import sys
import time


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    budgets = [float(x) for x in sys.argv[2:]] or [40, 64, 80, 100]
    steps = int(os.environ.get("SWEEP_STEPS", 100))
    chunk = int(os.environ.get("SWEEP_CHUNK", 50))

    import jax
    import jax.numpy as jnp

    from cfd_tpu.cases import make_cavity_case
    from cfd_tpu.solver import Simulation, make_step

    for mb in budgets:
        os.environ["CFD_TPU_VMEM_BUDGET_MB"] = str(mb)
        case = make_cavity_case(n_interior=n, poisson="multigrid",
                                dtype=jnp.float32, tolerance_factor=1e-6)
        step_fn = make_step(case)

        @jax.jit
        def multi(state, step_fn=step_fn):
            def body(s, _):
                s2, d = step_fn(s)
                return s2, d.poisson_iters

            return jax.lax.scan(body, state, None, length=chunk)

        state = Simulation(case, log=lambda *a: None).initial_state()
        t0 = time.perf_counter()
        state, _ = multi(state)
        jax.block_until_ready(state.u)
        compile_s = time.perf_counter() - t0
        n_chunks = max(1, steps // chunk)
        cycles = []
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            state, iters = multi(state)
            cycles.append(iters)
        jax.block_until_ready(state.u)
        wall = time.perf_counter() - t0
        sps = n_chunks * chunk / wall
        mc = float(sum(int(c.sum()) for c in cycles)) / (n_chunks * chunk)
        print(f"budget {mb:6.1f} MB: {sps:8.2f} steps/s, "
              f"{mc:.2f} cycles/step, compile {compile_s:.0f}s", flush=True)


if __name__ == "__main__":
    main()
