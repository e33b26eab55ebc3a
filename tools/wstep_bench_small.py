"""Measure the opt-in whole-step kernel against the default path at sizes
below its compile ceiling (tools/wstep_probe.py: OK <= 512^2, the axon
remote-compile helper crashes >= 768^2).

Small grids are dispatch-latency-bound (~1 ms/host dispatch over the
tunnel), which is exactly what ONE-Pallas-call-per-step removes — this is
the regime where whole_step can matter despite whole_solve being the
default fusion at production sizes.

Usage: python tools/wstep_bench_small.py [sizes...]   (default: 256 512)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def bench(n: int, overrides, steps=300, chunk=50) -> tuple[float, float]:
    import jax

    from cfd_tpu.cases import make_cavity_case
    from cfd_tpu.solver import Simulation, make_step

    case = make_cavity_case(n_interior=n, poisson="multigrid",
                            dtype="float32", tolerance_factor=1e-6,
                            mg_overrides=overrides)
    state = Simulation(case, log=lambda *a: None).initial_state()
    step = make_step(case)

    @jax.jit
    def multi(state):
        def body(s, _):
            s2, d = step(s)
            return s2, d.poisson_iters

        return jax.lax.scan(body, state, None, length=chunk)

    for _ in range(2):  # compile + warmup
        state, iters = multi(state)
        jax.block_until_ready(jax.tree.leaves(state)[0])
    t0 = time.perf_counter()
    tot = 0
    for _ in range(steps // chunk):
        state, iters = multi(state)
        tot += int(iters.sum())
    jax.block_until_ready(jax.tree.leaves(state)[0])
    wall = time.perf_counter() - t0
    n_steps = (steps // chunk) * chunk
    return n_steps / wall, tot / n_steps


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [256, 512]
    for n in sizes:
        for label, ov in (("default", None),
                          ("wstep", {"whole_step": True})):
            sps, cyc = bench(n, ov)
            print(f"cavity {n}^2 {label:8s}: {sps:8.1f} steps/s, "
                  f"{cyc:.2f} cycles/step", flush=True)


if __name__ == "__main__":
    main()
