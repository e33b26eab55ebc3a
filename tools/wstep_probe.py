"""Probe the whole-step (kernels.whole_step) compile-size ceiling on the
real chip.

The round-3 sweep showed the fused whole-TIME-STEP kernel compiles and runs
at 128^2 (Mosaic smoke) but crashes the axon remote-compile helper
(HTTP 500, subprocess exit 1) at the production bench sizes
(1536x512 / 2048x256).  This probe walks intermediate sizes to locate the
ceiling, so PARITY.md can state exactly where the opt-in knob works.

Usage:  python tools/wstep_probe.py [cavity_sizes...]
Default sizes: 256 512 768 1024 (square cavity interiors).
Each probe builds the cavity case with mg_overrides={'whole_step': True},
jits ONE step, and reports compile wall / failure. A fresh process per size
is NOT needed — compiles are independent — but failures leave the helper
usable (the sweep continued fine after them).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def probe(n: int) -> str:
    import jax

    from cfd_tpu.cases import make_cavity_case
    from cfd_tpu.solver import Simulation, make_step

    try:
        case = make_cavity_case(n_interior=n, poisson="multigrid",
                                dtype="float32", tolerance_factor=1e-6,
                                mg_overrides={"whole_step": True})
    except ValueError as e:  # VMEM-cap build rejection
        return f"build-rejected: {e}"
    state = Simulation(case, log=lambda *a: None).initial_state()
    step = jax.jit(make_step(case))
    t0 = time.perf_counter()
    try:
        s2, d = step(state)
        jax.block_until_ready(s2.p)
    except Exception as e:  # noqa: BLE001 — report any compile/run failure
        return f"FAILED after {time.perf_counter() - t0:.0f}s: " \
               f"{type(e).__name__}: {str(e)[:160]}"
    return (f"OK compile+run {time.perf_counter() - t0:.0f}s, "
            f"cycles={int(d.poisson_iters)}")


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [256, 512, 768, 1024]
    for n in sizes:
        print(f"wstep cavity {n}^2: ", end="", flush=True)
        print(probe(n), flush=True)


if __name__ == "__main__":
    main()
