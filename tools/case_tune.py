"""MG knob sweep for the step / Rayleigh-Benard quad paths on the real TPU.

At 2048x256 (step) and 1536x512 (RB) the per-step cost is launch/fixed-cost
dominated, so the interesting knobs are the ones that trade per-cycle work
for CYCLE COUNT and LEVEL COUNT: V(2,1) vs V(2,2) vs V(3,3), min_coarse
(hierarchy depth vs dense-pinv size).

Usage: python tools/case_tune.py step|rb [steps] [chunk]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import sys
import time


def bench(case, steps, chunk):
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
    n_chunks = max(1, steps // chunk)
    cycles = []
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, iters = multi(state)
        cycles.append(iters)
    jax.block_until_ready(jax.tree.leaves(state)[0])
    wall = time.perf_counter() - t0
    sps = n_chunks * chunk / wall
    mc = float(sum(int(c.sum()) for c in cycles)) / (n_chunks * chunk)
    return sps, mc, compile_s


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "step"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 50

    import jax.numpy as jnp

    variants = [
        ("V(2,1) mc4 [current]", {}),
        ("V(2,1) tail1", {"tail_from": 1}),
        ("V(2,1) tail2", {"tail_from": 2}),
        ("V(2,1) whole", {"whole_solve": True}),
        ("V(2,1) wstep", {"whole_step": True}),
        ("V(2,2) mc4", {"post_sweeps": 2}),
        ("V(3,3) mc4", {"pre_sweeps": 3, "post_sweeps": 3}),
        ("V(2,2) mc16", {"post_sweeps": 2, "min_coarse": 16}),
        ("V(2,1) mc16", {"min_coarse": 16}),
        ("V(2,2) mc32", {"post_sweeps": 2, "min_coarse": 32}),
    ]
    if which == "channel":
        # channel f32 default is V(1,2) (cases/channel.py sweep note:
        # V(2,1) DIVERGES at 1536x512 — kept here only for the record)
        variants = [
            ("V(1,2) mc4 [current]", {}),
            ("V(1,2) tail1", {"pre_sweeps": 1, "post_sweeps": 2,
                              "tail_from": 1}),
            ("V(1,2) whole", {"pre_sweeps": 1, "post_sweeps": 2,
                              "whole_solve": True}),
            ("V(2,2) mc4", {"pre_sweeps": 2, "post_sweeps": 2}),
            ("V(3,3) mc4", {"pre_sweeps": 3, "post_sweeps": 3}),
            ("V(1,2) mc16", {"pre_sweeps": 1, "post_sweeps": 2,
                             "min_coarse": 16}),
        ]
    if which in ("cavity", "cavity4096"):
        variants = [
            ("V(2,1) mc4 [current]", {}),
            ("V(2,1) bf16-coarse", {"coarse_dtype": "bfloat16"}),
            ("V(2,1) bf16 mc16", {"coarse_dtype": "bfloat16",
                                  "min_coarse": 16}),
            ("V(2,1) f32 mc16", {"min_coarse": 16}),
            ("V(2,1) bf16 mc32", {"coarse_dtype": "bfloat16",
                                  "min_coarse": 32}),
            ("V(2,1) tail1", {"tail_from": 1}),
            ("V(2,1) tail2", {"tail_from": 2}),
            ("V(2,1) tail3", {"tail_from": 3}),
        ]
    only = os.environ.get("CASE_TUNE_ONLY")
    if only:
        # comma-separated substring filter over variant names
        pats = [s.strip() for s in only.split(",") if s.strip()]
        variants = [(n, o) for n, o in variants
                    if any(p in n for p in pats)]
    for name, ov in variants:
        try:
            # case construction inside the try: make_mg_tail raises at
            # BUILD time when a tail request exceeds the VMEM cap (e.g.
            # cavity4096 tail1) and the sweep must keep going
            if which == "step":
                from cfd_tpu.cases import make_backwards_step_case

                case = make_backwards_step_case(
                    nx=2048, ny=256, dtype=jnp.float32, poisson="multigrid",
                    tolerance_factor=1e-6, abs_tol=0.0, mg_overrides=ov)
            elif which == "channel":
                from cfd_tpu.cases import make_channel_case

                case = make_channel_case(
                    nx=1536, ny=512, dtype=jnp.float32, poisson="multigrid",
                    tolerance_factor=1e-6, abs_tol=0.0, mg_overrides=ov)
            elif which in ("cavity", "cavity4096"):
                from cfd_tpu.cases import make_cavity_case

                case = make_cavity_case(
                    n_interior=4096 if which == "cavity4096" else 2048,
                    dtype=jnp.float32, poisson="multigrid",
                    tolerance_factor=1e-6, mg_overrides=ov)
            else:
                from cfd_tpu.physics.boussinesq import make_rayleigh_benard_case

                case = make_rayleigh_benard_case(
                    nx=1536, ny=512, rayleigh=1e6, dtype=jnp.float32,
                    mg_overrides=ov)
            sps, mc, cs = bench(case, steps, chunk)
            print(f"{which} {name:22s}: {sps:8.2f} steps/s, "
                  f"{mc:.2f} cycles/step, compile {cs:.0f}s", flush=True)
        except Exception as e:  # noqa: BLE001 - sweep robustness
            print(f"{which} {name:22s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
