"""A/B MGConfig.corr_opt (line-searched coarse correction) on the TPU chip.

VERDICT round-3 item 4b: the masked backwards-step case runs ~4.8-5
V-cycles/step under honest stall exits — the defect-correction hierarchy's
non-Galerkin coarse operator leaves a barely-contracting mode. corr_opt
rescales the coarse correction by the residual-minimizing steplength at the
exact/weighted seam (poisson/multigrid.py MGConfig.corr_opt); the fused
masked whole_solve honors it in-kernel (kernels/whole_solve.py
masked_vcycle_ctx). This tool measures cycles/step (contention-immune) +
steps/s for matched pairs so the corr_opt effect is not confounded with
the ~20% fusion speedup:

  per-kernel           (whole_solve=False baseline)
  per-kernel+corr_opt  (knob on the per-kernel path)
  fused                (auto whole_solve default — the production path)
  fused+corr_opt       (knob in-kernel — the production experiment)

Usage: python tools/step_corr_bench.py [nx ny]   (default 2048 256)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def run(nx: int, ny: int, ov: dict | None, label: str, steps: int,
        chunk: int, warmup_steps: int) -> dict:
    import jax
    import jax.numpy as jnp

    from cfd_tpu.cases import make_backwards_step_case
    from cfd_tpu.solver import Simulation, make_step

    case = make_backwards_step_case(nx=nx, ny=ny, poisson="multigrid",
                                    tolerance_factor=1e-6, abs_tol=0.0,
                                    dtype=jnp.float32, mg_overrides=ov)
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
    finite = all(bool(jnp.isfinite(leaf).all())
                 for leaf in jax.tree.leaves(state))
    mean_cycles = float(sum(int(c.sum()) for c in cycles)) / timed
    return {
        "variant": label,
        "nx": nx, "ny": ny,
        "steps_per_s": round(timed / wall, 1),
        "cycles_per_step": round(mean_cycles, 2),
        "compile_s": round(compile_s, 1),
        "finite": finite,
    }


def main() -> None:
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    ny = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    steps = int(os.environ.get("BENCH_STEPS", 300))
    chunk = int(os.environ.get("BENCH_CHUNK", 50))
    warmup = int(os.environ.get("BENCH_WARMUP_STEPS", 400))
    for ov, label in (
        ({"whole_solve": False}, "per-kernel"),
        ({"whole_solve": False, "corr_opt": True}, "per-kernel+corr_opt"),
        (None, "fused(auto whole_solve)"),
        ({"corr_opt": True}, "fused+corr_opt"),
    ):
        print(json.dumps(run(nx, ny, ov, label, steps, chunk, warmup)),
              flush=True)


if __name__ == "__main__":
    main()
