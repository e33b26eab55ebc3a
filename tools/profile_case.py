"""Profile one case's compiled step on the TPU and print the per-op time
breakdown (CLAUDE.md: profile the FULL compiled step; standalone op
microbenchmarks mislead).

Usage: python -m tools.profile_case cavity 2048 2048
       python -m tools.profile_case backwards_step 2048 256
       python -m tools.profile_case channel 1536 512
       python -m tools.profile_case rayleigh_benard 1536 512
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def build(name, nx, ny):
    if name == "cavity":
        from cfd_tpu.cases import make_cavity_case
        return make_cavity_case(n_interior=nx, poisson="multigrid",
                                dtype=jnp.float32, tolerance_factor=1e-6)
    if name == "channel":
        from cfd_tpu.cases import make_channel_case
        return make_channel_case(nx=nx, ny=ny, length=float(3 * nx) / ny,
                                 poisson="multigrid", dtype=jnp.float32,
                                 tolerance_factor=1e-6)
    if name == "backwards_step":
        from cfd_tpu.cases import make_backwards_step_case
        return make_backwards_step_case(nx=nx, ny=ny, poisson="multigrid",
                                        dtype=jnp.float32,
                                        tolerance_factor=1e-6)
    if name == "rayleigh_benard":
        from cfd_tpu.cases import make_rayleigh_benard_case
        return make_rayleigh_benard_case(nx=nx, ny=ny, dtype=jnp.float32)
    raise SystemExit(f"unknown case {name}")


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "cavity"
    nx = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    ny = int(sys.argv[3]) if len(sys.argv) > 3 else nx
    steps = int(os.environ.get("PROF_STEPS", 50))

    from cfd_tpu.solver import Simulation, make_step
    case = build(name, nx, ny)
    step_fn = make_step(case)

    @jax.jit
    def multi(state):
        def body(s, _):
            s2, d = step_fn(s)
            return s2, d.poisson_iters
        return jax.lax.scan(body, state, None, length=steps)

    state = Simulation(case, log=lambda *a: None).initial_state()
    for _ in range(2):  # compile + spin up flow so cycle counts are typical
        state, it = multi(state)
        jax.block_until_ready(state.u)

    t0 = time.perf_counter()
    state, it = multi(state)
    jax.block_until_ready(state.u)
    wall = time.perf_counter() - t0
    print(f"{name} {nx}x{ny}: {steps / wall:.1f} steps/s "
          f"({wall / steps * 1e3:.3f} ms/step), "
          f"mean cycles/step {float(it.sum()) / steps:.2f}")

    with jax.profiler.trace("/tmp/prof"):
        state, it = multi(state)
        jax.block_until_ready(state.u)

    fs = sorted(glob.glob("/tmp/prof/**/*.trace.json.gz", recursive=True),
                key=os.path.getmtime)
    with gzip.open(fs[-1], "rt") as f:
        tr = json.load(f)
    agg, cnt = collections.Counter(), collections.Counter()
    for e in tr["traceEvents"]:
        if (e.get("ph") == "X" and e.get("dur")
                and isinstance(e.get("args"), dict)
                and e["args"].get("long_name")):
            agg[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    rows = [(d, nm) for nm, d in agg.items() if not nm.startswith("while")]
    rows.sort(reverse=True)
    shown = 0
    for d, nm in rows[:30]:
        print(f"{d / steps:9.1f} us/step {cnt[nm] // steps:4d}x  {nm[:100]}")
        shown += d
    rest = sum(d for d, _ in rows[30:])
    print(f"{rest / steps:9.1f} us/step       (everything else, "
          f"{len(rows) - 30} ops)")


if __name__ == "__main__":
    main()
