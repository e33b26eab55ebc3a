"""Post-solid-fill smoothing sweep for the masked backwards step (on-chip).

The production V(1,2) default was chosen in round 4 BEFORE the mask-aware
solid-fill prolongation (multigrid._solid_fill) fixed the near-wall
barely-contracting mode.  Post-fix f64 contraction factors at 256x32
(tools measurement, round 5 cont.):

    V(1,2) 0.317   3 pairs/cycle
    V(2,2) 0.215   4
    V(1,3) 0.218   4
    V(2,3) 0.151   5
    V(3,3) 0.102   6

Smoothing-work per residual decade is FLAT across these (~6.0 pairs),
so heavier smoothing per cycle buys strictly fewer cycles, and every
per-cycle fixed cost (residual + restrict + coarse tail + prolong +
in-kernel loop bookkeeping) amortizes over fewer cycles — the opposite
trade from the pre-fix regime where V(2,2) ran MORE cycles (7.5 vs 5.0)
because the mask-blind transfer re-polluted whatever the smoother fixed.

Also probes the 2p - p_prev extrapolated warm start (round-3 measured
HARMFUL pre-fix: 4.0 -> 5.75 cycles; the solid-fill changes what the
hierarchy re-contracts) via a tool-local step wrapper carrying p_prev —
no production-code change until the number justifies one.

Usage: python tools/step_sweep_bench.py [nx ny] [--variants a,b,...]
Variants: v12 v22 v23 v33 v12x v23x  (x = extrapolated warm start)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

VARIANTS = {
    "v12": (1, 2, False),
    "v22": (2, 2, False),
    "v23": (2, 3, False),
    "v33": (3, 3, False),
    "v12x": (1, 2, True),
    "v23x": (2, 3, True),
}


def make_extrap_step(case):
    """The solver.make_step masked-fused branch with a 2p - p_prev guess:
    carries (state, p_prev) and warm-starts the fused whole_solve from the
    extrapolation instead of the plain previous p (solver.py channel-
    ordering extrap branch semantics, applied to the masked flavor)."""
    import jax
    import jax.numpy as jnp

    grid = case.grid
    n_fluid = grid.n_fluid
    fused = case.step_kernels[0]

    def remove_mean_quad(b, sum_b):
        from cfd_tpu.poisson.multigrid import step_rect_params

        q = jax.lax.broadcasted_iota(jnp.int32, b.shape, 0)
        jj = 2 * jax.lax.broadcasted_iota(jnp.int32, b.shape, 1) + (q >> 1)
        ii = 2 * jax.lax.broadcasted_iota(jnp.int32, b.shape, 2) + (q & 1)
        cell = (jj >= 1) & (jj <= grid.ny) & (ii >= 1) & (ii <= grid.nx)
        step_i, inlet_j = step_rect_params(grid)
        cell = cell & ~((ii <= step_i) & (jj > inlet_j))
        return jnp.where(cell, b - sum_b / n_fluid, b)

    def step(carry):
        state, p_prev = carry
        us2, vs2, b, sum_b = fused(state.u, state.v, state.p)
        if case.remove_source_mean:
            b = remove_mean_quad(b, sum_b)
        guess = 2.0 * state.p - p_prev
        p, iters, res = case.poisson_solve(guess, b)
        new = type(state)(us2, vs2, p, state.T, None)
        return (new, state.p), iters

    return step


def run(nx: int, ny: int, name: str, steps: int, chunk: int,
        warmup_steps: int) -> dict:
    import jax
    import jax.numpy as jnp

    from cfd_tpu.cases import make_backwards_step_case
    from cfd_tpu.solver import Simulation, make_step

    nu1, nu2, extrap = VARIANTS[name]
    ov = None if (nu1, nu2) == (1, 2) else {"pre_sweeps": nu1,
                                            "post_sweeps": nu2}
    case = make_backwards_step_case(nx=nx, ny=ny, poisson="multigrid",
                                    tolerance_factor=1e-6, abs_tol=0.0,
                                    dtype=jnp.float32, mg_overrides=ov)
    state = Simulation(case, log=lambda *a: None).initial_state()
    if extrap:
        step_fn = make_extrap_step(case)
        carry0 = (state, state.p)
    else:
        base = make_step(case)

        def step_fn(s):
            s2, d = base(s)
            return s2, d.poisson_iters

        carry0 = state

    @jax.jit
    def multi(carry):
        def body(c, _):
            c2, iters = step_fn(c) if extrap else step_fn(c)
            return c2, iters

        return jax.lax.scan(body, carry, None, length=chunk)

    t0 = time.perf_counter()
    carry, iters = multi(carry0)
    jax.block_until_ready(jax.tree.leaves(carry)[0])
    compile_s = time.perf_counter() - t0
    for _ in range(max(1, -(-warmup_steps // chunk) - 1)):
        carry, iters = multi(carry)
    jax.block_until_ready(jax.tree.leaves(carry)[0])

    n_chunks = max(1, steps // chunk)
    timed = n_chunks * chunk
    cycles = []
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        carry, iters = multi(carry)
        cycles.append(iters)
    jax.block_until_ready(jax.tree.leaves(carry)[0])
    wall = time.perf_counter() - t0
    finite = all(bool(jnp.isfinite(leaf).all())
                 for leaf in jax.tree.leaves(carry))
    mean_cycles = float(sum(int(c.sum()) for c in cycles)) / timed
    sps = timed / wall
    return {
        "variant": name, "nx": nx, "ny": ny,
        "steps_per_s": round(sps, 1),
        "cell_steps_per_s": round(sps * case.grid.n_fluid / 1e9, 3),
        "cycles_per_step": round(mean_cycles, 2),
        "compile_s": round(compile_s, 1),
        "finite": finite,
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    nx = int(args[0]) if args else 2048
    ny = int(args[1]) if len(args) > 1 else 256
    names = ["v12", "v22", "v23", "v33"]
    for a in sys.argv[1:]:
        if a.startswith("--variants"):
            names = a.split("=", 1)[1].split(",")
    steps = int(os.environ.get("BENCH_STEPS", 300))
    chunk = int(os.environ.get("BENCH_CHUNK", 50))
    warmup = int(os.environ.get("BENCH_WARMUP_STEPS", 400))
    for name in names:
        print(json.dumps(run(nx, ny, name, steps, chunk, warmup)),
              flush=True)


if __name__ == "__main__":
    main()
