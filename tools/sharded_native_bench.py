"""Compile + run the SHARDED quad builders natively (interpret=False).

VERDICT round-3 item 1: the sharded quad/Pallas path (parallel.quad_sharded)
had only ever run in interpret mode on virtual CPU meshes — the traced
``row_base`` SMEM scalar, the shard=(P, mdy) band bookkeeping and the step
flavor's dynamic-sliced 2D weight blocks had zero Mosaic-lowering evidence.
A 1-device mesh on the real chip exercises exactly those kernel variants
(only the ppermute halo refresh short-circuits, quad_sharded._refresh), so
this tool is the native proof: it compiles ShardedQuadProjection with
interpret=False, times it, and (optionally) checks the trajectory against
the single-device quad path in the same process.

One flavor per invocation (a compile crash must not take the other flavors
down with it); prints one JSON line.

Usage (on the real chip; run in background with a generous bound):
  python tools/sharded_native_bench.py --flavor cavity --n 256 --check 3
  python tools/sharded_native_bench.py --flavor cavity --n 2048
  python tools/sharded_native_bench.py --flavor step --nx 2048 --ny 256
  python tools/sharded_native_bench.py --flavor channel --nx 1536 --ny 512
  python tools/sharded_native_bench.py --flavor rb --nx 1536 --ny 512

Reference anchor: the SOR hot loops this path replaces at scale
(cavity-01.cpp:609-690, backwards_step-01.cpp:872-939).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def build_case(flavor: str, nx: int, ny: int, tol: float = 1e-6,
               mg_overrides: dict | None = None):
    import jax.numpy as jnp

    if flavor == "cavity":
        from cfd_tpu.cases import make_cavity_case

        return make_cavity_case(n_interior=nx, poisson="multigrid",
                                dtype=jnp.float32, tolerance_factor=tol,
                                layout="quad", mg_overrides=mg_overrides)
    if flavor == "channel":
        from cfd_tpu.cases import make_channel_case

        return make_channel_case(nx=nx, ny=ny, poisson="multigrid",
                                 tolerance_factor=tol, abs_tol=0.0,
                                 dtype=jnp.float32, layout="quad",
                                 mg_overrides=mg_overrides)
    if flavor == "step":
        from cfd_tpu.cases import make_backwards_step_case

        # V(1,1): the sharded masked solve runs V(1,1) only (the exact
        # masked smoother's halo budget, quad_sharded) — the single-device
        # case must match or the --check compares DIFFERENT solvers
        return make_backwards_step_case(nx=nx, ny=ny, poisson="multigrid",
                                        tolerance_factor=tol, abs_tol=0.0,
                                        dtype=jnp.float32, layout="quad",
                                        mg_overrides={"pre_sweeps": 1,
                                                      "post_sweeps": 1,
                                                      **(mg_overrides or {})})
    if flavor == "rb":
        from cfd_tpu.physics.boussinesq import make_rayleigh_benard_case

        return make_rayleigh_benard_case(nx=nx, ny=ny, rayleigh=1e6,
                                         dtype=jnp.float32, layout="quad",
                                         mg_overrides=mg_overrides)
    raise ValueError(flavor)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--flavor", default="cavity",
                    choices=["cavity", "channel", "rb", "step"])
    ap.add_argument("--n", type=int, default=256,
                    help="cavity n_interior (square)")
    ap.add_argument("--nx", type=int, default=None)
    ap.add_argument("--ny", type=int, default=None)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--warmup-chunks", type=int, default=2)
    ap.add_argument("--check", type=int, default=0,
                    help="also run N single-device steps and compare fields")
    ap.add_argument("--devices", type=int, default=1,
                    help="mesh size (1 on the real chip)")
    ap.add_argument("--single", action="store_true",
                    help="also time the single-device quad path")
    ap.add_argument("--tol", type=float, default=1e-6,
                    help="relative Poisson tolerance factor")
    ap.add_argument("--force-sharded", action="store_true",
                    help="keep the SHARDED program on a 1-device mesh "
                         "(the native Mosaic lowering-evidence mode; "
                         "default at --devices 1 is the mdy==1 delegation "
                         "to the single-device fast path)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from cfd_tpu.parallel.quad_sharded import ShardedQuadProjection

    nx = args.nx if args.nx is not None else args.n
    ny = args.ny if args.ny is not None else args.n
    case = build_case(args.flavor, nx, ny, tol=args.tol)
    devs = jax.devices()
    if len(devs) < args.devices:
        raise SystemExit(f"need {args.devices} devices, have {len(devs)}")
    mesh = Mesh(np.array(devs[: args.devices]), ("dy",))

    if args.devices == 1 and not args.force_sharded:
        # knob-free construction engages the mdy==1 delegation: the engine
        # runs the case's own single-device fast path (the factory already
        # bakes --tol in), so this measures the TRUE 1-device rate
        sq = ShardedQuadProjection(case, mesh, interpret=False)
    else:
        sq = ShardedQuadProjection(case, mesh, interpret=False,
                                   tol_factor=args.tol,
                                   mg_overrides={"abs_tol": 0.0},
                                   force_sharded_path=args.force_sharded)
    state = sq.initial_state()
    t0 = time.perf_counter()
    state, d = sq.run_chunk(state, args.chunk)
    jax.block_until_ready(state)
    compile_s = time.perf_counter() - t0
    for _ in range(args.warmup_chunks - 1):
        state, d = sq.run_chunk(state, args.chunk)
    jax.block_until_ready(state)

    n_chunks = max(1, args.steps // args.chunk)
    iters = []
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        state, d = sq.run_chunk(state, args.chunk)
        iters.append(d["poisson_iters"])
    jax.block_until_ready(state)
    wall = time.perf_counter() - t0
    steps = n_chunks * args.chunk
    sps = steps / wall
    cycles = float(sum(int(c.sum()) for c in iters)) / steps
    st = sq.logical(state)
    finite = bool(np.isfinite(np.asarray(st.u)).all()
                  and np.isfinite(np.asarray(st.p)).all())

    out = {
        "metric": f"sharded-native {args.flavor} {nx}x{ny} f32 quad "
                  f"({args.devices}-device mesh, interpret=False)",
        "steps_per_sec": round(sps, 1),
        "cycles_per_step": round(cycles, 2),
        "compile_s": round(compile_s, 1),
        "finite": finite,
        "delegated": bool(getattr(sq, "delegated", False)),
    }

    if args.single:
        from cfd_tpu.solver import Simulation, make_step

        sim = Simulation(case, log=lambda *a: None)
        sstate = sim.initial_state()
        step_fn = make_step(case)

        @jax.jit
        def multi(s):
            def body(c, _):
                c2, dd = step_fn(c)
                return c2, dd.poisson_iters

            return jax.lax.scan(body, s, None, length=args.chunk)

        sstate, _ = multi(sstate)
        jax.block_until_ready(jax.tree.leaves(sstate)[0])
        for _ in range(args.warmup_chunks - 1):
            sstate, _ = multi(sstate)
        jax.block_until_ready(jax.tree.leaves(sstate)[0])
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            sstate, _ = multi(sstate)
        jax.block_until_ready(jax.tree.leaves(sstate)[0])
        out["single_steps_per_sec"] = round(steps / (time.perf_counter() - t0), 1)
        out["ratio_vs_single"] = round(
            out["steps_per_sec"] / out["single_steps_per_sec"], 3)

    if args.check:
        from cfd_tpu.solver import Simulation, make_step

        # PINNED solves on both sides: a tolerance/stall-terminated f32
        # solve ends on the residual floor, where the exit cycle of two
        # DIFFERENTLY-COMPILED programs can differ by an ulp-driven stall
        # flip — after a few steps the trajectories then differ by up to
        # the (unreached) tolerance, which is NOT a kernel bug. Fixing
        # max_cycles (tol ~ 0, stall off) makes every solve run the same
        # cycle count so the fields must agree to f32 roundoff.
        pin = {"max_cycles": 3, "tol_factor": 1e-30, "stall_ratio": 1e30}
        case_chk = build_case(args.flavor, nx, ny, tol=args.tol,
                              mg_overrides=dict(pin))
        sq_chk = ShardedQuadProjection(case_chk, mesh, interpret=False,
                                       tol_factor=args.tol,
                                       mg_overrides={"abs_tol": 0.0, **pin},
                                       force_sharded_path=True)
        sim = Simulation(case_chk, log=lambda *a: None)
        st1 = sim.initial_state()
        it1 = []
        for _ in range(args.check):
            st1, dd = sim._step(st1)
            it1.append(int(dd.poisson_iters))
        ref = sim._logical(st1)
        s2 = sq_chk.initial_state()
        it2 = []
        for _ in range(args.check):
            s2, dd = sq_chk.step(s2)
            it2.append(int(dd["poisson_iters"]))
        got = sq_chk.logical(s2)
        errs = {}
        for name in ("u", "v", "p"):
            a = np.asarray(getattr(ref, name), np.float64)
            b = np.asarray(getattr(got, name), np.float64)
            scale = max(1.0, float(np.abs(a).max()))
            errs[name] = float(np.abs(a - b).max() / scale)
        out["check_steps"] = args.check
        out["check_iters"] = [it2, it1]
        out["check_max_rel_err"] = errs
        out["check_ok"] = bool(
            it2 == it1 and all(e < 5e-5 for e in errs.values()))

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
