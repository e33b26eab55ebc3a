#!/bin/bash
# Round-3 fused-tail measurement batch: run ALL tail_from sweeps in one
# process sequence so the (intermittently available) chip stays busy.
# Usage: bash tools/round3_tail_sweep.sh [logfile]
set -u
LOG=${1:-/tmp/tpu_results.log}
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
echo "=== tail sweep start $(date) ===" >> "$LOG"
# Mosaic smoke first: a small-grid tail compile fails in seconds if any
# in-kernel op is rejected, instead of after a 2048^2 compile
timeout 1200 python - >> "$LOG" 2>&1 <<'EOF'
import jax, jax.numpy as jnp
from cfd_tpu.cases import make_cavity_case, make_backwards_step_case
from cfd_tpu.solver import Simulation, make_step
for name, case in [
    ("tail", make_cavity_case(n_interior=256, dtype=jnp.float32,
                              poisson="multigrid", tolerance_factor=1e-5,
                              mg_overrides={"tail_from": 1})),
    ("whole", make_cavity_case(n_interior=256, dtype=jnp.float32,
                               poisson="multigrid", tolerance_factor=1e-5,
                               mg_overrides={"whole_solve": True})),
    ("whole-step", make_backwards_step_case(
        nx=256, ny=32, dtype=jnp.float32, poisson="multigrid",
        tolerance_factor=1e-5, mg_overrides={"whole_solve": True})),
    ("wstep", make_cavity_case(n_interior=256, dtype=jnp.float32,
                               poisson="multigrid", tolerance_factor=1e-5,
                               mg_overrides={"whole_step": True})),
    ("wstep-masked", make_backwards_step_case(
        nx=256, ny=32, dtype=jnp.float32, poisson="multigrid",
        tolerance_factor=1e-5, mg_overrides={"whole_step": True})),
]:
    sim = Simulation(case, log=lambda *a: None)
    step = jax.jit(make_step(case))
    st = sim.initial_state()
    for _ in range(3):
        st, d = step(st)
    jax.block_until_ready(jax.tree.leaves(st)[0])
    print(f"{name} MOSAIC SMOKE OK, cycles:", int(d.poisson_iters), flush=True)
EOF
rc=$?
echo "--- smoke rc=$rc $(date +%T) ---" >> "$LOG"
if [ "$rc" -ne 0 ]; then
  echo "SMOKE FAILED - skipping tail sweeps, running baseline modes only" >> "$LOG"
  sleep 150
fi
for mode in step rb channel cavity cavity4096; do
  echo "--- case_tune $mode $(date +%T) ---" >> "$LOG"
  timeout 4500 python tools/case_tune.py "$mode" 150 50 >> "$LOG" 2>&1
  rc=$?
  echo "--- $mode done rc=$rc $(date +%T) ---" >> "$LOG"
  # a timeout-killed TPU process wedges the chip ~2 min; never chain
  # the next process into the wedge (CLAUDE.md)
  if [ "$rc" -ne 0 ]; then sleep 150; fi
done
echo "=== tail sweep end $(date) ===" >> "$LOG"
