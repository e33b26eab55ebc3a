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
for mode in step rb channel cavity cavity4096; do
  echo "--- case_tune $mode $(date +%T) ---" >> "$LOG"
  timeout 3000 python tools/case_tune.py "$mode" 150 50 >> "$LOG" 2>&1
  echo "--- $mode done rc=$? $(date +%T) ---" >> "$LOG"
done
echo "=== tail sweep end $(date) ===" >> "$LOG"
