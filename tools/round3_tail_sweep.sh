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
  rc=$?
  echo "--- $mode done rc=$rc $(date +%T) ---" >> "$LOG"
  # a timeout-killed TPU process wedges the chip ~2 min; never chain
  # the next process into the wedge (CLAUDE.md)
  if [ "$rc" -ne 0 ]; then sleep 150; fi
done
echo "=== tail sweep end $(date) ===" >> "$LOG"
