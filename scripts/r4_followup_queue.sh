#!/bin/bash
# Round-4 follow-up queue — chains on scripts/r4_queue.sh (waits for its
# pid to exit), then:
#   F1  serving latency ON CHIP with the new phase breakdown (VERDICT #5
#       done-criterion: median <= 1.2 s with a phase table)
#   F2  EMA bulk-inference throughput at the convt G lowering (round-3's
#       3945 img/s predates UPBLOCK_FUSED)
#   F3  b256 full-stack HBM accounting (compile-level memory_analysis or
#       the full OOM text — the b256 half of VERDICT #2)
#   F4  b128 best-point + DAMSM_CHUNKS=2 only if encstem OOMed (fallback
#       composition; skipped when encstem ran)
LOG=${1:-logs/r4_ablations.log}
cd "$(dirname "$0")/.."

if [ -f /tmp/r4_queue.pid ]; then
  MAIN=$(cat /tmp/r4_queue.pid)
  while kill -0 "$MAIN" 2>/dev/null; do sleep 60; done
fi

run() {
  local T=$1; shift
  while [ -e /tmp/jax_cpu_busy ]; do sleep 60; done
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout "$T" "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

run 2400 python scripts/serving_latency.py -n 5
run 1800 env STEP_UPFUSED=1 STEP_UPIMPL=convt python scripts/perf_breakdown.py sample 128
run 2400 python scripts/hbm_report.py b256_fullstack 256 remat encblocks simpallas rematg bncompact upfused upimpl=convt

if grep -q "^b128_upct_encstem: batch=" "$LOG"; then
  echo "F4 skipped: encstem measured" >> "$LOG"
else
  run 1800 python scripts/perf_ablation.py one b128_upct_encblocks_chunks2 128 remat encblocks simpallas upfused upimpl=convt chunks=2
fi

echo "R4_FOLLOWUP_DONE $(date +%H:%M:%S)" >> "$LOG"
