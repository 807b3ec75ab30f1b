#!/bin/bash
# Round-3 DAY-5 queue: launches after the day-4 queue (pid file
# /tmp/r3_day4.pid) exits.  Adds the second training workload to the
# on-chip record — the DAMSM pretrain step (SURVEY A32: 299px Inception +
# bi-LSTM joint step, the reference's pretrain_DAMSM.py hot loop) — at the
# reference batch (32) and a TPU-saturating batch (256), both behind the
# measured-best DAMSM kernel flags.  Then a final bare-defaults bench IF
# bench.py defaults changed after day-4's rehearsal (set
# SBA_DAY5_FINAL_BENCH=1 when launching to include it).
#
# Same rules as every queue: one fresh process per config, honest fence
# (host value fetch inside the timed window), /tmp/jax_cpu_busy pause
# between items, timeout 1800 per item.
LOG=${1:-logs/r3_ablations.log}
cd "$(dirname "$0")/.."
mkdir -p "$(dirname "$LOG")"

D4_PID=$(cat /tmp/r3_day4.pid 2>/dev/null)
if [ -n "$D4_PID" ]; then
  while kill -0 "$D4_PID" 2>/dev/null; do sleep 120; done
fi

run() {
  while [ -e /tmp/jax_cpu_busy ]; do sleep 60; done
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 1800 "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

# ---- Tier E1: DAMSM pretrain step, reference batch ----
run env STEP_SIM_IMPL=pallas python scripts/perf_breakdown.py pretrain 32

# ---- Tier E2: DAMSM pretrain step, TPU-saturating batch ----
run env STEP_SIM_IMPL=pallas python scripts/perf_breakdown.py pretrain 256

# ---- Tier E3 (optional): final bare-defaults bench after a flip ----
if [ "$SBA_DAY5_FINAL_BENCH" = "1" ]; then
  run python bench.py
fi

echo "DAY5_QUEUE_DONE $(date +%H:%M:%S)" >> "$LOG"
