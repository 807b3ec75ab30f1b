#!/bin/bash
# Round-3 DAY-4 queue: launches after the night-3 queue (pid file
# /tmp/r3_night3.pid) exits.  Night-3 composes the convt fused UpBlock
# with partial encoder remat (encblocks); this queue (a) captures the
# profiler trace AT the measured-best operating point (the night-2 trace
# ran at round-1 flags), (b) re-states the decomposition with the fused
# G so the roofline claim matches the shipping config, and (c) runs
# bench.py with NO env overrides — i.e. exactly what the driver records
# at round end — so a defaults mismatch is caught while there is still
# time to fix it.
#
# Same rules as every queue: one fresh process per config, honest fence
# (host value fetch inside the timed window), /tmp/jax_cpu_busy pause
# between items, timeout 1800 per item.
LOG=${1:-logs/r3_ablations.log}
cd "$(dirname "$0")/.."
mkdir -p "$(dirname "$LOG")"

N3_PID=$(cat /tmp/r3_night3.pid 2>/dev/null)
if [ -n "$N3_PID" ]; then
  while kill -0 "$N3_PID" 2>/dev/null; do sleep 120; done
fi

run() {
  while [ -e /tmp/jax_cpu_busy ]; do sleep 60; done
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 1800 "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

ms_of() { grep -h "^$1: batch=" "$LOG" | tail -1 | sed -n 's/.* \([0-9.]*\) ms\/step.*/\1/p'; }
ips_of() { grep -h "^$1: batch=" "$LOG" | tail -1 | sed -n 's/.* \([0-9]*\) img\/s.*/\1/p'; }

# Best encoder-remat mode from night-3's M1 A/B (blocks vs full at upct).
ENC_MODE=full
UPCT=$(ips_of b128_nochunk_upct); UPCT=${UPCT:-0}
UPCTEB=$(ips_of b128_upct_encblocks); UPCTEB=${UPCTEB:-0}
if [ "$UPCTEB" -gt "$UPCT" ]; then ENC_MODE=blocks; fi
echo "DAY4_QUEUE_ENC_MODE=$ENC_MODE (upct=$UPCT upct_encblocks=$UPCTEB)" >> "$LOG"

# ---- Tier D1: profiler trace at the measured-best operating point ----
run env STEP_SIM_IMPL=pallas STEP_CHUNKS=1 STEP_UPFUSED=1 STEP_UPIMPL=convt \
    STEP_ENC_MODE=$ENC_MODE \
    python scripts/capture_trace.py 128 5.0 /tmp/sba_trace_best

# ---- Tier D2: non-DAMSM decomposition with the fused G ----
# A/B vs the 168.2 ms round-1-flags nodamsm: isolates what convt buys the
# conv stack alone (LAMBDA=0 removes every DAMSM flag from the program).
run env STEP_UPFUSED=1 STEP_UPIMPL=convt python scripts/perf_breakdown.py nodamsm 128

# ---- Tier D3: G fwd+vjp with the fused G (vs 89.4 ms unfused) ----
run env STEP_UPFUSED=1 STEP_UPIMPL=convt python scripts/perf_breakdown.py gvjp 128

# ---- Tier D4: the driver's exact round-end measurement ----
# NO env overrides: whatever bench.py's defaults are when this runs is
# what BENCH_r03.json will record.
run python bench.py

echo "DAY4_QUEUE_DONE $(date +%H:%M:%S)" >> "$LOG"
