#!/bin/bash
# Round-4 trace queue — chains on r4_followup_queue.sh, then captures the
# op-level evidence for the G-backward attack (VERDICT r3 next-#4) AT THE
# NEW OPERATING POINT (convt + stem encoder remat, 221.3 ms/578 img/s):
#   T1  lambda=0 trace (no DAMSM branch): names the G/D sinks that remain
#   T2  full-step trace at the same flags: shows the stem recompute +
#       words-loss share in situ
#   T3  decomposition triple at the new point: full / nodamsm / slice
# Summaries land in the log via summarize_trace.py (tf_op aggregation).
LOG=${1:-logs/r4_ablations.log}
cd "$(dirname "$0")/.."

if [ -f /tmp/r4_followup.pid ]; then
  P=$(cat /tmp/r4_followup.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi

run() {
  local T=$1; shift
  while [ -e /tmp/jax_cpu_busy ]; do sleep 60; done
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout "$T" "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

BEST_ENV="STEP_SIM_IMPL=pallas STEP_CHUNKS=1 STEP_UPFUSED=1 STEP_UPIMPL=convt STEP_REMAT=1 STEP_ENC_MODE=stem"

run 2400 env $BEST_ENV python scripts/capture_trace.py 128 0.0 /tmp/r4_trace_lam0
run 600 python scripts/summarize_trace.py /tmp/r4_trace_lam0
run 2400 env $BEST_ENV python scripts/capture_trace.py 128 5.0 /tmp/r4_trace_full
run 600 python scripts/summarize_trace.py /tmp/r4_trace_full
run 1800 env $BEST_ENV python scripts/perf_breakdown.py nodamsm 128
run 1800 env $BEST_ENV python scripts/perf_breakdown.py damsm_slice 128

echo "R4_TRACE_DONE $(date +%H:%M:%S)" >> "$LOG"
