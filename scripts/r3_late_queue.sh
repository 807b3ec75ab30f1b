#!/bin/bash
# Round-3 LATE queue: A/B the two NEW fused-UpBlock lowerings that replaced
# the OOMing fold2x2 form (models/blocks.py _FoldedUpConv3x3):
#   phase3x3 — aligned phases, pure-reshape depth-to-space
#   convt    — single stride-2 transposed conv, no depth-to-space
# fold2x2 evidence already in logs/r3_ablations.log (19:06/19:31: OOM at
# b128 both nochunk and chunked, where the naive conv runs — its shifted
# slice/pad VJP chain RAISES peak HBM).
#
# Chain after the resume queue:
#   bash scripts/wait_then_run.sh logs/r3_ablations.log RESUME_QUEUE_DONE \
#        -- bash scripts/r3_late_queue.sh
#
# Same rules: one fresh process per config, honest fence, lowering
# prechecks (CPU, no device) run as queue items so they never overlap an
# on-chip measurement.
LOG=${1:-logs/r3_ablations.log}
cd "$(dirname "$0")/.."
mkdir -p "$(dirname "$LOG")"

run() {
  while [ -e /tmp/jax_cpu_busy ]; do sleep 60; done
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 1800 "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

ms_of() {  # ms_of NAME -> step ms from the log (empty if absent/failed)
  grep -h "^$1: batch=" "$LOG" | tail -1 | sed -n 's/.* \([0-9.]*\) ms\/step.*/\1/p'
}

# 0. host-side TPU lowering prechecks (cheap; catches Mosaic/HLO rejects)
run python scripts/check_step_tpu_lowering.py upf3 128 remat simpallas upfused upimpl=phase3x3
run python scripts/check_step_tpu_lowering.py upct 128 remat simpallas upfused upimpl=convt

# 1. on-chip A/B vs tonight's anchor (b128_simpallas_nochunk_anchor 272.7)
grep -q "LOWER_OK upf3" "$LOG" && \
  run python scripts/perf_ablation.py one b128_nochunk_upf3 128 remat simpallas upfused upimpl=phase3x3
grep -q "LOWER_OK upct" "$LOG" && \
  run python scripts/perf_ablation.py one b128_nochunk_upct 128 remat simpallas upfused upimpl=convt

# 2. pick the winner (must beat the same-evening anchor to count)
ANCHOR=$(ms_of b128_simpallas_nochunk_anchor)
UPF3=$(ms_of b128_nochunk_upf3)
UPCT=$(ms_of b128_nochunk_upct)
BEST_IMPL=""; BEST_MS=$ANCHOR
for pair in "phase3x3:$UPF3" "convt:$UPCT"; do
  impl=${pair%%:*}; ms=${pair#*:}
  [ -n "$ms" ] || continue
  if awk -v a="$ms" -v b="$BEST_MS" 'BEGIN{exit !(a < b)}'; then
    BEST_IMPL=$impl; BEST_MS=$ms
  fi
done
echo "LATE_QUEUE_PICK impl=${BEST_IMPL:-none} ms=${BEST_MS} anchor=${ANCHOR}" >> "$LOG"

# 3. bench line at the winning flags (skip if neither beat the anchor —
#    tier E of the resume queue already benched phase3x3 blind)
if [ -n "$BEST_IMPL" ]; then
  SBA_BENCH_SIM_IMPL=pallas SBA_BENCH_CHUNKS=1 SBA_BENCH_UPFUSED=1 \
    SBA_BENCH_UPIMPL=$BEST_IMPL run python bench.py
fi

# 4. larger batch.  b192/b256 nochunk+rematg fail at COMPILE with an HBM
#    planning OOM surfaced as remote_compile HTTP 500 (17.09G resp.
#    18.18G vs 15.75G) — NOT a transient.  Remaining memory levers:
#    (a) DAMSM batch chunking composes with the kernel (the 298 ms
#    chunked point at b128), (b) the phase3x3/convt upfused lowerings
#    shrink G-side residuals (low-res conv inputs).
run python scripts/perf_ablation.py one b192_rematg_chunks4 192 remat simpallas rematg chunks=4
if [ -n "$BEST_IMPL" ]; then
  run python scripts/perf_ablation.py one b192_nochunk_rematg_upbest 192 remat simpallas rematg upfused upimpl=$BEST_IMPL
fi
B192=$(ms_of b192_rematg_chunks4)
if [ -n "$B192" ] && [ -n "$BEST_IMPL" ]; then
  run python scripts/perf_ablation.py one b192_rematg_chunks4_upbest 192 remat simpallas rematg chunks=4 upfused upimpl=$BEST_IMPL
fi

echo "LATE_QUEUE_DONE $(date +%H:%M:%S)" >> "$LOG"
