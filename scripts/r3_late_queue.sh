#!/bin/bash
# Round-3 LATE queue, ordered by decision value.  Two new levers vs the
# resume queue:
#
#  (A) BN_COMPACT (models/blocks.py _CompactBatchNorm): generator BNs no
#      longer promote the (B,H,W,C) activation to f32.  Evidence: the two
#      largest HLO temps of the b256 step were 4.00G f32 buffers from
#      exactly that promotion (this log, 20:50).  CPU parity tests green
#      (tests/test_blocks_bn_compact.py) and the step lowers clean for
#      TPU at b128 and b256 (LOWER_OK bnc128/bnc256, host-side).
#  (B) The two fused-UpBlock lowerings that replaced the OOMing fold2x2
#      (phase3x3 / convt) — phase3x3 already proven the big memory saver
#      (b256 OOM overage 2.43G -> 674M at 20:39/20:50).
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
ips_of() {  # ips_of NAME -> img/s from the log (empty if absent/failed)
  grep -h "^$1: batch=" "$LOG" | tail -1 | sed -n 's/.* \([0-9]*\) img\/s.*/\1/p'
}

# ---- Tier 1: BN_COMPACT at the flagship point (decides the bench flip) --
# 1a. direct A/B vs tonight's anchor (b128_simpallas_nochunk_anchor 272.7):
#     same flags + bncompact.  Also a memory-traffic lever in the forward.
run python scripts/perf_ablation.py one b128_nochunk_bnc 128 remat simpallas bncompact
# 1b. the big structural hope: bncompact may free enough HBM to drop the
#     encoder remat entirely (b128 'plain' OOMed at 08:31 without it).
run python scripts/perf_ablation.py one b128_plain_bnc 128 simpallas bncompact

# ---- Tier 2: fused-UpBlock lowerings A/B at b128 ----
# 0. host-side TPU lowering prechecks (cheap; catches Mosaic/HLO rejects)
run python scripts/check_step_tpu_lowering.py upf3 128 remat simpallas upfused upimpl=phase3x3
run python scripts/check_step_tpu_lowering.py upct 128 remat simpallas upfused upimpl=convt
grep -q "LOWER_OK upf3" "$LOG" && \
  run python scripts/perf_ablation.py one b128_nochunk_upf3 128 remat simpallas upfused upimpl=phase3x3
grep -q "LOWER_OK upct" "$LOG" && \
  run python scripts/perf_ablation.py one b128_nochunk_upct 128 remat simpallas upfused upimpl=convt

# pick the UpBlock winner (must beat the same-evening anchor to count)
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

# ---- Tier 3: larger batch behind the memory levers ----
# b192/b256 nochunk+rematg fail at COMPILE with an HBM planning OOM
# (17.09G resp. 18.18G vs 15.75G, surfaced as remote_compile HTTP 500 —
# NOT a transient).  Levers: bncompact (>=2G of f32 G-side temps),
# phase3x3 upfused (b256 overage 2.43G -> 674M), DAMSM batch chunking.
UPMEM=${BEST_IMPL:-phase3x3}
# 3a. b192 WITHOUT rematg: was 1.29G over; bncompact alone may fit it.
run python scripts/perf_ablation.py one b192_nochunk_bnc 192 remat simpallas bncompact
# 3b. b256 full stack: bncompact + upfused + rematg + chunks=4.
run python scripts/perf_ablation.py one b256_rematg_chunks4_up_bnc 256 remat simpallas rematg chunks=4 upfused upimpl=$UPMEM bncompact
# 3c. fallbacks at b192 if 3a OOMed: add upfused, then rematg+chunks.
if [ -z "$(ms_of b192_nochunk_bnc)" ]; then
  run python scripts/perf_ablation.py one b192_nochunk_bnc_up 192 remat simpallas bncompact upfused upimpl=$UPMEM
fi
if [ -z "$(ms_of b192_nochunk_bnc)" ] && [ -z "$(ms_of b192_nochunk_bnc_up)" ]; then
  run python scripts/perf_ablation.py one b192_rematg_chunks4 192 remat simpallas rematg chunks=4
fi

# ---- Tier 4: bench line at the measured-best flags ----
# Compare every candidate point's img/s against the anchor and record ONE
# bench-format line at the winner (evidence for the bench.py default flip;
# the driver's end-of-round bench.py uses env-free defaults).
ANCHIPS=$(ips_of b128_simpallas_nochunk_anchor)
BENV=""
BIPS=${ANCHIPS:-0}
check() {  # check NAME IPS ENV...
  local name=$1 ips=$2; shift 2
  [ -n "$ips" ] || return 0
  if [ "$ips" -gt "$BIPS" ]; then BIPS=$ips; BENV="$*"; fi
}
check b128_nochunk_bnc "$(ips_of b128_nochunk_bnc)" \
  SBA_BENCH_BNCOMPACT=1
check b128_plain_bnc "$(ips_of b128_plain_bnc)" \
  SBA_BENCH_BNCOMPACT=1 SBA_BENCH_REMAT=0
check b128_nochunk_upf3 "$(ips_of b128_nochunk_upf3)" \
  SBA_BENCH_UPFUSED=1 SBA_BENCH_UPIMPL=phase3x3
check b128_nochunk_upct "$(ips_of b128_nochunk_upct)" \
  SBA_BENCH_UPFUSED=1 SBA_BENCH_UPIMPL=convt
check b192_nochunk_bnc "$(ips_of b192_nochunk_bnc)" \
  SBA_BENCH_BATCH=192 SBA_BENCH_BNCOMPACT=1
check b192_nochunk_bnc_up "$(ips_of b192_nochunk_bnc_up)" \
  SBA_BENCH_BATCH=192 SBA_BENCH_BNCOMPACT=1 SBA_BENCH_UPFUSED=1 SBA_BENCH_UPIMPL=$UPMEM
check b192_rematg_chunks4 "$(ips_of b192_rematg_chunks4)" \
  SBA_BENCH_BATCH=192 SBA_BENCH_REMATG=stages SBA_BENCH_CHUNKS=4
check b256_rematg_chunks4_up_bnc "$(ips_of b256_rematg_chunks4_up_bnc)" \
  SBA_BENCH_BATCH=256 SBA_BENCH_BNCOMPACT=1 SBA_BENCH_REMATG=stages SBA_BENCH_CHUNKS=4 SBA_BENCH_UPFUSED=1 SBA_BENCH_UPIMPL=$UPMEM
echo "LATE_QUEUE_BENCH_PICK ips=${BIPS} env=[${BENV:-defaults-unchanged}]" >> "$LOG"
if [ -n "$BENV" ]; then
  # defaults first so $BENV's assignments win (last repeated env var wins)
  run env SBA_BENCH_SIM_IMPL=pallas SBA_BENCH_CHUNKS=1 $BENV python bench.py
fi

echo "LATE_QUEUE_DONE $(date +%H:%M:%S)" >> "$LOG"
