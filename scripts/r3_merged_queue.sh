#!/bin/bash
# Round-3 MERGED queue (replaces the tail of r3_resume_queue.sh + the whole
# r3_late_queue.sh): the round clock is near its budget, so the remaining
# on-chip slots are re-ordered by decision value.  Top of the list: the
# BN_COMPACT lever (commit 9fd6c76 + D/AdaIN extension) — it attacks the
# measured #1 HBM sink (f32 promotion of bf16 activations in the flax BN
# normalize path; 2x 4.00G HLO temps in the b256 compile report) and may
# unlock the operating points that OOMed tonight: b128 without encoder
# remat, b192 nochunk, b256.
#
# Same rules as every queue: one fresh process per config, honest fence
# (host value fetch inside the timed window), /tmp/jax_cpu_busy pause
# between items, lowering prechecks run as queue items.
LOG=${1:-logs/r3_ablations.log}
cd "$(dirname "$0")/.."
mkdir -p "$(dirname "$LOG")"

run() {
  while [ -e /tmp/jax_cpu_busy ]; do sleep 60; done
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 1800 "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

ms_of() { grep -h "^$1: batch=" "$LOG" | tail -1 | sed -n 's/.* \([0-9.]*\) ms\/step.*/\1/p'; }
ips_of() { grep -h "^$1: batch=" "$LOG" | tail -1 | sed -n 's/.* \([0-9]*\) img\/s.*/\1/p'; }

# ---- Tier 1: BN_COMPACT at the flagship point ----
run python scripts/perf_ablation.py one b128_nochunk_bnc 128 remat simpallas bncompact
run python scripts/perf_ablation.py one b128_plain_bnc 128 simpallas bncompact

# ---- Tier 2: fresh same-evening decomposition (roofline statement) ----
run python scripts/perf_breakdown.py nodamsm 128
# env scoped to the child only (VAR=x func leaks into the shell in bash)
run env SIM_IMPL=pallas REMAT=0 CHUNKS=1 python scripts/perf_breakdown.py damsm_slice 128

# ---- Tier 3: larger batch behind the memory levers ----
run python scripts/perf_ablation.py one b192_nochunk_bnc 192 remat simpallas bncompact
run python scripts/perf_ablation.py one b256_rematg_chunks4_up_bnc 256 remat simpallas rematg chunks=4 upfused upimpl=phase3x3 bncompact
if [ -z "$(ms_of b192_nochunk_bnc)" ]; then
  run python scripts/perf_ablation.py one b192_nochunk_bnc_up 192 remat simpallas bncompact upfused upimpl=phase3x3
fi

# ---- Tier 4: fused-UpBlock lowerings A/B at b128 ----
run python scripts/check_step_tpu_lowering.py upf3 128 remat simpallas upfused upimpl=phase3x3
run python scripts/check_step_tpu_lowering.py upct 128 remat simpallas upfused upimpl=convt
grep -q "LOWER_OK upf3" "$LOG" && \
  run python scripts/perf_ablation.py one b128_nochunk_upf3 128 remat simpallas upfused upimpl=phase3x3
grep -q "LOWER_OK upct" "$LOG" && \
  run python scripts/perf_ablation.py one b128_nochunk_upct 128 remat simpallas upfused upimpl=convt

# ---- Tier 5: word-attention kernel in-step A/B at tonight's best point,
#      honest serving latency + bulk-sampling throughput on-chip ----
run python scripts/perf_ablation.py one b128_nochunk_wattn 128 remat simpallas pallas
run python scripts/serving_latency.py -n 5
run python scripts/perf_breakdown.py sample 128

# ---- Tier 6: secondary sinks + profiler trace ----
run python scripts/perf_breakdown.py gvjp 128
run python scripts/perf_breakdown.py text 128
run python scripts/capture_trace.py 128 0.0 /tmp/sba_trace_lam0

# ---- Tier 7: ONE bench line at the measured-best flags ----
ANCHIPS=$(ips_of b128_simpallas_nochunk_anchor)
BENV=""; BIPS=${ANCHIPS:-0}
check() {
  local ips=$1; shift
  [ -n "$ips" ] || return 0
  if [ "$ips" -gt "$BIPS" ]; then BIPS=$ips; BENV="$*"; fi
}
check "$(ips_of b128_nochunk_bnc)"  SBA_BENCH_BNCOMPACT=1
check "$(ips_of b128_plain_bnc)"    SBA_BENCH_BNCOMPACT=1 SBA_BENCH_REMAT=0
check "$(ips_of b128_nochunk_upf3)" SBA_BENCH_UPFUSED=1 SBA_BENCH_UPIMPL=phase3x3
check "$(ips_of b128_nochunk_upct)" SBA_BENCH_UPFUSED=1 SBA_BENCH_UPIMPL=convt
check "$(ips_of b128_nochunk_wattn)" SBA_BENCH_WATTN=1
check "$(ips_of b192_nochunk_bnc)"  SBA_BENCH_BATCH=192 SBA_BENCH_BNCOMPACT=1
check "$(ips_of b192_nochunk_bnc_up)" SBA_BENCH_BATCH=192 SBA_BENCH_BNCOMPACT=1 SBA_BENCH_UPFUSED=1 SBA_BENCH_UPIMPL=phase3x3
check "$(ips_of b256_rematg_chunks4_up_bnc)" SBA_BENCH_BATCH=256 SBA_BENCH_BNCOMPACT=1 SBA_BENCH_REMATG=stages SBA_BENCH_CHUNKS=4 SBA_BENCH_UPFUSED=1 SBA_BENCH_UPIMPL=phase3x3
echo "MERGED_QUEUE_BENCH_PICK ips=${BIPS} env=[${BENV:-defaults-unchanged}]" >> "$LOG"
if [ -n "$BENV" ]; then
  # defaults first so $BENV's assignments win (last repeated env var wins)
  run env SBA_BENCH_SIM_IMPL=pallas SBA_BENCH_CHUNKS=1 $BENV python bench.py
fi

echo "MERGED_QUEUE_DONE $(date +%H:%M:%S)" >> "$LOG"
