#!/bin/bash
# Round-3 NIGHT-2 queue: launches after the merged queue (pid file
# /tmp/r3_merged.pid) exits, then attacks the lever the 01:10/01:38
# fresh decomposition exposed:
#
#   full step (b128 best)          272.7 ms
#   nodamsm  (LAMBDA=0)            168.2 ms
#   damsm_slice standalone          48.3 ms   (pallas kernel, NO remat)
#
# => in-step DAMSM costs 104.5 ms but the work is only 48.3 ms: the
# ~56 ms gap is the encoder-remat recompute (one extra Inception fwd in
# the backward) + the scheduling it forces.  Dropping REMAT_IMAGE_ENCODER
# needs HBM back; the levers that free it without touching step math are
# REMAT_GENERATOR=stages (G residuals), BN_COMPACT (no f32 promotion of
# bf16 activations), and the fused word-attention kernel (no (B,HW,T)
# attention temps).  Expected if plain fits: ~220 ms -> ~580 img/s at
# b128, before the larger-batch points.
#
# Same rules as every queue: one fresh process per config, honest fence
# (host value fetch inside the timed window), /tmp/jax_cpu_busy pause
# between items, timeout 1800 per item.
LOG=${1:-logs/r3_ablations.log}
cd "$(dirname "$0")/.."
mkdir -p "$(dirname "$LOG")"

# Wait for the merged queue to finish (never two jax processes at once).
MERGED_PID=$(cat /tmp/r3_merged.pid 2>/dev/null)
if [ -n "$MERGED_PID" ]; then
  while kill -0 "$MERGED_PID" 2>/dev/null; do sleep 120; done
fi

run() {
  while [ -e /tmp/jax_cpu_busy ]; do sleep 60; done
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 1800 "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

ms_of() { grep -h "^$1: batch=" "$LOG" | tail -1 | sed -n 's/.* \([0-9.]*\) ms\/step.*/\1/p'; }
ips_of() { grep -h "^$1: batch=" "$LOG" | tail -1 | sed -n 's/.* \([0-9]*\) img\/s.*/\1/p'; }

# ---- Tier N1: b128 WITHOUT encoder remat, memory levers composed ----
run python scripts/perf_ablation.py one b128_plain_rematg_bnc 128 simpallas rematg bncompact
if [ -z "$(ms_of b128_plain_rematg_bnc)" ]; then
  # stages remat didn't free enough: add the word-attention kernel
  # (kills the (B,HW,T) G attention temps seen in the OOM buffer ranking)
  run python scripts/perf_ablation.py one b128_plain_rematg_bnc_wattn 128 simpallas rematg bncompact pallas
fi
if [ -z "$(ms_of b128_plain_rematg_bnc)" ] && [ -z "$(ms_of b128_plain_rematg_bnc_wattn)" ]; then
  # last resort: full-G remat (compile-budget risk; timeout bounds it)
  run python scripts/perf_ablation.py one b128_plain_rematgfull_bnc 128 simpallas rematgfull bncompact
fi

# ---- Tier N2: quantify the encoder-remat tax at the SAME flags ----
# (only meaningful if a plain point exists: A/B vs remat+rematg+bnc)
if [ -n "$(ms_of b128_plain_rematg_bnc)" ] || [ -n "$(ms_of b128_plain_rematg_bnc_wattn)" ]; then
  run python scripts/perf_ablation.py one b128_remat_rematg_bnc 128 remat simpallas rematg bncompact
fi

# ---- Tier N3: larger batch behind the full lever stack ----
run python scripts/perf_ablation.py one b192_rematg_bnc 192 remat simpallas rematg bncompact
if [ -n "$(ms_of b192_rematg_bnc)" ]; then
  run python scripts/perf_ablation.py one b256_rematg_bnc 256 remat simpallas rematg bncompact
fi

# ---- Tier N4: bench at the best point found across BOTH queues ----
BIPS=$(ips_of b128_simpallas_nochunk_anchor); BIPS=${BIPS:-0}; BENV=""
check() {
  local ips=$1; shift
  [ -n "$ips" ] || return 0
  if [ "$ips" -gt "$BIPS" ]; then BIPS=$ips; BENV="$*"; fi
}
check "$(ips_of b128_nochunk_bnc)"            SBA_BENCH_BNCOMPACT=1
check "$(ips_of b128_plain_rematg_bnc)"       SBA_BENCH_BNCOMPACT=1 SBA_BENCH_REMAT=0 SBA_BENCH_REMATG=stages
check "$(ips_of b128_plain_rematg_bnc_wattn)" SBA_BENCH_BNCOMPACT=1 SBA_BENCH_REMAT=0 SBA_BENCH_REMATG=stages SBA_BENCH_WATTN=1
check "$(ips_of b128_plain_rematgfull_bnc)"   SBA_BENCH_BNCOMPACT=1 SBA_BENCH_REMAT=0 SBA_BENCH_REMATG=full
check "$(ips_of b128_remat_rematg_bnc)"       SBA_BENCH_BNCOMPACT=1 SBA_BENCH_REMATG=stages
check "$(ips_of b128_nochunk_wattn)"          SBA_BENCH_WATTN=1
check "$(ips_of b128_nochunk_upf3)"           SBA_BENCH_UPFUSED=1 SBA_BENCH_UPIMPL=phase3x3
check "$(ips_of b128_nochunk_upct)"           SBA_BENCH_UPFUSED=1 SBA_BENCH_UPIMPL=convt
check "$(ips_of b192_rematg_bnc)"             SBA_BENCH_BATCH=192 SBA_BENCH_BNCOMPACT=1 SBA_BENCH_REMATG=stages
check "$(ips_of b256_rematg_bnc)"             SBA_BENCH_BATCH=256 SBA_BENCH_BNCOMPACT=1 SBA_BENCH_REMATG=stages
check "$(ips_of b256_rematg_chunks4_up_bnc)"  SBA_BENCH_BATCH=256 SBA_BENCH_BNCOMPACT=1 SBA_BENCH_REMATG=stages SBA_BENCH_CHUNKS=4 SBA_BENCH_UPFUSED=1 SBA_BENCH_UPIMPL=phase3x3
echo "NIGHT2_QUEUE_BENCH_PICK ips=${BIPS} env=[${BENV:-defaults-unchanged}]" >> "$LOG"
if [ -n "$BENV" ]; then
  run env SBA_BENCH_SIM_IMPL=pallas SBA_BENCH_CHUNKS=1 $BENV python bench.py
fi

echo "NIGHT2_QUEUE_DONE $(date +%H:%M:%S)" >> "$LOG"
