#!/bin/bash
# Round-3 NIGHT-3 queue: launches after the night-2 queue (pid file
# /tmp/r3_night2.pid) exits.  Composes the two new on-chip winners:
#
#   * UPBLOCK_FUSED=convt  — fused upsample+conv via transposed-conv
#     lowering: b128_nochunk_upct 243.5 ms / 526 img/s vs the 272.7 ms
#     anchor (phase3x3 lowering LOST at 294.1 ms — the lowering, not the
#     fold, is what matters).
#   * REMAT_IMAGE_ENCODER_MODE=blocks — partial encoder remat (save the
#     Mixed-block outputs, recompute only the high-res stem) attacking the
#     ~56 ms in-step encoder-recompute tax from the 01:10/01:38
#     decomposition.
#
# Both lower clean for TPU (check_step_tpu_lowering).  Same rules as every
# queue: one fresh process per config, honest fence, /tmp/jax_cpu_busy
# pause between items, timeout 1800 per item.
LOG=${1:-logs/r3_ablations.log}
cd "$(dirname "$0")/.."
mkdir -p "$(dirname "$LOG")"

N2_PID=$(cat /tmp/r3_night2.pid 2>/dev/null)
if [ -n "$N2_PID" ]; then
  while kill -0 "$N2_PID" 2>/dev/null; do sleep 120; done
fi

run() {
  while [ -e /tmp/jax_cpu_busy ]; do sleep 60; done
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 1800 "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

ms_of() { grep -h "^$1: batch=" "$LOG" | tail -1 | sed -n 's/.* \([0-9.]*\) ms\/step.*/\1/p'; }
ips_of() { grep -h "^$1: batch=" "$LOG" | tail -1 | sed -n 's/.* \([0-9]*\) img\/s.*/\1/p'; }

# ---- Tier M1: compose the winners at b128 ----
run python scripts/perf_ablation.py one b128_upct_encblocks 128 remat encblocks simpallas upfused upimpl=convt
# encblocks isolated (quantifies the encoder-recompute tax cut alone)
run python scripts/perf_ablation.py one b128_encblocks 128 remat encblocks simpallas

# ---- Tier M2: plain encoder (no remat) behind the upct FLOP/memory cut,
# if night-2's plain points OOMed ----
if [ -z "$(ms_of b128_plain_rematg_bnc)" ] && [ -z "$(ms_of b128_plain_rematg_bnc_wattn)" ]; then
  run python scripts/perf_ablation.py one b128_plain_upct_rematg_bnc 128 simpallas rematg bncompact upfused upimpl=convt
fi

# ---- Tier M3: larger batch behind the full winning stack ----
run python scripts/perf_ablation.py one b192_upct_encblocks_rematg_bnc 192 remat encblocks simpallas rematg bncompact upfused upimpl=convt
if [ -n "$(ms_of b192_upct_encblocks_rematg_bnc)" ]; then
  run python scripts/perf_ablation.py one b256_upct_encblocks_rematg_bnc 256 remat encblocks simpallas rematg bncompact upfused upimpl=convt
fi

# ---- Tier M4: on-chip serving latency (VERDICT r2 next #5, on-chip half) ----
run python scripts/serving_latency.py --platform tpu -n 3

# ---- Tier M5: bench at the best point seen across ALL round-3 queues ----
BIPS=$(ips_of b128_nochunk_upct); BIPS=${BIPS:-0}
BENV="SBA_BENCH_UPFUSED=1 SBA_BENCH_UPIMPL=convt"
check() {
  local ips=$1; shift
  [ -n "$ips" ] || return 0
  if [ "$ips" -gt "$BIPS" ]; then BIPS=$ips; BENV="$*"; fi
}
check "$(ips_of b128_upct_encblocks)"         SBA_BENCH_UPFUSED=1 SBA_BENCH_UPIMPL=convt SBA_BENCH_REMAT_ENC_MODE=blocks
check "$(ips_of b128_encblocks)"              SBA_BENCH_REMAT_ENC_MODE=blocks
check "$(ips_of b128_plain_rematg_bnc)"       SBA_BENCH_BNCOMPACT=1 SBA_BENCH_REMAT=0 SBA_BENCH_REMATG=stages
check "$(ips_of b128_plain_rematg_bnc_wattn)" SBA_BENCH_BNCOMPACT=1 SBA_BENCH_REMAT=0 SBA_BENCH_REMATG=stages SBA_BENCH_WATTN=1
check "$(ips_of b128_plain_upct_rematg_bnc)"  SBA_BENCH_BNCOMPACT=1 SBA_BENCH_REMAT=0 SBA_BENCH_REMATG=stages SBA_BENCH_UPFUSED=1 SBA_BENCH_UPIMPL=convt
check "$(ips_of b128_remat_rematg_bnc)"       SBA_BENCH_BNCOMPACT=1 SBA_BENCH_REMATG=stages
check "$(ips_of b192_rematg_bnc)"             SBA_BENCH_BATCH=192 SBA_BENCH_BNCOMPACT=1 SBA_BENCH_REMATG=stages
check "$(ips_of b192_upct_encblocks_rematg_bnc)" SBA_BENCH_BATCH=192 SBA_BENCH_REMAT_ENC_MODE=blocks SBA_BENCH_BNCOMPACT=1 SBA_BENCH_REMATG=stages SBA_BENCH_UPFUSED=1 SBA_BENCH_UPIMPL=convt
check "$(ips_of b256_upct_encblocks_rematg_bnc)" SBA_BENCH_BATCH=256 SBA_BENCH_REMAT_ENC_MODE=blocks SBA_BENCH_BNCOMPACT=1 SBA_BENCH_REMATG=stages SBA_BENCH_UPFUSED=1 SBA_BENCH_UPIMPL=convt
echo "NIGHT3_QUEUE_BENCH_PICK ips=${BIPS} env=[${BENV}]" >> "$LOG"
run env SBA_BENCH_SIM_IMPL=pallas SBA_BENCH_CHUNKS=1 $BENV python bench.py

echo "NIGHT3_QUEUE_DONE $(date +%H:%M:%S)" >> "$LOG"
