#!/bin/bash
# Round-3 NIGHT-3 queue: launches after the night-2 queue (pid file
# /tmp/r3_night2.pid) exits.  Measures the new partial encoder remat
# (REMAT_IMAGE_ENCODER_MODE='blocks': save the Mixed-block outputs,
# recompute only the high-res Inception stem).  Rationale: the 01:10/01:38
# decomposition puts the in-step DAMSM cost at 104.5 ms vs 48.3 ms of
# actual work — full encoder remat recomputes the WHOLE frozen Inception
# forward in the G backward; blocks mode keeps ~all the HBM relief (the
# 299^2..71^2 stem chain is the hog) while skipping the Mixed-block
# recompute that carries most of the encoder FLOPs.  Both configs lower
# clean for TPU (check_step_tpu_lowering, 2026-08-20 03:2x).
#
# Same rules as every queue: one fresh process per config, honest fence,
# /tmp/jax_cpu_busy pause between items, timeout 1800 per item.
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

# ---- Tier M1: blocks-mode encoder remat A/B vs the 272.7 ms anchor ----
run python scripts/perf_ablation.py one b128_encblocks 128 remat encblocks simpallas

# ---- Tier M2: if it wins, compose with the memory levers at b192/b256
# (blocks mode SAVES the Mixed outputs, so large batches may need bnc) ----
if [ -n "$(ms_of b128_encblocks)" ]; then
  run python scripts/perf_ablation.py one b192_encblocks_rematg_bnc 192 remat encblocks simpallas rematg bncompact
fi
if [ -n "$(ms_of b192_encblocks_rematg_bnc)" ]; then
  run python scripts/perf_ablation.py one b256_encblocks_rematg_bnc 256 remat encblocks simpallas rematg bncompact
fi

# ---- Tier M3: on-chip serving latency (VERDICT r2 next #5, on-chip half) ----
run python scripts/serving_latency.py --platform tpu -n 3

# ---- Tier M4: bench at the best point seen across ALL round-3 queues ----
BIPS=$(ips_of b128_simpallas_nochunk_anchor); BIPS=${BIPS:-0}; BENV=""
check() {
  local ips=$1; shift
  [ -n "$ips" ] || return 0
  if [ "$ips" -gt "$BIPS" ]; then BIPS=$ips; BENV="$*"; fi
}
check "$(ips_of b128_encblocks)"              SBA_BENCH_REMAT_ENC_MODE=blocks
check "$(ips_of b128_plain_rematg_bnc)"       SBA_BENCH_BNCOMPACT=1 SBA_BENCH_REMAT=0 SBA_BENCH_REMATG=stages
check "$(ips_of b128_plain_rematg_bnc_wattn)" SBA_BENCH_BNCOMPACT=1 SBA_BENCH_REMAT=0 SBA_BENCH_REMATG=stages SBA_BENCH_WATTN=1
check "$(ips_of b128_remat_rematg_bnc)"       SBA_BENCH_BNCOMPACT=1 SBA_BENCH_REMATG=stages
check "$(ips_of b192_rematg_bnc)"             SBA_BENCH_BATCH=192 SBA_BENCH_BNCOMPACT=1 SBA_BENCH_REMATG=stages
check "$(ips_of b192_encblocks_rematg_bnc)"   SBA_BENCH_BATCH=192 SBA_BENCH_REMAT_ENC_MODE=blocks SBA_BENCH_BNCOMPACT=1 SBA_BENCH_REMATG=stages
check "$(ips_of b256_encblocks_rematg_bnc)"   SBA_BENCH_BATCH=256 SBA_BENCH_REMAT_ENC_MODE=blocks SBA_BENCH_BNCOMPACT=1 SBA_BENCH_REMATG=stages
echo "NIGHT3_QUEUE_BENCH_PICK ips=${BIPS} env=[${BENV:-defaults-unchanged}]" >> "$LOG"
if [ -n "$BENV" ]; then
  run env SBA_BENCH_SIM_IMPL=pallas SBA_BENCH_CHUNKS=1 $BENV python bench.py
fi

echo "NIGHT3_QUEUE_DONE $(date +%H:%M:%S)" >> "$LOG"
