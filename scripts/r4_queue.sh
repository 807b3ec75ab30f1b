#!/bin/bash
# Round-4 measurement queue (VERDICT r3 next-#2/#3/#6).
#
#   Q1  b128 anchor re-run (encblocks point) in THIS log — tunnel speed
#       varies ~2x day to day, so flips only trigger on same-log wins
#       (ADVICE r3: no hardcoded fallback anchor; flips are SKIPPED and
#       logged when the anchor item is missing).
#   Q2  b128 encstem+bnc — new 'stem' encoder remat (recompute only the
#       299^2..71^2 stem) with compact-norm headroom
#   Q3  b128 encstem alone (does it even need bnc?)
#   Q4  b128 encblocks+bnc (compact norms at the round-3 best point)
#   Q5  flip bench_tuning.json to the best b128 point if it beats the
#       anchor, run bench, and REVERT the flip if the bench line regresses
#       >2% vs the pre-queue last-TPU value (ADVICE r3 medium)
#   Q6  b192 full-stack TIMED (hbm_report: 15.0/16 GiB — fits when the
#       server HBM is clean; logged for the scaling writeup, NOT flipped)
#   Q7  DAMSM pretrain sweep at the DCE'd trunk backward (b256/b512/b32)
#
# Rules: one fresh process per config; honest fence (host value fetch in
# the timed window); /tmp/jax_cpu_busy pauses the queue between items;
# ablation items timeout 1800, bench items 7200 (ADVICE r3 low — bench.py
# internally budgets ~2x2400s TPU attempts + CPU smoke).
LOG=${1:-logs/r4_ablations.log}
cd "$(dirname "$0")/.."
mkdir -p "$(dirname "$LOG")"

run() {
  local T=$1; shift
  while [ -e /tmp/jax_cpu_busy ]; do sleep 60; done
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout "$T" "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

ips_of() { grep -h "^$1: batch=" "$LOG" | tail -1 | sed -n 's/.* \([0-9]*\) img\/s.*/\1/p'; }
bench_val() { grep -h '"gan_train_step_images_per_sec_256px_tpu"' "$LOG" | tail -1 | sed -n 's/.*"value": \([0-9.]*\).*/\1/p'; }

PRE_BENCH=$(sed -n 's/.*"value": \([0-9.]*\).*/\1/p' logs/last_tpu_bench.json 2>/dev/null)

# ---- Q1: same-log anchor ----
run 1800 python scripts/perf_ablation.py one b128_upct_encblocks 128 remat encblocks simpallas upfused upimpl=convt
ANCHOR=$(ips_of b128_upct_encblocks)

# ---- Q2-Q4: encoder-remat operating points at b128 ----
run 1800 python scripts/perf_ablation.py one b128_upct_encstem_bnc 128 remat encstem simpallas bncompact upfused upimpl=convt
run 1800 python scripts/perf_ablation.py one b128_upct_encstem 128 remat encstem simpallas upfused upimpl=convt
run 1800 python scripts/perf_ablation.py one b128_upct_encblocks_bnc 128 remat encblocks simpallas bncompact upfused upimpl=convt

# ---- Q5: flip to the best measured b128 point, bench, revert on regression ----
if [ -z "$ANCHOR" ]; then
  echo "R4_FLIP_SKIPPED: anchor item missing from $LOG (no same-log baseline)" >> "$LOG"
else
  BEST_NAME=""; BEST=$ANCHOR
  for N in b128_upct_encstem_bnc b128_upct_encstem b128_upct_encblocks_bnc; do
    V=$(ips_of $N); V=${V:-0}
    if [ "$V" -gt "$BEST" ]; then BEST=$V; BEST_NAME=$N; fi
  done
  if [ -n "$BEST_NAME" ]; then
    cp bench_tuning.json /tmp/r4_tuning_backup.json 2>/dev/null || echo '{}' > /tmp/r4_tuning_backup.json
    case $BEST_NAME in
      b128_upct_encstem_bnc) printf '{"SBA_BENCH_REMAT_ENC_MODE": "stem", "SBA_BENCH_BNCOMPACT": "1"}\n' > bench_tuning.json ;;
      b128_upct_encstem)     printf '{"SBA_BENCH_REMAT_ENC_MODE": "stem"}\n' > bench_tuning.json ;;
      b128_upct_encblocks_bnc) printf '{"SBA_BENCH_REMAT_ENC_MODE": "blocks", "SBA_BENCH_BNCOMPACT": "1"}\n' > bench_tuning.json ;;
    esac
    echo "R4_TUNING_FLIP $BEST_NAME: $BEST > $ANCHOR img/s (ablation)" >> "$LOG"
    run 7200 python bench.py
    POST=$(bench_val)
    if [ -n "$POST" ] && [ -n "$PRE_BENCH" ] && \
       awk -v a="$POST" -v b="$PRE_BENCH" 'BEGIN{exit !(a < 0.98*b)}'; then
      cp /tmp/r4_tuning_backup.json bench_tuning.json
      echo "R4_TUNING_REVERT: post-flip bench $POST < 0.98 * pre $PRE_BENCH" >> "$LOG"
    else
      echo "R4_TUNING_KEPT: post-flip bench ${POST:-none} vs pre ${PRE_BENCH:-none}" >> "$LOG"
    fi
  else
    echo "R4_NO_FLIP: nothing beat the anchor ($ANCHOR img/s)" >> "$LOG"
  fi
fi

# ---- Q6: b192 timed (fit confirmed by hbm_report in a clean process) ----
run 1800 python scripts/perf_ablation.py one b192_upct_encblocks_rematg_bnc 192 remat encblocks simpallas rematg bncompact upfused upimpl=convt

# ---- Q7: DAMSM pretrain sweep (trunk-backward DCE landed this round) ----
run 1800 env STEP_SIM_IMPL=pallas python scripts/perf_breakdown.py pretrain 256
run 1800 env STEP_SIM_IMPL=pallas python scripts/perf_breakdown.py pretrain 512
run 1800 env STEP_SIM_IMPL=pallas python scripts/perf_breakdown.py pretrain 32
run 1800 env STEP_SIM_IMPL=xla python scripts/perf_breakdown.py pretrain 256

echo "R4_QUEUE_DONE $(date +%H:%M:%S)" >> "$LOG"
