#!/bin/bash
# Round-4 late queue — chains on r4_night_queue.sh: the surgical
# BN_COMPACT='large' A/B at the new operating point (trace evidence: the
# flax f32 promotion costs ~10 ms at the 256^2 UpBlock BN alone, while
# full-scope bnc measured +17.4 ms — 'large' takes only the winning
# sites).  Flips bench_tuning.json only on a same-log win vs the
# standing b128_upct_encstem anchor, then re-runs bench and reverts on a
# bench regression (same discipline as Q5).
LOG=${1:-logs/r4_ablations.log}
cd "$(dirname "$0")/.."

if [ -f /tmp/r4_night.pid ]; then
  P=$(cat /tmp/r4_night.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi

run() {
  local T=$1; shift
  while [ -e /tmp/jax_cpu_busy ]; do sleep 60; done
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout "$T" "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

ips_of() { grep -h "^$1: batch=" "$LOG" | tail -1 | sed -n 's/.* \([0-9]*\) img\/s.*/\1/p'; }
bench_val() { grep -h '"gan_train_step_images_per_sec_256px_tpu"' "$LOG" | tail -1 | sed -n 's/.*"value": \([0-9.]*\).*/\1/p'; }

ANCHOR=$(ips_of b128_upct_encstem)
PRE_BENCH=$(sed -n 's/.*"value": \([0-9.]*\).*/\1/p' logs/last_tpu_bench.json 2>/dev/null)

run 1800 python scripts/perf_ablation.py one b128_upct_encstem_bnclarge 128 remat encstem simpallas bnclarge upfused upimpl=convt
V=$(ips_of b128_upct_encstem_bnclarge); V=${V:-0}
if [ -z "$ANCHOR" ]; then
  echo "LATE_FLIP_SKIPPED: no same-log encstem anchor" >> "$LOG"
elif [ "$V" -gt "$ANCHOR" ]; then
  cp bench_tuning.json /tmp/r4_late_tuning_backup.json
  printf '{"SBA_BENCH_REMAT_ENC_MODE": "stem", "SBA_BENCH_BNCOMPACT": "large"}\n' > bench_tuning.json
  echo "LATE_TUNING_FLIP bnclarge: $V > $ANCHOR img/s" >> "$LOG"
  run 7200 python bench.py
  POST=$(bench_val)
  if [ -n "$POST" ] && [ -n "$PRE_BENCH" ] && \
     awk -v a="$POST" -v b="$PRE_BENCH" 'BEGIN{exit !(a < 0.98*b)}'; then
    cp /tmp/r4_late_tuning_backup.json bench_tuning.json
    echo "LATE_TUNING_REVERT: post $POST < 0.98 * pre $PRE_BENCH" >> "$LOG"
  else
    echo "LATE_TUNING_KEPT: post ${POST:-none} vs pre ${PRE_BENCH:-none}" >> "$LOG"
  fi
else
  echo "LATE_NO_FLIP: bnclarge $V <= anchor $ANCHOR" >> "$LOG"
fi

echo "R4_LATE_DONE $(date +%H:%M:%S)" >> "$LOG"
