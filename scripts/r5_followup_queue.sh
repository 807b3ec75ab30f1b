#!/bin/bash
# Round-5 follow-up queue — chains on r5_queue.sh:
#   F1  CONV_WGRAD_DOT A/B at the b128 anchor point (VERDICT r4 #3: the
#       128^2 ResBlock conv wgrads ran ~2.9x their forwards; the lever
#       lowers them as nine shifted-view MXU dots — exact math)
#   F2  composition with the r5 winners (read from the same log)
#   F3  tuning flip on a same-log win + bench, revert on regression
# The lever is CPU-parity-tested and TPU-lowering-prevalidated before
# this queue is armed.
LOG=${1:-logs/r5_ablations.log}
cd "$(dirname "$0")/.."

if [ -f /tmp/r5_queue.pid ]; then
  P=$(cat /tmp/r5_queue.pid)
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

ANCHOR=$(ips_of b128_upct_encstem); ANCHOR=${ANCHOR:-0}

# F1: wgraddot at the standing anchor flags
run 1800 python scripts/perf_ablation.py one b128_upct_encstem_wgraddot 128 remat encstem simpallas upfused upimpl=convt wgraddot
WG=$(ips_of b128_upct_encstem_wgraddot); WG=${WG:-0}

# F2: compose with the best r5 single-lever point if both won
R8=$(ips_of b128_upct_encstem_rgbpad8); R8=${R8:-0}
R32=$(ips_of b128_upct_encstem_rgbpad32); R32=${R32:-0}
NOREMAT=$(ips_of b128_upct_noremat); NOREMAT=${NOREMAT:-0}
if [ "$WG" -gt "$ANCHOR" ]; then
  if [ "$NOREMAT" -gt "$ANCHOR" ] && [ "$NOREMAT" -ge "$R32" ]; then
    run 1800 python scripts/perf_ablation.py one b128_upct_noremat_wgraddot_rgbpad32 128 simpallas upfused upimpl=convt wgraddot rgbpad=32
  elif [ "$R32" -gt "$ANCHOR" ]; then
    run 1800 python scripts/perf_ablation.py one b128_upct_encstem_wgraddot_rgbpad32 128 remat encstem simpallas upfused upimpl=convt wgraddot rgbpad=32
  fi
fi

# F3: flip only if a wgraddot point beats everything already measured in
# this log (the r5 queue may already have flipped tuning — compare against
# the CURRENT bench line, not just the anchor)
PRE_BENCH=$(sed -n 's/.*"value": \([0-9.]*\).*/\1/p' logs/last_tpu_bench.json 2>/dev/null)
BESTSO=$ANCHOR
for n in b128_upct_encstem_rgbpad8 b128_upct_encstem_rgbpad32 b128_upct_noremat b128_upct_noremat_rgbpad8; do
  V=$(ips_of "$n"); V=${V:-0}
  [ "$V" -gt "$BESTSO" ] && BESTSO=$V
done
WGC1=$(ips_of b128_upct_noremat_wgraddot_rgbpad32); WGC1=${WGC1:-0}
WGC2=$(ips_of b128_upct_encstem_wgraddot_rgbpad32); WGC2=${WGC2:-0}

BEST=$BESTSO; TUNING=''
if [ "$WG" -gt "$BEST" ]; then BEST=$WG; TUNING='{"SBA_BENCH_REMAT_ENC_MODE": "stem", "SBA_BENCH_WGRADDOT": "1"}'; fi  # wgraddot alone beat rgbpad points too
if [ "$WGC2" -gt "$BEST" ]; then BEST=$WGC2; TUNING='{"SBA_BENCH_REMAT_ENC_MODE": "stem", "SBA_BENCH_WGRADDOT": "1", "SBA_BENCH_RGBPAD": "32"}'; fi
if [ "$WGC1" -gt "$BEST" ]; then BEST=$WGC1; TUNING='{"SBA_BENCH_REMAT": "0", "SBA_BENCH_WGRADDOT": "1", "SBA_BENCH_RGBPAD": "32"}'; fi

if [ -n "$TUNING" ]; then
  cp bench_tuning.json /tmp/r5f_tuning_backup.json 2>/dev/null
  printf '%s\n' "$TUNING" > bench_tuning.json
  echo "R5F_TUNING_FLIP: best=$BEST -> $TUNING" >> "$LOG"
  run 7200 env SBA_BENCH_PROBE_TIMEOUT=300 python bench.py
  POST=$(bench_val)
  if [ -n "$POST" ] && [ -n "$PRE_BENCH" ] && \
     awk -v a="$POST" -v b="$PRE_BENCH" 'BEGIN{exit !(a < 0.98*b)}'; then
    cp /tmp/r5f_tuning_backup.json bench_tuning.json
    echo "R5F_TUNING_REVERT: post $POST < 0.98 * pre $PRE_BENCH" >> "$LOG"
  else
    echo "R5F_TUNING_KEPT: post ${POST:-none} vs pre ${PRE_BENCH:-none}" >> "$LOG"
  fi
else
  echo "R5F_NO_FLIP: wgraddot $WG (compositions $WGC1/$WGC2) <= best-so-far $BESTSO" >> "$LOG"
fi

# The r5 queue's bench at the rgbpad32 flip fell to the CPU smoke line on
# an init-latency spike (00:48, probe 150 s x2 missed a LIVE backend) —
# make sure the round ends with a real on-chip line at the standing tuning.
if ! grep -q '"gan_train_step_images_per_sec_256px_tpu"' "$LOG"; then
  run 7200 env SBA_BENCH_PROBE_TIMEOUT=300 python bench.py
fi

echo "R5_FOLLOWUP_DONE $(date +%H:%M:%S)" >> "$LOG"
