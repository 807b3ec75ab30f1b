#!/bin/bash
# Round-5 queue — ordered by decision value (VERDICT r4 next-items):
#   Q0  b192 timed FIRST, in the round's cleanest server-HBM window
#       (VERDICT #1: r4 closed larger batches on queue-context OOM
#       fragility without ever recording a throughput number; fresh
#       round start = the cleanest window we can get)
#   Q0b b256 at the most memory-lean stack (blocks remat + chunks=4)
#   Q1  b128 anchor at the committed bench defaults (same-log anchor)
#   Q2  rgbpad=8 A/B (VERDICT #2: RGB-head Cout=3 lane-padding tax)
#   Q3  rgbpad=32 A/B
#   Q4  b128 WITHOUT encoder remat (VERDICT #4: the residual in-step
#       DAMSM tax is stem-recompute serialization; the convt-fused
#       UpBlocks freed HBM since the r3 noremat OOM) — composed with
#       rgbpad=8 if Q4 beats the anchor
#   Q5  tuning flip on a same-log win + bench, revert on regression
#       (r4 discipline); b192 flip only if it beat the b128 best
#   Q6  pretrain b512/b256 with the new chunk lever (VERDICT #6)
#   Q7  serving latency on-chip: default + jpeg/half-scale overlays
#       (VERDICT #7)
# All configs pre-validated for TPU lowering via jax.export (r3 lesson).
LOG=${1:-logs/r5_ablations.log}
cd "$(dirname "$0")/.."

run() {
  local T=$1; shift
  while [ -e /tmp/jax_cpu_busy ]; do sleep 60; done
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout "$T" "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

ips_of() { grep -h "^$1: batch=" "$LOG" | tail -1 | sed -n 's/.* \([0-9]*\) img\/s.*/\1/p'; }
bench_val() { grep -h '"gan_train_step_images_per_sec_256px_tpu"' "$LOG" | tail -1 | sed -n 's/.*"value": \([0-9.]*\).*/\1/p'; }

# ---- Q0: larger batches, timed in the cleanest window ----
run 1800 python scripts/perf_ablation.py one b192_upct_encstem_rematg_bnclarge_chunks2 192 remat encstem simpallas rematg bnclarge upfused upimpl=convt chunks=2
run 1800 python scripts/perf_ablation.py one b256_upct_encblocks_rematg_bnclarge_chunks4 256 remat encblocks simpallas rematg bnclarge upfused upimpl=convt chunks=4

# ---- Q1: same-log b128 anchor at the committed defaults ----
run 1800 python scripts/perf_ablation.py one b128_upct_encstem 128 remat encstem simpallas upfused upimpl=convt

# ---- Q2/Q3: RGB-head lane-pad A/Bs ----
run 1800 python scripts/perf_ablation.py one b128_upct_encstem_rgbpad8 128 remat encstem simpallas upfused upimpl=convt rgbpad=8
run 1800 python scripts/perf_ablation.py one b128_upct_encstem_rgbpad32 128 remat encstem simpallas upfused upimpl=convt rgbpad=32

# ---- Q4: drop the encoder remat entirely (claims the stem-recompute
#          serialization); compose with rgbpad=8 if it wins ----
run 1800 python scripts/perf_ablation.py one b128_upct_noremat 128 simpallas upfused upimpl=convt
ANCHOR=$(ips_of b128_upct_encstem); ANCHOR=${ANCHOR:-0}
NOREMAT=$(ips_of b128_upct_noremat); NOREMAT=${NOREMAT:-0}
if [ "$NOREMAT" -gt "$ANCHOR" ]; then
  run 1800 python scripts/perf_ablation.py one b128_upct_noremat_rgbpad8 128 simpallas upfused upimpl=convt rgbpad=8
fi

# ---- Q5: flip bench_tuning.json on the measured-best point, bench,
#          revert on a bench regression ----
R8=$(ips_of b128_upct_encstem_rgbpad8); R8=${R8:-0}
R32=$(ips_of b128_upct_encstem_rgbpad32); R32=${R32:-0}
NR8=$(ips_of b128_upct_noremat_rgbpad8); NR8=${NR8:-0}
B192=$(ips_of b192_upct_encstem_rematg_bnclarge_chunks2); B192=${B192:-0}
B256=$(ips_of b256_upct_encblocks_rematg_bnclarge_chunks4); B256=${B256:-0}
PRE_BENCH=$(sed -n 's/.*"value": \([0-9.]*\).*/\1/p' logs/last_tpu_bench.json 2>/dev/null)

BEST=$ANCHOR; TUNING=''
if [ "$R8" -gt "$BEST" ]; then BEST=$R8; TUNING='{"SBA_BENCH_REMAT_ENC_MODE": "stem", "SBA_BENCH_RGBPAD": "8"}'; fi
if [ "$R32" -gt "$BEST" ]; then BEST=$R32; TUNING='{"SBA_BENCH_REMAT_ENC_MODE": "stem", "SBA_BENCH_RGBPAD": "32"}'; fi
if [ "$NOREMAT" -gt "$BEST" ]; then BEST=$NOREMAT; TUNING='{"SBA_BENCH_REMAT": "0"}'; fi
if [ "$NR8" -gt "$BEST" ]; then BEST=$NR8; TUNING='{"SBA_BENCH_REMAT": "0", "SBA_BENCH_RGBPAD": "8"}'; fi
# b192 wins only on global img/s (bench.py is now OOM-safe: it falls back
# to a fresh b128 child on ResourceExhausted, so flipping the batch up can
# no longer cost the driver its line)
if [ "$B192" -gt "$BEST" ]; then BEST=$B192; TUNING='{"SBA_BENCH_BATCH": "192", "SBA_BENCH_REMAT_ENC_MODE": "stem", "SBA_BENCH_REMATG": "stages", "SBA_BENCH_BNCOMPACT": "large", "SBA_BENCH_CHUNKS": "2"}'; fi
if [ "$B256" -gt "$BEST" ]; then BEST=$B256; TUNING='{"SBA_BENCH_BATCH": "256", "SBA_BENCH_REMAT_ENC_MODE": "blocks", "SBA_BENCH_REMATG": "stages", "SBA_BENCH_BNCOMPACT": "large", "SBA_BENCH_CHUNKS": "4"}'; fi

if [ -z "$ANCHOR" ] || [ "$ANCHOR" = 0 ]; then
  echo "R5_FLIP_SKIPPED: no same-log anchor" >> "$LOG"
elif [ -n "$TUNING" ]; then
  cp bench_tuning.json /tmp/r5_tuning_backup.json 2>/dev/null
  printf '%s\n' "$TUNING" > bench_tuning.json
  echo "R5_TUNING_FLIP: best=$BEST > anchor=$ANCHOR -> $TUNING" >> "$LOG"
  run 7200 python bench.py
  POST=$(bench_val)
  if [ -n "$POST" ] && [ -n "$PRE_BENCH" ] && \
     awk -v a="$POST" -v b="$PRE_BENCH" 'BEGIN{exit !(a < 0.98*b)}'; then
    cp /tmp/r5_tuning_backup.json bench_tuning.json
    echo "R5_TUNING_REVERT: post $POST < 0.98 * pre $PRE_BENCH" >> "$LOG"
  else
    echo "R5_TUNING_KEPT: post ${POST:-none} vs pre ${PRE_BENCH:-none}" >> "$LOG"
  fi
else
  echo "R5_NO_FLIP: nothing beat the anchor ($ANCHOR img/s)" >> "$LOG"
  run 7200 python bench.py
fi

# ---- Q6: pretrain large-batch lever (train/damsm.py chunks) ----
run 1800 env STEP_SIM_IMPL=pallas python scripts/perf_breakdown.py pretrain 256
run 1800 env STEP_SIM_IMPL=pallas STEP_PRETRAIN_CHUNKS=2 python scripts/perf_breakdown.py pretrain 512
run 1800 env STEP_SIM_IMPL=pallas STEP_PRETRAIN_CHUNKS=4 python scripts/perf_breakdown.py pretrain 512
run 1800 env STEP_SIM_IMPL=pallas STEP_PRETRAIN_CHUNKS=2 python scripts/perf_breakdown.py pretrain 256

# ---- Q7: serving latency on-chip, default and shrunk-overlay options ----
run 1800 python scripts/serving_latency.py -n 5
run 1800 python scripts/serving_latency.py -n 5 --map_format jpeg --map_scale 0.5

echo "R5_QUEUE_DONE $(date +%H:%M:%S)" >> "$LOG"
