#!/bin/bash
# Round-3 SALVAGE queue: the 09:07 Aug 20 VM restart killed the chained
# night-2 -> night-3 -> day-4 -> day-5 drivers right after night-2's first
# item (b128_plain_rematg_bnc 273.0 ms / 469 img/s — loses to the convt
# point's 243.5 / 526).  This queue re-runs ONLY the remaining items, in
# strict decision-value order, and auto-flips bench.py's operating point
# via bench_tuning.json ONLY on a measured same-log win:
#
#   S1  b128 convt + partial encoder remat (the two on-chip winners
#       composed; attacks the ~56 ms encoder-recompute tax) -> flip+bench
#   S2  b192/b256 behind the full lever stack -> flip+bench if better
#   S3  encblocks isolated (tax quantification)
#   S4  DAMSM pretrain workload on-chip (reference batch + saturating)
#   S5  bare-defaults bench rehearsal = exactly what the driver records
#
# Same rules as every queue: one fresh process per config, honest fence
# (host value fetch inside the timed window), /tmp/jax_cpu_busy pause
# between items, timeout 1800 per item.
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

# The standing best point (same log, 03:44 today): convt fused UpBlock.
ANCHOR=$(ips_of b128_nochunk_upct); ANCHOR=${ANCHOR:-526}

# ---- S1: compose the two winners at b128 ----
run python scripts/perf_ablation.py one b128_upct_encblocks 128 remat encblocks simpallas upfused upimpl=convt
EB=$(ips_of b128_upct_encblocks); EB=${EB:-0}
BEST=$ANCHOR
if [ "$EB" -gt "$ANCHOR" ]; then
  BEST=$EB
  printf '{"SBA_BENCH_REMAT_ENC_MODE": "blocks"}\n' > bench_tuning.json
  echo "SALVAGE_TUNING_FLIP encblocks: $EB > $ANCHOR img/s" >> "$LOG"
  run python bench.py
fi

# ---- S2: larger batch behind the full lever stack ----
run python scripts/perf_ablation.py one b192_upct_encblocks_rematg_bnc 192 remat encblocks simpallas rematg bncompact upfused upimpl=convt
B192=$(ips_of b192_upct_encblocks_rematg_bnc); B192=${B192:-0}
if [ "$B192" -gt "$BEST" ]; then
  BEST=$B192
  printf '{"SBA_BENCH_BATCH": "192", "SBA_BENCH_REMAT_ENC_MODE": "blocks", "SBA_BENCH_BNCOMPACT": "1", "SBA_BENCH_REMATG": "stages"}\n' > bench_tuning.json
  echo "SALVAGE_TUNING_FLIP b192 stack: $B192 img/s" >> "$LOG"
  run python bench.py
fi
if [ -n "$(ms_of b192_upct_encblocks_rematg_bnc)" ]; then
  run python scripts/perf_ablation.py one b256_upct_encblocks_rematg_bnc 256 remat encblocks simpallas rematg bncompact upfused upimpl=convt
  B256=$(ips_of b256_upct_encblocks_rematg_bnc); B256=${B256:-0}
  if [ "$B256" -gt "$BEST" ]; then
    BEST=$B256
    printf '{"SBA_BENCH_BATCH": "256", "SBA_BENCH_REMAT_ENC_MODE": "blocks", "SBA_BENCH_BNCOMPACT": "1", "SBA_BENCH_REMATG": "stages"}\n' > bench_tuning.json
    echo "SALVAGE_TUNING_FLIP b256 stack: $B256 img/s" >> "$LOG"
    run python bench.py
  fi
fi

# ---- S3: encblocks isolated (quantifies the recompute-tax cut alone) ----
run python scripts/perf_ablation.py one b128_encblocks 128 remat encblocks simpallas

# ---- S4: the second training workload on-chip (day-5 items) ----
run env STEP_SIM_IMPL=pallas python scripts/perf_breakdown.py pretrain 32
run env STEP_SIM_IMPL=pallas python scripts/perf_breakdown.py pretrain 256

# ---- S5: bare-defaults rehearsal — the driver's exact round-end view ----
run python bench.py

echo "SALVAGE_QUEUE_DONE $(date +%H:%M:%S)" >> "$LOG"
