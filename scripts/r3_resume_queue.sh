#!/bin/bash
# Round-3 RESUME queue (evening session, after the 17:55 VM restart killed
# the morning drivers).  Contains exactly the items the morning queue +
# followup queue had not yet run, reordered by decision value, plus a
# fresh ANCHOR re-run of the morning's best point: tunnel speed varies
# ~2x day-to-day on identical HLO, so tonight's A/Bs only compare against
# tonight's anchor, never against the 07:00-08:30 absolute numbers.
#
# Morning results already in logs/r3_ablations.log (06:16-08:31):
#   check_sim_kernel PASS; damsmloss xla 12.0 / pallas 10.8 ms;
#   b128_simpallas 298.0 / b128_xla_ref 300.8 (chunked point ~1%);
#   bench.py (xla, chunks=4) 478.97 img/s TPU;
#   b128_simpallas_nochunk 275.0 ms / 465 img/s  <- best point;
#   b128_simpallas_plain RESOURCE_EXHAUSTED (encoder remat still needed);
#   SBA_BENCH_SIM_IMPL=pallas bench burned on transient FAILED_PRECONDITION.
#
# Usage: bash scripts/r3_resume_queue.sh [LOG]
LOG=${1:-logs/r3_ablations.log}
cd "$(dirname "$0")/.."
mkdir -p "$(dirname "$LOG")"

run() {
  while [ -e /tmp/jax_cpu_busy ]; do sleep 60; done
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 1800 "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

# ---- Tier A: anchor + the bench flip decision ----
# tonight's anchor: same config as the morning best point
run python scripts/perf_ablation.py one b128_simpallas_nochunk_anchor 128 remat simpallas
# the burned tier-1 bench retry at candidate-best flags
SBA_BENCH_SIM_IMPL=pallas SBA_BENCH_CHUNKS=1 run python bench.py

# ---- Tier B: headline levers (larger batch, conv fusion) ----
run python scripts/perf_ablation.py one b192_simpallas_nochunk 192 remat simpallas
run python scripts/perf_ablation.py one b128_nochunk_upfused 128 remat simpallas upfused
run python scripts/perf_ablation.py one b128_upfused 128 remat chunks=4 upfused
run python scripts/perf_ablation.py one b192_nochunk_upfused 192 remat simpallas upfused
run python scripts/perf_ablation.py one b192_nochunk_rematg 192 remat simpallas rematg
run python scripts/perf_ablation.py one b256_nochunk_rematg 256 remat simpallas rematg
run python scripts/perf_ablation.py one b256_nochunk_upfused_rematg 256 remat simpallas upfused rematg

# ---- Tier C: remaining operating-point probes ----
run python scripts/perf_ablation.py one b128_simpallas_tile32 128 remat simpallas tile=32
SIM_IMPL=xla FOLD=1 run python scripts/perf_breakdown.py damsmloss 128
run python scripts/perf_ablation.py one b128_fold 128 remat chunks=4 fold

# ---- Tier D: decomposition + secondary numbers ----
SIM_IMPL=xla    run python scripts/perf_breakdown.py damsm_slice 128
SIM_IMPL=pallas run python scripts/perf_breakdown.py damsm_slice 128
SIM_IMPL=pallas REMAT=0 CHUNKS=1 run python scripts/perf_breakdown.py damsm_slice 128
run python scripts/check_word_attn_tpu.py
run python scripts/perf_ablation.py one b128_wordattn_pallas 128 remat chunks=4 pallas
run python scripts/perf_breakdown.py sample 128
run python scripts/serving_latency.py -n 5
run python scripts/perf_breakdown.py gvjp 128
run python scripts/perf_breakdown.py text 128
run python scripts/perf_breakdown.py nodamsm 128
run python scripts/capture_trace.py 128 0.0 /tmp/sba_trace_lam0

# ---- Tier E: final bench at the other candidate flag set ----
SBA_BENCH_SIM_IMPL=pallas SBA_BENCH_CHUNKS=1 SBA_BENCH_UPFUSED=1 run python bench.py

echo "RESUME_QUEUE_DONE $(date +%H:%M:%S)" >> "$LOG"
