#!/bin/bash
# Round-3 follow-up measurements, re-planned around the tier-1/2 results
# already in logs/r3_ablations.log:
#   - fused sim kernel ~= xla at the chunked point (298 vs 300.8 ms), but
#     it FREES the words-loss grid HBM: chunks=1 behind it measured
#     275 ms / 465 img/s (b128_simpallas_nochunk) — the new best point.
#   - JAX.UPBLOCK_FUSED (commit 62645ce) landed after the main queue
#     started, so its A/Bs run here, at BOTH the reference point (for a
#     like-for-like vs b128_xla_ref) and the nochunk best point.
#   - the tier-1 `SBA_BENCH_SIM_IMPL=pallas bench.py` burned on a
#     transient tunnel FAILED_PRECONDITION (08:05) — re-run bench at the
#     candidate-best flags last, when the A/Bs have picked them.
# Chain after the main queue:
#   bash scripts/wait_then_run.sh logs/r3_ablations.log QUEUE_DONE -- \
#        bash scripts/r3_followup_queue.sh
#
# Same measurement rules as the main queue: one fresh process per config,
# honest fence, never overlap host jax work.
LOG=${1:-logs/r3_followup.log}
cd "$(dirname "$0")/.."
mkdir -p "$(dirname "$LOG")"

run() {
  while [ -e /tmp/jax_cpu_busy ]; do sleep 60; done
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 1800 "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

# 1. upfused alone at the reference operating point (vs b128_xla_ref 300.8)
run python scripts/perf_ablation.py one b128_upfused 128 remat chunks=4 upfused

# 2. upfused stacked on the measured-best point (vs b128_simpallas_nochunk 275)
run python scripts/perf_ablation.py one b128_nochunk_upfused 128 remat simpallas upfused

# 3. larger batch behind the kernel's grid-HBM savings (nochunk point);
#    rematg variant if plain b192 OOMs like the dense grid did
run python scripts/perf_ablation.py one b192_simpallas_nochunk 192 remat simpallas
run python scripts/perf_ablation.py one b192_nochunk_upfused 192 remat simpallas upfused
run python scripts/perf_ablation.py one b256_nochunk_rematg 256 remat simpallas rematg
run python scripts/perf_ablation.py one b256_nochunk_upfused_rematg 256 remat simpallas upfused rematg

# 4. the bench line at the candidate-best flags (retry of the burned
#    tier-1 pallas bench + the nochunk point the A/Bs picked)
SBA_BENCH_SIM_IMPL=pallas SBA_BENCH_CHUNKS=1 run python bench.py
SBA_BENCH_SIM_IMPL=pallas SBA_BENCH_CHUNKS=1 SBA_BENCH_UPFUSED=1 run python bench.py

echo "FOLLOWUP_DONE $(date +%H:%M:%S)" >> "$LOG"
