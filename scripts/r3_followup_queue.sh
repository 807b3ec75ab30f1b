#!/bin/bash
# Round-3 follow-up measurements: the fused low-res UpBlock conv
# (JAX.UPBLOCK_FUSED, commit 62645ce) landed after r3_ablation_queue.sh
# started, so its A/Bs run here.  Chain after the main queue:
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

# 1. upfused A/B at the reference operating point (vs b128_xla_ref from
#    the main queue)
run python scripts/perf_ablation.py one b128_upfused 128 remat chunks=4 upfused

# 2. combined candidates: kernel + fused upblocks
run python scripts/perf_ablation.py one b128_simpallas_upfused 128 remat chunks=4 simpallas upfused

# 3. larger batch behind the residual savings (upfused shrinks the G conv
#    residuals that drove the b256 OOM)
run python scripts/perf_ablation.py one b192_simpallas_upfused 192 remat chunks=4 simpallas upfused
run python scripts/perf_ablation.py one b256_simpallas_upfused 256 remat chunks=8 simpallas upfused

echo "FOLLOWUP_DONE $(date +%H:%M:%S)" >> "$LOG"
