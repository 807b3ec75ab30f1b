#!/bin/bash
# Round-3 perf queue (VERDICT r2 next #1): the round-2 queue never executed
# (tunnel outage), so this is r2's list verbatim plus the round-3 additions
# (REMAT_GENERATOR points, bench at the measured-best config last).
#
# One fresh process per config (HBM spill hazard), sequential (1-core host),
# each with its own timeout.  Logs append to $LOG (default: in-repo so the
# evidence is committable).
#
# Usage: bash scripts/r3_ablation_queue.sh [LOG]
LOG=${1:-logs/r3_ablations.log}
cd "$(dirname "$0")/.."
mkdir -p "$(dirname "$LOG")"

run() {
  # Never overlap a measurement with CPU jax work (1-core host skews
  # benches ~3x): wait while the busy marker exists.
  while [ -e /tmp/jax_cpu_busy ]; do sleep 60; done
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout 1800 "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

# 0. on-chip kernel numerics (Mosaic compile, not the interpreter) — gates
# everything 'simpallas' below.
run python scripts/check_sim_kernel_tpu.py
# word-attention kernel Mosaic check too (round-1 kernel, never validated)
run python scripts/check_word_attn_tpu.py

# 1. loss-level A/B: dense XLA grid vs fused Pallas kernel (fwd+bwd)
SIM_IMPL=xla    run python scripts/perf_breakdown.py damsmloss 128
SIM_IMPL=pallas run python scripts/perf_breakdown.py damsmloss 128

# 2. whole DAMSM branch as the train step builds it (encoder+remat+chunks+loss)
SIM_IMPL=xla    run python scripts/perf_breakdown.py damsm_slice 128
SIM_IMPL=pallas run python scripts/perf_breakdown.py damsm_slice 128
# kernel frees the grid HBM: try the branch without remat / without chunks
SIM_IMPL=pallas REMAT=0 CHUNKS=1 run python scripts/perf_breakdown.py damsm_slice 128

# 2b. r3: folded Eq.8->Eq.9 XLA path (one fewer (B,B,T,R) materialization;
# the kernel-independent attack on the 137 ms slice)
SIM_IMPL=xla FOLD=1 run python scripts/perf_breakdown.py damsmloss 128
SIM_IMPL=xla FOLD=1 run python scripts/perf_breakdown.py damsm_slice 128
run python scripts/perf_ablation.py one b128_fold 128 remat chunks=4 fold

# 3. full-step ablations at the bench operating point
run python scripts/perf_ablation.py one b128_simpallas 128 remat chunks=4 simpallas
run python scripts/perf_ablation.py one b128_simpallas_nochunk 128 remat simpallas
run python scripts/perf_ablation.py one b128_simpallas_plain 128 simpallas

# 3b. kernel tile sweep: tile_i=32 halves per-pair image DMA loads and
# doubles the matmul M dim (288 -> 576 rows on the MXU)
run python scripts/perf_ablation.py one b128_simpallas_tile32 128 remat chunks=4 simpallas tile=32

# 4. re-measure the round-1 (voided) Pallas word-attention A/B honestly
run python scripts/perf_ablation.py one b128_wordattn_pallas 128 remat chunks=4 pallas

# 5. larger batch: the fused kernel frees the words-loss grid HBM, so the
# b192 point that ResourceExhausted'ed with the dense grid may fit now
run python scripts/perf_ablation.py one b192_simpallas 192 remat chunks=4 simpallas
run python scripts/perf_ablation.py one b256_simpallas 256 remat chunks=8 simpallas
# r3: G-vjp residuals are the OOM driver at b>=192 — REMAT_GENERATOR points
run python scripts/perf_ablation.py one b192_simpallas_rematg 192 remat chunks=4 simpallas rematg
run python scripts/perf_ablation.py one b256_simpallas_rematg 256 remat chunks=8 simpallas rematg

# 6. honest inference throughput (replaces round 1's voided figure)
run python scripts/perf_breakdown.py sample 128
# 6b. r3: single-caption REST latency on-chip (reference eval/main.py
# publishes per-request elapsed; CPU figure measured in NOTES)
run python scripts/serving_latency.py -n 5

# 7. finer sink naming for the non-DAMSM 168 ms (NOTES perf table):
# generator fwd+vjp, bi-LSTM encode, full step at LAMBDA=0 re-check
run python scripts/perf_breakdown.py gvjp 128
run python scripts/perf_breakdown.py text 128
run python scripts/perf_breakdown.py nodamsm 128
# 7b. r3: XLA op-level trace of the LAMBDA=0 step (relative shares only;
# tunnel timing skew documented in the script header)
run python scripts/capture_trace.py 128 0.0 /tmp/sba_trace_lam0

# 8. r3: the bench line itself, on-chip, at the current default operating
# point (flip DAMSM_SIM_IMPL in bench.py manually once 0-5 say the kernel
# wins, then re-run).
run python bench.py

echo "QUEUE_DONE $(date +%H:%M:%S)" >> "$LOG"
