#!/bin/bash
# Round-3 perf queue (VERDICT r2 next #1): the round-2 queue never executed
# (tunnel outage), so this is r2's list plus the round-3 additions, ordered
# by DECISION VALUE — if the tunnel dies again mid-queue, the items that
# gate the bench flip and the headline number run first.
#
# One fresh process per config (HBM spill hazard), sequential (1-core host),
# each with its own timeout.  Logs append to $LOG (in-repo: committable).
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

# ---- Tier 1: decides the bench flip + the headline number ----
# 0. on-chip kernel numerics (Mosaic compile, not the interpreter) — gates
# everything 'simpallas' below.  Both kernels TPU-lowering-validated via
# jax.export already (tests/test_kernel_tpu_lowering.py); this executes.
run python scripts/check_sim_kernel_tpu.py

# 1. loss-level A/B: dense XLA grid vs fused Pallas kernel (fwd+bwd)
SIM_IMPL=xla    run python scripts/perf_breakdown.py damsmloss 128
SIM_IMPL=pallas run python scripts/perf_breakdown.py damsmloss 128

# 2. full-step A/B at the bench operating point
run python scripts/perf_ablation.py one b128_simpallas 128 remat chunks=4 simpallas
run python scripts/perf_ablation.py one b128_xla_ref 128 remat chunks=4

# 3. the bench line itself, both impls (SBA_BENCH_SIM_IMPL override)
run python bench.py
SBA_BENCH_SIM_IMPL=pallas run python bench.py

# ---- Tier 2: operating-point search ----
# 4. kernel frees the words-loss grid HBM: drop chunks/remat behind it
run python scripts/perf_ablation.py one b128_simpallas_nochunk 128 remat simpallas
run python scripts/perf_ablation.py one b128_simpallas_plain 128 simpallas
# tile_i=32 halves per-pair image DMA loads, doubles the MXU M dim
run python scripts/perf_ablation.py one b128_simpallas_tile32 128 remat chunks=4 simpallas tile=32
# larger batch: b192 OOMed with the dense grid; retry behind the kernel,
# then with per-stage G remat (the G-vjp residuals drove the b256 OOM)
run python scripts/perf_ablation.py one b192_simpallas 192 remat chunks=4 simpallas
run python scripts/perf_ablation.py one b192_simpallas_rematg 192 remat chunks=4 simpallas rematg
run python scripts/perf_ablation.py one b256_simpallas_rematg 256 remat chunks=8 simpallas rematg

# 5. folded Eq.8->Eq.9 XLA path (kernel-independent attack on the slice)
SIM_IMPL=xla FOLD=1 run python scripts/perf_breakdown.py damsmloss 128
run python scripts/perf_ablation.py one b128_fold 128 remat chunks=4 fold

# ---- Tier 3: decomposition + secondary numbers ----
# 6. whole DAMSM branch as the train step builds it
SIM_IMPL=xla    run python scripts/perf_breakdown.py damsm_slice 128
SIM_IMPL=pallas run python scripts/perf_breakdown.py damsm_slice 128
SIM_IMPL=pallas REMAT=0 CHUNKS=1 run python scripts/perf_breakdown.py damsm_slice 128

# 7. word-attention kernel: Mosaic numerics + full-step A/B (round-1 voided)
run python scripts/check_word_attn_tpu.py
run python scripts/perf_ablation.py one b128_wordattn_pallas 128 remat chunks=4 pallas

# 8. honest inference throughput + single-caption REST latency on-chip
run python scripts/perf_breakdown.py sample 128
run python scripts/serving_latency.py -n 5

# 9. finer sink naming for the non-DAMSM 168 ms + op-level trace
run python scripts/perf_breakdown.py gvjp 128
run python scripts/perf_breakdown.py text 128
run python scripts/perf_breakdown.py nodamsm 128
run python scripts/capture_trace.py 128 0.0 /tmp/sba_trace_lam0

echo "QUEUE_DONE $(date +%H:%M:%S)" >> "$LOG"
