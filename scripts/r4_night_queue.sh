#!/bin/bash
# Round-4 night queue — chains on r4_trace_queue.sh.  The hbm_report runs
# showed BOTH b192 (15.0/16 GiB) and b256 (15.97/16 GiB) full-lever
# points fit and execute in a clean process, while the in-queue b192
# timing attempt OOMed (server-side HBM residue) — so larger batches are
# measured here with maximum isolation, highest information first:
#   N1  b256 full-stack TIMED — if throughput beats b128's 578 img/s the
#       scaling story changes; if it ties/loses, b128-optimal is PROVEN
#       with measurements at every batch
#   N2  b192 stem-mode variant (stem won decisively at b128; rematg+bnc
#       buy back the Mixed-residual memory at b192)
#   N3  b256 + DAMSM_CHUNKS=2 — pulls the encoder slice's temp down for
#       reliability margin; measures what that margin costs
#   N4  bare-defaults bench rehearsal = exactly the driver's round-end
#       command, post-flip
LOG=${1:-logs/r4_ablations.log}
cd "$(dirname "$0")/.."

if [ -f /tmp/r4_trace.pid ]; then
  P=$(cat /tmp/r4_trace.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi

run() {
  local T=$1; shift
  while [ -e /tmp/jax_cpu_busy ]; do sleep 60; done
  echo "=== $(date +%H:%M:%S) $* ===" >> "$LOG"
  timeout "$T" "$@" >> "$LOG" 2>&1
  echo "rc=$?" >> "$LOG"
}

run 2400 python scripts/perf_ablation.py one b256_upct_encblocks_rematg_bnc 256 remat encblocks simpallas rematg bncompact upfused upimpl=convt
run 2400 python scripts/perf_ablation.py one b192_upct_encstem_rematg_bnc 192 remat encstem simpallas rematg bncompact upfused upimpl=convt
run 2400 python scripts/perf_ablation.py one b256_upct_encblocks_rematg_bnc_chunks2 256 remat encblocks simpallas rematg bncompact upfused upimpl=convt chunks=2
run 7200 python bench.py

echo "R4_NIGHT_DONE $(date +%H:%M:%S)" >> "$LOG"
