#!/bin/bash
# Round-4 master queue (fresh-container restart): the prior session's
# waves never produced artifacts because the container snapshot reset
# before the queue ran. This wrapper re-runs smoke as a cache warmer
# (SMOKE_r04.json exists, so wave 1 would skip it and start cold), then
# chains all three waves serially — the relay allows ONE client.
set -u
LOG=${RADIOCORE_TPU_QUEUE_LOG:-/root/repo/bench_logs/tpu_queue_r4.log}
mkdir -p "$(dirname "$LOG")"
export RADIOCORE_TPU_QUEUE_LOG="$LOG"
export JAX_COMPILATION_CACHE_DIR=$HOME/.cache/radiocore_tpu/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
export RADIOCORE_TPU_FETCH_ATTEMPTS=24
cd /root/repo

echo "=== master start $(date +%T) ===" >> "$LOG"
# Cache-warm smoke (all variants incl. spec); output kept as evidence
# in bench_logs only — SMOKE_r04.json stays the committed artifact.
timeout 3600 python benchmarks/smoke_compile.py \
  > bench_logs/smoke_warm.json 2>> "$LOG"
echo "=== smoke_warm rc=$? $(date +%T) ===" >> "$LOG"

bash benchmarks/run_tpu_queue_r4.sh
bash benchmarks/run_tpu_queue_r4b.sh
bash benchmarks/run_tpu_queue_r4c.sh
echo "=== master done $(date +%T) ===" >> "$LOG"
