#!/bin/bash
# Round-5 wave 11: acceptance under shipped 3pass defaults + component
# benches + one more stream attempt.
set -u
LOG=${RADIOCORE_TPU_QUEUE_LOG:-/root/repo/bench_logs/tpu_queue_r5.log}
export JAX_COMPILATION_CACHE_DIR=$HOME/.cache/radiocore_tpu/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
export RADIOCORE_TPU_FETCH_ATTEMPTS=24
cd /root/repo
probe() {
  local tries=0
  while [ $tries -lt 20 ]; do
    tries=$((tries + 1))
    if timeout 600 python - <<'EOF' >> "$LOG" 2>&1
import jax, jax.numpy as jnp
print("probe:", float(jax.jit(lambda v: v + 1)(jnp.ones(8)).sum()))
EOF
    then echo "=== probe OK after $tries tries $(date +%T) ===" >> "$LOG"; return 0; fi
    echo "--- probe fail $tries $(date +%T); sleeping 90 ---" >> "$LOG"; sleep 90
  done
  echo "=== probe GAVE UP $(date +%T) ===" >> "$LOG"; return 1
}
run() {
  local name=$1 tmo=$2 out=$3; shift 3
  [ -s "$out" ] && { echo "=== $name SKIP $(date +%T) ===" >> "$LOG"; return 0; }
  local attempt
  for attempt in 1 2; do
    probe || return 1
    echo "=== $name start (attempt $attempt) $(date +%T) ===" >> "$LOG"
    if timeout "$tmo" "$@" > "$out.part" 2>> "$LOG" && [ -s "$out.part" ]; then
      mv "$out.part" "$out"; echo "=== $name OK $(date +%T) ===" >> "$LOG"; return 0
    fi
    echo "=== $name FAIL rc=$? (attempt $attempt) $(date +%T) ===" >> "$LOG"
    rm -f "$out.part"; sleep 60
  done
  echo "=== $name GAVE UP $(date +%T) ===" >> "$LOG"; return 1
}
# Acceptance drives (configs 1-4, transfer-free) under shipped defaults.
run accept_r5 2400 ACCEPT_r05.json python benchmarks/tpu_acceptance.py
# One more app-level stream attempt (outage may have rotated out).
run stream_final2 2400 STREAM_tpu_final_r05.json \
  python benchmarks/stream_run.py --seconds 60 --input-rate 524288
echo "=== queue_r5 wave11 done $(date +%T) ===" >> "$LOG"
