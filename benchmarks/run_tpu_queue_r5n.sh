#!/bin/bash
# Round-5 wave 10: final validation of the last kernel edits.
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
probe && {
  echo "=== smoke10 start $(date +%T) ===" >> "$LOG"
  timeout 2400 python benchmarks/smoke_compile.py \
    --only pipeline_default,fft_mixed,fir_kernel \
    > bench_logs/smoke_r5w10.json 2>> "$LOG" \
    && echo "=== smoke10 OK $(date +%T) ===" >> "$LOG" \
    || echo "=== smoke10 FAIL $(date +%T) ===" >> "$LOG"
}
run bench_final2 1500 BENCH_final2_r05.json python bench.py
# FFT-kernel correctness soak under the final code state.
run fftsoak_final 2400 FFT_SOAK_final_r05.json \
  python benchmarks/pallas_soak.py --fft
echo "=== queue_r5 wave10 done $(date +%T) ===" >> "$LOG"
