#!/bin/bash
# Round-5 wave 3: final headline under the r5 defaults, 3pass precision
# soaks, sustained streaming artifact, prfft-rerun (clears the wave-2
# suspect flag).
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
  echo "=== smoke3 start $(date +%T) ===" >> "$LOG"
  timeout 2400 python benchmarks/smoke_compile.py \
    --only pipeline_default,fft_mixed \
    > bench_logs/smoke_r5w3.json 2>> "$LOG" \
    && echo "=== smoke3 OK $(date +%T) ===" >> "$LOG" \
    || echo "=== smoke3 FAIL $(date +%T) ===" >> "$LOG"
}
# Final headline under the shipped r5 defaults (mixed + prfft + band
# kernel) — the committed BENCH_r05.
run bench_final 1500 BENCH_r05.json python bench.py
# 3pass precision soaks (correctness gate <1e-4 + device-loop marginal).
run fftsoak_3p 2400 FFT_SOAK_3pass_r05.json \
  env RADIOCORE_TPU_FFT_MM_PRECISION=3pass \
  python benchmarks/pallas_soak.py --fft
run firsoak_3p 2400 PALLAS_SOAK_3pass_r05.json \
  env RADIOCORE_TPU_FIR_PRECISION=3pass \
  python benchmarks/pallas_soak.py --device-loop --block-rows 512
# Sustained 60 s streaming run through the real 3-thread app.
run stream60 2400 STREAM_r05.json \
  python benchmarks/stream_run.py --seconds 60 --out /dev/null
# 3pass in-pipeline A/B (both kernels): does the MXU saving show e2e?
run bench_3pass 1500 BENCH_3pass_r05.json \
  env RADIOCORE_TPU_FFT_MM_PRECISION=3pass RADIOCORE_TPU_FIR_PRECISION=3pass \
  python bench.py
echo "=== queue_r5 wave3 done $(date +%T) ===" >> "$LOG"
