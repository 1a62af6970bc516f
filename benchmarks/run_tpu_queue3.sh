#!/bin/bash
# Third TPU queue wave: full-pipeline A/B of the Pallas FFT lowerings
# on the headline bench. Waits for queue2 (single-client relay).
LOG=/root/repo/tpu_queue.log
export JAX_COMPILATION_CACHE_DIR=$HOME/.cache/radiocore_tpu/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
export RADIOCORE_TPU_FETCH_ATTEMPTS=500

while ! grep -q "queue2 done" "$LOG" 2>/dev/null; do sleep 60; done

probe() {
  local tries=0
  while :; do
    tries=$((tries + 1))
    if timeout 240 python - <<'EOF' >> "$LOG" 2>&1
import jax, jax.numpy as jnp
print("probe:", float(jax.jit(lambda v: v + 1)(jnp.ones(8)).sum()))
EOF
    then
      echo "=== probe OK after $tries tries $(date +%T) ===" >> "$LOG"
      return 0
    fi
    echo "--- probe fail $tries $(date +%T); sleeping 120 ---" >> "$LOG"
    sleep 120
  done
}

run() {
  local name=$1 tmo=$2 out=$3; shift 3
  if [ -s "$out" ]; then
    echo "=== $name SKIP (exists) $(date +%T) ===" >> "$LOG"
    return 0
  fi
  probe
  echo "=== $name start $(date +%T) ===" >> "$LOG"
  if timeout "$tmo" "$@" > "$out.tmp" 2>> "$LOG" && [ -s "$out.tmp" ]; then
    mv "$out.tmp" "$out"
    echo "=== $name OK $(date +%T) ===" >> "$LOG"
  else
    echo "=== $name FAIL rc=$? $(date +%T) ===" >> "$LOG"
  fi
}
cd /root/repo
# Extraction IFFT only (isolates the dominant stage's lowering).
run bench_extract_pallas 5400 bench_extract_pallas.json \
    env RADIOCORE_TPU_EXTRACT_IFFT=pallas python bench.py
# Band FFT only (2^24 composed long-FFT path).
run bench_band_pallas 5400 bench_band_pallas.json \
    env RADIOCORE_TPU_FFT_PALLAS_MIN=16777216 python bench.py
# Everything: band + extraction + demod rfft/irfft + envelope iffts.
run bench_all_pallas 5400 bench_all_pallas.json \
    env RADIOCORE_TPU_FFT_PALLAS_MIN=65536 \
        RADIOCORE_TPU_EXTRACT_IFFT=pallas python bench.py
echo "=== queue3 done $(date +%T) ===" >> "$LOG"
