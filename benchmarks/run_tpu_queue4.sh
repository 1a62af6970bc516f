#!/bin/bash
# Final TPU queue wave: the items deferred from wave 1 (placeholdered
# so the decision-critical extract/fft_micro/soak/A-B runs went first),
# plus retries of anything that failed. Waits for queue3.
LOG=/root/repo/tpu_queue.log
export JAX_COMPILATION_CACHE_DIR=$HOME/.cache/radiocore_tpu/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
export RADIOCORE_TPU_FETCH_ATTEMPTS=500

while ! grep -q "queue3 done" "$LOG" 2>/dev/null; do sleep 60; done

# Remove placeholders so run() actually executes these.
cd /root/repo
for f in wb_pfb.json PALLAS_SOAK_r03.json bench_96.json bench_128.json; do
  grep -q '"deferred"' "$f" 2>/dev/null && rm -f "$f"
done

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
# Wideband FFT path with the Pallas lowerings (config-4 speed-of-light
# attempt; compare vs wb_fft.json).
run wb_fft_pallas 5400 wb_fft_pallas.json \
    env RADIOCORE_TPU_FFT_PALLAS_MIN=65536 \
        RADIOCORE_TPU_EXTRACT_IFFT=pallas \
        python benchmarks/wideband.py --channelizer fft
run wb_pfb 5400 wb_pfb.json python benchmarks/wideband.py --channelizer pfb
run fft_soak_devloop 5400 FFT_SOAK_r03.json \
    python benchmarks/pallas_soak.py --fft
run pallas_devloop 5400 PALLAS_SOAK_r03.json \
    python benchmarks/pallas_soak.py --device-loop
run bench_96 5400 bench_96.json \
    env RADIOCORE_TPU_BENCH_STATIONS=96 python bench.py
run bench_128 5400 bench_128.json \
    env RADIOCORE_TPU_BENCH_STATIONS=128 python bench.py
echo "=== queue4 done $(date +%T) ===" >> "$LOG"
