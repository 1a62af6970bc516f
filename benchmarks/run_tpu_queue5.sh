#!/bin/bash
# Queue wave 5: the config-4 FFT-path artifact FIRST (two rounds of
# relay outages have killed it; now with outer retries), then the
# iota-fixed Pallas FFT A/Bs, then the deferred soak + station sweeps.
# Waits for queue4 (single-client relay — NEVER two TPU processes).
LOG=/root/repo/tpu_queue.log
export JAX_COMPILATION_CACHE_DIR=$HOME/.cache/radiocore_tpu/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
export RADIOCORE_TPU_FETCH_ATTEMPTS=800

while ! grep -q "queue4 done" "$LOG" 2>/dev/null; do sleep 60; done

cd /root/repo
# Remove placeholders deferred out of queue4.
for f in PALLAS_SOAK_r03.json bench_96.json bench_128.json; do
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

# run NAME TIMEOUT OUT CMD... — probe-gated, with up to 3 whole-run
# retries: a D2H outage mid-run kills an attempt (wb_fft r3 wave 1 died
# 52 min in), so re-running the epoch beats dying with it.
run() {
  local name=$1 tmo=$2 out=$3; shift 3
  if [ -s "$out" ]; then
    echo "=== $name SKIP (exists) $(date +%T) ===" >> "$LOG"
    return 0
  fi
  local attempt
  for attempt in 1 2 3; do
    probe
    echo "=== $name start (attempt $attempt) $(date +%T) ===" >> "$LOG"
    if timeout "$tmo" "$@" > "$out.tmp" 2>> "$LOG" && [ -s "$out.tmp" ]; then
      mv "$out.tmp" "$out"
      echo "=== $name OK $(date +%T) ===" >> "$LOG"
      return 0
    fi
    echo "=== $name FAIL rc=$? (attempt $attempt) $(date +%T) ===" >> "$LOG"
    sleep 120
  done
}

run wb_fft 5400 wb_fft.json python benchmarks/wideband.py --channelizer fft
run wb_fft_pallas 5400 wb_fft_pallas.json \
    env RADIOCORE_TPU_FFT_PALLAS_MIN=65536 \
        RADIOCORE_TPU_EXTRACT_IFFT=pallas \
        python benchmarks/wideband.py --channelizer fft
run bench_extract_pallas 5400 bench_extract_pallas.json \
    env RADIOCORE_TPU_EXTRACT_IFFT=pallas python bench.py
run bench_band_pallas 5400 bench_band_pallas.json \
    env RADIOCORE_TPU_FFT_PALLAS_MIN=16777216 python bench.py
run bench_all_pallas 5400 bench_all_pallas.json \
    env RADIOCORE_TPU_FFT_PALLAS_MIN=65536 \
        RADIOCORE_TPU_EXTRACT_IFFT=pallas python bench.py
run pallas_devloop 5400 PALLAS_SOAK_r03.json \
    python benchmarks/pallas_soak.py --device-loop
run bench_96 5400 bench_96.json \
    env RADIOCORE_TPU_BENCH_STATIONS=96 python bench.py
run bench_128 5400 bench_128.json \
    env RADIOCORE_TPU_BENCH_STATIONS=128 python bench.py
echo "=== queue5 done $(date +%T) ===" >> "$LOG"
