#!/bin/bash
# Round-4 wave 4: re-validate after the fused-extraction default flip +
# the band-FFT-only Pallas routing experiment (the all-pallas variant
# wedged on device; this isolates the large-kernel band FFT, which won
# its standalone device-loop 6.4 vs 9.7 ms native).
# Run AFTER waves 1-3 are done and the default flip is committed.
set -u
LOG=${RADIOCORE_TPU_QUEUE_LOG:-/root/repo/bench_logs/tpu_queue_r4.log}
mkdir -p "$(dirname "$LOG")"
export JAX_COMPILATION_CACHE_DIR=$HOME/.cache/radiocore_tpu/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
export RADIOCORE_TPU_FETCH_ATTEMPTS=24
cd /root/repo

probe() {
  local tries=0
  while :; do
    tries=$((tries + 1))
    if timeout 600 python - <<'EOF' >> "$LOG" 2>&1
import jax, jax.numpy as jnp
print("probe:", float(jax.jit(lambda v: v + 1)(jnp.ones(8)).sum()))
EOF
    then
      echo "=== probe OK after $tries tries $(date +%T) ===" >> "$LOG"
      return 0
    fi
    echo "--- probe fail $tries $(date +%T); sleeping 90 ---" >> "$LOG"
    sleep 90
  done
}

run() {
  local name=$1 tmo=$2 out=$3; shift 3
  if [ -s "$out" ]; then
    echo "=== $name SKIP (exists) $(date +%T) ===" >> "$LOG"
    return 0
  fi
  local attempt
  for attempt in 1 2; do
    probe
    echo "=== $name start (attempt $attempt) $(date +%T) ===" >> "$LOG"
    if timeout "$tmo" "$@" > "$out.part" 2>> "$LOG" && [ -s "$out.part" ]; then
      mv "$out.part" "$out"
      echo "=== $name OK $(date +%T) ===" >> "$LOG"
      return 0
    fi
    echo "=== $name FAIL rc=$? (attempt $attempt) $(date +%T) ===" >> "$LOG"
    [ -s "$out.part" ] && mv "$out.part" "$LOG.$name.fail$attempt"
    rm -f "$out.part"
    sleep 60
  done
  echo "=== $name GAVE UP $(date +%T) ===" >> "$LOG"
  return 1
}

# Config-4 wideband FFT retry under the device-loop protocol (the
# per-call wall form wedged its process's D2H on all 4 wave-1 tries).
run wb_fft2 2400 WIDEBAND_fft_r04.json \
  python benchmarks/wideband.py --channelizer fft
run wb_pfb2 2400 WIDEBAND_pfb_r04.json \
  python benchmarks/wideband.py --channelizer pfb

# New-default (fused extraction) 64-station headline. (96/128 already
# ran post-flip in wave 1: BENCH_96/128_r04.json ARE new-default rows.)
run bench_newdef 1200 BENCH_newdefault_r04.json python bench.py
# Band FFT through the large Pallas kernel ONLY (stations stay native):
# FFT_PALLAS_MIN above the station rfft half-size (2^17) but at the
# band size 2^24.
run bench_bandkernel 1200 BENCH_bandkernel_r04.json \
  env RADIOCORE_TPU_FFT_PALLAS_MIN=16777216 python bench.py
# All-pallas retry: the 22:04 "device wedge" coincided with the relay
# degradation that later killed trivial probes; prfft (same knob) ran
# clean at 01:00. One attempt, tight timeout.
run bench_allpallas2 900 BENCH_allpallas2_r04.json \
  env RADIOCORE_TPU_FFT_PALLAS_MIN=65536 python bench.py
echo "=== queue_r4d done $(date +%T) ===" >> "$LOG"
