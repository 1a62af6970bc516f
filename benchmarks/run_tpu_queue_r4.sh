#!/bin/bash
# Round-4 serial TPU queue. Lessons baked in from the r3 post-mortem:
#  * FAIL FAST on fetches: RADIOCORE_TPU_FETCH_ATTEMPTS=24 (~2 min)
#    instead of 500-800 (r3's "65-min compiles" were actually the fetch
#    retry loop sleeping 5 s × 800 on a process whose D2H never heals —
#    the compile itself was cache-warm in under a minute). A fresh
#    process beats in-process patience.
#  * Compile-only smoke stage at queue head (also pre-warms the cache).
#  * Persistent compile cache is set in-process by every harness
#    (runtime/compile_cache.py); the env var is belt-and-braces.
#  * ONE process at a time (the relay serializes clients).
# Usage: bash benchmarks/run_tpu_queue_r4.sh [job...]  (default: all)
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

# run NAME TIMEOUT OUT CMD... — probe-gated; 4 fresh-process attempts
# (fail-fast fetches make each retry cheap on a warm cache).
run() {
  local name=$1 tmo=$2 out=$3; shift 3
  if [ -s "$out" ]; then
    echo "=== $name SKIP (exists) $(date +%T) ===" >> "$LOG"
    return 0
  fi
  local attempt
  for attempt in 1 2 3 4; do
    probe
    echo "=== $name start (attempt $attempt) $(date +%T) ===" >> "$LOG"
    if timeout "$tmo" "$@" > "$out.part" 2>> "$LOG" && [ -s "$out.part" ]; then
      mv "$out.part" "$out"
      echo "=== $name OK $(date +%T) ===" >> "$LOG"
      return 0
    fi
    echo "=== $name FAIL rc=$? (attempt $attempt) $(date +%T) ===" >> "$LOG"
    # Keep whatever the attempt printed — failed-attempt stdout is
    # evidence (the r4 smoke stage's per-variant errors live there).
    [ -s "$out.part" ] && mv "$out.part" "$LOG.$name.fail$attempt"
    rm -f "$out.part"
    sleep 60
  done
  echo "=== $name GAVE UP $(date +%T) ===" >> "$LOG"
  return 1
}

want() {  # job selected? (no args = all)
  [ $# -eq 0 ] && return 0
  local j; for j in "$@"; do [ "$j" = "$CUR" ] && return 0; done
  return 1
}

JOBS=("$@")

CUR=smoke;        want "${JOBS[@]}" && run smoke 3600 SMOKE_r04.json \
  python benchmarks/smoke_compile.py
CUR=fft_soak;     want "${JOBS[@]}" && run fft_soak 3600 FFT_SOAK_r04.json \
  python benchmarks/pallas_soak.py --fft
CUR=extract;      want "${JOBS[@]}" && run extract 3600 EXTRACT_PROFILE_r04.json \
  python benchmarks/extract_profile.py
CUR=bench_default; want "${JOBS[@]}" && run bench_default 2400 BENCH_default_r04.json \
  python bench.py
CUR=bench_fused;  want "${JOBS[@]}" && run bench_fused 2400 BENCH_fused_r04.json \
  env RADIOCORE_TPU_EXTRACT_IFFT=fused python bench.py
CUR=bench_allpallas; want "${JOBS[@]}" && run bench_allpallas 2400 BENCH_allpallas_r04.json \
  env RADIOCORE_TPU_EXTRACT_IFFT=fused RADIOCORE_TPU_FFT_PALLAS_MIN=65536 \
      python bench.py
CUR=wb_fft;       want "${JOBS[@]}" && run wb_fft 3600 WIDEBAND_fft_r04.json \
  python benchmarks/wideband.py --channelizer fft
CUR=wb_pfb;       want "${JOBS[@]}" && run wb_pfb 3600 WIDEBAND_pfb_r04.json \
  python benchmarks/wideband.py --channelizer pfb
CUR=fir_soak;     want "${JOBS[@]}" && run fir_soak 3600 PALLAS_SOAK_r04.json \
  python benchmarks/pallas_soak.py --device-loop
CUR=bench_96;     want "${JOBS[@]}" && run bench_96 2400 BENCH_96_r04.json \
  env RADIOCORE_TPU_BENCH_STATIONS=96 python bench.py
CUR=bench_128;    want "${JOBS[@]}" && run bench_128 2400 BENCH_128_r04.json \
  env RADIOCORE_TPU_BENCH_STATIONS=128 python bench.py

echo "=== queue_r4 done $(date +%T) ===" >> "$LOG"
