#!/bin/bash
# Round-5 wave 1.5: config-4 D2H-wedge bisect. Wave-1 evidence: BOTH
# the full config-4 program AND the no-FIR variant wedge their process's
# first scalar D2H at n=2^23 under bench.py's exact protocol — while
# bench.py (band 2^24, same pipeline shape + demod) fetches fine in the
# same queue. Hypotheses, cheapest first:
#   (a) n=2^24 works where 2^23 doesn't (bench.py's only size-level
#       difference) → --seconds 0.35 snaps the chunk to 2^24;
#   (b) the band FFT alone vs +extraction at 2^23 (--stage fft).
set -u
LOG=${RADIOCORE_TPU_QUEUE_LOG:-/root/repo/bench_logs/tpu_queue_r5.log}
mkdir -p "$(dirname "$LOG")"
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
    then
      echo "=== probe OK after $tries tries $(date +%T) ===" >> "$LOG"
      return 0
    fi
    echo "--- probe fail $tries $(date +%T); sleeping 90 ---" >> "$LOG"
    sleep 90
  done
  echo "=== probe GAVE UP after $tries tries $(date +%T) ===" >> "$LOG"
  return 1
}

run() {
  local name=$1 tmo=$2 out=$3; shift 3
  if [ -s "$out" ]; then
    echo "=== $name SKIP (exists) $(date +%T) ===" >> "$LOG"
    return 0
  fi
  local attempt
  for attempt in 1 2; do
    probe || return 1
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

# (a) band chunk = 2^24 (bench.py's proven size), full program with FIR:
run wb24_fir 1800 WIDEBAND_n24_r05.json \
  python benchmarks/wideband_bench.py --channelizer fft --fir pallas \
  --seconds 0.35
# (a') same without FIR (if fir wedges only at 2^23... separate the axes):
run wb24_nofir 1200 WIDEBAND_n24_nofir_r05.json \
  python benchmarks/wideband_bench.py --channelizer fft --fir none \
  --seconds 0.35
# (b) 2^23 band FFT ALONE (no extract, no transpose):
run wb23_fftonly 1200 WIDEBAND_fftonly_r05.json \
  python benchmarks/wideband_bench.py --channelizer fft --fir none \
  --stage fft
# (c) alias-elision control: same as the failed wb5_nofir but with the
# history output forced through a real computation:
run wb23_touch 1200 WIDEBAND_touchh_r05.json \
  python benchmarks/wideband_bench.py --channelizer fft --fir none \
  --touch-history
echo "=== queue_r5 wave1.5 done $(date +%T) ===" >> "$LOG"
