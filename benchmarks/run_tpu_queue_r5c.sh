#!/bin/bash
# Round-5 wave 1.6: config-4 via dependency-laundered fetch.
# Wave-1/1.5 finding: D2H of ANY buffer produced by the config-4
# programs is refused (UNIMPLEMENTED, 24 retries) even after a
# successful block_until_ready, across protocols (per-call, fori_loop),
# FIR lowerings (pallas/none), channelizers (fft/pfb), band sizes
# (2^23/2^24/15.36M) and alias controls — while bench.py-program
# buffers fetch fine in the SAME session minutes apart. So: chain the
# wideband scalar into a known-fetchable WBFM probe program's INPUT and
# fetch the probe's output (serial dependency = the chain must run).
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

# THE config-4 artifact: full program (Pallas FIR + FFT channelizer).
run wb16_fir 1800 WIDEBAND_r05.json \
  python benchmarks/wideband_bench.py --channelizer fft --fir pallas \
  --fetch-via demod
# PFB A/B.
run wb16_pfb 1800 WIDEBAND_pfb_r05.json \
  python benchmarks/wideband_bench.py --channelizer pfb --fir pallas \
  --fetch-via demod
# 2^24-chunk variant (bench-band-size cross-check).
run wb16_n24 1500 WIDEBAND_n24_r05.json \
  python benchmarks/wideband_bench.py --channelizer fft --fir pallas \
  --seconds 0.35 --fetch-via demod
echo "=== queue_r5 wave1.6 done $(date +%T) ===" >> "$LOG"
