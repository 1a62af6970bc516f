#!/bin/bash
# Round-5 wave 1: config-4 wideband via the bench.py-protocol harness
# (VERDICT r4 #1 — the per-call chained-scalar protocol that has fetched
# successfully in every r4 queue epoch), bisect variants included, then
# the headline bench under the new band-FFT-kernel default.
# Serial: NEVER two TPU clients at once (CLAUDE.md).
set -u
LOG=${RADIOCORE_TPU_QUEUE_LOG:-/root/repo/bench_logs/tpu_queue_r5.log}
mkdir -p "$(dirname "$LOG")"
export JAX_COMPILATION_CACHE_DIR=$HOME/.cache/radiocore_tpu/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
export RADIOCORE_TPU_FETCH_ATTEMPTS=24
cd /root/repo

probe() {
  # Bounded (ADVICE r4): 20 tries ≈ 30 min, then GAVE UP so the queue
  # advances and the failure is visible in the log.
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

# Compile-only smoke head: warms every program the wave runs (catches
# Mosaic lowering bugs in minutes; long in-process compiles correlate
# with first-fetch D2H deaths).
probe && {
  echo "=== smoke start $(date +%T) ===" >> "$LOG"
  timeout 2400 python benchmarks/smoke_compile.py \
    --only wb_bench_fft,wb_bench_nofir,wb_bench_pfb,pipeline_default \
    > bench_logs/smoke_r5w1.json 2>> "$LOG" \
    && echo "=== smoke OK $(date +%T) ===" >> "$LOG" \
    || echo "=== smoke FAIL $(date +%T) ===" >> "$LOG"
}

# 1. Config-4 via the bench.py protocol — the round's top deliverable.
run wb5_fft 1800 WIDEBAND_r05.json \
  python benchmarks/wideband_bench.py --channelizer fft --fir pallas
# 2. Bisect: same program minus the band-rate FIR (≈ bench.py's head).
run wb5_nofir 1200 WIDEBAND_nofir_r05.json \
  python benchmarks/wideband_bench.py --channelizer fft --fir none
# 3. PFB form A/B.
run wb5_pfb 1800 WIDEBAND_pfb_r05.json \
  python benchmarks/wideband_bench.py --channelizer pfb --fir pallas
# 4. Headline bench under the new band-FFT-kernel default (code flip).
run bench_r5 1200 BENCH_head_r05.json python bench.py
echo "=== queue_r5 wave1 done $(date +%T) ===" >> "$LOG"
