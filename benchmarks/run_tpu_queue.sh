#!/bin/bash
# Serial TPU benchmark queue (the relay is single-client): each step is a
# fresh process with long scalar-fetch patience; failures don't stop the
# queue. Results land in /root/repo/*.json + a progress log.
#
# Every item is health-gated: a trivial fresh-process probe
# (jit(v+1) on 8 elements + scalar fetch) must pass before the item
# launches, so a bad relay window stalls the queue instead of burning
# an item's timeout. Bad windows have lasted 35+ minutes (CLAUDE.md),
# so the gate is patient.
LOG=/root/repo/tpu_queue.log
export JAX_COMPILATION_CACHE_DIR=$HOME/.cache/radiocore_tpu/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
export RADIOCORE_TPU_FETCH_ATTEMPTS=500

probe() {  # loop until the relay answers a trivial program
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

run() {  # run <name> <timeout_s> <outfile> <cmd...>
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
run wb_fft 5400 wb_fft.json python benchmarks/wideband.py --channelizer fft
run wb_pfb 5400 wb_pfb.json python benchmarks/wideband.py --channelizer pfb
run extract 5400 extract_profile.json python benchmarks/extract_profile.py
run fft_micro 5400 fft_micro.json python benchmarks/fft_micro.py
run pallas_devloop 5400 PALLAS_SOAK_r03.json \
    python benchmarks/pallas_soak.py --device-loop
run bench_96 5400 bench_96.json \
    env RADIOCORE_TPU_BENCH_STATIONS=96 python bench.py
run bench_128 5400 bench_128.json \
    env RADIOCORE_TPU_BENCH_STATIONS=128 python bench.py
echo "=== queue done $(date +%T) ===" >> "$LOG"
