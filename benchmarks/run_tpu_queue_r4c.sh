#!/bin/bash
# Round-4 wave 3: the spectrum-output mega-kernel A/B + the widened
# extract profile. Waits for wave 2 (single-client relay).
set -u
LOG=${RADIOCORE_TPU_QUEUE_LOG:-/root/repo/bench_logs/tpu_queue_r4.log}
mkdir -p "$(dirname "$LOG")"
export JAX_COMPILATION_CACHE_DIR=$HOME/.cache/radiocore_tpu/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
export RADIOCORE_TPU_FETCH_ATTEMPTS=24

while ! grep -q "queue_r4b done" "$LOG" 2>/dev/null; do sleep 60; done
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
  for attempt in 1 2 3 4; do
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

run smoke_spec 3600 SMOKE_spec_r04.json \
  python benchmarks/smoke_compile.py --only fused_extract_demod_spec
run bench_spec 2400 BENCH_spec_r04.json \
  env RADIOCORE_TPU_EXTRACT_DEMOD=spec python bench.py
run extract2 3600 EXTRACT_PROFILE2_r04.json \
  python benchmarks/extract_profile.py
echo "=== queue_r4c done $(date +%T) ===" >> "$LOG"
