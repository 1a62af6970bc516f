#!/bin/bash
# Follow-up TPU queue: waits for run_tpu_queue.sh to finish (the relay
# is single-client — NEVER two TPU processes at once), then runs the
# Pallas FFT-kernel soak and the pallas-lowering wideband A/B.
LOG=/root/repo/tpu_queue.log
export JAX_COMPILATION_CACHE_DIR=$HOME/.cache/radiocore_tpu/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
export RADIOCORE_TPU_FETCH_ATTEMPTS=500

while ! grep -q "queue done" "$LOG" 2>/dev/null; do sleep 60; done

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
run fft_soak 5400 FFT_SOAK_r03.json \
    python benchmarks/pallas_soak.py --fft
echo "=== queue2 done $(date +%T) ===" >> "$LOG"
