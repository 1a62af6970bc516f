#!/bin/bash
# Round-5 wave 7: device-resident sustained pipeline run, then a patient
# stream retry loop (the bad-H2D window outlasted 8 attempts; windows
# rotate on a tens-of-minutes scale — retry every ~8 min up to 8x).
set -u
LOG=${RADIOCORE_TPU_QUEUE_LOG:-/root/repo/bench_logs/tpu_queue_r5.log}
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
    then echo "=== probe OK after $tries tries $(date +%T) ===" >> "$LOG"; return 0; fi
    echo "--- probe fail $tries $(date +%T); sleeping 90 ---" >> "$LOG"; sleep 90
  done
  echo "=== probe GAVE UP $(date +%T) ===" >> "$LOG"; return 1
}
run() {
  local name=$1 tmo=$2 out=$3; shift 3
  [ -s "$out" ] && { echo "=== $name SKIP $(date +%T) ===" >> "$LOG"; return 0; }
  local attempt
  for attempt in 1 2; do
    probe || return 1
    echo "=== $name start (attempt $attempt) $(date +%T) ===" >> "$LOG"
    if timeout "$tmo" "$@" > "$out.part" 2>> "$LOG" && [ -s "$out.part" ]; then
      mv "$out.part" "$out"; echo "=== $name OK $(date +%T) ===" >> "$LOG"; return 0
    fi
    echo "=== $name FAIL rc=$? (attempt $attempt) $(date +%T) ===" >> "$LOG"
    rm -f "$out.part"; sleep 60
  done
  echo "=== $name GAVE UP $(date +%T) ===" >> "$LOG"; return 1
}
# Window-immune at-scale sustained run (only scalar D2H).
run sustained60 2400 SUSTAINED_r05.json \
  python benchmarks/sustained_pipeline.py --chunks 60
# Patient stream retries: one attempt per pass, 8 passes, ~8 min apart.
for pass in 1 2 3 4 5 6 7 8; do
  [ -s STREAM_r05.json ] && break
  probe || break
  echo "=== stream_pass$pass start $(date +%T) ===" >> "$LOG"
  if timeout 2400 python benchmarks/stream_run.py --seconds 60 \
       --input-rate 524288 > STREAM_r05.json.part 2>> "$LOG" \
       && [ -s STREAM_r05.json.part ]; then
    mv STREAM_r05.json.part STREAM_r05.json
    echo "=== stream_pass$pass OK $(date +%T) ===" >> "$LOG"
    break
  fi
  echo "=== stream_pass$pass FAIL $(date +%T) ===" >> "$LOG"
  rm -f STREAM_r05.json.part
  sleep 420
done
echo "=== queue_r5 wave7 done $(date +%T) ===" >> "$LOG"
