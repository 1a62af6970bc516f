#!/bin/bash
# Round-5 wave 2: demod per-transform profile, precision-lever A/Bs
# (docs/ROOFLINE.md), mixed-radix 24M band probe, station-rfft routing
# A/B, 96/128 station ladder. Run AFTER wave 1 (run_tpu_queue_r5.sh).
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

# Smoke head: the two new compile surfaces of this wave.
probe && {
  echo "=== smoke2 start $(date +%T) ===" >> "$LOG"
  timeout 2400 python benchmarks/smoke_compile.py \
    --only pipeline_prfft,fft_mixed \
    > bench_logs/smoke_r5w2.json 2>> "$LOG" \
    && echo "=== smoke2 OK $(date +%T) ===" >> "$LOG" \
    || echo "=== smoke2 FAIL $(date +%T) ===" >> "$LOG"
}

# 1. Where does the 12.6 ms demod stage go? (VERDICT r4 #3)
run demod_prof 3000 DEMOD_PROFILE_r05.json \
  python benchmarks/demod_profile.py
# 2. Station-rfft kernel routing A/B on the headline pipeline.
run bench_prfft 1200 BENCH_prfft_r05.json \
  env RADIOCORE_TPU_STATION_RFFT=pallas python bench.py
# 3. Precision levers on the FFT kernel (docs/ROOFLINE.md):
run fftsoak_high 2400 FFT_SOAK_high_r05.json \
  env RADIOCORE_TPU_FFT_MM_PRECISION=high \
  python benchmarks/pallas_soak.py --fft
run fftsoak_h3 2400 FFT_SOAK_high3mm_r05.json \
  env RADIOCORE_TPU_FFT_MM_PRECISION=high RADIOCORE_TPU_FFT_CMUL=3mm \
  python benchmarks/pallas_soak.py --fft
# 4. Precision lever on the FIR kernel.
run firsoak_high 2400 PALLAS_SOAK_high_r05.json \
  env RADIOCORE_TPU_FIR_PRECISION=high \
  python benchmarks/pallas_soak.py --device-loop --block-rows 512
# 5. Non-pow2 24M band: native vs XLA fourstep vs Pallas mixed-radix.
run probe24m 2400 FFT_PROBE_24M_r05.json \
  python benchmarks/fft_probe.py --sizes 24 --raw-sizes 25165824 \
  --impls native,fourstep,mixed
# 6. Station ladder with the mixed-radix band default candidate.
run bench96_mixed 1500 BENCH_96mixed_r05.json \
  env RADIOCORE_TPU_BENCH_STATIONS=96 RADIOCORE_TPU_FFT_MIXED_MIN=16777216 \
  python bench.py
run bench96 1500 BENCH_96_r05.json \
  env RADIOCORE_TPU_BENCH_STATIONS=96 python bench.py
run bench128 1500 BENCH_128_r05.json \
  env RADIOCORE_TPU_BENCH_STATIONS=128 python bench.py
echo "=== queue_r5 wave2 done $(date +%T) ===" >> "$LOG"
