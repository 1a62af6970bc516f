#!/bin/bash
# Retry-the-whole-run loop for benchmarks/wideband.py on the flaky relay:
# each attempt is a FRESH process (wedged relay windows usually clear on
# a new process — CLAUDE.md); first JSON line wins. Scalar barriers get
# ~42 min of in-process patience (RADIOCORE_TPU_FETCH_ATTEMPTS) because
# measured bad D2H windows last 35+ minutes.
CHZ=${1:-fft}
OUT=${2:-/root/repo/wb_${CHZ}.json}
MAX=${3:-4}
export JAX_COMPILATION_CACHE_DIR=$HOME/.cache/radiocore_tpu/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
export RADIOCORE_TPU_FETCH_ATTEMPTS=500
for i in $(seq 1 "$MAX"); do
  echo "=== attempt $i ($(date +%T)) ===" >> "/root/repo/wb_${CHZ}.err"
  if timeout 5400 python /root/repo/benchmarks/wideband.py --channelizer "$CHZ" \
       > "$OUT.tmp" 2>> "/root/repo/wb_${CHZ}.err" && [ -s "$OUT.tmp" ]; then
    mv "$OUT.tmp" "$OUT"
    echo "SUCCESS attempt $i ($(date +%T))" >> "/root/repo/wb_${CHZ}.err"
    exit 0
  fi
  sleep 45
done
echo "FAILED after $MAX attempts" >> "/root/repo/wb_${CHZ}.err"
exit 1
