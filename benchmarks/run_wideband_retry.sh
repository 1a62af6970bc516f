#!/bin/bash
# Retry-the-whole-run loop for benchmarks/wideband.py on the flaky relay:
# each attempt is a FRESH process (wedged relay windows usually clear on
# a new process — CLAUDE.md); first JSON line wins.
CHZ=${1:-fft}
OUT=${2:-/root/repo/wb_${CHZ}.json}
MAX=${3:-10}
export JAX_COMPILATION_CACHE_DIR=$HOME/.cache/radiocore_tpu/jaxcache
export PYTHONPATH=/root/repo:/root/.axon_site
for i in $(seq 1 "$MAX"); do
  echo "=== attempt $i ($(date +%T)) ===" >> "/root/repo/wb_${CHZ}.err"
  if timeout 590 python /root/repo/benchmarks/wideband.py --channelizer "$CHZ" \
       > "$OUT.tmp" 2>> "/root/repo/wb_${CHZ}.err" && [ -s "$OUT.tmp" ]; then
    mv "$OUT.tmp" "$OUT"
    echo "SUCCESS attempt $i" >> "/root/repo/wb_${CHZ}.err"
    exit 0
  fi
  sleep 45
done
echo "FAILED after $MAX attempts" >> "/root/repo/wb_${CHZ}.err"
exit 1
