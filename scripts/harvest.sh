#!/bin/bash
# Poll tunnel health; in healthy windows run the pending TPU probes once each.
# Results land in /tmp/harvest/. Exits when all probes have produced output.
set -u
OUT=/tmp/harvest
mkdir -p $OUT
cd /root/repo

health() {
  timeout -k 10 100 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((64,64)) @ jnp.ones((64,64)))[0,0]))
" >/dev/null 2>&1
}

run_probe() {  # name, script
  local name=$1 script=$2
  if [ -s "$OUT/$name.txt" ]; then return 0; fi
  echo "$(date +%H:%M:%S) running $name" >> $OUT/log
  timeout -k 10 580 python "$script" > "$OUT/$name.raw" 2>&1
  grep -aE "ms|GNNZ|err|OK" "$OUT/$name.raw" | grep -av WARN > "$OUT/$name.tmp"
  if [ -s "$OUT/$name.tmp" ]; then mv "$OUT/$name.tmp" "$OUT/$name.txt"; fi
}

for attempt in $(seq 1 60); do
  if [ -s $OUT/probe8.txt ] && [ -s $OUT/probe2.txt ]; then
    echo "$(date +%H:%M:%S) all collected" >> $OUT/log
    exit 0
  fi
  if health; then
    echo "$(date +%H:%M:%S) healthy" >> $OUT/log
    run_probe probe8 scripts/tpu_probe8.py
    if health; then run_probe probe2 scripts/tpu_probe2.py; fi
  else
    echo "$(date +%H:%M:%S) unhealthy" >> $OUT/log
  fi
  sleep 240
done
