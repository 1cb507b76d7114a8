#!/bin/bash
# Round-5 fig1 arm queue: cheapest arms first so every completed arm is
# durable before the expensive DiffusionTS ones start.  Retries each batch
# (tunnel drops / stale-grant stalls); the arm driver skips complete arms,
# so retries only re-pay model loading.  Usage:
#   bash examples/run_fig1_round5.sh <batch>   # batch: cheap|dts_sis|dts_neuronal
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
echo $$ > /tmp/zoo_all.pid  # bench.py round-end eviction reads this pidfile

case "$1" in
  cheap)       ARMS="NsDiff:SIS DiffSTG:SIS TMDM:SIS TMDM:neuronal";;
  dts_sis)     ARMS="DiffusionTS:SIS";;
  dts_neuronal) ARMS="DiffusionTS:neuronal";;
  *) echo "unknown batch: $1" >&2; exit 1;;
esac

LOG=/tmp/fig1_r5_$1.log
STALL=${STALL_TIMEOUT:-1500}  # kill+retry if the log stops growing (dead tunnel fetch)
for attempt in $(seq 1 20); do
  echo "=== attempt $attempt ($(date -u +%H:%M:%S)) arms: $ARMS" >> "$LOG"
  python examples/fig1_arm_driver.py --arms $ARMS >> "$LOG" 2>&1 &
  PY=$!
  last_size=$(stat -c %s "$LOG"); last_t=$(date +%s)
  while kill -0 "$PY" 2>/dev/null; do
    sleep 60
    size=$(stat -c %s "$LOG")
    if [ "$size" != "$last_size" ]; then last_size=$size; last_t=$(date +%s); fi
    if [ $(( $(date +%s) - last_t )) -gt "$STALL" ]; then
      echo "=== attempt $attempt stalled (no log growth ${STALL}s); killing $PY" >> "$LOG"
      kill "$PY" 2>/dev/null; sleep 5; kill -9 "$PY" 2>/dev/null
      break
    fi
  done
  wait "$PY"; code=$?
  if [ "$code" -eq 0 ]; then
    echo "=== batch $1 complete ($(date -u +%H:%M:%S))" >> "$LOG"
    exit 0
  fi
  echo "=== attempt $attempt failed (exit $code); retrying in 120s" >> "$LOG"
  sleep 120
done
echo "=== batch $1 FAILED after 20 attempts" >> "$LOG"
exit 1
