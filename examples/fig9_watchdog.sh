#!/bin/bash
# Round-5 fig9 job under the stall watchdog (same pattern as
# run_fig1_round5.sh): a TPU client started right after another one dies can
# wedge SILENTLY in its first remote compile (see CLAUDE.md), so every
# attempt is killed+retried when its log stops growing.  Writes its pid to
# /tmp/zoo_all.pid so bench.py's round-end eviction can free the grant.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
echo $$ > /tmp/zoo_all.pid
LOG=/tmp/fig9.log
STALL=${STALL_TIMEOUT:-1500}
for attempt in $(seq 1 12); do
  echo "=== fig9 attempt $attempt ($(date -u +%H:%M:%S))" >> "$LOG"
  python examples/run_fig9_round5.py >> "$LOG" 2>&1 &
  PY=$!; echo $PY > /tmp/fig9.pid
  last_size=$(stat -c %s "$LOG"); last_t=$(date +%s)
  while kill -0 "$PY" 2>/dev/null; do
    sleep 60
    size=$(stat -c %s "$LOG")
    if [ "$size" != "$last_size" ]; then last_size=$size; last_t=$(date +%s); fi
    if [ $(( $(date +%s) - last_t )) -gt "$STALL" ]; then
      echo "=== fig9 attempt $attempt stalled ${STALL}s; killing $PY" >> "$LOG"
      kill "$PY" 2>/dev/null; sleep 5; kill -9 "$PY" 2>/dev/null
      break
    fi
  done
  wait "$PY"; code=$?
  if [ "$code" -eq 0 ]; then echo "=== fig9 complete ($(date -u +%H:%M:%S))" >> "$LOG"; exit 0; fi
  echo "=== fig9 attempt $attempt failed ($code); grant wait 180s" >> "$LOG"
  sleep 180
done
echo "=== fig9 FAILED after 12 attempts" >> "$LOG"; exit 1
