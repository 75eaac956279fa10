#!/bin/bash
# Waits for the axon tunnel to come back, then runs the round-4
# measurement battery ONCE and exits. Detach with setsid/nohup; progress
# notes append to round4_watchdog.log. Probing a stuck jax INIT with a
# timeout is safe (CLAUDE.md — unlike killing mid-device-op).
set -u
cd "$(dirname "$0")/.."
LOG=round4_watchdog.log
BATTERY_LOG=${1:-round4_measured.jsonl}

echo "watchdog start $(date -u +%FT%TZ)" >>"$LOG"
for i in $(seq 1 200); do
  if timeout 120 python -c "import numpy as np, jax.numpy as jnp; np.asarray(jnp.arange(8, dtype=jnp.uint32)[:2])" >/dev/null 2>&1; then
    echo "tunnel ok $(date -u +%FT%TZ) (probe $i) — running battery" >>"$LOG"
    bash tools/round4_measure.sh "$BATTERY_LOG" >>"$LOG" 2>&1
    echo "battery done $(date -u +%FT%TZ)" >>"$LOG"
    exit 0
  fi
  echo "tunnel down $(date -u +%FT%TZ) (probe $i)" >>"$LOG"
  sleep 360
done
echo "watchdog gave up $(date -u +%FT%TZ)" >>"$LOG"
