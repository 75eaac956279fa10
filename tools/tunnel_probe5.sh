#!/bin/bash
# Round-5 probe-only watchdog: logs tunnel state every ~6 min so the
# session knows when chip measurements can run. Probing a stuck jax
# INIT with a timeout is safe (CLAUDE.md — unlike killing mid-device-op).
set -u
cd "$(dirname "$0")/.."
LOG=round5_watchdog.log
echo "probe5 start $(date -u +%FT%TZ)" >>"$LOG"
for i in $(seq 1 300); do
  if timeout 120 python -c "import numpy as np, jax.numpy as jnp; np.asarray(jnp.arange(8, dtype=jnp.uint32)[:2])" >/dev/null 2>&1; then
    echo "tunnel OK $(date -u +%FT%TZ) (probe $i)" >>"$LOG"
    exit 0
  fi
  echo "tunnel down $(date -u +%FT%TZ) (probe $i)" >>"$LOG"
  sleep 300
done
