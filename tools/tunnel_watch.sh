#!/bin/bash
# appends tunnel status to round5_watchdog.log every ~4 min; exits when up
for i in $(seq 1 200); do
  if timeout 90 python -c "
import jax, numpy as np
x = jax.numpy.arange(8)
assert int(np.asarray(x)[3]) == 3
" >/dev/null 2>&1; then
    echo "tunnel OK $(date -u +%FT%TZ) (watch $i)" >> /root/repo/round5_watchdog.log
    exit 0
  fi
  echo "tunnel down $(date -u +%FT%TZ) (watch $i)" >> /root/repo/round5_watchdog.log
  sleep 240
done
exit 1
