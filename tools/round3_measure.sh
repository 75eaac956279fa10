#!/bin/bash
# Round-3 TPU measurement battery — run when the axon tunnel is healthy.
# Each step is independent; results append (JSON lines) to the log so a
# tunnel hiccup mid-battery loses only the step in flight. First compiles
# cost minutes (remote compiler); the persistent XLA cache makes reruns
# disk-hits. Never timeout-kill a step mid-device-op (CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-round3_measured.jsonl}

step() {
  echo "=== $* (start $(date +%H:%M:%S)) ===" >&2
  "$@" 2>>"$LOG.err" | tee -a "$LOG"
}

# tunnel health probe (tiny op; fails fast if down)
python - <<'EOF' || { echo "tunnel down; aborting" >&2; exit 1; }
import numpy as np, jax.numpy as jnp
np.asarray(jnp.arange(8, dtype=jnp.uint32)[:2])
print("tunnel ok")
EOF

# 1. headline (what the driver runs) — confirms nothing regressed
step python bench.py --n $((1<<26))

# 2. new round-3 operators at scale, all device-verified
step python -m tpu_qe bench-bigagg  --n $((1<<30)) --groups $((1<<20))
step python -m tpu_qe bench-bigagg  --n $((1<<28)) --groups $((1<<20)) --minmax
step python -m tpu_qe bench-bigagg  --n $((1<<28)) --groups $((1<<20)) --value-cols 4
step python -m tpu_qe bench-bigtopk --n $((1<<30)) --k $((1<<10))
step python -m tpu_qe bench-bigtopk --n $((1<<28)) --k $((1<<10)) --distributed --force-composed
step python -m tpu_qe bench-big     --n $((1<<28)) --payload-cols 3   # table-shaped rows
step python -m tpu_qe bench-bigpipe --n-left $((1<<28)) --n-right $((1<<28)) --groups $((1<<16))
step python -m tpu_qe bench-bigpipe --n-left $((1<<27)) --n-right $((1<<27)) --groups $((1<<16)) --distributed --force-composed
# machinery-through paths at D=1 (the real chip): --force-composed keeps
# the exchange/combine-tree instead of delegating to the 1-chip drivers
step python -m tpu_qe bench-bigjoin --n-left $((1<<28)) --n-right $((1<<28)) --distributed --force-composed
step python -m tpu_qe bench-bigagg  --n $((1<<28)) --groups $((1<<20)) --distributed --force-composed
step python -m tpu_qe bench-big     --n $((1<<28)) --distributed

# 2b. window-function family (round-3 additions while the tunnel was down)
step python -m tpu_qe bench-matrix -- --configs window
step python -m tpu_qe bench-matrix -- --configs window --scale 0.25
step python -m tpu_qe bench-bigwindow --n $((1<<29)) --partitions $((1<<20))
step python -m tpu_qe bench-bigwindow --n $((1<<28)) --partitions $((1<<20)) --distributed --force-composed
step python -m tpu_qe bench-bigquantile --n $((1<<30))
step python -m tpu_qe bench-bigquantile --n $((1<<28)) --distributed
step python -m tpu_qe bench-bigdistinct --n $((1<<30))
step python -m tpu_qe bench-bigdistinct --n $((1<<28)) --distributed --force-composed
step python -m tpu_qe bench-bigorderby --n $((1<<29))
step python -m tpu_qe bench-bigorderby --n $((1<<28)) --distributed --force-composed
step python -m tpu_qe bench-matrix -- --configs orderby,count_distinct,quantile,setop
step python -m tpu_qe bench-bigsetops --op intersect --n-a $((1<<29)) --n-b $((1<<29))
step python -m tpu_qe bench-bigsetops --op union --n-a $((1<<28)) --n-b $((1<<28)) --distributed --force-composed
step python -m tpu_qe bench-bigquantile --n $((1<<30)) --cont

# 3. payload-marginal sort cost calibration (STATUS known gap)
step python tools/calibrate_sol.py sort_ops

echo "battery complete -> $LOG" >&2
