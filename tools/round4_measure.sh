#!/bin/bash
# Round-4 TPU measurement battery — run when the axon tunnel is healthy.
# Each step is independent; results append (JSON lines) to the log so a
# tunnel hiccup mid-battery loses only the step in flight. First compiles
# cost minutes (remote compiler); the persistent XLA cache makes reruns
# disk-hits. Never timeout-kill a step mid-device-op (CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-round4_measured.jsonl}

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

# 2. warmup-fixed drivers re-measured at the 1B scale (round-3 numbers
#    carried ~30 s of first-transfer setup inside the timed loop)
step python -m tpu_qe bench-bigquantile --n $((1<<30))
step python -m tpu_qe bench-bigquantile --n $((1<<30)) --cont
step python -m tpu_qe bench-bigdistinct --n $((1<<30))
step python -m tpu_qe bench-bigsetops --n-a $((1<<29)) --n-b $((1<<29))

# 3. the SQL front-end at scale (device programs identical to the direct
#    operator composition; prints the measured front-end overhead)
step python tools/bench_sql.py --n $((1<<27)) --groups 4096

# 4. signed-sum aggregate cost control: the sign-extension adds one
#    where+select per int32 sum operand — confirm group-by rate holds
step python -m tpu_qe bench-matrix -- --configs filter_agg

# 5. round-4 session-2 additions: out-of-core SQL (virtual tables),
#    the re-measured join (restore-operand shave), per-group quantiles
#    with the max_groups extraction
step python -m tpu_qe bench-bigsql --n $((1<<30))
step python -m tpu_qe bench-bigsql --n $((1<<30)) --where
step python -m tpu_qe bench-matrix -- --configs join
step python -m tpu_qe bench-matrix -- --configs quantile
