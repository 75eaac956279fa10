#!/usr/bin/env python
"""Headline benchmark: u64 morton-key radix sort throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "keys/s", "vs_baseline": R, ...}

vs_baseline is the speedup over the XLA-native sort (jax.lax.sort on the
same data, same chip) — the strongest existing TPU sort a user gets without
this framework. Extra keys report the speed-of-light fraction per
BASELINE.md's bytes-moved model.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _measure(fn, reps: int) -> float:
    fn()  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax_block(out)
    return (time.perf_counter() - t0) / reps


def jax_block(out):
    import jax
    jax.block_until_ready(out)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=1 << 26,
                        help="number of u64 keys (default 64M)")
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--backend", type=str, default="xla",
                        help="sort backend for the headline number")
    args = parser.parse_args()

    import jax.numpy as jnp

    from tpu_qe.bench.sol import device_kind, sort_sol_seconds
    from tpu_qe.bits import U64
    from tpu_qe.sort import sort_u64

    n = args.n
    rng = np.random.default_rng(7)
    keys = U64(
        jnp.asarray(rng.integers(0, 1 << 32, size=n, dtype=np.uint32)),
        jnp.asarray(rng.integers(0, 1 << 32, size=n, dtype=np.uint32)),
    )
    payload = jnp.arange(n, dtype=jnp.uint32)

    def run(backend):
        return lambda: sort_u64(keys, payload, backend=backend)

    xla_s = _measure(run("xla"), args.reps)
    best_s = xla_s if args.backend == "xla" else _measure(
        run(args.backend), args.reps)

    sol_s = sort_sol_seconds(n, num_passes=8, payload_cols=1)
    result = {
        "metric": f"radix sort {n} u64 morton keys + u32 payload, 1 chip",
        "value": round(n / best_s),
        "unit": "keys/s",
        "vs_baseline": round(xla_s / best_s, 3),
        "backend": args.backend,
        "time_s": round(best_s, 4),
        "xla_sort_time_s": round(xla_s, 4),
        "sol_fraction": round(sol_s / best_s, 4),
        "device": device_kind(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
