#!/usr/bin/env python
"""Headline benchmark: u64 morton-key radix sort throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "keys/s", "vs_baseline": R, ...}

vs_baseline is the speedup over the XLA-native sort (a stable
jax.lax.sort on the same data, same chip) — the strongest existing TPU
sort a user gets without this framework. The framework's default backend
for this workload is xla_tiebreak: the payload is the unique row index
(the reference pipeline sorts (morton code, triangle index) pairs), so an
unstable 3-key sort with the payload as tiebreak returns the bit-identical
stable-by-key result ~24% faster. Extra keys report the speed-of-light
fraction per BASELINE.md's bytes-moved model.

Timing methodology: differential chained measurement (see
tpu_qe/utils/timing.py) — block_until_ready is unreliable on this transport
and per-call round-trip latency (~35 ms) would otherwise swamp the kernel
time, so we time k-chained in-jit iterations and difference them.
"""

from __future__ import annotations

import argparse
import functools
import json


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=1 << 26,
                        help="number of u64 keys (default 64M)")
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--backend", type=str, default="best",
                        help="sort backend for the headline number "
                             "('best' picks the framework default)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu_qe.bench.sol import device_kind, sort_sol_seconds
    from tpu_qe.sort import BEST_UNIQUE_PAYLOAD_BACKEND, sort_u64
    from tpu_qe.bits import U64
    from tpu_qe.utils.timing import measure_chained

    # the headline workload's payload is a unique index, so the tiebreak
    # backend returns the bit-identical stable result, faster
    backend = (BEST_UNIQUE_PAYLOAD_BACKEND if args.backend == "best"
               else args.backend)
    n = args.n
    rng = np.random.default_rng(7)
    lo = jnp.asarray(rng.integers(0, 1 << 32, size=n, dtype=np.uint32))
    hi = jnp.asarray(rng.integers(0, 1 << 32, size=n, dtype=np.uint32))
    payload = jnp.arange(n, dtype=jnp.uint32)

    def chain(be):
        def make(k):
            @jax.jit
            def run(lo, hi, payload):
                def body(i, carry):
                    clo, chi, cpay = carry
                    # Perturb with the loop counter so every iteration is
                    # live; xor-ing the sorted output keeps key distribution.
                    clo = clo ^ i.astype(jnp.uint32)
                    skey, (spay,) = sort_u64(U64(clo, chi), cpay,
                                             backend=be)
                    return (skey.lo, skey.hi, spay)
                return jax.lax.fori_loop(0, k, body, (lo, hi, payload))
            return functools.partial(run, lo, hi, payload)
        return make

    # Scale chain length so the differential work dwarfs the ~35 ms fixed
    # round-trip noise (sub-noise differentials clamp to 0 and are garbage).
    k_big = 1 + max(4, (1 << 28) // n)
    xla_s = measure_chained(chain("xla"), 1, k_big, reps=args.reps)
    if backend == "xla":
        best_s = xla_s
    else:
        best_s = measure_chained(chain(backend), 1, k_big, reps=args.reps)
    if xla_s <= 0 or best_s <= 0:
        raise RuntimeError(
            f"timing below noise floor (xla={xla_s}, {backend}={best_s}); "
            "increase --n or chain length")

    sol_s = sort_sol_seconds(n, num_passes=8, payload_cols=1)
    result = {
        "metric": f"radix sort {n} u64 morton keys + u32 payload, 1 chip",
        "value": round(n / best_s),
        "unit": "keys/s",
        "vs_baseline": round(xla_s / best_s, 3),
        "backend": backend,
        "time_s": round(best_s, 4),
        "xla_sort_time_s": round(xla_s, 4),
        "sol_fraction": round(sol_s / best_s, 4),
        "device": device_kind(),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
