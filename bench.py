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


def _probe_device_or_die(timeout_s: int = 600) -> None:
    """Fail fast (clean JSON error) instead of hanging forever when the
    TPU tunnel is down — jax initialization blocks uninterruptibly in
    C++, so the probe runs in a subprocess with a generous timeout (a
    COLD healthy tunnel can take minutes on its first transfer; an
    outage hangs indefinitely — observed 2026-08-17)."""
    import os
    import subprocess
    import sys

    # honor JAX_PLATFORMS via jax.config: this container's site hook
    # registers the TPU plugin at interpreter start and the env var alone
    # does NOT redirect it (tests/conftest.py records the same trap)
    code = ("import os, jax;"
            "p = os.environ.get('JAX_PLATFORMS');"
            "p and jax.config.update('jax_platforms', p);"
            "import numpy as np, jax.numpy as jnp;"
            "np.asarray(jnp.arange(8, dtype=jnp.uint32)[:2]);print('ok')")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, timeout=timeout_s,
                           cwd=os.path.dirname(os.path.abspath(__file__)))
        if r.returncode == 0:
            return
        detail = (r.stderr or b"").decode()[-200:]
    except subprocess.TimeoutExpired:
        detail = f"device probe hung > {timeout_s}s (tunnel down?)"
    print(json.dumps({"metric": "headline sort", "value": 0,
                      "unit": "keys/s", "vs_baseline": 0.0,
                      "error": f"device unreachable: {detail}"}))
    raise SystemExit(1)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=1 << 26,
                        help="number of u64 keys (default 64M)")
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--backend", type=str, default="best",
                        help="sort backend for the headline number "
                             "('best' picks the framework default)")
    parser.add_argument("--no-probe", action="store_true",
                        help="skip the fail-fast device probe")
    args = parser.parse_args()

    if not args.no_probe:
        _probe_device_or_die()

    import os

    import jax

    # same env-honoring workaround as the probe (site hook registers the
    # TPU plugin regardless of JAX_PLATFORMS)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
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
                    # Perturb BOTH words with the loop counter so every
                    # iteration is live and later iterations are not
                    # near-sorted in hi (an adaptive backend could exploit
                    # that). XOR by a per-iteration constant is a bijection
                    # applied uniformly, so the key distribution is
                    # stationary across iterations (asserted once below).
                    iu = i.astype(jnp.uint32)
                    clo = clo ^ iu
                    chi = chi ^ (iu * jnp.uint32(0x9E3779B9))
                    skey, (spay,) = sort_u64(U64(clo, chi), cpay,
                                             backend=be)
                    return (skey.lo, skey.hi, spay)
                return jax.lax.fori_loop(0, k, body, (lo, hi, payload))
            return functools.partial(run, lo, hi, payload)
        return make

    # One-time stationarity check of the chaining methodology: after k
    # perturb+sort rounds the key distribution must still look uniform
    # (mean of each u32 word near 2^31). Host-side numpy replay of the
    # exact perturbation on a small n — the property is per-element and
    # independent of array size.
    def _stationary_ok(k=6, n_small=1 << 18, tol=0.02):
        r2 = np.random.default_rng(11)
        l = r2.integers(0, 1 << 32, n_small, dtype=np.uint32)
        h = r2.integers(0, 1 << 32, n_small, dtype=np.uint32)
        for i in range(k):
            l ^= np.uint32(i)
            h ^= np.uint32((i * 0x9E3779B9) & 0xFFFFFFFF)
            u = (h.astype(np.uint64) << np.uint64(32)) | l.astype(np.uint64)
            order = np.argsort(u, kind="stable")
            l, h = l[order], h[order]
        c = 2.0**31
        return (abs(l.mean() / c - 1) < tol and abs(h.mean() / c - 1) < tol)
    assert _stationary_ok(), "chained perturbation drifted off-uniform"

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
