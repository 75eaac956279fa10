"""Honest device timing for TPU benchmarks.

Measuring TPU time correctly here is subtle, and the naive recipe is wrong on
this platform in two ways we verified empirically:

1. ``jax.block_until_ready`` can return before device execution finishes on
   experimental PJRT transports (observed on the ``axon``-tunneled chip: a
   64M-element copy "measured" 0.07 ms, i.e. 7 TB/s — impossible). The only
   trustworthy completion signal is a small device-to-host readback of the
   result.
2. Each dispatch+readback round trip carries a large fixed latency (~35 ms
   observed through the tunnel), so single-shot timings of sub-50ms kernels
   are meaningless. We therefore measure *differentially*: run the operation
   chained k_big times and k_small times inside one jitted call (with a data
   dependence so XLA cannot elide iterations) and divide the time difference
   by (k_big - k_small). Fixed overhead cancels exactly.

The reference measures GPU work the analogous way — whole-queue submission
with a mapped readback as the completion fence (/root/reference/src/main.rs
727, 774-789); there is no per-dispatch timing there either.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import numpy as np


def force_completion(out) -> None:
    """Block until `out` is truly materialized: tiny readback of each leaf.

    Reads 1 element per leaf array to host. This is the completion fence;
    see module docstring for why block_until_ready is insufficient.
    """
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))


def measure(fn: Callable[[], object], reps: int = 3, warmup: int = 1) -> float:
    """Wall-time fn() end to end (dispatch + compute + completion fence).

    Includes the fixed per-call round-trip latency; use measure_op for
    per-op costs of things faster than ~100 ms. Reports the MINIMUM over
    reps: device execution is deterministic, so spread across reps is
    transport/host noise (tunnel contention inflated averaged reps by up
    to ~7% run-to-run; the min is the stable estimator).
    """
    for _ in range(warmup):
        force_completion(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        force_completion(out)
        best = min(best, time.perf_counter() - t0)
    return best


def measure_chained(chain_fn: Callable[[int], Callable], k_small: int,
                    k_big: int, reps: int = 2) -> float:
    """Differential timing: seconds per single op, fixed overhead cancelled.

    Args:
      chain_fn: k -> zero-arg callable running the op k times *chained*
        (each iteration must consume the previous result, or XLA dedups).
      k_small, k_big: chain lengths; per-op = (t_big - t_small)/(k_big-k_small).
    """
    assert k_big > k_small >= 1
    f_small, f_big = chain_fn(k_small), chain_fn(k_big)
    t_small = measure(f_small, reps=reps)
    t_big = measure(f_big, reps=reps)
    return max((t_big - t_small) / (k_big - k_small), 0.0)
