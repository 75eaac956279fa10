"""Regenerable hash key generators (leaf module — no tpu_qe imports
besides bits, so the out-of-core family and the sort drivers can share
these without import cycles).

The property everything downstream leans on: any (key, payload) output
pair can be re-validated ANYWHERE as key == keygen_hash(payload) — which
is what lets the out-of-core engines verify billions of rows on device
without ever materializing an input array (see sort/bigsort.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tpu_qe.bits import U64


def murmur_fmix32(h):
    """murmur3 32-bit finalizer — a bijective avalanche mix on u32."""
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> jnp.uint32(16))
    return h


def keygen_hash(idx: jnp.ndarray, seed: int = 7) -> U64:
    """Regenerable pseudorandom u64 key for global row index idx (u32).

    Two independent murmur3 finalizer streams form (lo, hi): uniform
    enough for sort benchmarking, and re-validatable per row (module
    docstring).
    """
    s = jnp.uint32(seed)
    lo = murmur_fmix32(idx ^ (s * jnp.uint32(0x9E3779B9)))
    hi = murmur_fmix32(idx ^ (s * jnp.uint32(0x85EBCA77))
                       ^ jnp.uint32(0x5BD1E995))
    return U64(lo, hi)


def murmur_fmix32_numpy(h: np.ndarray) -> np.ndarray:
    """Numpy mirror of murmur_fmix32 (u32 in, u32 out) — the ONE copy
    every oracle derives from (device/oracle parity depends on these
    constants staying in lockstep)."""
    h = h.astype(np.uint32)
    h = h ^ (h >> np.uint32(16))
    h = (h * np.uint32(0x85EBCA6B)).astype(np.uint32)
    h = h ^ (h >> np.uint32(13))
    h = (h * np.uint32(0xC2B2AE35)).astype(np.uint32)
    return h ^ (h >> np.uint32(16))


def keygen_hash_numpy(idx: np.ndarray, seed: int = 7) -> np.ndarray:
    """Numpy mirror of keygen_hash (for oracle checks in tests)."""
    idx = idx.astype(np.uint32)
    c1 = np.uint32((seed * 0x9E3779B9) & 0xFFFFFFFF)
    c2 = np.uint32((seed * 0x85EBCA77) & 0xFFFFFFFF)
    lo = murmur_fmix32_numpy(idx ^ c1)
    hi = murmur_fmix32_numpy(idx ^ c2 ^ np.uint32(0x5BD1E995))
    return lo.astype(np.uint64) | (hi.astype(np.uint64) << np.uint64(32))
