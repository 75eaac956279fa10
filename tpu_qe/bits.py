"""64-bit keys as (lo, hi) uint32 pairs, and radix digit extraction.

TPU cores operate natively on 32-bit lanes, so u64 sort keys are carried as
two uint32 arrays — the same representation the reference uses on the GPU
(morton code buffers hold u64 as 2xu32, /root/reference/src/main.rs:60-74,
and digit extraction splits on the pair, radix_sort_histogram.wgsl:28-36).

All functions are jit-safe and shape-polymorphic.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np


class U64(NamedTuple):
    """A u64 array as (lo, hi) uint32 pair — a jax pytree."""

    lo: jnp.ndarray
    hi: jnp.ndarray

    @property
    def shape(self):
        return self.lo.shape

    @staticmethod
    def from_numpy(x: np.ndarray) -> "U64":
        x = np.asarray(x, dtype=np.uint64)
        return U64(
            jnp.asarray((x & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            jnp.asarray((x >> np.uint64(32)).astype(np.uint32)),
        )

    def to_numpy(self) -> np.ndarray:
        lo = np.asarray(self.lo).astype(np.uint64)
        hi = np.asarray(self.hi).astype(np.uint64)
        return lo | (hi << np.uint64(32))


def select_digit(lo: jnp.ndarray, hi: jnp.ndarray, shift: int,
                 bits: int) -> jnp.ndarray:
    """Extract `bits` key bits starting at `shift` (static) as uint32.

    Generalizes the reference's select_digit/select_digit_8
    (/root/reference/src/tests.rs:7-24) to any digit width/offset, handling
    digits that straddle the lo/hi word boundary.
    """
    assert 0 < bits <= 16 and 0 <= shift and shift + bits <= 64
    mask = jnp.uint32((1 << bits) - 1)
    if shift + bits <= 32:
        return (lo >> shift) & mask if shift else lo & mask
    if shift >= 32:
        s = shift - 32
        return (hi >> s) & mask if s else hi & mask
    # straddles the 32-bit boundary
    lo_part = lo >> shift
    hi_part = hi << (32 - shift)
    return (lo_part | hi_part) & mask


def digit_schedule(key_bits: int, bits_per_pass: int) -> list[tuple[int, int]]:
    """LSD pass schedule: list of (shift, bits) covering `key_bits` bits."""
    out = []
    shift = 0
    while shift < key_bits:
        bits = min(bits_per_pass, key_bits - shift)
        out.append((shift, bits))
        shift += bits
    return out


def masked_key(lo: jnp.ndarray, hi: jnp.ndarray, key_bits: int) -> U64:
    """Zero all bits above `key_bits` — the reference's select_bits mask used
    by its sortedness verifier (/root/reference/src/main.rs:1042-1051)."""
    if key_bits >= 64:
        return U64(lo, hi)
    if key_bits <= 32:
        m = jnp.uint32((1 << key_bits) - 1) if key_bits < 32 else jnp.uint32(0xFFFFFFFF)
        return U64(lo & m, jnp.zeros_like(hi))
    m = jnp.uint32((1 << (key_bits - 32)) - 1)
    return U64(lo, hi & m)


def is_sorted_u64(lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """Non-decreasing check on u64 pairs (jit-safe, returns scalar bool)."""
    if lo.shape[0] < 2:
        return jnp.bool_(True)
    hi_prev, hi_next = hi[:-1], hi[1:]
    lo_prev, lo_next = lo[:-1], lo[1:]
    ok = (hi_prev < hi_next) | ((hi_prev == hi_next) & (lo_prev <= lo_next))
    return jnp.all(ok)


def pack_columns(cols: Sequence[jnp.ndarray]) -> list[jnp.ndarray]:
    """Normalize payload columns to uint32 bit patterns for sorting."""
    out = []
    for c in cols:
        if c.dtype == jnp.float32:
            out.append(jnp.asarray(c).view(jnp.uint32))
        elif c.dtype in (jnp.uint32, jnp.int32):
            out.append(c.view(jnp.uint32) if c.dtype == jnp.int32 else c)
        else:
            raise TypeError(f"unsupported payload dtype {c.dtype}")
    return out
