"""Per-block digit histogram + stable local rank (Pallas TPU kernels).

TPU-native replacement for two reference GPU kernels:

- ``radix_sort_compute_histogram`` (radix_sort_histogram.wgsl:38-59):
  shared-memory atomicAdd histogram, written digit-major
  (``hist[num_blocks * d + b]``) so ONE flat exclusive scan of the whole
  buffer yields every (digit, block) global base offset. We keep the
  digit-major convention — it is exactly as good an idea on TPU — but build
  the histogram without atomics, as a reduction over the one-hot digit
  expansion walked in 8x128 register tiles.

- the ballot-based stable rank in ``radix_sort_index``
  (radix_sort_index.wgsl:185-252): 8 rounds of emulated __ballot + popcount.
  On TPU the stable rank among equal digits is an exclusive cumulative sum
  over the one-hot digit matrix — no ballots, no barriers, no atomics.

Layout: a block of B keys is a (B//128, 128) u32 tile pair; linear element
order is row-major, so in-row exclusive cumsums plus row-prefix offsets give
ranks in input order (stability).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_qe.kernels import use_interpret

LANES = 128
SUBLANES = 8


def _extract_digit(lo: jnp.ndarray, hi: jnp.ndarray, shift: int,
                   bits: int) -> jnp.ndarray:
    """Digit from (lo, hi) u32 key words — delegates to the single
    implementation in tpu_qe.bits (pure jnp, Pallas-safe), so kernel digits
    can never drift from driver digits."""
    from tpu_qe.bits import select_digit
    return select_digit(lo, hi, shift, bits)


def _cumsum(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Inclusive cumulative sum via log-step shifted adds (Hillis-Steele).

    Mosaic has no native cumsum primitive; this is the vectorized scan the
    reference builds out of shared-memory Blelloch passes
    (radix_sort_block_sum_large.wgsl:47-144), collapsed to log2(n) roll+add
    steps on VREG tiles.
    """
    n = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    k = 1
    while k < n:
        rolled = pltpu.roll(x, k, axis)
        x = x + jnp.where(idx >= k, rolled, jnp.zeros_like(x))
        k *= 2
    return x


def _hist_kernel(lo_ref, hi_ref, hist_ref, *, shift: int, bits: int):
    b = pl.program_id(0)
    rows = lo_ref.shape[1]
    radix = 1 << bits
    n_tiles = rows // SUBLANES
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES, radix), 2)

    def body(t, carry):
        lo = lo_ref[0, pl.ds(t * SUBLANES, SUBLANES), :]
        hi = hi_ref[0, pl.ds(t * SUBLANES, SUBLANES), :]
        d = _extract_digit(lo, hi, shift, bits).astype(jnp.int32)
        oh = (d[:, :, None] == iota_r).astype(jnp.float32)
        return carry + jnp.sum(oh, axis=(0, 1), keepdims=True)[0]

    totals = jax.lax.fori_loop(
        0, n_tiles, body, jnp.zeros((1, radix), dtype=jnp.float32))
    hist_ref[pl.ds(b, 1), :] = totals.astype(jnp.int32).astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("shift", "bits", "interpret"))
def block_histogram(lo: jnp.ndarray, hi: jnp.ndarray, shift: int, bits: int,
                    interpret: bool | None = None) -> jnp.ndarray:
    """Digit-major per-block histogram.

    Args:
      lo, hi: (nb, B) uint32 key halves, B a multiple of 1024 (pad inputs
        with all-ones sentinel keys).
      shift, bits: digit position within the 64-bit key (static).
    Returns:
      (radix, nb) uint32 — digit-major layout, matching
      tpu_qe.native.digit_major_histogram.
    """
    if interpret is None:
        interpret = use_interpret()
    nb, block = lo.shape
    assert block % (SUBLANES * LANES) == 0, block
    # per-(block, digit) counts accumulate in float32 inside the kernel;
    # exactness requires counts < 2^24 (a skewed block could put every
    # element in one digit) — reject silently-inexact block sizes
    assert block < (1 << 24), f"block {block} would overflow f32 counts"
    rows = block // LANES
    radix = 1 << bits
    lo3 = lo.reshape(nb, rows, LANES)
    hi3 = hi.reshape(nb, rows, LANES)
    hist = pl.pallas_call(
        functools.partial(_hist_kernel, shift=shift, bits=bits),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, rows, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # Accumulator layout: the whole (nb, radix) table stays resident in
        # VMEM; step b fills row b.
        out_specs=pl.BlockSpec((nb, radix), lambda b: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, radix), jnp.uint32),
        interpret=interpret,
    )(lo3, hi3)
    return hist.T


def _rank_kernel(lo_ref, hi_ref, rank_ref, hist_ref, *, shift: int,
                 bits: int):
    """Stable local rank + histogram for one block.

    Walks the block in 8x128 register tiles; a running per-digit count
    carries across tiles (the TPU-sequential analogue of the reference's
    chained scan, radix_sort_block_sum_small.wgsl:60-76).
    """
    b = pl.program_id(0)
    rows = lo_ref.shape[1]
    radix = 1 << bits
    n_tiles = rows // SUBLANES
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES, radix), 2)

    def body(t, carry):
        # carry: (1, 1, radix) f32 — digit totals of previous tiles
        lo = lo_ref[0, pl.ds(t * SUBLANES, SUBLANES), :]
        hi = hi_ref[0, pl.ds(t * SUBLANES, SUBLANES), :]
        d = _extract_digit(lo, hi, shift, bits).astype(jnp.int32)
        oh = (d[:, :, None] == iota_r).astype(jnp.float32)
        # exclusive count within each row (lane order), then add row prefixes
        # so counts follow linear (row-major) element order.
        excl = _cumsum(oh, axis=1) - oh
        row_tot = jnp.sum(oh, axis=1, keepdims=True)       # (8, 1, radix)
        row_pref = _cumsum(row_tot, axis=0) - row_tot      # (8, 1, radix)
        total = excl + row_pref + carry
        rank = jnp.sum(total * oh, axis=2).astype(jnp.int32).astype(jnp.uint32)
        rank_ref[0, pl.ds(t * SUBLANES, SUBLANES), :] = rank
        return carry + jnp.sum(row_tot, axis=0, keepdims=True)

    totals = jax.lax.fori_loop(
        0, n_tiles, body, jnp.zeros((1, 1, radix), dtype=jnp.float32))
    hist_ref[pl.ds(b, 1), :] = totals[0].astype(jnp.int32).astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("shift", "bits", "interpret"))
def block_rank_and_histogram(lo: jnp.ndarray, hi: jnp.ndarray, shift: int,
                             bits: int, interpret: bool | None = None):
    """Stable local ranks within each block plus digit-major histograms.

    Args:
      lo, hi: (nb, B) uint32 key halves, B a multiple of 1024.
    Returns:
      ranks (nb, B) uint32 — occurrence index among equal digits in-block
      hist (radix, nb) uint32 — digit-major histogram
    """
    if interpret is None:
        interpret = use_interpret()
    nb, block = lo.shape
    assert block % (SUBLANES * LANES) == 0, block
    assert block < (1 << 24), f"block {block} would overflow f32 counts"
    rows = block // LANES
    radix = 1 << bits
    lo3 = lo.reshape(nb, rows, LANES)
    hi3 = hi.reshape(nb, rows, LANES)
    ranks, hist = pl.pallas_call(
        functools.partial(_rank_kernel, shift=shift, bits=bits),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, rows, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, rows, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, radix), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nb, rows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((nb, radix), jnp.uint32),
        ),
        interpret=interpret,
    )(lo3, hi3)
    return ranks.reshape(nb, block), hist.T
