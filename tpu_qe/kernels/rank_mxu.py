"""MXU-accelerated stable block rank + digit-major histogram.

The one-hot-cumsum rank kernel (kernels/histogram.py) walks a 256-wide
one-hot expansion on the VPU — ~256 vector ops per element. This variant
moves the counting onto the MXU (the reference's ballot-popcount loop,
radix_sort_index.wgsl:185-252, becomes a handful of small matmuls):

per 128-lane row, with digit d split into hi/lo nibbles (one-hot OH_hi,
OH_lo — 0/1 values, exact in bf16; counts <= block < 2^24, exact in f32):

  SAME   = (OH_hi @ OH_hi^T) * (OH_lo @ OH_lo^T)   SAME[i,j] = [d_i == d_j]
  rank_i = sum_{j<i} SAME[i,j]                     within-row stable rank
  H      = OH_hi^T @ OH_lo                         row histogram as a
                                                   (16,16) nibble matrix
  base   = rowsum( (OH_hi @ EXCL) * OH_lo )        EXCL = running exclusive
                                                   prefix of H over rows —
                                                   a dual matmul replaces
                                                   the 256-entry lookup

Histograms stay in (16,16) nibble-matrix layout inside the kernel (Mosaic
cannot shape-cast 16x16 -> 256 minor dims); the (nb, 16, 16) output is
reshaped to the digit-major (256, nb) layout outside, where XLA reshapes
are free. Output matches kernels/histogram.py::block_rank_and_histogram
bit-for-bit.

MEASURED RESULT (v5e, 16M elements, honest chained timing): 561 M elem/s —
SLOWER than the VPU one-hot-cumsum kernel (823 M elem/s). The 128x16
nibble matmuls use ~1/8 of the systolic array per dimension, and the
triangular-masked reduction of the (128,128) SAME matrix still costs ~128
VPU ops/element, so the MXU never becomes the bottleneck reliever. Kept as
a tested alternative implementation and a worked example of moving radix
counting onto the MXU; the engine default remains the VPU kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_qe.kernels import use_interpret
from tpu_qe.kernels.histogram import _extract_digit

LANES = 128
NIB = 16
G = 8  # row-group size: bounds the (G,128,128) SAME tensor to 512 KB


def _rank_kernel(lo_ref, hi_ref, rank_ref, hist_ref, *, shift: int):
    b = pl.program_id(0)
    rows = lo_ref.shape[1]

    i_idx = jax.lax.broadcasted_iota(jnp.int32, (G, LANES, LANES), 1)
    j_idx = jax.lax.broadcasted_iota(jnp.int32, (G, LANES, LANES), 2)
    tri = (j_idx < i_idx).astype(jnp.float32)
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (G, LANES, NIB), 2)
    dn_nib = (((2,), (2,)), ((0,), (0,)))   # contract nibbles, batch rows
    dn_lane = (((1,), (1,)), ((0,), (0,)))  # contract lanes, batch rows
    dn_mix = (((2,), (1,)), ((0,), (0,)))   # OH_hi (G,128,16h) @ EXCL (G,16h,16l)

    def group(g, carry):
        # carry: (1, 16, 16) f32 — digit totals of all previous rows
        lo_g = lo_ref[0, pl.ds(g * G, G), :]
        hi_g = hi_ref[0, pl.ds(g * G, G), :]
        dg = _extract_digit(lo_g, hi_g, shift, 8).astype(jnp.int32)
        oh_hi = ((dg >> 4)[:, :, None] == iota_n).astype(jnp.bfloat16)
        oh_lo = ((dg & 15)[:, :, None] == iota_n).astype(jnp.bfloat16)

        same = (jax.lax.dot_general(oh_hi, oh_hi, dimension_numbers=dn_nib,
                                    preferred_element_type=jnp.float32)
                * jax.lax.dot_general(oh_lo, oh_lo, dimension_numbers=dn_nib,
                                      preferred_element_type=jnp.float32))
        rank_in_row = jnp.sum(same * tri, axis=2)            # (G, 128)

        h = jax.lax.dot_general(oh_hi, oh_lo, dimension_numbers=dn_lane,
                                preferred_element_type=jnp.float32)
        # within-group exclusive prefix over the G rows (unrolled: G=8)
        excl_rows = [carry[0]]
        for k in range(1, G):
            excl_rows.append(excl_rows[-1] + h[k - 1])
        excl = jnp.stack(excl_rows, axis=0)                  # (G, 16, 16)

        # base[e] = EXCL[row, d_hi[e], d_lo[e]] via dual matmul. EXCL holds
        # prefix COUNTS (up to the block size): it must stay f32 — a bf16
        # cast is exact only up to 256 and silently corrupted ranks for
        # skewed digit distributions (f32 matmul on the MXU is exact for
        # counts < 2^24, enforced by the block-size assert).
        t1 = jax.lax.dot_general(
            oh_hi.astype(jnp.float32), excl, dimension_numbers=dn_mix,
            preferred_element_type=jnp.float32)              # (G, 128, 16l)
        base = jnp.sum(t1 * oh_lo.astype(jnp.float32), axis=2)

        rank_ref[0, pl.ds(g * G, G), :] = (
            (rank_in_row + base).astype(jnp.int32).astype(jnp.uint32))
        return carry + jnp.sum(h, axis=0, keepdims=True)

    totals = jax.lax.fori_loop(
        0, rows // G, group, jnp.zeros((1, NIB, NIB), jnp.float32))
    hist_ref[pl.ds(b, 1), :, :] = totals.astype(jnp.int32).astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("shift", "interpret"))
def block_rank_and_histogram_mxu(lo: jnp.ndarray, hi: jnp.ndarray,
                                 shift: int,
                                 interpret: bool | None = None):
    """MXU variant of block_rank_and_histogram (8-bit digits only).

    Args/returns identical to kernels.histogram.block_rank_and_histogram
    with bits=8: lo/hi (nb, B) uint32 -> (ranks (nb, B), hist (256, nb)).
    """
    if interpret is None:
        interpret = use_interpret()
    nb, block = lo.shape
    assert block % 1024 == 0, block
    assert block < (1 << 24), block  # f32-exact counts
    rows = block // LANES
    lo3 = lo.reshape(nb, rows, LANES)
    hi3 = hi.reshape(nb, rows, LANES)
    spec = pl.BlockSpec((1, rows, LANES), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    ranks, hist = pl.pallas_call(
        functools.partial(_rank_kernel, shift=shift),
        grid=(nb,),
        in_specs=[spec, spec],
        out_specs=(spec,
                   pl.BlockSpec((nb, NIB, NIB), lambda b: (0, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((nb, rows, LANES), jnp.uint32),
                   jax.ShapeDtypeStruct((nb, NIB, NIB), jnp.uint32)),
        interpret=interpret,
    )(lo3, hi3)
    # (nb, 16hi, 16lo) -> digit-major (256, nb); digit = 16*hi + lo
    return ranks.reshape(nb, block), hist.reshape(nb, 256).T


# expose the digit-major (16,16)->256 convention for tests
def nibble_hist_to_digit_major(hist_nib: jnp.ndarray) -> jnp.ndarray:
    return hist_nib.reshape(hist_nib.shape[0], 256).T
