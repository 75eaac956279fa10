"""Pallas extended-morton key construction (LUT path, VMEM-resident).

TPU-native replacement for the reference's morton kernel
(/root/reference/src/shaders/morton_code.wgsl:91-335): builds the 64-bit
extended morton key from quantized cell coordinates by OR-ing LUT entries
for 9 (axis, byte-level) groups plus the size bits.

The reference's LUT design exists because GPU shared-memory table lookups
are cheap; on TPU the analogous cheap primitive is the 128-lane dynamic
gather (`take_along_axis` along the minor axis), so each 256-entry LUT is
laid out as a (2, 128) tile: gather by the low 7 index bits, select by the
high bit. XLA's generic `jnp.take` gather runs at ~68 M elem/s on v5e —
this kernel replaces it with lane gathers at VPU rate.

The 4 size bits (size_bit_position(b) = 16*b, tpu_qe/cpp/core.cc) are
placed directly — a 4096-entry size LUT would need a 32-row table select,
and the direct placement is exact (validated against the LUT path and the
native builder in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_qe.bits import U64
from tpu_qe.constants import SIZE_BITS, SIZE_INDEX_BITS
from tpu_qe.kernels import use_interpret
from tpu_qe.morton import size_bit_position

LANES = 128


def _lookup(tab_ref, grp: int, byte: jnp.ndarray) -> jnp.ndarray:
    """256-entry LUT lookup as (2,128) lane-gather + high-bit select."""
    lo_rows = tab_ref[grp, 0, :]   # (128,) entries 0..127
    hi_rows = tab_ref[grp, 1, :]   # (128,) entries 128..255
    idx = (byte & jnp.uint32(0x7F)).astype(jnp.int32)
    r, c = byte.shape
    low = jnp.take_along_axis(
        jnp.broadcast_to(lo_rows[None, :], (r, c)), idx, axis=1)
    high = jnp.take_along_axis(
        jnp.broadcast_to(hi_rows[None, :], (r, c)), idx, axis=1)
    return jnp.where(byte >= jnp.uint32(128), high, low)


def _morton_kernel(qx_ref, qy_ref, qz_ref, j_ref, lut_lo_ref, lut_hi_ref,
                   lo_ref, hi_ref, *, byte_step: int = 8):
    q = (qx_ref[0], qy_ref[0], qz_ref[0])
    lo = jnp.zeros_like(q[0])
    hi = jnp.zeros_like(q[0])
    # 9 groups: axis + 3*level, byte = (coord >> byte_step*level) & 0xFF
    # (the reference's translate_coords_lut, morton_code.wgsl:42-46;
    # byte_step=8 resolves the :72-74 quirk, byte_step=3 is faithful to
    # the shipped kernel's i*3 shift)
    for level in range(3):
        for axis in range(3):
            byte = (q[axis] >> jnp.uint32(byte_step * level)) & jnp.uint32(0xFF)
            grp = axis + 3 * level
            lo = lo | _lookup(lut_lo_ref, grp, byte)
            hi = hi | _lookup(lut_hi_ref, grp, byte)
    # size bits, placed directly
    s = j_ref[0] >> jnp.uint32(SIZE_INDEX_BITS - SIZE_BITS)
    for b in range(SIZE_BITS):
        pos = size_bit_position(b)
        bit = (s >> jnp.uint32(b)) & jnp.uint32(1)
        if pos < 32:
            lo = lo | (bit << jnp.uint32(pos))
        else:
            hi = hi | (bit << jnp.uint32(pos - 32))
    lo_ref[0], hi_ref[0] = lo, hi


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret",
                                             "quirk_shift"))
def encode_quantized_lut(q: jnp.ndarray, j: jnp.ndarray,
                         lut_lo: jnp.ndarray, lut_hi: jnp.ndarray,
                         block_rows: int = 256,
                         interpret: bool | None = None,
                         quirk_shift: bool = False) -> U64:
    """Morton keys from quantized cells via VMEM LUT lane-gathers.

    Args:
      q: (n, 3) uint32 quantized cell coords, n a multiple of block_rows*128.
      j: (n,) uint32 size index.
      lut_lo/lut_hi: (9, 256) uint32 LUT words (MortonParams.lut_lo/hi).
    Returns U64 keys.
    """
    if interpret is None:
        interpret = use_interpret()
    n = q.shape[0]
    assert n % (8 * LANES) == 0, n
    block_rows = min(block_rows, n // LANES)
    while n % (block_rows * LANES):
        block_rows //= 2
    nb = n // (block_rows * LANES)

    def shape2(a):
        return a.reshape(nb, block_rows, LANES)

    data_spec = pl.BlockSpec((1, block_rows, LANES), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    lut_spec = pl.BlockSpec((9, 2, LANES), lambda b: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    lo, hi = pl.pallas_call(
        functools.partial(_morton_kernel,
                          byte_step=3 if quirk_shift else 8),
        grid=(nb,),
        in_specs=[data_spec] * 4 + [lut_spec] * 2,
        out_specs=(data_spec, data_spec),
        out_shape=(jax.ShapeDtypeStruct((nb, block_rows, LANES), jnp.uint32),
                   jax.ShapeDtypeStruct((nb, block_rows, LANES), jnp.uint32)),
        interpret=interpret,
    )(shape2(q[:, 0]), shape2(q[:, 1]), shape2(q[:, 2]), shape2(j),
      lut_lo.reshape(9, 2, LANES), lut_hi.reshape(9, 2, LANES))
    return U64(lo.reshape(n), hi.reshape(n))
