"""Pallas grid-sequential exclusive scan (the collapsed scan tree).

The reference needs THREE kernels and a level cascade for a device-wide
exclusive prefix sum (radix_sort_block_sum_large.wgsl parts 1+2 +
radix_sort_block_sum_small.wgsl, sized by calculate_num_items_prefix_buffers
at /root/reference/src/main.rs:200-233) because GPU workgroups cannot be
globally ordered. A TPU grid executes SEQUENTIALLY per core, so ONE kernel
scans the whole array: each grid step computes the in-block exclusive scan
in VMEM and carries the running total in SMEM scratch to the next step —
the structural simplification SURVEY.md §2b calls out.

Used for the flat digit-major histogram scan: one exclusive scan of the
(radix * num_blocks) table yields every (digit, block) global base offset.
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


def _cumsum_tile(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum over the flattened (rows, 128) tile, row-major."""
    rows = x.shape[0]
    # in-row inclusive scan via log-step roll+add
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    k = 1
    while k < LANES:
        rolled = pltpu.roll(x, k, 1)
        x = x + jnp.where(idx >= k, rolled, jnp.zeros_like(x))
        k *= 2
    # add exclusive row prefixes (cumsum of row totals)
    row_tot = x[:, LANES - 1:LANES]                      # (rows, 1)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    k = 1
    pref = row_tot
    while k < rows:
        rolled = pltpu.roll(pref, k, 0)
        pref = pref + jnp.where(ridx >= k, rolled, jnp.zeros_like(pref))
        k *= 2
    excl_row_pref = pref - row_tot                       # (rows, 1)
    return x + excl_row_pref


def _scan_kernel(x_ref, out_ref, carry_ref):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        carry_ref[0, 0] = jnp.uint32(0)

    inc = _cumsum_tile(x_ref[0])
    carry = carry_ref[0, 0]
    # exclusive output: inclusive - self + running carry
    out_ref[0] = inc - x_ref[0] + carry
    carry_ref[0, 0] = carry + inc[inc.shape[0] - 1, LANES - 1]


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def exclusive_scan(x: jnp.ndarray, block_rows: int = 64,
                   interpret: bool | None = None) -> jnp.ndarray:
    """Exclusive prefix sum of a flat uint32 array (one Pallas kernel).

    Args:
      x: (n,) uint32, n a multiple of 1024. Sums wrap mod 2^32 (same
        arithmetic as the reference's u32 scan).
    """
    if interpret is None:
        interpret = use_interpret()
    n = x.shape[0]
    assert n % (SUBLANES * LANES) == 0, n
    block_rows = min(block_rows, n // LANES)
    while n % (block_rows * LANES):
        block_rows //= 2
    nb = n // (block_rows * LANES)
    spec = pl.BlockSpec((1, block_rows, LANES), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _scan_kernel,
        grid=(nb,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((nb, block_rows, LANES), jnp.uint32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.uint32)],
        interpret=interpret,
    )(x.reshape(nb, block_rows, LANES))
    return out.reshape(n)
