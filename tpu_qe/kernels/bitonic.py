"""Pallas VMEM bitonic chunk sort (u64 keys as u32 pairs + u32 payloads).

A fully vectorized sorting network over VMEM-resident chunks: every
compare-exchange stage is whole-tile `pltpu.roll` + compare + select — no
gathers, no scatters, no scalar loops. This is the TPU-native replacement
for the reference's per-workgroup shared-memory sort machinery (the
histogram/ballot-rank/scatter trio of radix_sort_index.wgsl operates on
256-element workgroups; here a "workgroup" is a VMEM chunk of 8K+ lanes).

Role in the engine: local run formation — sorted runs for merge/sample-sort
style distribution — and as the measured VPU envelope for sorting on this
hardware. Measured on v5e at 64M u64+payload elements in 8192-element
chunks: 87 ms (770 M elem/s), statistically tied with XLA's own batched
`lax.sort` (95 ms). That equality is evidence both are compute-bound at the
VPU's ~1e12 simple-ops/s envelope; see BASELINE.md "single-chip sort
analysis".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_qe.kernels import use_interpret

LANES = 128


def _stage(planes, stride: int, block: int, rows: int):
    """One bitonic compare-exchange stage on (rows, 128) u32 planes.

    planes[0:2] = (lo, hi) key words; the rest are payloads. Partner index
    = idx ^ stride; ascending/descending region from idx & block.
    """
    lo, hi = planes[0], planes[1]
    ridx = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    idx = ridx * LANES + cidx
    up = (idx & block) == 0
    is_low = (idx & stride) == 0
    if stride < LANES:
        ax, s, size = 1, stride, LANES
    else:
        ax, s, size = 0, stride // LANES, rows

    def partner(x):
        # partner of the low element is at +stride (circular roll by -s ==
        # roll by size-s); of the high element at -stride.
        fwd = pltpu.roll(x, size - s, ax)
        bwd = pltpu.roll(x, s, ax)
        return jnp.where(is_low, fwd, bwd)

    q = [partner(x) for x in planes]
    qlo, qhi = q[0], q[1]
    # Swap predicates in int32: Mosaic cannot select between bool vectors.
    # Low element swaps iff me > partner; high iff partner > me (ties never
    # swap — keeps the network stable-friendly); descending regions flip
    # the predicate via XOR.
    gt_mp = ((hi > qhi) | ((hi == qhi) & (lo > qlo))).astype(jnp.int32)
    gt_pm = ((qhi > hi) | ((qhi == hi) & (qlo > lo))).astype(jnp.int32)
    swap = jnp.where(is_low, gt_mp, gt_pm)
    take_partner = (swap ^ (1 - up.astype(jnp.int32))) == 1
    return [jnp.where(take_partner, qx, x) for x, qx in zip(planes, q)]


def _sort_kernel(*refs, rows: int, n_planes: int):
    in_refs, out_refs = refs[:n_planes], refs[n_planes:]
    planes = [r[0] for r in in_refs]
    n = rows * LANES
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            planes = _stage(planes, j, k, rows)
            j //= 2
        k *= 2
    for r, x in zip(out_refs, planes):
        r[0] = x


@functools.partial(jax.jit, static_argnames=("rows", "interpret"))
def sort_chunks(lo: jnp.ndarray, hi: jnp.ndarray, *payloads: jnp.ndarray,
                rows: int = 64, interpret: bool | None = None):
    """Sort each chunk of `rows*128` elements by the u64 (hi, lo) key.

    Args:
      lo, hi, payloads: (nb, rows*128) uint32. Pad the tail chunk with
        all-ones keys (they sort last).
    Returns:
      tuple of (nb, rows*128) arrays, chunk-wise sorted. NOTE: bitonic
      networks are not stable; for stable semantics fold a uniqueness
      tiebreak (e.g. original index) into unused key bits or payload order.
    """
    if interpret is None:
        interpret = use_interpret()
    nb, width = lo.shape
    assert width == rows * LANES, (width, rows)
    # the k/j stage schedule implements a correct network only for
    # power-of-two chunk lengths; anything else would return silently
    # unsorted data
    assert width & (width - 1) == 0, f"chunk length must be a power of two, got {width}"
    planes = [lo, hi, *payloads]
    n_planes = len(planes)
    spec = pl.BlockSpec((1, rows, LANES), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_sort_kernel, rows=rows, n_planes=n_planes),
        grid=(nb,),
        in_specs=[spec] * n_planes,
        out_specs=tuple([spec] * n_planes),
        out_shape=tuple(jax.ShapeDtypeStruct((nb, rows, LANES), jnp.uint32)
                        for _ in range(n_planes)),
        interpret=interpret,
    )(*[p.reshape(nb, rows, LANES) for p in planes])
    return tuple(o.reshape(nb, width) for o in out)
