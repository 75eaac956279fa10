"""Blocked two-level segmented scan (ops/segscan.py) vs the flat loop.

The blocked scan replaced the flat Hillis-Steele loops inside the join
forward-fill and the aggregate segmented reductions; these tests pin its
results to a plain numpy left fold (the ground truth both formulations
approximate associatively) across sizes that straddle the block
boundary, the small-n flat fallback, and non-multiple-of-block tails.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_qe.ops.segscan import scan_assoc
from tpu_qe.ops.aggregate import segmented_reduce, segmented_sum_u64

SIZES = [1, 2, 3, 255, 256, 257, 4096, 4097, 5000, 16384, 20000]


def _flags(rng, n, p=0.05):
    f = rng.random(n) < p
    f[0] = True
    return f


@pytest.mark.parametrize("n", SIZES)
def test_segmented_reduce_matches_numpy(n):
    rng = np.random.default_rng(n)
    vals = rng.integers(0, 1 << 31, n, dtype=np.int64).astype(np.int32)
    f = _flags(rng, n)
    for kind in ("min", "max", "sum"):
        out = np.asarray(segmented_reduce(
            jnp.asarray(vals), jnp.asarray(f), kind))
        want = np.empty(n, np.int64)
        for i in range(n):
            if f[i]:
                acc = int(vals[i])
            elif kind == "sum":
                acc = (acc + int(vals[i])) & 0xFFFFFFFF
                acc = acc - (1 << 32) if acc >= (1 << 31) else acc
            else:
                acc = (min if kind == "min" else max)(acc, int(vals[i]))
            want[i] = acc
        np.testing.assert_array_equal(out.astype(np.int64), want, err_msg=kind)


@pytest.mark.parametrize("n", SIZES)
def test_segmented_sum_u64_exact(n):
    rng = np.random.default_rng(100 + n)
    lo = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)
    hi = rng.integers(0, 4, n, dtype=np.uint64).astype(np.uint32)
    f = _flags(rng, n)
    olo, ohi = segmented_sum_u64(jnp.asarray(lo), jnp.asarray(hi),
                                 jnp.asarray(f))
    got = (np.asarray(ohi).astype(np.uint64) << np.uint64(32)) \
        | np.asarray(olo).astype(np.uint64)
    v64 = lo.astype(np.uint64) | (hi.astype(np.uint64) << np.uint64(32))
    want = np.empty(n, np.uint64)
    acc = np.uint64(0)
    for i in range(n):
        acc = v64[i] if f[i] else acc + v64[i]
        want[i] = acc
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n", [7, 4095, 4096, 4097, 12289])
@pytest.mark.parametrize("block", [64, 256, 1024])
def test_last_valid_fill_monoid(n, block):
    """The join's (s, f, v) last-valid forward-fill monoid, any block."""
    rng = np.random.default_rng(7 * n + block)
    s = _flags(rng, n, 0.1)
    fflag = rng.random(n) < 0.3
    v = rng.integers(0, 1 << 32, n, dtype=np.uint64).astype(np.uint32)

    def combine(a, b):
        sa, fa, va = a
        sb, fb, vb = b
        return (sa | sb, fb | (fa & ~sb), jnp.where(fb, vb, va))

    so, fo, vo = scan_assoc(
        combine, (False, False, 0),
        (jnp.asarray(s), jnp.asarray(fflag), jnp.asarray(v)), block=block)
    fo, vo = np.asarray(fo), np.asarray(vo)
    # ground truth: at row i, the last flagged value since the last
    # segment boundary at or before i (boundaries reset the fill)
    want_f = np.zeros(n, bool)
    want_v = np.zeros(n, np.uint32)
    have, val = False, np.uint32(0)
    for i in range(n):
        if s[i]:
            have, val = False, np.uint32(0)
        if fflag[i]:
            have, val = True, v[i]
        want_f[i] = have
        if have:
            want_v[i] = val
    np.testing.assert_array_equal(fo, want_f)
    np.testing.assert_array_equal(np.where(want_f, vo, 0),
                                  np.where(want_f, want_v, 0))


def test_float_segment_sum_error_stays_segment_proportional():
    """Blocked float sums: per-segment accuracy (the reason float sums
    use segmented_reduce instead of global cumsum differences)."""
    rng = np.random.default_rng(3)
    n = 20000
    f = np.zeros(n, bool)
    f[::97] = True
    f[0] = True
    vals = (rng.random(n) * 1e3).astype(np.float32)
    out = np.asarray(segmented_reduce(
        jnp.asarray(vals), jnp.asarray(f), "sum"))
    # segment ends = positions right before the next start (and n-1)
    starts = np.flatnonzero(f)
    ends = np.concatenate([starts[1:] - 1, [n - 1]])
    seg_sums = out[ends]
    want = [vals[a:b + 1].astype(np.float64).sum()
            for a, b in zip(starts, ends)]
    np.testing.assert_allclose(seg_sums, want, rtol=1e-5)
