"""Unit tests for the shared bitonic merge network (sort/merge.py)."""

import numpy as np
import jax.numpy as jnp

from tpu_qe.sort.merge import bitonic_merge_cols, merge_tree


def _np_key(hi, lo, rk):
    return (hi.astype(np.uint64) << np.uint64(42)) * 0 + (
        hi.astype(np.uint64) * np.uint64(1 << 21) ** 2
        + lo.astype(np.uint64) * np.uint64(1 << 21) + rk.astype(np.uint64))


def _make_run(rng, m, payloads=0):
    hi = rng.integers(0, 1 << 20, m, dtype=np.uint32)
    lo = rng.integers(0, 1 << 20, m, dtype=np.uint32)
    rk = rng.integers(0, 1 << 20, m, dtype=np.uint32)
    order = np.lexsort((rk, lo, hi))
    cols = [hi[order], lo[order], rk[order]]
    for p in range(payloads):
        cols.append(rng.integers(0, 1 << 31, m, dtype=np.uint32)[order])
    return cols


def test_merge_two_runs_matches_numpy():
    rng = np.random.default_rng(0)
    for m in (128, 1024, 4096):
        A = _make_run(rng, m)
        B = _make_run(rng, m)
        got = bitonic_merge_cols([jnp.asarray(c) for c in A],
                                 [jnp.asarray(c) for c in B])
        allc = [np.concatenate([a, b]) for a, b in zip(A, B)]
        order = np.lexsort((allc[2], allc[1], allc[0]))
        for g, w in zip(got, allc):
            np.testing.assert_array_equal(np.asarray(g), w[order])


def test_merge_carries_payloads():
    rng = np.random.default_rng(1)
    m = 512
    A = _make_run(rng, m, payloads=2)
    B = _make_run(rng, m, payloads=2)
    got = bitonic_merge_cols([jnp.asarray(c) for c in A],
                             [jnp.asarray(c) for c in B])
    allc = [np.concatenate([a, b]) for a, b in zip(A, B)]
    order = np.lexsort((allc[2], allc[1], allc[0]))
    # keys sorted; payloads permuted consistently (ranks unique w.h.p.
    # would be needed for exact payload match — compare via row tuples)
    rows_got = set(zip(*[np.asarray(g).tolist() for g in got]))
    rows_want = set(zip(*[c.tolist() for c in allc]))
    assert rows_got == rows_want
    np.testing.assert_array_equal(np.asarray(got[0]), allc[0][order])


def test_merge_tree_four_runs():
    rng = np.random.default_rng(2)
    runs = [_make_run(rng, 256) for _ in range(4)]
    got = merge_tree([[jnp.asarray(c) for c in r] for r in runs])
    allc = [np.concatenate([r[i] for r in runs]) for i in range(3)]
    order = np.lexsort((allc[2], allc[1], allc[0]))
    for g, w in zip(got, allc):
        np.testing.assert_array_equal(np.asarray(g), w[order])


def test_merge_tiny_runs():
    rng = np.random.default_rng(3)
    A = _make_run(rng, 8)
    B = _make_run(rng, 8)
    got = bitonic_merge_cols([jnp.asarray(c) for c in A],
                             [jnp.asarray(c) for c in B])
    allc = [np.concatenate([a, b]) for a, b in zip(A, B)]
    order = np.lexsort((allc[2], allc[1], allc[0]))
    for g, w in zip(got, allc):
        np.testing.assert_array_equal(np.asarray(g), w[order])
