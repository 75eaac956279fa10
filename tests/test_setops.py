"""Set operations vs numpy set algebra (ops/setops.py)."""

import numpy as np
import pytest

from tpu_qe.bits import U64
from tpu_qe.ops.setops import set_op


def _u64(x):
    x = x.astype(np.uint64)
    return U64(x.astype(np.uint32), (x >> np.uint64(32)).astype(np.uint32))


def _got(res):
    keys, ca, cb, num = res
    m = int(num)
    k = keys.to_numpy()[:m]
    return k, np.asarray(ca)[:m], np.asarray(cb)[:m]


def _oracle(a, b, op):
    ua, ub = np.unique(a), np.unique(b)
    if op == "union":
        return np.union1d(ua, ub)
    if op == "intersect":
        return np.intersect1d(ua, ub)
    return np.setdiff1d(ua, ub)


@pytest.mark.parametrize("op", ["union", "intersect", "except"])
@pytest.mark.parametrize("trial", range(4))
def test_matches_numpy(op, trial):
    rng = np.random.default_rng(trial * 7 + len(op))
    n_a = int(rng.integers(1, 4000))
    n_b = int(rng.integers(1, 4000))
    # overlapping narrow key space with duplicates
    a = rng.integers(0, 300, n_a, dtype=np.uint64) << np.uint64(30)
    b = rng.integers(100, 400, n_b, dtype=np.uint64) << np.uint64(30)
    k, ca, cb = _got(set_op(_u64(a), _u64(b), op))
    np.testing.assert_array_equal(k, _oracle(a, b, op), err_msg=op)
    # multiplicities exact (ALL-semantics handle)
    for kk, xa, xb in zip(k, ca, cb):
        assert xa == (a == kk).sum() and xb == (b == kk).sum()


def test_disjoint_and_identical():
    a = np.arange(100, dtype=np.uint64)
    b = np.arange(100, 200, dtype=np.uint64)
    k, _, _ = _got(set_op(_u64(a), _u64(b), "intersect"))
    assert len(k) == 0
    k, _, _ = _got(set_op(_u64(a), _u64(a), "except"))
    assert len(k) == 0
    k, _, _ = _got(set_op(_u64(a), _u64(a), "union"))
    np.testing.assert_array_equal(k, a)


def test_all_semantics_via_counts():
    a = np.array([5, 5, 5, 9, 2], dtype=np.uint64)
    b = np.array([5, 9, 9, 9], dtype=np.uint64)
    k, ca, cb = _got(set_op(_u64(a), _u64(b), "intersect"))
    mult = np.minimum(ca, cb)          # INTERSECT ALL multiplicities
    want = {5: 1, 9: 1}
    assert {int(x): int(m) for x, m in zip(k, mult)} == want
    k, ca, cb = _got(set_op(_u64(a), _u64(b), "union"))
    exc = np.maximum(ca.astype(np.int64) - cb.astype(np.int64), 0)
    assert {int(x): int(m) for x, m in zip(k, exc)} == {2: 1, 5: 2, 9: 0}


def test_validation():
    a = _u64(np.zeros(4, np.uint64))
    with pytest.raises(ValueError, match="op must be"):
        set_op(a, a, "minus")


@pytest.mark.parametrize("op", ["union", "intersect", "except"])
@pytest.mark.parametrize("n_dev", [1, 4, 8])
def test_distributed_matches_numpy(op, n_dev):
    from tpu_qe.exchange import make_mesh
    from tpu_qe.exchange.dops import distributed_set_op_numpy

    mesh = make_mesh(n_dev)
    rng = np.random.default_rng(n_dev + len(op))
    n_a = 512 * n_dev
    n_b = 256 * n_dev
    a = rng.integers(0, 200, n_a, dtype=np.uint64) << np.uint64(33)
    b = rng.integers(100, 300, n_b, dtype=np.uint64) << np.uint64(33)
    k, ca, cb = distributed_set_op_numpy(a, b, mesh, op=op,
                                         capacity_factor=float(n_dev))
    np.testing.assert_array_equal(k, _oracle(a, b, op), err_msg=op)
    for kk, xa, xb in zip(k, ca, cb):
        assert xa == (a == kk).sum() and xb == (b == kk).sum()


def test_distributed_hot_key():
    from tpu_qe.exchange import make_mesh
    from tpu_qe.exchange.dops import distributed_set_op_numpy

    mesh = make_mesh(8)
    n = 1 << 12
    a = np.full(n, 7, dtype=np.uint64)        # one hot key everywhere
    b = np.full(n // 2, 7, dtype=np.uint64)
    b[: n // 4] = 9
    k, ca, cb = distributed_set_op_numpy(a, b, mesh, op="intersect",
                                         capacity_factor=8.0)
    np.testing.assert_array_equal(k, [7])
    assert ca[0] == n and cb[0] == n // 4


def test_table_api():
    from tpu_qe.table import Table
    a = Table.from_numpy({"key": np.array([1, 2, 2, 3], np.uint64)})
    b = Table.from_numpy({"key": np.array([2, 4], np.uint64)})
    keys, ca, cb, num = a.set_op(b, "union")
    assert list(keys.to_numpy()[: int(num)]) == [1, 2, 3, 4]
