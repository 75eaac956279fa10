"""Top-k operator tests (ops/topk.py)."""

import numpy as np
import pytest

from tpu_qe.ops import top_k
from tpu_qe.table import Table


def _oracle(keys, vals, k, largest):
    order = np.argsort(keys, kind="stable")
    if largest:
        # stable largest-first: sort by key desc, ties by original index asc
        order = np.lexsort((np.arange(len(keys)), ~keys))
    return keys[order[:k]], vals[order[:k]]


@pytest.mark.parametrize("largest", [False, True])
@pytest.mark.parametrize("k", [1, 7, 100])
def test_matches_stable_sort_head(largest, k):
    rng = np.random.default_rng(k + largest)
    n = 1 << 14
    keys = rng.integers(0, 1 << 64, n, dtype=np.uint64)
    vals = np.arange(n, dtype=np.uint32)
    t = Table.from_numpy({"key": keys, "v": vals})
    res = top_k(t, k, largest=largest)
    wk, wv = _oracle(keys, vals, k, largest)
    out = res.table.to_numpy()
    np.testing.assert_array_equal(out["key"], wk)
    np.testing.assert_array_equal(out["v"], wv)


def test_duplicates_at_boundary_stable():
    # many duplicates straddling rank k: ties must break by row order
    keys = np.array([5, 3, 5, 3, 3, 5, 1, 3], dtype=np.uint64)
    vals = np.arange(8, dtype=np.uint32)
    t = Table.from_numpy({"key": keys, "v": vals})
    res = top_k(t, 4)
    out = res.table.to_numpy()
    np.testing.assert_array_equal(out["key"], [1, 3, 3, 3])
    np.testing.assert_array_equal(out["v"], [6, 1, 3, 4])


def test_all_equal_keys_exact_stable():
    n = 1 << 13
    keys = np.full(n, 42, dtype=np.uint64)
    vals = np.arange(n, dtype=np.uint32)
    t = Table.from_numpy({"key": keys, "v": vals})
    res = top_k(t, 10)
    out = res.table.to_numpy()
    np.testing.assert_array_equal(out["v"], np.arange(10))


def test_spread_keys():
    rng = np.random.default_rng(0)
    n = 1 << 15
    keys = rng.permutation(n).astype(np.uint64) * np.uint64(12345)
    t = Table.from_numpy({"key": keys,
                          "v": np.arange(n, dtype=np.uint32)})
    res = top_k(t, 16)
    out = res.table.to_numpy()
    order = np.argsort(keys, kind="stable")[:16]
    np.testing.assert_array_equal(out["v"], order.astype(np.uint32))


def test_k_equals_n_and_invalid_k():
    keys = np.array([9, 2, 7], dtype=np.uint64)
    t = Table.from_numpy({"key": keys})
    res = top_k(t, 3)
    np.testing.assert_array_equal(res.table.to_numpy()["key"], [2, 7, 9])
    with pytest.raises(ValueError):
        top_k(t, 0)
    with pytest.raises(ValueError):
        top_k(t, 4)


def test_u64_value_columns_and_table_method():
    rng = np.random.default_rng(5)
    n = 4096
    keys = rng.integers(0, 1 << 40, n, dtype=np.uint64)
    big = rng.integers(0, 1 << 60, n, dtype=np.uint64)
    t = Table.from_numpy({"key": keys, "big": big})
    res = t.top_k(5, largest=True)
    out = res.table.to_numpy()
    order = np.lexsort((np.arange(n), ~keys))[:5]
    np.testing.assert_array_equal(out["key"], keys[order])
    np.testing.assert_array_equal(out["big"], big[order])


def test_fuzz_vs_oracle():
    rng = np.random.default_rng(77)
    for trial in range(6):
        n = int(rng.integers(64, 5000))
        dup = int(rng.integers(2, 1 + n))
        keys = rng.integers(0, dup, n).astype(np.uint64)
        vals = np.arange(n, dtype=np.uint32)
        k = int(rng.integers(1, n + 1))
        largest = bool(rng.integers(0, 2))
        t = Table.from_numpy({"key": keys, "v": vals})
        res = top_k(t, k, largest=largest)
        wk, wv = _oracle(keys, vals, k, largest)
        out = res.table.to_numpy()
        np.testing.assert_array_equal(out["key"], wk, err_msg=str(trial))
        np.testing.assert_array_equal(out["v"], wv, err_msg=str(trial))
