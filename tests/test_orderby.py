"""Multi-column ORDER BY vs a numpy lexsort oracle (ops/orderby.py)."""

import numpy as np
import pytest

from tpu_qe.bits import U64
from tpu_qe.ops.orderby import canon_by, sort_by_multi
from tpu_qe.table import Table


def _np_sortable(col):
    """Independent numpy formulation of the order-preserving u32 bits."""
    if col.dtype == np.float32:
        b = col.view(np.uint32)
        return np.where(b >> 31 == 1, ~b, b | np.uint32(0x80000000))
    if col.dtype == np.int32:
        return col.view(np.uint32) ^ np.uint32(0x80000000)
    return col


def _oracle_perm(cols_np, spec):
    """Stable permutation: np.lexsort over transformed planes, minor
    key first (lexsort's convention), position implicit via stability."""
    planes = []
    for name, desc in spec:
        c = cols_np[name]
        if c.dtype == np.uint64:
            sub = [(c >> np.uint64(32)).astype(np.uint32),
                   c.astype(np.uint32)]
        else:
            sub = [_np_sortable(c)]
        planes += [~p if desc else p for p in sub]
    return np.lexsort(list(reversed(planes)))  # lexsort is stable


def _check(cols_np, by):
    t = Table.from_numpy(cols_np)
    got = sort_by_multi(t, by).to_numpy()
    perm = _oracle_perm(cols_np, canon_by(by))
    for nm, c in cols_np.items():
        np.testing.assert_array_equal(got[nm], c[perm], err_msg=nm)


def test_two_keys_mixed_direction():
    rng = np.random.default_rng(0)
    n = 4000
    cols = {
        "a": rng.integers(0, 10, n).astype(np.uint64) << np.uint64(40),
        "b": rng.integers(-50, 50, n, dtype=np.int64).astype(np.int32),
        "pay": np.arange(n, dtype=np.uint32),
    }
    _check(cols, [("a", "desc"), "b"])
    _check(cols, ["a", ("b", "desc")])
    _check(cols, [("b", "desc"), ("a", "desc")])


def test_float_keys_and_payload_types():
    rng = np.random.default_rng(1)
    n = 2000
    cols = {
        "f": rng.standard_normal(n).astype(np.float32),
        "g": rng.integers(0, 4, n).astype(np.uint64),
        "fp": rng.standard_normal(n).astype(np.float32),  # float payload
        "up": rng.integers(0, 1 << 32, n, dtype=np.uint64),  # u64 payload
    }
    cols["f"][:20] = 0.0
    cols["f"][20:40] = -0.0  # -0.0 sorts before +0.0 (bit order)
    cols["f"][40:50] = np.inf
    cols["f"][50:60] = -np.inf
    _check(cols, [("g", "asc"), ("f", "desc")])
    _check(cols, ["f"])


def test_stability_three_keys():
    rng = np.random.default_rng(2)
    n = 3000
    cols = {
        "a": rng.integers(0, 3, n).astype(np.uint64),
        "b": rng.integers(0, 3, n, dtype=np.int64).astype(np.uint32),
        "c": rng.integers(0, 3, n, dtype=np.int64).astype(np.int32),
        "i": np.arange(n, dtype=np.uint32),
    }
    _check(cols, ["a", ("b", "desc"), "c"])
    # ties on all three keys must preserve input order exactly
    got = sort_by_multi(Table.from_numpy(cols),
                        ["a", ("b", "desc"), "c"]).to_numpy()
    keys = list(zip(got["a"], got["b"], got["c"]))
    for i in range(1, n):
        if keys[i] == keys[i - 1]:
            assert got["i"][i] > got["i"][i - 1]


def test_single_key_matches_sort_by():
    rng = np.random.default_rng(3)
    n = 1000
    keys = rng.integers(0, 1 << 64, n, dtype=np.uint64)
    cols = {"key": keys, "v": np.arange(n, dtype=np.uint32)}
    t = Table.from_numpy(cols)
    a = t.order_by("key").to_numpy()
    b = t.sort_by("key").to_numpy()
    for nm in cols:
        np.testing.assert_array_equal(a[nm], b[nm], err_msg=nm)


def test_spec_validation_and_empty():
    t = Table.from_numpy({"a": np.zeros(4, np.uint64)})
    with pytest.raises(ValueError, match="asc"):
        canon_by([("a", "down")])
    with pytest.raises(ValueError, match="duplicate"):
        canon_by(["a", ("a", "desc")])
    with pytest.raises(ValueError, match="at least one"):
        canon_by([])
    te = Table.from_numpy({"a": np.zeros(0, np.uint64)})
    assert sort_by_multi(te, ["a"]).num_rows == 0
