"""Out-of-core set operations vs a raw-keys numpy oracle
(ops/bigsetops.py)."""

import numpy as np
import pytest

from tpu_qe.ops.bigsetops import set_op_big


def _oracle(op, n_a, g_a, n_b, g_b, offset):
    """Independent of the module's closed forms: build the raw key
    bags, take the SQL-DISTINCT set result + per-side multiplicities."""
    ka = np.arange(n_a, dtype=np.uint64) % g_a
    kb = np.arange(n_b, dtype=np.uint64) % g_b + offset
    ua, ub = np.unique(ka), np.unique(kb)
    if op == "union":
        keys = np.union1d(ua, ub)
    elif op == "intersect":
        keys = np.intersect1d(ua, ub)
    else:
        keys = np.setdiff1d(ua, ub)
    ca = np.array([(ka == k).sum() for k in keys], dtype=np.uint32)
    cb = np.array([(kb == k).sum() for k in keys], dtype=np.uint32)
    return keys.astype(np.uint32), ca, cb


@pytest.mark.parametrize("op", ["union", "intersect", "except"])
@pytest.mark.parametrize("g_a,g_b,offset", [
    (300, 200, 150),     # partial overlap, non-dividing counts
    (256, 128, 0),       # B subset of A's key range
    (100, 100, 4096),    # disjoint
])
def test_matches_oracle(op, g_a, g_b, offset):
    n_a, n_b, rs = 1 << 12, 3 << 10, 1 << 10
    res = set_op_big(op, n_a, n_b, g_a=g_a, g_b=g_b, offset=offset,
                     run_size=rs, collect=True)
    assert res.all_ok, res
    keys, ca, cb = _oracle(op, n_a, g_a, n_b, g_b, offset)
    np.testing.assert_array_equal(res.table["key"], keys)
    np.testing.assert_array_equal(res.table["count_a"], ca)
    np.testing.assert_array_equal(res.table["count_b"], cb)


def test_bag_semantics_one_expand_away():
    # ALL-semantics totals derive from the returned multiplicities
    op, n_a, n_b, rs = "intersect", 1 << 12, 1 << 12, 1 << 10
    g_a, g_b, offset = 96, 160, 32
    res = set_op_big(op, n_a, n_b, g_a=g_a, g_b=g_b, offset=offset,
                     run_size=rs, collect=True)
    assert res.all_ok
    keys, ca, cb = _oracle(op, n_a, g_a, n_b, g_b, offset)
    want_all = np.minimum(ca, cb).sum()          # INTERSECT ALL rows
    got_all = np.minimum(res.table["count_a"],
                         res.table["count_b"]).sum()
    assert got_all == want_all


def test_overflow_detected_not_silent():
    res = set_op_big("union", 1 << 12, 1 << 12, g_a=512, g_b=512,
                     offset=0, run_size=1 << 10, partial_cap=128)
    assert res.overflow and not res.all_ok


def test_single_run_degenerate_and_empty_result():
    n = 1 << 10
    res = set_op_big("intersect", n, n, g_a=16, g_b=16, offset=1 << 16,
                     run_size=n, collect=True)  # disjoint -> empty
    assert res.all_ok and res.num == 0
    assert res.table["key"].size == 0
