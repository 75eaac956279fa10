"""Distributed x out-of-core set operations vs the raw-keys numpy
oracle and the single-chip driver (ops/dbigsetops.py)."""

import numpy as np
import pytest

from tpu_qe.exchange import make_mesh
from tpu_qe.ops.bigsetops import set_op_big
from tpu_qe.ops.dbigsetops import set_op_big_distributed


def _oracle(op, n_a, g_a, n_b, g_b, offset):
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


@pytest.mark.parametrize("n_dev", [2, 4, 8])
@pytest.mark.parametrize("op", ["union", "intersect", "except"])
def test_matches_oracle(n_dev, op):
    mesh = make_mesh(n_dev)
    n_a, n_b, rs = 1 << 13, 1 << 13, 1 << 10
    g_a, g_b, offset = 300, 200, 150
    res = set_op_big_distributed(op, n_a, n_b, mesh, g_a=g_a, g_b=g_b,
                                 offset=offset, run_size=rs,
                                 collect=True,
                                 capacity_factor=float(n_dev))
    assert res.all_ok, res
    keys, ca, cb = _oracle(op, n_a, g_a, n_b, g_b, offset)
    np.testing.assert_array_equal(res.table["key"], keys)
    np.testing.assert_array_equal(res.table["count_a"], ca)
    np.testing.assert_array_equal(res.table["count_b"], cb)


def test_d1_delegates_and_force_composed_agrees():
    n_a, n_b, rs = 1 << 12, 1 << 12, 1 << 10
    kw = dict(g_a=96, g_b=160, offset=32, run_size=rs, collect=True)
    mesh1 = make_mesh(1)
    dele = set_op_big_distributed("intersect", n_a, n_b, mesh1, **kw)
    single = set_op_big("intersect", n_a, n_b, **kw)
    forced = set_op_big_distributed("intersect", n_a, n_b, mesh1,
                                    force_composed=True, **kw)
    assert dele.all_ok and single.all_ok and forced.all_ok
    for k in ("key", "count_a", "count_b"):
        np.testing.assert_array_equal(dele.table[k], single.table[k])
        np.testing.assert_array_equal(forced.table[k], single.table[k])


def test_one_hot_key_all_devices():
    # g_a = 1: every A row is the same key, generated on every device
    mesh = make_mesh(8)
    n, rs = 1 << 13, 1 << 10
    res = set_op_big_distributed("except", n, n, mesh, g_a=1, g_b=64,
                                 offset=1, run_size=rs, collect=True,
                                 capacity_factor=8.0)
    assert res.all_ok
    np.testing.assert_array_equal(res.table["key"], [0])
    np.testing.assert_array_equal(res.table["count_a"], [n])


def test_exchange_overflow_detected():
    mesh = make_mesh(4)
    n, rs = 1 << 12, 1 << 10
    res = set_op_big_distributed("union", n, n, mesh, g_a=1 << 10,
                                 g_b=1 << 10, offset=0, run_size=rs,
                                 capacity_factor=0.05)
    assert res.overflow and not res.all_ok
