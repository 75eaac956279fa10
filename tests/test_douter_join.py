"""Distributed LEFT/FULL OUTER join vs a numpy oracle
(exchange/dops.py::distributed_join_outer)."""

import numpy as np
import pytest

from tpu_qe.exchange import make_mesh
from tpu_qe.exchange.dops import distributed_join_outer_numpy


def _oracle(lk, lv, rk, rv):
    """{left index -> (lval, matched, sorted right vals)} + unmatched
    right multiset."""
    rows = {}
    for i, k in enumerate(lk):
        hits = sorted(rv[rk == k].tolist())
        rows[i] = (int(lv[i]), bool(hits), hits if hits else [0])
    ro = sorted(rv[~np.isin(rk, lk)].tolist())
    return rows, ro


def _got(g, lcols, rcols, matched, n_l):
    rows = {}
    for i in range(n_l):
        sel = g == i
        assert sel.any(), f"left row {i} missing"
        rows[int(i)] = (int(lcols[0][sel][0]),
                        bool(matched[sel].all()),
                        sorted(rcols[0][sel].tolist()))
        assert (matched[sel] == matched[sel][0]).all()
    return rows


@pytest.mark.parametrize("n_dev", [2, 4, 8])
@pytest.mark.parametrize("full", [False, True])
def test_matches_oracle(n_dev, full):
    mesh = make_mesh(n_dev)
    rng = np.random.default_rng(n_dev)
    n_l = n_r = 256
    lk = rng.integers(0, 64, n_l).astype(np.uint64)
    rk = (rng.integers(0, 64, n_r) * 2).astype(np.uint64)  # half match
    lv = np.arange(n_l, dtype=np.uint32) + 1
    rv = rng.integers(1, 1 << 20, n_r).astype(np.uint32)
    out = distributed_join_outer_numpy(
        lk, [lv], rk, [rv], mesh, full=full,
        capacity_factor=float(n_dev), out_budget_factor=16.0)
    want_rows, want_ro = _oracle(lk, lv, rk, rv)
    got_rows = _got(out[0], out[1], out[2], out[3], n_l)
    assert got_rows == want_rows
    if full:
        assert sorted(out[5][0].tolist()) == want_ro
        assert not np.isin(out[4], lk).any()  # truly unmatched keys


def test_hot_key_one_device():
    # every left row one key, no right match for it: pure NULL output
    mesh = make_mesh(4)
    n = 128
    lk = np.full(n, 7, dtype=np.uint64)
    rk = np.arange(n, dtype=np.uint64) * 2  # 7 absent
    out = distributed_join_outer_numpy(
        lk, [np.arange(n, dtype=np.uint32)], rk,
        [np.ones(n, np.uint32)], mesh, full=True,
        capacity_factor=4.0, out_budget_factor=8.0)
    g, lcols, rcols, matched, ro_keys, ro_cols = out
    assert len(g) == n and not matched.any()
    assert (rcols[0] == 0).all()
    assert len(ro_keys) == n  # no right row matched
    np.testing.assert_array_equal(np.sort(ro_keys), rk)


def test_auto_capacity():
    mesh = make_mesh(4)
    rng = np.random.default_rng(9)
    n = 256
    lk = rng.integers(0, 32, n).astype(np.uint64)
    rk = rng.integers(0, 32, n).astype(np.uint64)
    out = distributed_join_outer_numpy(
        lk, [np.arange(n, dtype=np.uint32)], rk,
        [np.arange(n, dtype=np.uint32)], mesh,
        capacity_factor="auto", out_budget_factor=64.0)
    want_rows, _ = _oracle(lk, np.arange(n), rk, np.arange(n))
    got_rows = _got(out[0], out[1], out[2], out[3], n)
    assert got_rows == want_rows
