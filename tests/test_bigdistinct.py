"""Out-of-core COUNT DISTINCT vs the numpy data-model oracle
(ops/bigdistinct.py)."""

import numpy as np
import pytest

from tpu_qe.ops.bigdistinct import (count_distinct_big, rows_of_index_numpy)


def _oracle(n, g, v):
    keys, vals = rows_of_index_numpy(np.arange(n, dtype=np.uint32), g, v)
    out = {}
    for k in np.unique(keys):
        sel = keys == k
        out[int(k)] = (len(np.unique(vals[sel])), int(sel.sum()))
    return out


@pytest.mark.parametrize("g,v", [(16, 4), (64, 1000), (7, 3)])
def test_matches_oracle(g, v):
    n, rs = 1 << 12, 1 << 10
    res = count_distinct_big(n, n_groups=g, n_values=v, run_size=rs,
                             collect=True)
    assert res.all_ok, res
    want = _oracle(n, g, v)
    got = {int(k): (int(cd), int(c))
           for k, cd, c in zip(res.table["key"],
                               res.table["count_distinct"],
                               res.table["count"])}
    assert got == want


def test_closed_form_checks_carry_information():
    # sanity of the on-device certificate: distinct = min(n/G, V)
    n, rs = 1 << 14, 1 << 12
    res = count_distinct_big(n, n_groups=8, n_values=1 << 20, run_size=rs)
    assert res.all_ok
    # V > n/G: every row's value distinct within its group
    res2 = count_distinct_big(n, n_groups=8, n_values=4, run_size=rs)
    assert res2.all_ok  # V < n/G: exactly 4 distinct per group


def test_overflow_detected_not_silent():
    n, rs = 1 << 12, 1 << 10
    res = count_distinct_big(n, n_groups=256, n_values=256, run_size=rs,
                             partial_cap=128)  # < distinct pairs per run
    assert res.overflow and not res.all_ok


def test_single_run_degenerate():
    n = 1 << 10
    res = count_distinct_big(n, n_groups=32, n_values=8, run_size=n,
                             collect=True)
    assert res.all_ok
    assert (res.table["count_distinct"] == 8).all()
    assert (res.table["count"] == n // 32).all()
