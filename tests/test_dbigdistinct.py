"""Distributed x out-of-core COUNT DISTINCT vs the numpy data-model
oracle and the single-chip driver (ops/dbigdistinct.py)."""

import numpy as np
import pytest

from tpu_qe.exchange import make_mesh
from tpu_qe.ops.bigdistinct import count_distinct_big, rows_of_index_numpy
from tpu_qe.ops.dbigdistinct import count_distinct_big_distributed


def _oracle(n, g, v):
    keys, vals = rows_of_index_numpy(np.arange(n, dtype=np.uint32), g, v)
    out = {}
    for k in np.unique(keys):
        sel = keys == k
        out[int(k)] = (len(np.unique(vals[sel])), int(sel.sum()))
    return out


def _table_dict(table):
    return {int(k): (int(cd), int(c))
            for k, cd, c in zip(table["key"], table["count_distinct"],
                                table["count"])}


@pytest.mark.parametrize("n_dev", [2, 4, 8])
@pytest.mark.parametrize("g,v", [(16, 4), (64, 1000)])
def test_matches_oracle(n_dev, g, v):
    mesh = make_mesh(n_dev)
    n, rs = 1 << 13, 1 << 10
    res = count_distinct_big_distributed(n, mesh, n_groups=g, n_values=v,
                                         run_size=rs, collect=True,
                                         capacity_factor=float(n_dev))
    assert res.all_ok, res
    assert _table_dict(res.table) == _oracle(n, g, v)


def test_matches_singlechip_and_d1_delegates():
    n, rs = 1 << 12, 1 << 10
    mesh1 = make_mesh(1)
    res1 = count_distinct_big_distributed(n, mesh1, n_groups=32,
                                          n_values=8, run_size=rs,
                                          collect=True)
    single = count_distinct_big(n, n_groups=32, n_values=8, run_size=rs,
                                collect=True)
    assert res1.all_ok and single.all_ok
    assert _table_dict(res1.table) == _table_dict(single.table)
    mesh8 = make_mesh(8)
    res8 = count_distinct_big_distributed(n * 2, mesh8, n_groups=32,
                                          n_values=8, run_size=rs // 4,
                                          collect=True,
                                          capacity_factor=8.0)
    assert res8.all_ok
    assert _table_dict(res8.table) == _oracle(n * 2, 32, 8)


def test_one_group_all_devices():
    mesh = make_mesh(8)
    n, rs = 1 << 13, 1 << 10
    res = count_distinct_big_distributed(n, mesh, n_groups=1,
                                         n_values=100, run_size=rs,
                                         collect=True,
                                         capacity_factor=8.0)
    assert res.all_ok
    assert _table_dict(res.table) == {0: (100, n)}


def test_non_dividing_groups_exact():
    mesh = make_mesh(4)
    n, rs = 1 << 12, 1 << 10
    res = count_distinct_big_distributed(n, mesh, n_groups=7,
                                         n_values=3, run_size=rs,
                                         collect=True,
                                         capacity_factor=4.0)
    assert res.all_ok
    assert _table_dict(res.table) == _oracle(n, 7, 3)
