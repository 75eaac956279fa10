"""Distributed x out-of-core ORDER BY vs the single-chip driver and the
numpy oracle (ops/dbigorderby.py)."""

import numpy as np
import pytest

from tpu_qe.exchange import make_mesh
from tpu_qe.ops.bigorderby import order_by_big, rows_numpy
from tpu_qe.ops.dbigorderby import order_by_big_distributed


def _oracle(n, a_card):
    a, b, pay = rows_numpy(np.arange(n, dtype=np.uint32), a_card)
    perm = np.lexsort((np.arange(n), b, ~a))
    return a[perm], b[perm], perm.astype(np.uint32), pay[perm]


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_matches_oracle_and_singlechip(n_dev):
    mesh = make_mesh(n_dev)
    n, rs = 1 << 13, 1 << 10
    res, got = order_by_big_distributed(n, mesh, a_card=19, run_size=rs,
                                        buckets_per_dev=2, collect=True)
    assert res.all_ok, res
    wa, wb, widx, wpay = _oracle(n, 19)
    np.testing.assert_array_equal(got["a"], wa)
    np.testing.assert_array_equal(got["b"], wb)
    np.testing.assert_array_equal(got["idx"], widx)
    np.testing.assert_array_equal(got["pay"], wpay)
    # bit-identical to the single-chip composed driver's rows
    _, single = order_by_big(n, a_card=19, run_size=rs, n_buckets=4,
                             collect=True)
    for nm in got:
        np.testing.assert_array_equal(got[nm], single[nm], err_msg=nm)


def test_one_hot_key_spans_mesh_and_buckets():
    mesh = make_mesh(8)
    n, rs = 1 << 13, 1 << 10
    res, got = order_by_big_distributed(n, mesh, a_card=1, run_size=rs,
                                        buckets_per_dev=2, collect=True)
    assert res.all_ok, res
    _, _, widx, _ = _oracle(n, 1)
    np.testing.assert_array_equal(got["idx"], widx)


def test_d1_delegates_and_force_composed_agrees():
    mesh1 = make_mesh(1)
    n, rs = 1 << 12, 1 << 10
    res_d = order_by_big_distributed(n, mesh1, a_card=11, run_size=rs,
                                     buckets_per_dev=3)
    assert isinstance(res_d, type(order_by_big(1 << 10, a_card=2,
                                               run_size=1 << 10)))
    res_f, got_f = order_by_big_distributed(n, mesh1, a_card=11,
                                            run_size=rs,
                                            buckets_per_dev=3,
                                            collect=True,
                                            force_composed=True)
    assert res_f.all_ok
    _, _, widx, _ = _oracle(n, 11)
    np.testing.assert_array_equal(got_f["idx"], widx)
