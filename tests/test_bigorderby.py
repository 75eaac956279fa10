"""Out-of-core multi-column ORDER BY vs a numpy oracle over the
regenerated data model (ops/bigorderby.py)."""

import numpy as np
import pytest

from tpu_qe.ops.bigorderby import order_by_big, rows_numpy


def _oracle(n, a_card):
    a, b, pay = rows_numpy(np.arange(n, dtype=np.uint32), a_card)
    # ORDER BY a DESC, b ASC, input position (stability); DESC on u64
    # via bitwise complement (int64 negation would wrap for a >= 2^63)
    perm = np.lexsort((np.arange(n), b, ~a))
    return a[perm], b[perm], perm.astype(np.uint32), pay[perm]


@pytest.mark.parametrize("a_card,buckets", [(7, 4), (1 << 10, 3), (1, 2)])
def test_matches_oracle(a_card, buckets):
    n, rs = 1 << 12, 1 << 10
    res, got = order_by_big(n, a_card=a_card, run_size=rs,
                            n_buckets=buckets, collect=True)
    assert res.all_ok, res
    wa, wb, widx, wpay = _oracle(n, a_card)
    np.testing.assert_array_equal(got["a"], wa)
    np.testing.assert_array_equal(got["b"], wb)
    np.testing.assert_array_equal(got["idx"], widx)  # stability exact
    np.testing.assert_array_equal(got["pay"], wpay)


def test_certificates_at_scale_shape():
    # no collect: the on-device certificates alone must pass
    res = order_by_big(1 << 14, run_size=1 << 12, n_buckets=5)
    assert res.all_ok, res
    assert res.sorted_ok and res.hash_ok and res.boundary_ok
    assert res.perm_ok and res.count_ok


def test_single_bucket_single_run():
    n = 1 << 10
    res, got = order_by_big(n, a_card=3, run_size=n, n_buckets=2,
                            collect=True)
    assert res.all_ok
    wa, wb, widx, _ = _oracle(n, 3)
    np.testing.assert_array_equal(got["idx"], widx)
