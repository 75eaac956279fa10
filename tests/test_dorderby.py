"""Distributed multi-column ORDER BY on the CPU mesh vs the in-core
operator and a numpy lexsort oracle (exchange/dorderby.py)."""

import numpy as np
import pytest

from tpu_qe.exchange import make_mesh
from tpu_qe.exchange.dorderby import distributed_order_by_numpy
from tpu_qe.ops.orderby import sort_by_multi
from tpu_qe.table import Table


def _cols(rng, n):
    return {
        "a": rng.integers(0, 12, n).astype(np.uint64) << np.uint64(35),
        "b": rng.integers(-40, 40, n, dtype=np.int64).astype(np.int32),
        "f": rng.standard_normal(n).astype(np.float32),
        "pay": np.arange(n, dtype=np.uint32),
    }


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_matches_incore(n_dev):
    mesh = make_mesh(n_dev)
    rng = np.random.default_rng(n_dev)
    n = 1 << 12
    cols = _cols(rng, n)
    by = [("a", "desc"), "b", ("f", "desc")]
    got, pos = distributed_order_by_numpy(cols, by, mesh,
                                          capacity_factor=float(n_dev))
    want = sort_by_multi(Table.from_numpy(cols), by).to_numpy()
    for nm in cols:
        np.testing.assert_array_equal(got[nm], want[nm], err_msg=nm)
    # the position witness reproduces the permutation exactly
    for nm in cols:
        np.testing.assert_array_equal(cols[nm][pos], want[nm])


def test_auto_capacity_hot_key_skew():
    mesh = make_mesh(8)
    rng = np.random.default_rng(9)
    n = 1 << 13
    cols = _cols(rng, n)
    cols["a"][:] = 7  # ONE key value: splitters must split by position
    got, _ = distributed_order_by_numpy(cols, ["a", ("b", "desc")], mesh,
                                        capacity_factor="auto")
    want = sort_by_multi(Table.from_numpy(cols),
                         ["a", ("b", "desc")]).to_numpy()
    for nm in cols:
        np.testing.assert_array_equal(got[nm], want[nm], err_msg=nm)


def test_stability_across_devices():
    mesh = make_mesh(4)
    rng = np.random.default_rng(3)
    n = 1 << 10
    cols = {"k": rng.integers(0, 3, n).astype(np.uint64),
            "i": np.arange(n, dtype=np.uint32)}
    got, pos = distributed_order_by_numpy(cols, ["k"], mesh,
                                          capacity_factor=4.0)
    # ties keep global input order — i strictly increases within a key
    k, i = got["k"], got["i"]
    same = k[1:] == k[:-1]
    assert (i[1:][same] > i[:-1][same]).all()
    np.testing.assert_array_equal(i, pos.astype(np.uint32))
