"""Distributed x out-of-core quantiles vs the single-chip driver and
the regenerated-key numpy oracle (ops/dbigquantile.py)."""

import numpy as np
import pytest

from tpu_qe.exchange import make_mesh
from tpu_qe.hashing import keygen_hash_numpy
from tpu_qe.ops.bigquantile import quantile_big
from tpu_qe.ops.dbigquantile import quantile_big_distributed
from tpu_qe.ops.quantile import canon_qs, disc_rank

QS = [0.0, 0.1, (1, 1), 0.99, 1.0]


def _oracle(n, key_bits):
    k = keygen_hash_numpy(np.arange(n, dtype=np.uint32), 7)
    if key_bits < 64:
        k = k & np.uint64((1 << key_bits) - 1)
    s = np.sort(k)
    return np.array([s[disc_rank(num, sh, n)]
                     for num, sh in canon_qs(QS)], dtype=np.uint64)


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_matches_oracle_and_singlechip(n_dev):
    mesh = make_mesh(n_dev)
    n, rs = 1 << 13, 1 << 10
    res = quantile_big_distributed(n, QS, mesh, run_size=rs)
    assert res.all_ok and res.n_runs == n // rs
    np.testing.assert_array_equal(res.values, _oracle(n, 64))
    # bit-identical to the single-chip out-of-core driver on the same
    # data model (the union of per-device index ranges IS [0, n))
    single = quantile_big(n, QS, run_size=rs)
    np.testing.assert_array_equal(res.values, single.values)


def test_duplicate_heavy_key_space():
    mesh = make_mesh(8)
    n, rs = 1 << 13, 1 << 10
    res = quantile_big_distributed(n, QS, mesh, run_size=rs, key_bits=6)
    assert res.all_ok
    np.testing.assert_array_equal(res.values, _oracle(n, 6))


def test_shape_contract():
    mesh = make_mesh(8)
    with pytest.raises(AssertionError, match="multiple of devices"):
        quantile_big_distributed(1 << 12, [0.5], mesh, run_size=1 << 10)
