"""Out-of-core exact quantiles vs the regenerated-key numpy oracle
(ops/bigquantile.py)."""

import numpy as np
import pytest

from tpu_qe.hashing import keygen_hash_numpy
from tpu_qe.ops.bigquantile import quantile_big
from tpu_qe.ops.quantile import canon_qs, disc_rank

QS = [0.0, 0.1, 0.5, (3, 2), 0.99, 1.0]


def _oracle_keys(n, seed, key_bits):
    k = keygen_hash_numpy(np.arange(n, dtype=np.uint32), seed)
    if key_bits < 64:
        k = k & np.uint64((1 << key_bits) - 1)
    return k


@pytest.mark.parametrize("key_bits", [64, 40, 8])
def test_matches_oracle(key_bits):
    n, run_size = 1 << 12, 1 << 10
    res = quantile_big(n, QS, run_size=run_size, key_bits=key_bits)
    assert res.all_ok and res.n_runs == 4
    keys = np.sort(_oracle_keys(n, 7, key_bits))
    want = np.array([keys[disc_rank(num, sh, n)]
                     for num, sh in canon_qs(QS)], dtype=np.uint64)
    np.testing.assert_array_equal(res.values, want, err_msg=str(key_bits))


def test_single_run_and_heavy_duplicates():
    n = 1 << 10
    res = quantile_big(n, [(1, 1)], run_size=n, key_bits=2)
    assert res.all_ok
    keys = np.sort(_oracle_keys(n, 7, 2))  # values in {0,1,2,3}
    assert res.values[0] == keys[(n + 1) // 2 - 1]


def test_certificate_ranks_are_exact():
    n, run_size = 1 << 12, 1 << 11
    res = quantile_big(n, [0.25, 0.75], run_size=run_size, key_bits=16)
    keys = _oracle_keys(n, 7, 16)
    for v, r in zip(res.values, res.ranks):
        assert (keys < v).sum() <= r < (keys <= v).sum()
        assert (keys == v).any()  # always a data element
