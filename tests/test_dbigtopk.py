"""Distributed out-of-core top-k (ops/dbigtopk.py): candidate tree."""

import numpy as np
import pytest

from tpu_qe.exchange.dsort import make_mesh
from tpu_qe.ops.bigtopk import top_k_big
from tpu_qe.ops.dbigtopk import top_k_big_distributed


@pytest.mark.parametrize("n_dev,n,k,run_size,largest", [
    (1, 1 << 14, 16, 1 << 12, False),     # D=1 delegates to top_k_big
    (2, 1 << 14, 16, 1 << 12, False),
    (2, 1 << 14, 16, 1 << 12, True),
    (4, 1 << 15, 100, 1 << 12, False),    # 2 runs/device, odd k
    (8, 1 << 15, 1 << 12, 1 << 12, True),  # k == run_size boundary
])
def test_matches_single_chip_bit_exact(n_dev, n, k, run_size, largest):
    mesh = make_mesh(n_dev)
    res, (keys, pay) = top_k_big_distributed(
        n, k, mesh, run_size=run_size, largest=largest, collect=True)
    assert res.all_ok, res
    res1, (k1, p1) = top_k_big(n, k, run_size=run_size, largest=largest,
                               collect=True)
    assert res1.all_ok
    assert np.array_equal(keys, k1)
    assert np.array_equal(pay, p1)


def test_matches_numpy_oracle():
    from tpu_qe.hashing import keygen_hash_numpy
    n, k = 1 << 14, 37
    mesh = make_mesh(4)
    _, (keys, pay) = top_k_big_distributed(n, k, mesh, run_size=1 << 12,
                                           collect=True)
    okeys = keygen_hash_numpy(np.arange(n, dtype=np.uint32))
    order = np.argsort(okeys, kind="stable")[:k]
    assert np.array_equal(keys, okeys[order])
    assert np.array_equal(pay, order.astype(np.uint32))


def test_1dev_forced_composed_matches():
    # keep the shard_map machinery covered at D=1 (identity all_gather)
    mesh = make_mesh(1)
    res, (keys, pay) = top_k_big_distributed(
        1 << 14, 16, mesh, run_size=1 << 12, collect=True,
        force_composed=True)
    assert res.all_ok, res
    _, (k1, p1) = top_k_big(1 << 14, 16, run_size=1 << 12, collect=True)
    assert np.array_equal(keys, k1)
    assert np.array_equal(pay, p1)


def test_indivisible_n_asserts():
    with pytest.raises(AssertionError):
        top_k_big_distributed(1 << 14, 16, make_mesh(8), run_size=3000)
