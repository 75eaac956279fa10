"""Out-of-core top-k (ops/bigtopk.py) vs the numpy stable-sort oracle."""

import numpy as np
import pytest

from tpu_qe.ops.bigtopk import top_k_big
from tpu_qe.sort.bigsort import keygen_hash_numpy


def _oracle(n, k, largest, seed=7):
    keys = keygen_hash_numpy(np.arange(n, dtype=np.uint32), seed)
    order = np.argsort(keys, kind="stable")
    if largest:
        # largest-first with ties by ORIGINAL index ascending: stable
        # argsort of the complement
        order = np.argsort(~keys, kind="stable")
    return keys[order[:k]], order[:k].astype(np.uint32)


@pytest.mark.parametrize("n,k,run_size,largest", [
    (1 << 14, 16, 1 << 12, False),
    (1 << 14, 16, 1 << 12, True),
    (1 << 14, 1 << 12, 1 << 12, False),   # k == run_size boundary
    (3 * (1 << 12), 100, 1 << 12, False),  # non-power-of-two run count
    (1 << 12, 5, 1 << 12, True),           # single run degenerate
])
def test_top_k_big_oracle(n, k, run_size, largest):
    res, (keys, pay) = top_k_big(n, k, run_size=run_size, largest=largest,
                                 collect=True)
    assert res.all_ok, res
    okeys, opay = _oracle(n, k, largest)
    assert np.array_equal(keys, okeys)
    assert np.array_equal(pay, opay)


def test_k_exceeding_run_asserts():
    with pytest.raises(AssertionError):
        top_k_big(1 << 13, (1 << 11) + 1, run_size=1 << 11)
