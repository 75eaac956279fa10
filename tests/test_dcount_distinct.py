"""Distributed COUNT(DISTINCT value) GROUP BY key on the CPU mesh.

Dedup-then-route two-phase operator (exchange/dops.py): phase 1 local
(key, value) dedup is the volume reducer; phase 2 routes distinct pairs
by key splitters so each key's count is computed wholly on one device.
Oracle: the in-core group_aggregate count_distinct plus raw numpy.
"""

import numpy as np
import pytest

from tpu_qe.exchange import make_mesh
from tpu_qe.exchange.dops import distributed_count_distinct_numpy


def _oracle(keys, values):
    out = {}
    for k in np.unique(keys):
        out[int(k)] = len(np.unique(values[keys == k]))
    return out


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_matches_oracle(n_dev):
    mesh = make_mesh(n_dev)
    rng = np.random.default_rng(n_dev)
    n = 1 << 12
    keys = rng.integers(0, 37, n).astype(np.uint64) << np.uint64(30)
    vals = rng.integers(0, 11, n, dtype=np.int64).astype(np.uint32)
    got = distributed_count_distinct_numpy(keys, vals, mesh,
                                           capacity_factor=float(n_dev))
    assert got == _oracle(keys, vals)


def test_auto_capacity_and_skew():
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    n = 1 << 13
    # adversarial: ONE hot key holding most rows (all its pairs land on a
    # single device), plus a zipf tail; capacity planned, not guessed
    keys = np.where(rng.random(n) < 0.7, 5,
                    rng.zipf(1.5, n) % 97).astype(np.uint64)
    vals = rng.integers(0, 50, n, dtype=np.int64).astype(np.uint32)
    got = distributed_count_distinct_numpy(keys, vals, mesh,
                                           capacity_factor="auto")
    assert got == _oracle(keys, vals)


def test_all_one_key_all_distinct_values():
    mesh = make_mesh(4)
    n = 1 << 10
    keys = np.full(n, 42, dtype=np.uint64)
    vals = np.arange(n, dtype=np.uint32)
    got = distributed_count_distinct_numpy(keys, vals, mesh,
                                           capacity_factor="auto")
    assert got == {42: n}


def test_all_ones_key_is_exact():
    mesh = make_mesh(4)
    n = 1 << 10
    keys = np.full(n, (1 << 64) - 1, dtype=np.uint64)
    keys[: n // 2] = 7
    vals = (np.arange(n, dtype=np.uint32) % 13)
    got = distributed_count_distinct_numpy(keys, vals, mesh,
                                           capacity_factor="auto")
    assert got == _oracle(keys, vals)
