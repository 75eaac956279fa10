"""Fused distributed join -> GROUP BY vs a numpy oracle
(exchange/dops.py distributed_join_aggregate)."""

import numpy as np
import pytest

from tpu_qe.exchange import make_mesh
from tpu_qe.exchange.dops import distributed_join_aggregate_numpy


def _oracle(lkeys, rkeys, rvals):
    pos = {int(k): int(v) for k, v in zip(rkeys, rvals)}
    out = {}
    for k in lkeys:
        k = int(k)
        if k in pos:
            c, s = out.get(k, (0, 0))
            out[k] = (c + 1, s + pos[k])
    return {k: {"count": c, "sum": s} for k, (c, s) in out.items()}


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_matches_oracle(n_dev):
    mesh = make_mesh(n_dev)
    rng = np.random.default_rng(n_dev)
    n_r = 64 * n_dev
    rkeys = np.unique(rng.integers(0, 1 << 40, 4 * n_r,
                                   dtype=np.uint64))[:n_r]
    rvals = rng.integers(0, 1 << 20, n_r, dtype=np.int64).astype(np.uint32)
    n_l = 512 * n_dev
    hit = rng.random(n_l) < 0.7
    lkeys = np.where(hit, rkeys[rng.integers(0, n_r, n_l)],
                     rng.integers(0, 1 << 40, n_l, dtype=np.uint64)
                     | (np.uint64(1) << np.uint64(41)))
    got = distributed_join_aggregate_numpy(lkeys, rkeys, rvals, mesh,
                                           capacity_factor=float(n_dev))
    assert got == _oracle(lkeys, rkeys, rvals)


def test_hot_left_key_split_partials():
    # ONE left key holds most rows: (key, position) splitters split it
    # across devices, so its partial groups MUST combine in phase 2-3
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    n_r = 64 * 8
    rkeys = np.unique(rng.integers(0, 1 << 40, 4 * n_r,
                                   dtype=np.uint64))[:n_r]
    rvals = rng.integers(0, 1 << 20, n_r, dtype=np.int64).astype(np.uint32)
    n_l = 1 << 12
    lkeys = np.full(n_l, rkeys[17], dtype=np.uint64)
    lkeys[:: 13] = rkeys[rng.integers(0, n_r, len(lkeys[::13]))]
    got = distributed_join_aggregate_numpy(lkeys, rkeys, rvals, mesh,
                                           capacity_factor="auto")
    assert got == _oracle(lkeys, rkeys, rvals)


def test_exact_u64_sums_past_2_32():
    mesh = make_mesh(4)
    n_r = 16 * 4
    rkeys = np.arange(n_r, dtype=np.uint64) * np.uint64(1 << 33)
    rvals = np.full(n_r, (1 << 31) + 5, dtype=np.uint64).astype(np.uint32)
    n_l = 1 << 10
    lkeys = rkeys[np.arange(n_l) % 4]  # 4 hot keys, 256 rows each
    got = distributed_join_aggregate_numpy(lkeys, rkeys, rvals, mesh,
                                           capacity_factor=4.0)
    want_sum = 256 * ((1 << 31) + 5)
    assert want_sum > (1 << 32)  # would wrap a u32 sum
    for k in np.unique(lkeys):
        assert got[int(k)] == {"count": 256, "sum": want_sum}
