"""Randomized config fuzz for the out-of-core family (big*/dbig*).

The big-family operators generate their data on device from a fixed
regenerable model (hash-of-index), so the fuzz axis is CONFIGURATION:
random row counts, run sizes, group cardinalities, bucket counts, and
mesh widths — the shape parameters that drive padding, capacity
planning, and the combine trees. Oracles: numpy GROUP BY for the
aggregates, the construction-exact match count for the joins, and
cross-implementation equality (distributed table == single-chip table).
"""

from __future__ import annotations

import numpy as np
import pytest

from tpu_qe.exchange.dsort import make_mesh
from tpu_qe.ops.bigagg import aggregate_big, group_of_index_numpy
from tpu_qe.ops.bigjoin import join_big
from tpu_qe.ops.dbigagg import aggregate_big_distributed
from tpu_qe.ops.dbigjoin import join_big_distributed


def _agg_oracle(n, n_groups, seed=7):
    idx = np.arange(n, dtype=np.uint32)
    g = group_of_index_numpy(idx, n_groups, seed)
    cnt = np.bincount(g, minlength=n_groups)
    sums = np.zeros(n_groups, np.uint64)
    np.add.at(sums, g, idx.astype(np.uint64))
    keep = cnt > 0
    return (np.nonzero(keep)[0].astype(np.uint32),
            cnt[keep].astype(np.uint32), sums[keep])


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_bigagg_configs(trial):
    rng = np.random.default_rng(4000 + trial)
    run_size = 1 << int(rng.integers(9, 13))
    n_runs = int(rng.integers(1, 9))
    n = n_runs * run_size
    n_groups = 1 << int(rng.integers(0, 15))
    minmax = bool(rng.integers(0, 2))
    res, table = aggregate_big(n, n_groups=n_groups, run_size=run_size,
                               collect=True, minmax=minmax)
    assert res.all_ok, (trial, res)
    okey, ocnt, osum = _agg_oracle(n, n_groups)
    assert np.array_equal(table["key"], okey), trial
    assert np.array_equal(table["count"], ocnt), trial
    assert np.array_equal(table["sum"], osum), trial


@pytest.mark.parametrize("trial", range(4))
def test_fuzz_dbigagg_matches_single_chip(trial):
    rng = np.random.default_rng(5000 + trial)
    n_dev = int(rng.choice([1, 2, 4, 8]))
    run_size = 1 << int(rng.integers(9, 12))
    runs_per_dev = int(rng.integers(1, 4))
    n = n_dev * runs_per_dev * run_size
    n_groups = 1 << int(rng.integers(2, 14))
    mesh = make_mesh(n_dev)
    res, table = aggregate_big_distributed(
        n, mesh, n_groups=n_groups, run_size=run_size, collect=True)
    assert res.all_ok, (trial, res)
    _, t1 = aggregate_big(n, n_groups=n_groups, run_size=run_size,
                          collect=True)
    for k in t1:
        assert np.array_equal(table[k], t1[k]), (trial, k)


@pytest.mark.parametrize("trial", range(4))
def test_fuzz_bigjoin_configs(trial):
    rng = np.random.default_rng(6000 + trial)
    n_l = 1 << int(rng.integers(10, 14))
    n_r = 1 << int(rng.integers(10, 14))
    b = int(rng.integers(2, 9))
    res = join_big(n_l, n_r, n_buckets=b)
    assert res.all_ok, (trial, res)
    assert res.matched == (n_l + 1) // 2, trial


@pytest.mark.parametrize("trial", range(4))
def test_fuzz_dbigjoin_configs(trial):
    rng = np.random.default_rng(7000 + trial)
    n_dev = int(rng.choice([1, 2, 4, 8]))
    run_size = 1 << int(rng.integers(9, 11))
    rl = int(rng.integers(1, 4))
    rr = int(rng.integers(1, 4))
    n_l = n_dev * rl * run_size
    n_r = n_dev * rr * run_size
    b = int(rng.integers(1, 4))
    mesh = make_mesh(n_dev)
    res = join_big_distributed(n_l, n_r, mesh, run_size=run_size,
                               buckets_per_dev=b)
    assert res.all_ok, (trial, res)
    assert res.matched == (n_l + 1) // 2, trial
