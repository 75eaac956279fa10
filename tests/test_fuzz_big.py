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


@pytest.mark.parametrize("trial", range(4))
def test_fuzz_bigquantile_bigdistinct_bigorderby(trial):
    rng = np.random.default_rng(8000 + trial)
    from tpu_qe.hashing import keygen_hash_numpy
    from tpu_qe.ops.bigdistinct import count_distinct_big
    from tpu_qe.ops.bigorderby import order_by_big, rows_numpy
    from tpu_qe.ops.bigquantile import quantile_big
    from tpu_qe.ops.quantile import canon_qs, disc_rank

    rs = int(rng.choice([1 << 9, 1 << 10, 1 << 11]))
    n = rs * int(rng.integers(2, 7))
    kb = int(rng.choice([64, 48, 12]))
    qs = sorted(rng.uniform(0, 1, int(rng.integers(1, 4))).tolist())
    res = quantile_big(n, qs, run_size=rs, key_bits=kb)
    assert res.all_ok, (trial, res)
    keys = keygen_hash_numpy(np.arange(n, dtype=np.uint32), 7)
    if kb < 64:
        keys = keys & np.uint64((1 << kb) - 1)
    s = np.sort(keys)
    for v, (num, sh) in zip(res.values, canon_qs(qs)):
        assert v == s[disc_rank(num, sh, n)], (trial, num, sh)

    g = int(rng.integers(2, 80))
    vv = int(rng.integers(1, 50))
    dres = count_distinct_big(n, n_groups=g, n_values=vv, run_size=rs)
    assert dres.all_ok, (trial, dres)

    a_card = int(rng.integers(1, 40))
    ores, got = order_by_big(n, a_card=a_card, run_size=rs,
                             n_buckets=int(rng.integers(2, 6)),
                             collect=True)
    assert ores.all_ok, (trial, ores)
    a, b, _pay = rows_numpy(np.arange(n, dtype=np.uint32), a_card)
    perm = np.lexsort((np.arange(n), b, ~a))
    np.testing.assert_array_equal(got["idx"], perm.astype(np.uint32),
                                  err_msg=str(trial))
