"""Randomized cross-checks of the distributed paths vs numpy oracles."""

import jax
import numpy as np
import pytest

from tpu_qe.exchange import distributed_sort_numpy, make_mesh
from tpu_qe.exchange.dops import (distributed_aggregate_numpy,
                                  distributed_join_inner_numpy,
                                  distributed_top_k_numpy)


def _mesh(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")
    return make_mesh(n)


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_distributed_sort(trial):
    rng = np.random.default_rng(1000 + trial)
    n_dev = int(rng.choice([2, 4, 8]))
    mesh = _mesh(n_dev)
    overlap = int(rng.choice([1, 2]))
    n = int(rng.integers(4, 600)) * n_dev * (overlap * 2)
    dup = int(rng.integers(1, 1 + n))
    keys = rng.integers(0, dup, n).astype(np.uint64) * np.uint64(
        rng.integers(1, 1 << 40))
    payload = np.arange(n, dtype=np.uint32)
    k, p = distributed_sort_numpy(keys, payload, mesh,
                                  capacity_factor="auto", overlap=overlap)
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(k, keys[order], err_msg=str(trial))
    np.testing.assert_array_equal(p, order.astype(np.uint32),
                                  err_msg=str(trial))


@pytest.mark.parametrize("trial", range(4))
def test_fuzz_distributed_aggregate(trial):
    rng = np.random.default_rng(2000 + trial)
    n_dev = int(rng.choice([2, 4]))
    mesh = _mesh(n_dev)
    n = int(rng.integers(8, 500)) * n_dev
    nk = int(rng.integers(1, 40))
    keys = rng.integers(0, nk, n).astype(np.uint64)
    vals = rng.integers(0, 1 << 20, n, dtype=np.uint32)
    got = distributed_aggregate_numpy(keys, vals, mesh,
                                      aggs=("count", "sum", "min", "max"),
                                      capacity_factor=4.0)
    for k in set(int(x) for x in keys):
        sel = vals[keys == k]
        assert got[k]["count"] == len(sel), trial
        assert got[k]["sum"] == int(sel.sum()) % (1 << 32), trial
        assert got[k]["min"] == int(sel.min()), trial
        assert got[k]["max"] == int(sel.max()), trial


@pytest.mark.parametrize("trial", range(4))
def test_fuzz_distributed_inner_join(trial):
    rng = np.random.default_rng(3000 + trial)
    n_dev = int(rng.choice([2, 4]))
    mesh = _mesh(n_dev)
    n_l = int(rng.integers(4, 300)) * n_dev
    n_r = int(rng.integers(4, 300)) * n_dev
    kr = int(rng.integers(2, 60))
    lkeys = rng.integers(0, kr, n_l).astype(np.uint64)
    rkeys = rng.integers(0, kr, n_r).astype(np.uint64)
    rvals = np.arange(n_r, dtype=np.uint32) * 7 + 3
    import collections
    where = collections.defaultdict(list)
    for j, k in enumerate(rkeys):
        where[int(k)].append(int(rvals[j]))
    want = sorted((i, v) for i, k in enumerate(lkeys)
                  for v in where.get(int(k), ()))
    ob = max(4.0, 8.0 * len(want) / max(n_l, 1))
    if trial % 2 == 0:  # alternate the demand-planned path
        g, _, (rv,) = distributed_join_inner_numpy(
            lkeys, [], rkeys, [rvals], mesh, capacity_factor="auto",
            out_budget_factor=ob)
    else:
        g, _, (rv,) = distributed_join_inner_numpy(
            lkeys, [], rkeys, [rvals], mesh, capacity_factor=float(n_dev),
            capacity_factor_right=float(n_dev), out_budget_factor=ob)
    got = sorted(zip(g.tolist(), rv.tolist()))
    assert got == want, trial


@pytest.mark.parametrize("trial", range(3))
def test_fuzz_distributed_top_k(trial):
    rng = np.random.default_rng(4000 + trial)
    n_dev = int(rng.choice([2, 8]))
    mesh = _mesh(n_dev)
    n = int(rng.integers(8, 400)) * n_dev
    keys = rng.integers(0, n, n).astype(np.uint64)  # duplicates likely
    k = int(rng.integers(1, n + 1))
    largest = bool(rng.integers(0, 2))
    ks, g, _ = distributed_top_k_numpy(keys, [], mesh, k, largest=largest)
    order = (np.lexsort((np.arange(n), ~keys)) if largest
             else np.argsort(keys, kind="stable"))[:k]
    np.testing.assert_array_equal(g, order.astype(np.uint32),
                                  err_msg=str(trial))
