"""Distributed out-of-core window tests (ops/dbigwindow.py) on the CPU
mesh, vs the single-chip driver's numpy oracle."""

import numpy as np
import pytest

from tpu_qe.exchange.dsort import make_mesh
from tpu_qe.ops.dbigwindow import window_big_distributed

from test_bigwindow import _oracle  # noqa: E402  (same data model)


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_matches_oracle(n_dev):
    n, run_size, parts = 1 << 14, 1 << 11, 64
    mesh = make_mesh(n_dev)
    res, got = window_big_distributed(
        n, mesh, partitions=parts, run_size=run_size, buckets_per_dev=2,
        collect=True, force_composed=(n_dev == 1))
    assert res.all_ok, res
    want = _oracle(n, parts)
    for nm in ("key", "order", "idx", "value", "rn", "rk", "cum", "lg"):
        np.testing.assert_array_equal(got[nm], want[nm], err_msg=nm)


def test_one_partition_spans_every_device_and_bucket():
    # the full adversarial composition: ONE partition, split across all
    # devices AND all buckets by the composite (key, order, idx)
    # splitters; both carry levels (pre-pass device chain + per-round
    # bucket chain) must compose it exactly
    n, n_dev = 1 << 13, 8
    mesh = make_mesh(n_dev)
    res, got = window_big_distributed(
        n, mesh, partitions=1, run_size=1 << 10, buckets_per_dev=2,
        collect=True)
    assert res.all_ok, res
    want = _oracle(n, 1)
    for nm in ("rn", "rk", "cum", "lg"):
        np.testing.assert_array_equal(got[nm], want[nm], err_msg=nm)
    # the exact u64 running sum crosses 2^32 within the single partition
    assert got["cum"][-1] == got["value"].astype(np.uint64).sum()
    assert got["cum"][-1] > (1 << 32)


def test_device_checks_without_collect():
    mesh = make_mesh(4)
    res = window_big_distributed(1 << 14, mesh, partitions=256,
                                 run_size=1 << 11, buckets_per_dev=2)
    assert res.all_ok, res


def test_d1_delegates_and_composed_path_agrees():
    n, parts = 1 << 13, 32
    mesh = make_mesh(1)
    res_d, got_d = window_big_distributed(
        n, mesh, partitions=parts, run_size=1 << 11, buckets_per_dev=4,
        collect=True)          # delegates to window_big
    res_c, got_c = window_big_distributed(
        n, mesh, partitions=parts, run_size=1 << 11, buckets_per_dev=4,
        collect=True, force_composed=True)
    assert res_d.all_ok and res_c.all_ok
    for nm in ("key", "order", "idx", "value", "rn", "rk", "cum", "lg"):
        np.testing.assert_array_equal(got_c[nm], got_d[nm], err_msg=nm)
