"""Distributed out-of-core FK join (ops/dbigjoin.py)."""

import pytest

from tpu_qe.exchange.dsort import make_mesh
from tpu_qe.ops.dbigjoin import join_big_distributed


@pytest.mark.parametrize("n_dev,n_l,n_r,b", [
    (1, 1 << 13, 1 << 13, 2),     # degenerate single-device path
    (2, 1 << 13, 1 << 13, 2),
    (4, 1 << 14, 1 << 12, 2),     # left-heavy (4 vs 1 runs/dev)
    (4, 1 << 12, 1 << 14, 3),     # right-heavy, odd bucket count
    (8, 1 << 14, 1 << 14, 2),
])
def test_join_big_distributed_all_checks(n_dev, n_l, n_r, b):
    mesh = make_mesh(n_dev)
    res = join_big_distributed(n_l, n_r, mesh,
                               run_size=min(n_l, n_r) // n_dev,
                               buckets_per_dev=b)
    assert res.all_ok, res
    assert res.matched == (n_l + 1) // 2


def test_multiple_runs_per_device():
    # out-of-core per device: 4 runs per device per side
    mesh = make_mesh(2)
    res = join_big_distributed(1 << 14, 1 << 14, mesh, run_size=1 << 11,
                               buckets_per_dev=2)
    assert res.all_ok, res
    assert res.matched == 1 << 13


def test_divisibility_asserts():
    mesh = make_mesh(8)
    with pytest.raises(AssertionError):
        join_big_distributed(1 << 12, 1 << 13, mesh, run_size=1 << 11)
