"""Distributed out-of-core GROUP BY (ops/dbigagg.py): two-level combine."""

import numpy as np
import pytest

from tpu_qe.exchange.dsort import make_mesh
from tpu_qe.ops.bigagg import aggregate_big
from tpu_qe.ops.dbigagg import aggregate_big_distributed


@pytest.mark.parametrize("n_dev,n,n_groups,run_size", [
    (1, 1 << 14, 1 << 9, 1 << 12),     # D=1 delegates to aggregate_big
    (2, 1 << 14, 1 << 9, 1 << 12),
    (4, 1 << 15, 1 << 10, 1 << 12),    # 8 runs across 4 devices
    (8, 1 << 15, 1 << 16, 1 << 12),    # more groups than rows per run
])
def test_matches_single_chip_bit_exact(n_dev, n, n_groups, run_size):
    mesh = make_mesh(n_dev)
    res, table = aggregate_big_distributed(
        n, mesh, n_groups=n_groups, run_size=run_size, collect=True)
    assert res.all_ok, res
    res1, t1 = aggregate_big(n, n_groups=n_groups, run_size=run_size,
                             collect=True)
    assert res1.all_ok
    for k in t1:
        assert np.array_equal(table[k], t1[k]), k
    assert res.n_groups == res1.n_groups


def test_minmax_matches_single_chip():
    mesh = make_mesh(4)
    res, table = aggregate_big_distributed(
        1 << 14, mesh, n_groups=1 << 8, run_size=1 << 12, collect=True,
        minmax=True)
    assert res.all_ok and res.minmax_ok
    _, t1 = aggregate_big(1 << 14, n_groups=1 << 8, run_size=1 << 12,
                          collect=True, minmax=True)
    for k in ("key", "count", "sum", "min", "max"):
        assert np.array_equal(table[k], t1[k]), k


def test_1dev_forced_composed_matches():
    # keep the shard_map machinery covered at D=1 (identity all_gather)
    mesh = make_mesh(1)
    res, table = aggregate_big_distributed(
        1 << 14, mesh, n_groups=1 << 9, run_size=1 << 12, collect=True,
        force_composed=True)
    assert res.all_ok, res
    _, t1 = aggregate_big(1 << 14, n_groups=1 << 9, run_size=1 << 12,
                          collect=True)
    for k in t1:
        assert np.array_equal(table[k], t1[k]), k


def test_single_group_adversarial():
    # every row in ONE group: local tables are 1 valid row each; the
    # combine tree must still produce the exact global count and sum
    mesh = make_mesh(8)
    n = 1 << 15
    res, table = aggregate_big_distributed(
        n, mesh, n_groups=1, run_size=1 << 12, collect=True)
    assert res.all_ok, res
    assert res.n_groups == 1
    assert table["count"][0] == n
    assert int(table["sum"][0]) == n * (n - 1) // 2


def test_divisibility_asserts():
    mesh = make_mesh(8)
    with pytest.raises(AssertionError):
        aggregate_big_distributed(1 << 14, mesh, run_size=1 << 12)


def test_checkpoint_resume_distributed(tmp_path, monkeypatch):
    """Kill-between-rounds resume for the distributed path: sharded
    round tables persist; a restart loads + re-places them and computes
    only the missing rounds, bit-identical result."""
    import tpu_qe.ops.bigagg as ba

    mesh = make_mesh(4)
    n, g, rs = 1 << 14, 1 << 8, 1 << 11   # 2 rounds of 4-device runs
    ckdir = str(tmp_path)
    want, wtab = aggregate_big_distributed(
        n, mesh, n_groups=g, run_size=rs, collect=True,
        force_composed=True)
    assert want.all_ok

    real_save = ba._run_ck_save
    calls = {"n": 0}

    def crashing_save(directory, r, meta, part):
        real_save(directory, r, meta, part)
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated kill")

    # dbigagg resolves the helpers from the bigagg module at call time
    # (function-level import), so patching ba is enough
    monkeypatch.setattr(ba, "_run_ck_save", crashing_save)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="simulated kill"):
        aggregate_big_distributed(n, mesh, n_groups=g, run_size=rs,
                                  checkpoint_dir=ckdir,
                                  force_composed=True)
    monkeypatch.setattr(ba, "_run_ck_save", real_save)

    res, table = aggregate_big_distributed(
        n, mesh, n_groups=g, run_size=rs, collect=True,
        checkpoint_dir=ckdir, force_composed=True)
    assert res.all_ok
    for k in wtab:
        assert np.array_equal(table[k], wtab[k]), k
