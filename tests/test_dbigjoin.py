"""Distributed out-of-core FK join (ops/dbigjoin.py)."""

import pytest

from tpu_qe.exchange.dsort import make_mesh
from tpu_qe.ops.dbigjoin import join_big_distributed


@pytest.mark.parametrize("n_dev,n_l,n_r,b", [
    (1, 1 << 13, 1 << 13, 2),     # D=1 delegates to join_big
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


def test_1dev_forced_composed_path():
    # keep the full composed machinery covered at D=1
    mesh = make_mesh(1)
    res = join_big_distributed(1 << 13, 1 << 13, mesh, run_size=1 << 11,
                               buckets_per_dev=2, force_composed=True)
    assert res.all_ok, res
    assert res.matched == 1 << 12


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


def test_checkpoint_resume(tmp_path, monkeypatch):
    import numpy as np

    import tpu_qe.ops.dbigjoin as dj

    mesh = make_mesh(4)
    kw = dict(run_size=1 << 10, buckets_per_dev=3)
    n = 4 * 2 * (1 << 10)
    ckdir = str(tmp_path)
    want = dj.join_big_distributed(n, n, mesh, **kw)
    assert want.all_ok

    real_record = dj._DJoinState.record
    calls = {"n": 0}

    def crashing_record(self, b, vals):
        real_record(self, b, vals)
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated kill")

    monkeypatch.setattr(dj._DJoinState, "record", crashing_record)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="simulated kill"):
        dj.join_big_distributed(n, n, mesh, checkpoint_dir=ckdir, **kw)
    monkeypatch.setattr(dj._DJoinState, "record", real_record)

    meta = np.asarray([n, n, 4, 1 << 10, 3, 7, 1 << 10], np.int64)
    st = dj._DJoinState.load(ckdir, meta)
    assert st is not None and int(st.done.sum()) == 1

    res = dj.join_big_distributed(n, n, mesh, checkpoint_dir=ckdir, **kw)
    assert res.all_ok
    assert res.matched == want.matched
    st = dj._DJoinState.load(ckdir, meta)
    assert int(st.done.sum()) == 3
