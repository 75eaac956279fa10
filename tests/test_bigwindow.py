"""Out-of-core window tests (ops/bigwindow.py) vs a numpy oracle."""

import numpy as np
import pytest

from tpu_qe.ops.bigwindow import rows_numpy, window_big


def _oracle(n, partitions, seed=7):
    """Sequential reference: lexsort by (key, order, idx) + one sweep.

    Returns dict of arrays in SORTED order (the driver's output order).
    """
    idx = np.arange(n, dtype=np.uint32)
    key, o, v = rows_numpy(idx, partitions, seed)
    perm = np.lexsort((idx, o, key))
    sk, so, si, sv = key[perm], o[perm], idx[perm], v[perm]
    rn = np.zeros(n, np.uint32)
    rk = np.zeros(n, np.uint32)
    cum = np.zeros(n, np.uint64)
    lg = np.zeros(n, np.uint32)
    for i in range(n):
        new = i == 0 or sk[i] != sk[i - 1]
        onew = new or so[i] != so[i - 1]
        rn[i] = 1 if new else rn[i - 1] + 1
        rk[i] = rn[i] if onew else rk[i - 1]
        cum[i] = np.uint64(sv[i]) if new else cum[i - 1] + np.uint64(sv[i])
        lg[i] = 0 if new else sv[i - 1]
    return dict(key=sk, order=so, idx=si, value=sv,
                rn=rn, rk=rk, cum=cum, lg=lg)


@pytest.mark.parametrize("partitions", [1, 16, 512])
def test_matches_oracle(partitions):
    # partitions=1: ONE partition spans every bucket (the carry chain's
    # adversarial case); 16: hot partitions straddle bucket boundaries
    n = 1 << 13
    res, got = window_big(n, partitions=partitions, run_size=1 << 11,
                          n_buckets=4, collect=True)
    assert res.all_ok, res
    want = _oracle(n, partitions)
    for nm in ("key", "order", "idx", "value", "rn", "rk", "cum", "lg"):
        np.testing.assert_array_equal(got[nm], want[nm], err_msg=nm)


def test_device_checks_pass_without_collect():
    res = window_big(1 << 14, partitions=64, run_size=1 << 12,
                     n_buckets=4)
    assert res.all_ok, res
    assert res.count_ok and res.window_ok


def test_uneven_buckets_and_single_run():
    res = window_big(1 << 12, partitions=7, run_size=1 << 12, n_buckets=3)
    assert res.all_ok, res


def test_running_sum_exact_past_2_32():
    # one partition, 8K rows of ~2^32-ish hashed values: the final
    # running sum exceeds 2^32 and must be exact (u64 pair carry)
    n = 1 << 13
    res, got = window_big(n, partitions=1, run_size=1 << 11, n_buckets=4,
                          collect=True)
    assert res.all_ok
    assert got["cum"][-1] == got["value"].astype(np.uint64).sum()
    assert got["cum"][-1] > (1 << 32)


class TestCheckpointResume:
    def test_resume_after_partial_window(self, tmp_path, monkeypatch):
        from tpu_qe.utils.checkpoint import RunState

        n, run_size, n_buckets, parts = 1 << 13, 1 << 11, 4, 16
        ckdir = str(tmp_path)
        want = window_big(n, partitions=parts, run_size=run_size,
                          n_buckets=n_buckets)
        assert want.all_ok

        real_record = RunState.record
        calls = {"n": 0}

        def crashing_record(self, b, vals):
            real_record(self, b, vals)
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("simulated kill")

        monkeypatch.setattr(RunState, "record", crashing_record)
        with pytest.raises(RuntimeError, match="simulated kill"):
            window_big(n, partitions=parts, run_size=run_size,
                       n_buckets=n_buckets, checkpoint_dir=ckdir)
        monkeypatch.setattr(RunState, "record", real_record)

        res = window_big(n, partitions=parts, run_size=run_size,
                         n_buckets=n_buckets, checkpoint_dir=ckdir)
        assert res.all_ok
        for f in ("n", "sorted_ok", "hash_ok", "window_ok", "count_ok",
                  "boundary_ok"):
            assert getattr(res, f) == getattr(want, f), f
