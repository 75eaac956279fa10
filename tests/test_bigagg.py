"""Out-of-core GROUP BY (ops/bigagg.py): partial-aggregate + combine."""

import numpy as np
import pytest

from tpu_qe.ops.bigagg import (aggregate_big, group_of_index_numpy)


def _oracle(n, n_groups, seed=7):
    idx = np.arange(n, dtype=np.uint32)
    g = group_of_index_numpy(idx, n_groups, seed)
    cnt = np.bincount(g, minlength=n_groups).astype(np.uint64)
    sums = np.zeros(n_groups, dtype=np.uint64)
    np.add.at(sums, g, idx.astype(np.uint64))
    keep = cnt > 0
    return (np.nonzero(keep)[0].astype(np.uint32),
            cnt[keep].astype(np.uint32), sums[keep])


@pytest.mark.parametrize("n,n_groups,run_size", [
    (1 << 14, 1 << 8, 1 << 12),    # many runs, few groups
    (1 << 14, 1 << 12, 1 << 12),   # partial_cap == run_size
    (1 << 14, 1 << 16, 1 << 12),   # more groups than rows per run
    (3 * (1 << 12), 1 << 10, 1 << 12),  # non-power-of-two run count
])
def test_aggregate_big_oracle(n, n_groups, run_size):
    res, table = aggregate_big(n, n_groups=n_groups, run_size=run_size,
                               collect=True)
    assert res.all_ok, res
    okey, ocnt, osum = _oracle(n, n_groups)
    assert np.array_equal(table["key"], okey)
    assert np.array_equal(table["count"], ocnt)
    assert np.array_equal(table["sum"], osum)
    assert res.n_groups == okey.size


def test_single_run_degenerate():
    res, table = aggregate_big(1 << 12, n_groups=64, run_size=1 << 12,
                               collect=True)
    assert res.all_ok
    okey, ocnt, osum = _oracle(1 << 12, 64)
    assert np.array_equal(table["key"], okey)
    assert np.array_equal(table["count"], ocnt)
    assert np.array_equal(table["sum"], osum)


def test_sum_exceeds_u32():
    # per-group value sums past 2^32: n large enough that a group's sum of
    # indices wraps a u32 — exact u64 pair sums must not wrap
    n, g = 1 << 19, 8
    res, table = aggregate_big(n, n_groups=g, run_size=1 << 16,
                               collect=True)
    assert res.all_ok
    _, ocnt, osum = _oracle(n, g)
    assert osum.max() > (1 << 32)  # the test is vacuous otherwise
    assert np.array_equal(table["count"], ocnt)
    assert np.array_equal(table["sum"], osum)


def test_seed_changes_grouping():
    _, t7 = aggregate_big(1 << 13, n_groups=1 << 6, run_size=1 << 12,
                          seed=7, collect=True)
    _, t11 = aggregate_big(1 << 13, n_groups=1 << 6, run_size=1 << 12,
                           seed=11, collect=True)
    # counts are IDENTICAL across seeds here by construction (seed enters
    # by XOR, a bijection on the power-of-two index range) — the sums are
    # the seed-sensitive observable
    assert np.array_equal(t7["count"], t11["count"])
    assert not np.array_equal(t7["sum"], t11["sum"])
    okey, ocnt, osum = _oracle(1 << 13, 1 << 6, seed=11)
    assert np.array_equal(t11["key"], okey)
    assert np.array_equal(t11["count"], ocnt)
    assert np.array_equal(t11["sum"], osum)


def test_minmax_oracle():
    n, g, rs = 1 << 14, 1 << 9, 1 << 12
    res, table = aggregate_big(n, n_groups=g, run_size=rs, collect=True,
                               minmax=True)
    assert res.all_ok, res
    assert res.minmax_ok
    idx = np.arange(n, dtype=np.uint32)
    gid = group_of_index_numpy(idx, g)
    okey, ocnt, osum = _oracle(n, g)
    assert np.array_equal(table["key"], okey)
    assert np.array_equal(table["count"], ocnt)
    assert np.array_equal(table["sum"], osum)
    omin = np.full(g, np.iinfo(np.uint32).max, dtype=np.uint32)
    omax = np.zeros(g, dtype=np.uint32)
    np.minimum.at(omin, gid, idx)
    np.maximum.at(omax, gid, idx)
    keep = np.bincount(gid, minlength=g) > 0
    assert np.array_equal(table["min"], omin[keep])
    assert np.array_equal(table["max"], omax[keep])


def test_combine_cap_asserts():
    # the structural M < 2^28 guard on the in-core combine must fire, not
    # silently truncate (house overflow-detection rule)
    from unittest import mock

    import tpu_qe.ops.bigagg as bigagg
    with mock.patch.object(bigagg, "_combine") as fake:
        fake.lower.side_effect = AssertionError("cap")
        with pytest.raises(AssertionError):
            aggregate_big(1 << 13, n_groups=1 << 6, run_size=1 << 12)


def test_checkpoint_resume(tmp_path, monkeypatch):
    """Kill-between-runs resume: partial tables persist per run; a
    restart loads them and computes only the missing runs, producing
    the identical verified table."""
    import tpu_qe.ops.bigagg as ba

    n, g, rs = 1 << 14, 1 << 9, 1 << 12   # 4 runs
    ckdir = str(tmp_path)
    want, wtab = ba.aggregate_big(n, n_groups=g, run_size=rs, collect=True)
    assert want.all_ok

    real_save = ba._run_ck_save
    calls = {"n": 0}

    def crashing_save(directory, r, meta, part):
        real_save(directory, r, meta, part)
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated kill")

    monkeypatch.setattr(ba, "_run_ck_save", crashing_save)
    with pytest.raises(RuntimeError, match="simulated kill"):
        ba.aggregate_big(n, n_groups=g, run_size=rs, checkpoint_dir=ckdir)
    monkeypatch.setattr(ba, "_run_ck_save", real_save)

    meta = np.asarray([n, g, rs, 7, 0], np.int64)
    assert ba._run_ck_load(ckdir, 0, meta) is not None
    assert ba._run_ck_load(ckdir, 1, meta) is not None
    assert ba._run_ck_load(ckdir, 2, meta) is None

    res, table = ba.aggregate_big(n, n_groups=g, run_size=rs,
                                  checkpoint_dir=ckdir, collect=True)
    assert res.all_ok
    for k in wtab:
        assert np.array_equal(table[k], wtab[k]), k

    # mismatched config must not reuse stale run tables
    res2 = ba.aggregate_big(n, n_groups=g * 2, run_size=rs,
                            checkpoint_dir=ckdir)
    assert res2.all_ok


@pytest.mark.parametrize("value_cols,n,g,rs", [
    (1, 1 << 14, 1 << 8, 1 << 12),
    (3, 1 << 14, 1 << 9, 1 << 12),
    (5, 1 << 13, 1 << 12, 1 << 12),   # wide + single-run-cap groups
])
def test_aggregate_big_multi_oracle(value_cols, n, g, rs):
    from tpu_qe.ops.bigagg import aggregate_big_multi

    res, table = aggregate_big_multi(n, n_groups=g, run_size=rs,
                                     value_cols=value_cols, collect=True)
    assert res.all_ok, res
    idx = np.arange(n, dtype=np.uint32)
    gid = group_of_index_numpy(idx, g)
    cnt = np.bincount(gid, minlength=g)
    keep = cnt > 0
    assert np.array_equal(table["key"],
                          np.nonzero(keep)[0].astype(np.uint32))
    assert np.array_equal(table["count"], cnt[keep].astype(np.uint32))
    for c in range(value_cols):
        s = np.zeros(g, np.uint64)
        np.add.at(s, gid, (idx + c).astype(np.uint64))
        assert np.array_equal(table[f"sum{c}"], s[keep]), c


def test_aggregate_big_multi_sums_past_u32():
    from tpu_qe.ops.bigagg import aggregate_big_multi

    n = 1 << 19
    res, table = aggregate_big_multi(n, n_groups=8, run_size=1 << 16,
                                     value_cols=2, collect=True)
    assert res.all_ok
    assert table["sum0"].max() > (1 << 32)
    idx = np.arange(n, dtype=np.uint32)
    gid = group_of_index_numpy(idx, 8)
    for c in range(2):
        s = np.zeros(8, np.uint64)
        np.add.at(s, gid, (idx + c).astype(np.uint64))
        assert np.array_equal(table[f"sum{c}"], s[np.bincount(gid, minlength=8) > 0]), c
