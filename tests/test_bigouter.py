"""Out-of-core LEFT/FULL OUTER join (ops/bigouter.py)."""

import numpy as np
import pytest

from tpu_qe.ops.bigouter import (join_big_outer, lkeys_numpy, rkeys_numpy,
                                 rval_numpy, _OuterState)


def test_generator_construction_oracle():
    # numpy mirror of the device generators: even left keys are right
    # keys of EVEN right indices, odd left keys miss (right lo is even,
    # miss lo has bit 0 set), right keys are injective
    n_r, n_l, seed = 1 << 10, 1 << 11, 7
    rkeys = rkeys_numpy(n_r, seed)
    assert len(set(rkeys.tolist())) == n_r  # injective
    assert (rkeys % 2 == 0).all()
    lkeys = lkeys_numpy(n_l, n_r, seed)
    j = np.arange(n_l)
    rset = set(rkeys.tolist())
    assert all(int(k) in rset for k in lkeys[j % 2 == 0])
    assert (lkeys[j % 2 == 1] % 2 == 1).all()  # bit 0 set -> miss
    # coverage: every even right index is hit
    hit_i = ((j[j % 2 == 0] >> 1) % (n_r >> 1)) << 1
    assert set(hit_i.tolist()) == set(range(0, n_r, 2))


@pytest.mark.parametrize("n_l,n_r,b,how", [
    (1 << 12, 1 << 12, 2, "full"),
    (1 << 13, 1 << 11, 4, "full"),   # left-heavy
    (1 << 12, 1 << 12, 7, "full"),   # non-power-of-two bucket count
    (1 << 12, 1 << 12, 4, "left"),   # LEFT OUTER: no right-only probe
])
def test_join_big_outer_all_checks(n_l, n_r, b, how):
    res = join_big_outer(n_l, n_r, how=how, n_buckets=b)
    assert res.all_ok, res
    assert res.matched == (n_l + 1) // 2
    assert res.num_out == n_l           # unique right keys: 1 slot/row
    assert res.right_only == (n_r // 2 if how == "full" else 0)


def test_collect_matches_numpy_oracle():
    n_l, n_r, seed = 1 << 12, 1 << 11, 7
    res, out = join_big_outer(n_l, n_r, how="full", n_buckets=4,
                              collect=True)
    assert res.all_ok, res
    keys, lidx = out["key"], out["lidx"]
    matched, value = out["matched"], out["value"]
    assert keys.shape == (n_l,)
    assert (keys[1:] >= keys[:-1]).all()        # global key order
    assert np.array_equal(np.sort(lidx), np.arange(n_l, dtype=np.uint32))
    want_keys = lkeys_numpy(n_l, n_r, seed)
    assert np.array_equal(keys, want_keys[lidx])
    assert np.array_equal(matched, lidx % 2 == 0)
    assert np.array_equal(value[matched], rval_numpy(keys[matched]))
    assert (value[~matched] == 0).all()         # NULL convention
    # FULL: the right-only rows are exactly the odd right indices
    assert np.array_equal(np.sort(out["ro_ridx"]),
                          np.arange(1, n_r, 2, dtype=np.uint32))


def test_left_outer_skips_right_only():
    res, out = join_big_outer(1 << 11, 1 << 11, how="left", n_buckets=2,
                              collect=True)
    assert res.all_ok
    assert "ro_ridx" not in out
    assert res.right_only == 0


def test_coverage_precondition_rejected():
    with pytest.raises(AssertionError, match="coverage"):
        join_big_outer(1 << 8, 1 << 12)  # too few left rows to cover


def test_checkpoint_resume(tmp_path, monkeypatch):
    import tpu_qe.ops.bigouter as bo

    n_l, n_r, b = 1 << 12, 1 << 12, 4
    ckdir = str(tmp_path)
    want = bo.join_big_outer(n_l, n_r, n_buckets=b)
    assert want.all_ok

    real_record = _OuterState.record
    calls = {"n": 0}

    def crashing_record(self, bb, vals):
        real_record(self, bb, vals)
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated kill")

    monkeypatch.setattr(bo._OuterState, "record", crashing_record)
    with pytest.raises(RuntimeError, match="simulated kill"):
        bo.join_big_outer(n_l, n_r, n_buckets=b, checkpoint_dir=ckdir)
    monkeypatch.setattr(bo._OuterState, "record", real_record)

    meta = np.asarray([n_l, n_r, 1, b, 7, 8192, 0x0073], np.int64)
    st = bo._OuterState.load(ckdir, meta)
    assert st is not None and int(st.done.sum()) == 2

    res = bo.join_big_outer(n_l, n_r, n_buckets=b, checkpoint_dir=ckdir)
    assert res.all_ok
    assert res.matched == want.matched
    assert res.right_only == want.right_only
    st = bo._OuterState.load(ckdir, meta)
    assert int(st.done.sum()) == b
