"""Out-of-core FK join (ops/bigjoin.py): bucket-partitioned join_fk_scan."""

import numpy as np
import pytest

from tpu_qe.hashing import murmur_fmix32_numpy as _shared_fmix32
from tpu_qe.ops.bigjoin import join_big
from tpu_qe.sort.bigsort import keygen_hash_numpy


def test_generator_construction_oracle():
    # numpy mirror of the device generators: even left keys must be right
    # keys (bit 0 of the low word clear), odd left keys must be misses
    # (bit 0 set) — the disjointness the exact count proof rests on
    n_r, n_l, seed = 1 << 10, 1 << 11, 7
    rkeys = keygen_hash_numpy(np.arange(n_r, dtype=np.uint32), seed) \
        & ~np.uint64(1)
    j = np.arange(n_l, dtype=np.uint32)
    i = (j * np.uint32(2654435761)) % np.uint32(n_r)
    hit = keygen_hash_numpy(i, seed) & ~np.uint64(1)
    miss = keygen_hash_numpy(j, seed + 1) | np.uint64(1)
    lkeys = np.where(j % 2 == 0, hit, miss)
    rset = set(rkeys.tolist())
    assert all(int(k) in rset for k in lkeys[j % 2 == 0])
    assert all(int(k) not in rset for k in lkeys[j % 2 == 1])


@pytest.mark.parametrize("n_l,n_r,b", [
    (1 << 12, 1 << 12, 2),
    (1 << 13, 1 << 11, 4),   # left-heavy
    (1 << 11, 1 << 13, 4),   # right-heavy
    (1 << 12, 1 << 12, 7),   # non-power-of-two bucket count
])
def test_join_big_all_checks(n_l, n_r, b):
    res = join_big(n_l, n_r, n_buckets=b)
    assert res.all_ok, res
    assert res.matched == (n_l + 1) // 2


def test_combined_cap_would_reject_single_program():
    # the whole point: per-bucket capacities stay under join_fk_scan's
    # 2^30 combined cap even as n_l + n_r scales past it (functional
    # stand-in at test size: caps shrink ~1/B)
    res = join_big(1 << 14, 1 << 14, n_buckets=8, verbose=False)
    assert res.all_ok




def _np_lkeys(n_l, n_r, seed=7):
    j = np.arange(n_l, dtype=np.uint32)
    i = (j * np.uint32(2654435761)) % np.uint32(n_r)
    hit = keygen_hash_numpy(i, seed) & ~np.uint64(1)
    miss = keygen_hash_numpy(j, seed + 1) | np.uint64(1)
    return np.where(j % 2 == 0, hit, miss)


def test_join_big_collect_matches_oracle():
    # materialized bucket stream: every valid left row appears exactly
    # once, in global key order, with the construction-oracle match flag
    # and value
    n_l, n_r, seed = 1 << 12, 1 << 12, 7
    res, out = join_big(n_l, n_r, n_buckets=4, collect=True)
    assert res.all_ok
    keys, lidx, value, matched = (out["key"], out["lidx"], out["value"],
                                  out["matched"])
    assert keys.shape == (n_l,)
    # key order across the assembled stream (buckets are key ranges)
    assert (keys[1:] >= keys[:-1]).all()
    # permutation of left rows
    assert np.array_equal(np.sort(lidx), np.arange(n_l, dtype=np.uint32))
    want_keys = _np_lkeys(n_l, n_r, seed)
    assert np.array_equal(keys, want_keys[lidx])
    assert np.array_equal(matched, lidx % 2 == 0)
    want_val = _shared_fmix32((want_keys[lidx] ^ (want_keys[lidx] >> np.uint64(32))
                           ^ np.uint64(0xABCD1234)) & np.uint64(0xFFFFFFFF))
    assert np.array_equal(value[matched], want_val[matched])


def test_join_big_consume_device_arrays():
    # the consumer callback sees one call per bucket with device arrays;
    # summing matched flags on device must reproduce the exact count
    import jax.numpy as jnp
    n_l, n_r = 1 << 12, 1 << 12
    got = []

    def consume(b, bucket):
        got.append((b, int(jnp.sum(bucket["matched"])),
                    int(jnp.sum(bucket["valid"]))))

    res = join_big(n_l, n_r, n_buckets=4, consume=consume)
    assert res.all_ok
    assert [b for b, _, _ in got] == [0, 1, 2, 3]
    assert sum(m for _, m, _ in got) == res.matched
    assert sum(v for _, _, v in got) == n_l


class TestCheckpointResume:
    """Kill-between-buckets resume: the checkpoint persists the bucket
    plan + per-bucket scalars; a restarted run regenerates the sorted
    sides, loads the plan, skips completed buckets, and reports the
    identical verified result."""

    def test_resume_after_partial_join(self, tmp_path, monkeypatch):
        import tpu_qe.ops.bigjoin as bj

        n_l, n_r, b = 1 << 12, 1 << 12, 4
        ckdir = str(tmp_path)
        want = bj.join_big(n_l, n_r, n_buckets=b)
        assert want.all_ok

        real_record = bj._JoinState.record
        calls = {"n": 0}

        def crashing_record(self, bb, vals):
            real_record(self, bb, vals)
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("simulated kill")

        monkeypatch.setattr(bj._JoinState, "record", crashing_record)
        with pytest.raises(RuntimeError, match="simulated kill"):
            bj.join_big(n_l, n_r, n_buckets=b, checkpoint_dir=ckdir)
        monkeypatch.setattr(bj._JoinState, "record", real_record)

        meta = np.asarray([n_l, n_r, b, 7, 8192], np.int64)
        st = bj._JoinState.load(ckdir, meta)
        assert st is not None and int(st.done.sum()) == 2

        res = bj.join_big(n_l, n_r, n_buckets=b, checkpoint_dir=ckdir)
        assert res.all_ok
        assert res.matched == want.matched
        st = bj._JoinState.load(ckdir, meta)
        assert int(st.done.sum()) == b

        # collect=True on a completed checkpoint re-runs the buckets and
        # still assembles the exact stream
        res2, out = bj.join_big(n_l, n_r, n_buckets=b,
                                checkpoint_dir=ckdir, collect=True)
        assert res2.all_ok
        assert out["matched"].sum() == want.matched

    def test_state_files_do_not_collide_with_sort(self, tmp_path):
        import tpu_qe.ops.bigjoin as bj
        from tpu_qe.sort import bigsort as bs

        ckdir = str(tmp_path)
        r1 = bs.sort_big(1 << 12, run_size=1 << 10, n_buckets=2,
                         checkpoint_dir=ckdir)
        r2 = bj.join_big(1 << 11, 1 << 11, n_buckets=2,
                         checkpoint_dir=ckdir)
        assert r1.all_ok and r2.all_ok
        import os
        names = set(os.listdir(ckdir))
        assert {"bigsort_state.npz", "bigjoin_state.npz"} <= names
