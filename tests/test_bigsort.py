"""Out-of-core device-resident sample sort (sort/bigsort.py)."""

import numpy as np
import pytest

from tpu_qe.sort.bigsort import (keygen_hash, keygen_hash_numpy, sort_big)


def test_keygen_matches_numpy():
    import jax.numpy as jnp
    idx = np.arange(4096, dtype=np.uint32)
    dev = keygen_hash(jnp.asarray(idx), seed=7)
    got = (np.asarray(dev.lo).astype(np.uint64)
           | (np.asarray(dev.hi).astype(np.uint64) << np.uint64(32)))
    np.testing.assert_array_equal(got, keygen_hash_numpy(idx, seed=7))


def test_keygen_is_injective_at_small_scale():
    keys = keygen_hash_numpy(np.arange(1 << 16, dtype=np.uint32))
    assert len(np.unique(keys)) == 1 << 16


def test_small_end_to_end_all_checks_pass():
    res = sort_big(1 << 14, run_size=1 << 12, n_buckets=4)
    assert res.all_ok, res
    assert res.n == 1 << 14


def test_bucket_contents_match_numpy_oracle():
    # INDEPENDENT oracle: collect the sorted bucket contents and compare
    # against a numpy argsort of the same hash-generated key stream
    n = 1 << 13
    res, (got_keys, got_pay) = sort_big(n, run_size=1 << 11, n_buckets=2,
                                        collect=True)
    assert res.all_ok
    keys = keygen_hash_numpy(np.arange(n, dtype=np.uint32))
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(got_keys, keys[order])
    np.testing.assert_array_equal(got_pay, order.astype(np.uint32))


def test_uneven_bucket_sizes():
    res = sort_big(1 << 13, run_size=1 << 12, n_buckets=3)
    assert res.all_ok, res


def test_incore_small():
    from tpu_qe.sort.bigsort import sort_big_incore
    res = sort_big_incore(1 << 13)
    assert res.all_ok, res


class TestCheckpointResume:
    """Kill-between-phases resume: the checkpoint persists the splitter
    plan + per-bucket completion; a restarted run regenerates phase A,
    loads the plan, skips completed buckets, and produces the identical
    verified result."""

    def test_resume_after_partial_merge(self, tmp_path, monkeypatch):
        import tpu_qe.sort.bigsort as bs

        n, run_size, n_buckets = 1 << 13, 1 << 11, 4
        ckdir = str(tmp_path)

        # full run WITHOUT checkpointing = the reference result
        want = bs.sort_big(n, run_size=run_size, n_buckets=n_buckets)
        assert want.all_ok

        # killed run: crash after 2 bucket readbacks
        real_record = bs._RunState.record
        calls = {"n": 0}

        def crashing_record(self, b, vals):
            real_record(self, b, vals)
            calls["n"] += 1
            if calls["n"] == 2:
                raise RuntimeError("simulated kill")

        monkeypatch.setattr(bs._RunState, "record", crashing_record)
        with pytest.raises(RuntimeError, match="simulated kill"):
            bs.sort_big(n, run_size=run_size, n_buckets=n_buckets,
                        checkpoint_dir=ckdir)
        monkeypatch.setattr(bs._RunState, "record", real_record)

        st = bs._RunState.load(
            ckdir, np.asarray([n, run_size, n_buckets, 7, 4096, 1, 1], np.int64))
        assert st is not None and int(st.done.sum()) == 2

        # resume: only the 2 remaining buckets merge; result identical
        res = bs.sort_big(n, run_size=run_size, n_buckets=n_buckets,
                          checkpoint_dir=ckdir)
        assert res.all_ok
        for f in ("n", "sorted_ok", "hash_ok", "count_ok", "perm_ok",
                  "boundary_ok"):
            assert getattr(res, f) == getattr(want, f), f
        st = bs._RunState.load(
            ckdir, np.asarray([n, run_size, n_buckets, 7, 4096, 1, 1], np.int64))
        assert int(st.done.sum()) == n_buckets

        # a fully-completed checkpoint replays without any merge work and
        # with collect=True still reproduces the exact sorted stream
        res2, (keys, pay) = bs.sort_big(n, run_size=run_size,
                                        n_buckets=n_buckets,
                                        checkpoint_dir=ckdir, collect=True)
        assert res2.all_ok
        want_keys = np.sort(keygen_hash_numpy(np.arange(n, dtype=np.uint32)))
        np.testing.assert_array_equal(keys, want_keys)

    def test_mismatched_meta_ignored(self, tmp_path):
        import tpu_qe.sort.bigsort as bs

        ckdir = str(tmp_path)
        res = bs.sort_big(1 << 12, run_size=1 << 10, n_buckets=2,
                          checkpoint_dir=ckdir)
        assert res.all_ok
        # a different configuration must NOT reuse the stale plan
        res2 = bs.sort_big(1 << 12, run_size=1 << 10, n_buckets=4,
                           checkpoint_dir=ckdir)
        assert res2.all_ok


def test_consume_stream_device_arrays():
    # the consumer sees one call per bucket in global key order with
    # device arrays; masked on-device payload sums must reproduce the
    # global closed form sum(0..n-1) (mod 2^32)
    import jax.numpy as jnp

    from tpu_qe.sort.bigsort import sort_big

    n = 1 << 13
    got = []

    def consume(b, bucket):
        m = bucket["payload"].shape[0]
        valid = jnp.arange(m, dtype=jnp.uint32) < bucket["count"]
        got.append((b, int(bucket["count"]),
                    int(jnp.sum(jnp.where(valid, bucket["payload"], 0),
                                dtype=jnp.uint32))))

    res = sort_big(n, run_size=1 << 11, n_buckets=4, consume=consume)
    assert res.all_ok
    assert [b for b, _, _ in got] == [0, 1, 2, 3]
    assert sum(c for _, c, _ in got) == n
    want = (n * (n - 1) // 2) & 0xFFFFFFFF
    assert sum(s for _, _, s in got) & 0xFFFFFFFF == want


def test_payload_cols_carried_and_verified():
    # table-shaped rows: extra value columns move through every sort as
    # real operands and arrive attached to their own row
    from tpu_qe.sort.bigsort import _value_col_numpy, sort_big

    n = 1 << 13
    res, (keys, pay, vals) = sort_big(n, run_size=1 << 11, n_buckets=3,
                                      payload_cols=4, collect=True)
    assert res.all_ok, res
    want = keygen_hash_numpy(np.arange(n, dtype=np.uint32))
    order = np.argsort(want, kind="stable")
    assert np.array_equal(keys, want[order])
    assert np.array_equal(pay, order.astype(np.uint32))
    assert len(vals) == 3
    for j, v in enumerate(vals):
        assert np.array_equal(v, _value_col_numpy(order.astype(np.uint32),
                                                  j))


@pytest.mark.parametrize("strategy", ["partition", "merge"])
def test_strategies_bit_identical(strategy):
    # both formulations produce the SAME verified sorted stream
    n = 1 << 13
    res, (keys, pay) = sort_big(n, run_size=1 << 11, n_buckets=4,
                                collect=True, strategy=strategy)
    assert res.all_ok
    assert np.array_equal(keys, np.sort(keys))
    # permutation of the input stream with per-row key validity
    assert np.array_equal(np.sort(pay), np.arange(n, dtype=np.uint32))


def test_partition_first_uneven_buckets():
    res = sort_big(1 << 13, run_size=1 << 12, n_buckets=3,
                   strategy="partition")
    assert res.all_ok
