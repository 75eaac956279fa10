"""Distributed + out-of-core sort (sort/dbigsort.py) on the CPU mesh.

The SURVEY-mandated composition: data larger than one device's sortable
set, sorted across the mesh. Tests validate bit-exactness against numpy
oracles at reduced scale — the same fake-backend strategy as the other
distributed suites (SURVEY.md §4).
"""

import numpy as np
import pytest

from tpu_qe.exchange.dsort import make_mesh
from tpu_qe.sort.bigsort import keygen_hash_numpy
from tpu_qe.sort.dbigsort import keygen_masked_numpy, sort_big_distributed


def _oracle(n, key_bits=64):
    keys = keygen_masked_numpy(np.arange(n, dtype=np.uint32),
                               key_bits=key_bits)
    order = np.argsort(keys, kind="stable")
    return keys[order], order.astype(np.uint32)


def _run(n_dev, n_runs, run_size, buckets_per_dev, key_bits=64, **kw):
    mesh = make_mesh(n_dev)
    n = n_dev * n_runs * run_size
    res, (keys, pay) = sort_big_distributed(
        n, mesh, run_size=run_size, buckets_per_dev=buckets_per_dev,
        key_bits=key_bits, collect=True, **kw)
    assert res.all_ok, res
    want_keys, want_pay = _oracle(n, key_bits)
    np.testing.assert_array_equal(keys, want_keys)
    np.testing.assert_array_equal(pay, want_pay)
    return res


def test_8dev_bit_exact():
    _run(n_dev=8, n_runs=4, run_size=2048, buckets_per_dev=2)


def test_8dev_single_bucket_per_dev():
    _run(n_dev=8, n_runs=2, run_size=1024, buckets_per_dev=1)


def test_2dev_many_buckets():
    _run(n_dev=2, n_runs=3, run_size=1536, buckets_per_dev=5)


def test_4dev_single_run_per_dev():
    _run(n_dev=4, n_runs=1, run_size=4096, buckets_per_dev=3)


def test_1dev_delegates_to_bigsort():
    # D=1 default: the exchange has nothing to move, so the call
    # delegates to single-chip sort_big (same data model + checks)
    _run(n_dev=1, n_runs=4, run_size=2048, buckets_per_dev=4)


def test_1dev_forced_composed_path():
    # force_composed=True keeps the full machinery at D=1 (identity
    # all_to_all + block copies) — what the machinery measurement runs
    _run(n_dev=1, n_runs=4, run_size=2048, buckets_per_dev=4,
         force_composed=True)


def test_adversarial_duplicates_16_keys():
    # 2^4 distinct keys over 64K rows: every key is hot; whole-bucket
    # skew. Exact demand-sized capacities must absorb it (imbalance, not
    # overflow) and ties must come back payload-ordered (stability).
    _run(n_dev=8, n_runs=4, run_size=2048, buckets_per_dev=2, key_bits=4)


def test_adversarial_duplicates_2_keys():
    _run(n_dev=4, n_runs=2, run_size=2048, buckets_per_dev=2, key_bits=1)


def test_few_samples_still_exact():
    # sampling only affects balance, never correctness: capacities are
    # sized from exact searchsorted boundaries, not from the samples
    _run(n_dev=8, n_runs=4, run_size=2048, buckets_per_dev=2,
         samples_per_run=4)


def test_matches_unmasked_keygen():
    # key_bits=64 is plain keygen_hash (bigsort parity of the generator)
    n = 1 << 12
    np.testing.assert_array_equal(
        keygen_masked_numpy(np.arange(n, dtype=np.uint32), key_bits=64),
        keygen_hash_numpy(np.arange(n, dtype=np.uint32)))


def test_rejects_indivisible_n():
    mesh = make_mesh(4)
    with pytest.raises(AssertionError):
        sort_big_distributed(4 * 2048 + 1, mesh, run_size=2048)


def test_checkpoint_resume(tmp_path, monkeypatch):
    """Kill after one bucket round; resume completes identically."""
    import tpu_qe.sort.bigsort as bs

    mesh = make_mesh(4)
    n = 4 * 2 * 2048
    kw = dict(run_size=2048, buckets_per_dev=2)
    ckdir = str(tmp_path)

    want = sort_big_distributed(n, mesh, **kw)
    assert want.all_ok

    real_record = bs._RunState.record
    calls = {"n": 0}

    def crashing_record(self, b, vals):
        real_record(self, b, vals)
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated kill")

    monkeypatch.setattr(bs._RunState, "record", crashing_record)
    with pytest.raises(RuntimeError, match="simulated kill"):
        sort_big_distributed(n, mesh, checkpoint_dir=ckdir, **kw)
    monkeypatch.setattr(bs._RunState, "record", real_record)

    res = sort_big_distributed(n, mesh, checkpoint_dir=ckdir, **kw)
    assert res.all_ok
    for f in ("n", "sorted_ok", "hash_ok", "count_ok", "perm_ok",
              "boundary_ok"):
        assert getattr(res, f) == getattr(want, f), f

    # a completed checkpoint replays; collect re-merges bit-exactly
    res2, (keys, pay) = sort_big_distributed(
        n, mesh, checkpoint_dir=ckdir, collect=True, **kw)
    assert res2.all_ok
    want_keys, want_pay = _oracle(n)
    np.testing.assert_array_equal(keys, want_keys)
    np.testing.assert_array_equal(pay, want_pay)


def test_two_tier_exchange_unequal_caps():
    # Direct unit test of the two-tier segment exchange with a hand-built
    # plan where the DIAGONAL share is much larger than any off-diagonal
    # segment (cap_blk=1024 vs cap_off=16) — the condition the hash-keyed
    # end-to-end tests cannot produce. Both clamp windows are active:
    # device 1's diagonal start (1014) must clamp against run - cap_blk
    # and carry a delta, while its off-diagonal start uses the cap_off
    # ceiling.
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tpu_qe.sort.dbigsort import _exchange_fn
    from tpu_qe.exchange.shuffle import AXIS

    mesh = make_mesh(2)
    run = 2048
    cap_blk, cap_off = 1024, 16
    # device d's run column: value = d*10000 + position (distinct, traceable)
    col = np.concatenate([d * 10000 + np.arange(run, dtype=np.uint32)
                          for d in range(2)]).astype(np.uint32)
    # plan[s, t]: device 0 keeps [0, 1000) local, sends [1000, 1010) to 1;
    # device 1 sends [4, 14) to 0, keeps [14, 1038) local.
    starts = np.array([[0, 1000], [4, 14]], np.int64)
    sizes = np.array([[1000, 10], [10, 1024]], np.int64)
    off_ceiling, diag_ceiling = run - cap_off, run - cap_blk
    st = np.minimum(starts, off_ceiling)
    dl = starts - st
    st_d = np.minimum(starts, diag_ceiling)
    dl_d = starts - st_d

    sh = NamedSharding(mesh, P(AXIS, None))
    put = lambda x: jax.device_put(jnp.asarray(x, jnp.int32), sh)
    data = jax.device_put(jnp.asarray(col),
                          NamedSharding(mesh, P(AXIS)))
    fn = _exchange_fn(mesh, 2, cap_blk, cap_off)
    blo, bhi, bpay = fn(put(st), put(dl), put(sizes), put(st_d), put(dl_d),
                        data, data, data)
    blo = np.asarray(blo).reshape(2, 2, cap_blk)  # [dest, src, slot]
    ONES = 0xFFFFFFFF

    def valid(dest, src):
        row = blo[dest, src]
        return row[row != ONES]

    np.testing.assert_array_equal(valid(0, 0), np.arange(0, 1000))
    np.testing.assert_array_equal(valid(0, 1), 10000 + np.arange(4, 14))
    np.testing.assert_array_equal(valid(1, 0), np.arange(1000, 1010))
    np.testing.assert_array_equal(valid(1, 1), 10000 + np.arange(14, 1038))


def test_payload_cols_distributed():
    # table-shaped rows through the whole composed path: runner sorts,
    # segment exchange, bucket merges — values verified per row
    from tpu_qe.sort.bigsort import _value_col_numpy

    mesh = make_mesh(4)
    n = 4 * 2 * 2048
    res, (keys, pay, vals) = sort_big_distributed(
        n, mesh, run_size=2048, buckets_per_dev=2, collect=True,
        payload_cols=3, force_composed=True)
    assert res.all_ok, res
    want = keygen_hash_numpy(np.arange(n, dtype=np.uint32))
    order = np.argsort(want, kind="stable")
    assert np.array_equal(keys, want[order])
    assert np.array_equal(pay, order.astype(np.uint32))
    assert len(vals) == 2
    for j, v in enumerate(vals):
        assert np.array_equal(
            v, _value_col_numpy(order.astype(np.uint32), j))
