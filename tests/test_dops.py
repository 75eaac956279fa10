"""Distributed join/aggregate tests on the fake 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from tpu_qe.exchange import make_mesh
from tpu_qe.exchange.dops import (distributed_aggregate_numpy,
                                  distributed_join_fk_numpy)


def _mesh(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")
    return make_mesh(n)


class TestDistributedJoin:
    @pytest.mark.parametrize("n_dev", [2, 8])
    def test_matches_local_oracle(self, n_dev):
        mesh = _mesh(n_dev)
        rng = np.random.default_rng(n_dev)
        n_r = 1 << 10
        rkeys = np.unique(rng.integers(0, 1 << 62, 2 * n_r, dtype=np.uint64))[:n_r]
        rvals = (np.arange(n_r, dtype=np.uint32) * 11 + 1)
        n_l = 1 << 11
        hit = rkeys[rng.integers(0, n_r, n_l // 2)]
        miss = rng.integers(0, 1 << 62, n_l - n_l // 2, dtype=np.uint64) | (
            np.uint64(1) << np.uint64(62))  # disjoint from rkeys
        lkeys = np.concatenate([hit, miss])
        rng.shuffle(lkeys)

        # the miss-key range is disjoint from right keys, so right rows
        # legitimately concentrate on the lower devices — genuinely
        # off-diagonal demand. "auto" plans both exchanges and sizes the
        # receive layouts to the measured demand (no n_dev factor guess).
        matched, (rv,) = distributed_join_fk_numpy(
            lkeys, [], rkeys, [rvals], mesh, capacity_factor="auto")
        pos = {int(k): i for i, k in enumerate(rkeys)}
        for i, k in enumerate(lkeys):
            if int(k) in pos:
                assert matched[i], i
                assert rv[i] == pos[int(k)] * 11 + 1
            else:
                assert not matched[i], i

    def test_skewed_left_keys(self, n_dev=4):
        # many left duplicates of few right keys — hotspots on one device
        mesh = _mesh(n_dev)
        rng = np.random.default_rng(0)
        rkeys = np.arange(1, 65, dtype=np.uint64) * np.uint64(12345)
        rvals = np.arange(64, dtype=np.uint32)
        lkeys = rkeys[rng.zipf(1.5, size=1 << 10).clip(1, 64) - 1]
        matched, (rv,) = distributed_join_fk_numpy(
            lkeys, [], rkeys, [rvals], mesh, capacity_factor="auto")
        assert matched.all()
        pos = {int(k): i for i, k in enumerate(rkeys)}
        assert all(rv[i] == pos[int(k)] for i, k in enumerate(lkeys))


class TestDistributedAggregate:
    @pytest.mark.parametrize("n_dev", [2, 8])
    def test_count_sum_vs_numpy(self, n_dev):
        mesh = _mesh(n_dev)
        rng = np.random.default_rng(n_dev + 10)
        n = 1 << 12
        keys = rng.integers(0, 50, n).astype(np.uint64) * np.uint64(
            0x9E3779B97F4A7C15)
        vals = rng.integers(0, 1000, n, dtype=np.uint32)
        got = distributed_aggregate_numpy(keys, vals, mesh,
                                          aggs=("count", "sum"),
                                          capacity_factor=4.0)
        import collections
        want_cnt = collections.Counter(int(k) & ((1 << 64) - 1) for k in keys)
        want_sum = collections.defaultdict(int)
        for k, v in zip(keys, vals):
            want_sum[int(k) & ((1 << 64) - 1)] += int(v)
        assert set(got) == set(want_cnt)
        for k in want_cnt:
            assert got[k]["count"] == want_cnt[k]
            assert got[k]["sum"] == want_sum[k]  # exact u64, not mod 2^32

    def test_auto_capacity_all_rows_one_key(self, n_dev=8):
        # adversarial skew: EVERY row shares one key. Phase 1 reduces each
        # shard to a single partial group, so the planned off-diagonal
        # demand is ~1 — "auto" must pass with no n_dev-factor crutch.
        mesh = _mesh(n_dev)
        n = 1 << 12
        keys = np.full(n, 0xDEADBEEF, dtype=np.uint64)
        vals = np.arange(n, dtype=np.uint32)
        got = distributed_aggregate_numpy(keys, vals, mesh,
                                          aggs=("count", "sum"),
                                          capacity_factor="auto")
        assert got == {0xDEADBEEF: {
            "count": n, "sum": n * (n - 1) // 2}}

    def test_auto_capacity_many_groups(self, n_dev=4):
        mesh = _mesh(n_dev)
        rng = np.random.default_rng(31)
        n = 1 << 12
        keys = rng.integers(0, 200, n).astype(np.uint64)
        vals = rng.integers(0, 1000, n, dtype=np.uint32)
        got = distributed_aggregate_numpy(keys, vals, mesh,
                                          aggs=("count", "sum"),
                                          capacity_factor="auto")
        import collections
        want_cnt = collections.Counter(int(k) for k in keys)
        assert set(got) == set(want_cnt)
        for k in want_cnt:
            assert got[k]["count"] == want_cnt[k]
            sel = vals[keys == k]
            assert got[k]["sum"] == int(sel.sum())

    def test_sums_past_2_32_exact(self, n_dev=4):
        # partial sums overflow u32 on every shard AND the phase-3
        # combine must add the u64 pairs with carry — end-to-end exact
        mesh = _mesh(n_dev)
        rng = np.random.default_rng(21)
        n = 1 << 12
        keys = rng.integers(0, 4, n).astype(np.uint64)
        vals = np.full(n, 0xF0000000, dtype=np.uint32)
        got = distributed_aggregate_numpy(keys, vals, mesh,
                                          aggs=("sum", "count"),
                                          capacity_factor=4.0)
        for k in np.unique(keys):
            want = int((keys == k).sum()) * 0xF0000000
            assert want > (1 << 32)
            assert got[int(k)]["sum"] == want

    def test_min_max(self, n_dev=4):
        mesh = _mesh(n_dev)
        rng = np.random.default_rng(2)
        n = 1 << 12
        keys = rng.integers(0, 20, n).astype(np.uint64)
        vals = rng.integers(0, 1 << 31, n, dtype=np.uint32)
        got = distributed_aggregate_numpy(keys, vals, mesh,
                                          aggs=("count", "min", "max"),
                                          capacity_factor=4.0)
        for k in set(int(x) for x in keys):
            sel = vals[keys == k]
            assert got[k]["min"] == sel.min()
            assert got[k]["max"] == sel.max()

    def test_all_ones_key_group(self, n_dev=2):
        # a REAL all-ones key must survive the padding convention
        mesh = _mesh(n_dev)
        keys = np.full(256, (1 << 64) - 1, dtype=np.uint64)
        vals = np.ones(256, dtype=np.uint32)
        got = distributed_aggregate_numpy(keys, vals, mesh,
                                          aggs=("count", "sum"),
                                          capacity_factor=4.0)
        k = (1 << 64) - 1
        assert got[k]["count"] == 256
        assert got[k]["sum"] == 256


def test_min_only_no_phantom_padding_group(n_dev=4):
    # regression: without 'count' in aggs, padding groups used to leak
    # through as a phantom all-ones key with min=0xFFFFFFFF
    mesh = _mesh(n_dev)
    rng = np.random.default_rng(6)
    keys = rng.integers(0, 10, 1 << 10).astype(np.uint64)
    vals = rng.integers(0, 1 << 30, 1 << 10, dtype=np.uint32)
    got = distributed_aggregate_numpy(keys, vals, mesh, aggs=("min",),
                                      capacity_factor=4.0)
    assert set(got) == set(int(k) for k in keys)
    for k in got:
        assert got[k] == {"min": int(vals[keys == k].min())}


def test_float_values_sum_min_max(n_dev=4):
    # regression: float values used to be silently truncated to uint32,
    # and the uint32 pad neutrals corrupted float min/max
    mesh = _mesh(n_dev)
    rng = np.random.default_rng(21)
    n = 1 << 10
    keys = rng.integers(0, 12, n).astype(np.uint64)
    vals = (rng.standard_normal(n) * 10).astype(np.float32)  # negatives too
    got = distributed_aggregate_numpy(keys, vals, mesh,
                                      aggs=("count", "sum", "min", "max"),
                                      capacity_factor=4.0)
    for k in set(int(x) for x in keys):
        sel = vals[keys == k]
        assert got[k]["count"] == len(sel)
        assert abs(got[k]["sum"] - float(sel.sum())) < 1e-2 * max(
            1.0, abs(float(sel.sum())))
        assert got[k]["min"] == float(sel.min())
        assert got[k]["max"] == float(sel.max())


def test_signed_negative_min_max_rejected(n_dev=2):
    # regression (ADVICE r1): int32 values with negatives were silently
    # reinterpreted as u32, so min/max aggregated in unsigned order
    # (min([-1, 5]) -> 5). Now rejected with guidance.
    mesh = _mesh(n_dev)
    keys = np.array([1, 1, 2, 2], dtype=np.uint64)
    vals = np.array([-1, 5, 3, -7], dtype=np.int32)
    with pytest.raises(ValueError, match="unsigned order"):
        distributed_aggregate_numpy(keys, vals, mesh, aggs=("min",))
    # sum/count of negatives stays legal (exact u32 wraparound)
    got = distributed_aggregate_numpy(keys, vals, mesh,
                                      aggs=("count", "sum"),
                                      capacity_factor=4.0)
    assert got[1]["count"] == 2 and got[2]["count"] == 2
    # int32 columns sum their two's-complement bit patterns; the low
    # 32 bits are the familiar mod-2^32 signed result
    assert got[1]["sum"] & 0xFFFFFFFF == 4
    # non-negative signed min/max still allowed
    got = distributed_aggregate_numpy(
        keys, np.abs(vals), mesh, aggs=("min",), capacity_factor=4.0)
    assert got[1]["min"] == 1 and got[2]["min"] == 3


def test_hot_left_key_splits_with_right_broadcast(n_dev=8):
    # ALL left rows share one key: previously every row routed to a single
    # device (that shard received the whole dataset); position splitters
    # spread them across devices and the straddling right row is broadcast
    # so every shard matches. The identity-aligned left route stays LOCAL
    # under the two-tier exchange, so the default factor suffices; the
    # BALANCE is observable: every device receives ~n/D real rows.
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpu_qe.bits import U64
    from tpu_qe.exchange.dops import distributed_join_fk

    mesh = _mesh(n_dev)
    n_l = 1 << 12
    lkeys = np.full(n_l, 424242, dtype=np.uint64)
    rkeys = np.array([424242, 7, 8, 9, 10, 11, 12, 13], dtype=np.uint64)
    rvals = np.arange(len(rkeys), dtype=np.uint32) + 100
    matched, (rv,) = distributed_join_fk_numpy(
        lkeys, [], rkeys, [rvals], mesh, capacity_factor="auto")
    assert matched.all()
    assert (rv == 100).all()

    # balance: count real received left rows per device via pad flags
    sh = NamedSharding(mesh, P("x"))
    u = U64.from_numpy(lkeys)
    lk = U64(jax.device_put(u.lo, sh), jax.device_put(u.hi, sh))
    ru = U64.from_numpy(rkeys)
    rk = U64(jax.device_put(ru.lo, sh), jax.device_put(ru.hi, sh))
    rv_dev = jax.device_put(jnp.asarray(rvals), sh)
    res = distributed_join_fk(lk, (), rk, (rv_dev,), mesh=mesh,
                              capacity_factor=2.0,
                              capacity_factor_right=2.0)
    flag = np.asarray(res[2]).reshape(n_dev, -1)
    per_dev = (flag == 0).sum(axis=1)
    assert per_dev.max() <= 2 * n_l // n_dev, per_dev


def test_mixed_hot_and_unique_left_keys(n_dev=4):
    mesh = _mesh(n_dev)
    rng = np.random.default_rng(31)
    rkeys = np.unique(rng.integers(0, 1 << 40, 256, dtype=np.uint64))
    rvals = (np.arange(len(rkeys), dtype=np.uint32) * 3 + 1)
    hot = rkeys[5]
    n_l = 1 << 11
    lkeys = np.where(rng.random(n_l) < 0.6, hot,
                     rkeys[rng.integers(0, len(rkeys), n_l)])
    matched, (rv,) = distributed_join_fk_numpy(
        lkeys, [], rkeys, [rvals], mesh, capacity_factor="auto")
    assert matched.all()
    pos = {int(k): i for i, k in enumerate(rkeys)}
    assert all(rv[i] == pos[int(k)] * 3 + 1 for i, k in enumerate(lkeys))


class TestDistributedInnerJoin:
    @staticmethod
    def _oracle_pairs(lkeys, rkeys, rvals):
        import collections
        where = collections.defaultdict(list)
        for j, k in enumerate(rkeys):
            where[int(k)].append(int(rvals[j]))
        out = []
        for i, k in enumerate(lkeys):
            for v in where.get(int(k), ()):
                out.append((i, v))
        return sorted(out)

    @pytest.mark.parametrize("n_dev", [2, 8])
    def test_duplicate_right_keys_vs_oracle(self, n_dev):
        from tpu_qe.exchange.dops import distributed_join_inner_numpy
        mesh = _mesh(n_dev)
        rng = np.random.default_rng(n_dev + 50)
        n_l, n_r = 1 << 11, 1 << 10
        lkeys = rng.integers(0, 200, n_l).astype(np.uint64)
        rkeys = rng.integers(0, 300, n_r).astype(np.uint64)  # dups + misses
        rvals = np.arange(n_r, dtype=np.uint32) * 5 + 2
        g, _, (rv,) = distributed_join_inner_numpy(
            lkeys, [], rkeys, [rvals], mesh, capacity_factor=4.0,
            out_budget_factor=16.0)
        got = sorted(zip(g.tolist(), rv.tolist()))
        assert got == self._oracle_pairs(lkeys, rkeys, rvals)

    def test_left_values_carried(self, n_dev=4):
        from tpu_qe.exchange.dops import distributed_join_inner_numpy
        mesh = _mesh(n_dev)
        rng = np.random.default_rng(3)
        n = 1 << 10
        lkeys = rng.integers(0, 64, n).astype(np.uint64)
        lvals = np.arange(n, dtype=np.uint32) * 7
        rkeys = np.arange(64, dtype=np.uint64)
        rkeys = np.tile(rkeys, 2)  # each key twice
        rvals = np.arange(128, dtype=np.uint32)
        g, (lv,), (rv,) = distributed_join_inner_numpy(
            lkeys, [lvals], rkeys, [rvals], mesh, capacity_factor=4.0,
            out_budget_factor=8.0)
        # every left row matches exactly 2 right rows
        assert len(g) == 2 * n
        np.testing.assert_array_equal(lv, lvals[g])
        # right value consistency: rv's key must equal the left key
        rmap = {}
        for j, k in enumerate(rkeys):
            rmap[int(rvals[j])] = int(k)
        assert all(rmap[int(v)] == int(lkeys[i])
                   for i, v in zip(g[:512], rv[:512]))

    def test_output_budget_overflow_detected(self, n_dev=2):
        from tpu_qe.exchange.dops import distributed_join_inner_numpy
        mesh = _mesh(n_dev)
        lkeys = np.full(1 << 8, 5, dtype=np.uint64)
        rkeys = np.full(1 << 8, 5, dtype=np.uint64)  # 65536 pairs, one dev
        with pytest.raises(RuntimeError, match="budget"):
            distributed_join_inner_numpy(
                lkeys, [], rkeys, [np.arange(1 << 8, dtype=np.uint32)],
                mesh, capacity_factor=float(n_dev),
                capacity_factor_right=float(n_dev), out_budget_factor=2.0)


class TestDistributedTopK:
    @pytest.mark.parametrize("n_dev", [2, 8])
    @pytest.mark.parametrize("largest", [False, True])
    def test_matches_single_machine(self, n_dev, largest):
        from tpu_qe.exchange.dops import distributed_top_k_numpy
        mesh = _mesh(n_dev)
        rng = np.random.default_rng(n_dev + 7 * largest)
        n = 1 << 12
        keys = rng.integers(0, 1 << 40, n, dtype=np.uint64)
        keys[::9] = keys[3]  # duplicates exercise the global tiebreak
        vals = np.arange(n, dtype=np.uint32) * 3
        k = 37
        ks, g, (v,) = distributed_top_k_numpy(keys, [vals], mesh, k,
                                              largest=largest)
        order = (np.lexsort((np.arange(n), ~keys)) if largest
                 else np.argsort(keys, kind="stable"))[:k]
        np.testing.assert_array_equal(ks, keys[order])
        np.testing.assert_array_equal(g, order.astype(np.uint32))
        np.testing.assert_array_equal(v, vals[order])

    def test_hot_key_everywhere(self, n_dev=4):
        from tpu_qe.exchange.dops import distributed_top_k_numpy
        mesh = _mesh(n_dev)
        n = 1 << 10
        keys = np.full(n, 5, dtype=np.uint64)
        ks, g, _ = distributed_top_k_numpy(keys, [], mesh, 8)
        np.testing.assert_array_equal(g, np.arange(8))


def test_distributed_topk_k_exceeds_shard_size(n_dev=8):
    from tpu_qe.exchange.dops import distributed_top_k_numpy
    mesh = _mesh(n_dev)
    rng = np.random.default_rng(4)
    n = 1 << 9  # 64 rows/shard
    keys = rng.permutation(n).astype(np.uint64)
    k = 200     # > 64 per shard
    ks, g, _ = distributed_top_k_numpy(keys, [], mesh, k)
    order = np.argsort(keys, kind="stable")[:k]
    np.testing.assert_array_equal(g, order.astype(np.uint32))
    np.testing.assert_array_equal(ks, keys[order])
