"""Distributed sort tests on the fake 8-device CPU mesh (SURVEY.md §4)."""

import jax
import numpy as np
import pytest

from tpu_qe.exchange import distributed_sort_numpy, make_mesh


def _mesh(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")
    return make_mesh(n)


class TestDistributedSort:
    @pytest.mark.parametrize("n_dev", [2, 4, 8])
    def test_uniform_keys_bit_exact(self, n_dev):
        mesh = _mesh(n_dev)
        rng = np.random.default_rng(n_dev)
        keys = rng.integers(0, 1 << 64, size=1 << 13, dtype=np.uint64)
        payload = np.arange(len(keys), dtype=np.uint32)
        k, p = distributed_sort_numpy(keys, payload, mesh)
        order = np.argsort(keys, kind="stable")
        np.testing.assert_array_equal(k, keys[order])
        np.testing.assert_array_equal(p, order.astype(np.uint32))

    def test_zipf_skewed_keys(self, n_dev=8):
        # heavy-tailed duplicates: splitter sampling must still balance
        mesh = _mesh(n_dev)
        rng = np.random.default_rng(42)
        ranks = rng.zipf(1.3, size=1 << 13).astype(np.uint64)
        keys = (ranks * np.uint64(0x9E3779B97F4A7C15)) & np.uint64((1 << 64) - 1)
        payload = np.arange(len(keys), dtype=np.uint32)
        k, p = distributed_sort_numpy(keys, payload, mesh,
                                      capacity_factor=4.0)
        order = np.argsort(keys, kind="stable")
        np.testing.assert_array_equal(k, keys[order])
        np.testing.assert_array_equal(p, order.astype(np.uint32))

    def test_all_equal_keys(self, n_dev=4):
        # worst-case skew: every key identical. Position splitters route
        # identity (src d -> dest d) and the two-tier exchange keeps
        # diagonal rows local, so the DEFAULT capacity factor suffices
        # (round 1 needed capacity_factor = n_dev here).
        mesh = _mesh(n_dev)
        keys = np.full(1 << 10, 12345, dtype=np.uint64)
        payload = np.arange(len(keys), dtype=np.uint32)
        k, p = distributed_sort_numpy(keys, payload, mesh)
        np.testing.assert_array_equal(k, keys)
        np.testing.assert_array_equal(p, payload)

    def test_max_key_values_not_confused_with_padding(self, n_dev=4):
        mesh = _mesh(n_dev)
        rng = np.random.default_rng(1)
        keys = rng.integers(0, 1 << 64, size=1 << 10, dtype=np.uint64)
        keys[::5] = np.uint64(0xFFFFFFFFFFFFFFFF)  # real all-ones keys
        payload = np.arange(len(keys), dtype=np.uint32)
        k, p = distributed_sort_numpy(keys, payload, mesh,
                                      capacity_factor=4.0)
        order = np.argsort(keys, kind="stable")
        np.testing.assert_array_equal(k, keys[order])
        np.testing.assert_array_equal(p, order.astype(np.uint32))

    def test_overflow_detected(self, n_dev=4):
        # adversarial TRUE off-diagonal overload: keys descend across the
        # mesh, so device d's whole shard must move to device D-1-d (the
        # reversal permutation) — per-pair demand = n_local >> capacity.
        # (All-zero keys no longer overflow: identity routing is local.)
        mesh = _mesh(n_dev)
        n = 1 << 10
        keys = np.arange(n, 0, -1).astype(np.uint64)
        with pytest.raises(RuntimeError, match="capacity"):
            distributed_sort_numpy(keys, None, mesh, capacity_factor=1.0)

    def test_keys_only(self, n_dev=8):
        mesh = _mesh(n_dev)
        rng = np.random.default_rng(3)
        keys = rng.integers(0, 1 << 64, size=1 << 12, dtype=np.uint64)
        k = distributed_sort_numpy(keys, None, mesh)
        np.testing.assert_array_equal(k, np.sort(keys))


def test_single_device_mesh_fast_path():
    mesh = make_mesh(1)
    rng = np.random.default_rng(5)
    keys = rng.integers(0, 1 << 64, size=1 << 12, dtype=np.uint64)
    payload = np.arange(len(keys), dtype=np.uint32)
    k, p = distributed_sort_numpy(keys, payload, mesh)
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(k, keys[order])
    np.testing.assert_array_equal(p, order.astype(np.uint32))


def test_all_equal_keys_split_across_devices(n_dev=8):
    # heavy-key splitting: position splitters route an all-equal dataset
    # identically (source s -> dest s: zero data movement, balanced
    # totals), so every device ends with n/D rows instead of one device
    # receiving everything. The two-tier exchange keeps the fat identity
    # pair local, so the default capacity factor suffices.
    mesh = _mesh(n_dev)
    keys = np.full(1 << 12, 777, dtype=np.uint64)
    payload = np.arange(len(keys), dtype=np.uint32)
    k, p = distributed_sort_numpy(keys, payload, mesh)
    np.testing.assert_array_equal(k, keys)
    np.testing.assert_array_equal(p, payload)  # stability across the split

    # balance check: every device holds exactly n/D real rows
    from tpu_qe.bits import U64
    from tpu_qe.exchange import distributed_sort
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    u = U64.from_numpy(keys)
    sh = NamedSharding(mesh, P("x"))
    key = U64(jax.device_put(u.lo, sh), jax.device_put(u.hi, sh))
    res, _ = distributed_sort(key, mesh=mesh)
    valid = np.asarray(res.valid).reshape(n_dev)
    expect = len(keys) // n_dev
    assert (np.abs(valid.astype(np.int64) - expect) <= 2).all(), valid


def test_zipf_low_capacity(n_dev=8):
    mesh = _mesh(n_dev)
    rng = np.random.default_rng(11)
    ranks = rng.zipf(1.2, size=1 << 13).astype(np.uint64)
    keys = ranks * np.uint64(0x9E3779B97F4A7C15)
    payload = np.arange(len(keys), dtype=np.uint32)
    k, p = distributed_sort_numpy(keys, payload, mesh, capacity_factor=2.0)
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(k, keys[order])
    np.testing.assert_array_equal(p, order.astype(np.uint32))


def test_adversarial_reversal_auto_capacity(n_dev=8):
    # the reversal permutation (every shard moves wholesale to another
    # device) overflows any O(n_local/D) uniform budget; "auto" plans the
    # exchange (plan_sort_capacity) and sizes the receive layout to the
    # measured per-pair demand (~n_local), so it just works.
    mesh = _mesh(n_dev)
    n = 1 << 13
    keys = np.arange(n, 0, -1).astype(np.uint64)
    payload = np.arange(n, dtype=np.uint32)
    k, p = distributed_sort_numpy(keys, payload, mesh,
                                  capacity_factor="auto")
    np.testing.assert_array_equal(k, np.sort(keys))
    np.testing.assert_array_equal(p, np.argsort(keys, kind="stable"))


def test_auto_capacity_zipf(n_dev=8):
    mesh = _mesh(n_dev)
    rng = np.random.default_rng(13)
    ranks = rng.zipf(1.2, size=1 << 13).astype(np.uint64)
    keys = ranks * np.uint64(0x9E3779B97F4A7C15)
    payload = np.arange(len(keys), dtype=np.uint32)
    k, p = distributed_sort_numpy(keys, payload, mesh,
                                  capacity_factor="auto")
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(k, keys[order])
    np.testing.assert_array_equal(p, order.astype(np.uint32))


def test_auto_capacity_is_demand_sized(n_dev=8):
    # identity route: measured off-diagonal demand ~0 -> capacity floor,
    # receive buffer D*16 + n_local instead of D * (factor * n_local / D).
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tpu_qe.bits import U64
    from tpu_qe.exchange.dsort import auto_capacity
    mesh = _mesh(n_dev)
    keys = np.full(1 << 12, 7, dtype=np.uint64)
    u = U64.from_numpy(keys)
    sh = NamedSharding(mesh, P("x"))
    key = U64(jax.device_put(u.lo, sh), jax.device_put(u.hi, sh))
    assert auto_capacity(key, mesh) == 16  # the floor: no off-diag demand


class TestOverlappedExchange:
    """dsort(overlap=k): chunked sub-exchanges + merge tree (SURVEY §2c
    exchange/compute overlap). Must be bit-identical to the monolithic
    path on the valid prefix."""

    @pytest.mark.parametrize("n_dev", [2, 4, 8])
    @pytest.mark.parametrize("k", [2, 4])
    def test_bit_identical_to_monolithic(self, n_dev, k):
        mesh = _mesh(n_dev)
        rng = np.random.default_rng(100 * n_dev + k)
        n = 1 << 13
        keys = rng.integers(0, 1 << 64, size=n, dtype=np.uint64)
        keys[::5] = keys[1]  # duplicates exercise the stability rank
        payload = np.arange(n, dtype=np.uint32)
        k_m, p_m = distributed_sort_numpy(keys, payload, mesh,
                                          capacity_factor=3.0)
        k_o, p_o = distributed_sort_numpy(keys, payload, mesh,
                                          capacity_factor=3.0, overlap=k)
        np.testing.assert_array_equal(k_o, k_m)
        np.testing.assert_array_equal(p_o, p_m)
        order = np.argsort(keys, kind="stable")
        np.testing.assert_array_equal(k_o, keys[order])
        np.testing.assert_array_equal(p_o, order.astype(np.uint32))

    def test_zipf_overlap(self, n_dev=8, k=4):
        mesh = _mesh(n_dev)
        rng = np.random.default_rng(77)
        ranks = rng.zipf(1.3, size=1 << 13).astype(np.uint64)
        keys = ranks * np.uint64(0x9E3779B97F4A7C15)
        payload = np.arange(len(keys), dtype=np.uint32)
        k_o, p_o = distributed_sort_numpy(keys, payload, mesh,
                                          capacity_factor=4.0, overlap=k)
        order = np.argsort(keys, kind="stable")
        np.testing.assert_array_equal(k_o, keys[order])
        np.testing.assert_array_equal(p_o, order.astype(np.uint32))

    def test_all_equal_keys_overlap(self, n_dev=4, k=2):
        # identity route: every chunk is pure local tail, zero collective
        mesh = _mesh(n_dev)
        keys = np.full(1 << 12, 99, dtype=np.uint64)
        payload = np.arange(len(keys), dtype=np.uint32)
        k_o, p_o = distributed_sort_numpy(keys, payload, mesh, overlap=k)
        np.testing.assert_array_equal(k_o, keys)
        np.testing.assert_array_equal(p_o, payload)

    def test_overlap_overflow_detected(self, n_dev=4, k=2):
        mesh = _mesh(n_dev)
        n = 1 << 12
        keys = np.arange(n, 0, -1).astype(np.uint64)  # reversal route
        with pytest.raises(RuntimeError, match="capacity"):
            distributed_sort_numpy(keys, None, mesh, capacity_factor=1.0,
                                   overlap=k)


@pytest.mark.parametrize("n_dev,overlap", [(2, 1), (8, 2)])
def test_distributed_flagship_pipeline(n_dev, overlap):
    """Mesh-sharded morton encode + distributed sort equals the
    single-machine pipeline result exactly."""
    import jax.numpy as jnp

    from tpu_qe import morton
    from tpu_qe.pipeline import sorted_morton_index_distributed
    from tpu_qe.sort import sort_u64

    mesh = _mesh(n_dev)
    rng = np.random.default_rng(n_dev)
    n = 1 << 13
    x = rng.uniform(-50, 50, n).astype(np.float32)
    y = rng.uniform(-50, 50, n).astype(np.float32)
    z = rng.uniform(-50, 50, n).astype(np.float32)
    params = morton.MortonParams.for_scene(
        np.array([-50.0] * 3, np.float32), np.array([50.0] * 3, np.float32))

    res, overflow = sorted_morton_index_distributed(
        x, y, z, params, mesh, overlap=overlap)
    assert int(np.asarray(overflow).max()) == 0

    # single-machine oracle: the JITTED pipeline (eager-mode encode
    # rounds differently under the x64-enabled test config — only
    # jit-vs-jit is the meaningful bit-exactness contract)
    import jax

    @jax.jit
    def local_pipeline(x, y, z):
        code = morton.encode_points(x, y, z, params)
        return sort_u64(code, jnp.arange(n, dtype=jnp.uint32))

    skey, (sidx,) = local_pipeline(jnp.asarray(x), jnp.asarray(y),
                                   jnp.asarray(z))

    # compact the distributed result and compare
    lo = np.asarray(res.key.lo).reshape(n_dev, -1)
    hi = np.asarray(res.key.hi).reshape(n_dev, -1)
    pay = np.asarray(res.payloads[0]).reshape(n_dev, -1)
    valid = np.asarray(res.valid).reshape(n_dev)
    got_lo = np.concatenate([lo[d, :valid[d]] for d in range(n_dev)])
    got_hi = np.concatenate([hi[d, :valid[d]] for d in range(n_dev)])
    got_pay = np.concatenate([pay[d, :valid[d]] for d in range(n_dev)])
    np.testing.assert_array_equal(got_lo, np.asarray(skey.lo))
    np.testing.assert_array_equal(got_hi, np.asarray(skey.hi))
    np.testing.assert_array_equal(got_pay, np.asarray(sidx))
