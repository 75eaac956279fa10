"""Distributed zero-row-movement quantiles vs the in-core operator and
numpy (exchange/dquantile.py)."""

import numpy as np
import pytest

from tpu_qe.bits import U64
from tpu_qe.exchange import make_mesh
from tpu_qe.exchange.dquantile import distributed_quantile_numpy
from tpu_qe.ops.quantile import canon_qs, disc_rank

QS = [0.0, 0.25, 0.5, (9, 4), 0.99, 1.0]


def _oracle(vals, qs):
    s = np.sort(vals)
    return np.array([s[disc_rank(num, sh, len(vals))]
                     for num, sh in canon_qs(qs)], dtype=vals.dtype)


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_u64_matches_oracle(n_dev):
    mesh = make_mesh(n_dev)
    rng = np.random.default_rng(n_dev)
    vals = rng.integers(0, 1 << 64, 1 << 12, dtype=np.uint64)
    got = distributed_quantile_numpy(vals, QS, mesh)
    np.testing.assert_array_equal(got, _oracle(vals, QS))


@pytest.mark.parametrize("dtype", [np.uint32, np.int32, np.float32])
def test_scalar_dtypes(dtype):
    mesh = make_mesh(8)
    rng = np.random.default_rng(7)
    if dtype == np.float32:
        vals = rng.standard_normal(1 << 12).astype(np.float32)
    else:
        vals = rng.integers(-9999 if dtype == np.int32 else 0, 9999,
                            1 << 12, dtype=np.int64).astype(dtype)
    got = distributed_quantile_numpy(vals, QS, mesh)
    np.testing.assert_array_equal(got, _oracle(vals, QS))


def test_duplicates_and_extremes():
    mesh = make_mesh(4)
    # heavy duplicates + boundary values: the greedy must land ON an
    # element, including 0 and all-ones
    vals = np.concatenate([
        np.zeros(100, np.uint64),
        np.full(100, 7, np.uint64),
        np.full(50, (1 << 64) - 1, np.uint64),
        np.arange(6, dtype=np.uint64) * np.uint64(1 << 40)]).astype(np.uint64)
    got = distributed_quantile_numpy(vals, QS, mesh)
    np.testing.assert_array_equal(got, _oracle(vals, QS))
    same = np.full(1 << 10, 42, dtype=np.uint64)
    got = distributed_quantile_numpy(same, [0.0, 0.5, 1.0], mesh)
    assert (got == 42).all()


def test_median_is_global_not_per_shard():
    # values arranged so every shard's local median differs from the
    # global one: shard d holds only value d
    mesh = make_mesh(8)
    vals = np.repeat(np.arange(8, dtype=np.uint64), 128)
    got = distributed_quantile_numpy(vals, [(1, 1)], mesh)
    s = np.sort(vals)
    assert got[0] == s[(len(vals) + 1) // 2 - 1]


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_group_quantile_matches_incore(n_dev):
    import jax.numpy as jnp
    from tpu_qe.exchange.dquantile import distributed_group_quantile_numpy
    from tpu_qe.ops.quantile import group_quantile

    mesh = make_mesh(n_dev)
    rng = np.random.default_rng(100 + n_dev)
    n = 1 << 12
    keys = rng.integers(0, 30, n).astype(np.uint64) << np.uint64(33)
    vals = rng.integers(-500, 500, n, dtype=np.int64).astype(np.int32)
    got = distributed_group_quantile_numpy(keys, vals, QS, mesh,
                                           max_groups=64)
    res = group_quantile(U64.from_numpy(keys), jnp.asarray(vals), QS)
    ng = int(res.num_groups)
    klo = np.asarray(res.key.lo)[:ng].astype(np.uint64)
    khi = np.asarray(res.key.hi)[:ng].astype(np.uint64)
    q = np.asarray(res.quantiles)[:, :ng]
    want = {int((h << np.uint64(32)) | l): list(q[:, i])
            for i, (h, l) in enumerate(zip(khi, klo))}
    assert got == want


def test_group_quantile_overflow_detected():
    from tpu_qe.exchange.dquantile import distributed_group_quantile_numpy
    mesh = make_mesh(4)
    n = 1 << 10
    keys = np.arange(n, dtype=np.uint64)  # n distinct > max_groups
    vals = np.zeros(n, dtype=np.uint32)
    with pytest.raises(RuntimeError, match="max_groups"):
        distributed_group_quantile_numpy(keys, vals, [0.5], mesh,
                                         max_groups=16)


def test_group_quantile_single_group_spanning_mesh():
    from tpu_qe.exchange.dquantile import distributed_group_quantile_numpy
    mesh = make_mesh(8)
    n = 1 << 11
    keys = np.full(n, 9, dtype=np.uint64)
    vals = np.arange(n, dtype=np.int64).astype(np.uint32)
    got = distributed_group_quantile_numpy(keys, vals, [(1, 1)], mesh,
                                           max_groups=8)
    assert got == {9: [np.uint32((n + 1) // 2 - 1)]}
