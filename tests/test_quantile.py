"""Exact PERCENTILE_DISC (global + per group) vs numpy oracles
(ops/quantile.py)."""

import numpy as np
import pytest

from tpu_qe.bits import U64
from tpu_qe.ops.quantile import (canon_qs, disc_rank, group_quantile,
                                 median, quantile)


def _disc_oracle(vals, num, shift):
    """PERCENTILE_DISC on sorted numpy data, exact integer rank math."""
    n = len(vals)
    r = -((-num * n) >> shift) - 1
    r = min(max(r, 0), n - 1)
    return np.sort(vals)[r]


def _u64(keys64):
    k = keys64.astype(np.uint64)
    return U64(k.astype(np.uint32), (k >> np.uint64(32)).astype(np.uint32))


QS = [0.0, 0.25, 0.5, (9, 4), 0.99, 1.0]  # (9, 4) = 9/16 exactly


def test_global_u64():
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 1 << 64, 4097, dtype=np.uint64)
    got = quantile(_u64(vals), QS).to_numpy()
    for g, (num, sh) in zip(got, canon_qs(QS)):
        assert g == _disc_oracle(vals, num, sh)


@pytest.mark.parametrize("dtype", [np.uint32, np.int32, np.float32])
def test_global_scalar_dtypes(dtype):
    rng = np.random.default_rng(1)
    if dtype == np.float32:
        vals = rng.standard_normal(1001).astype(np.float32)
    else:
        vals = rng.integers(-1000 if dtype == np.int32 else 0, 1000,
                            1001, dtype=np.int64).astype(dtype)
    import jax.numpy as jnp
    got = np.asarray(quantile(jnp.asarray(vals), QS))
    for g, (num, sh) in zip(got, canon_qs(QS)):
        assert g == _disc_oracle(vals, num, sh), (dtype, num, sh)


def test_median_is_element():
    vals = np.array([5, 1, 9, 3, 7], dtype=np.uint64)  # odd: middle = 5
    assert int(median(_u64(vals)).to_numpy()[0]) == 5
    vals = np.array([4, 1, 3, 2], dtype=np.uint64)  # even: lower = 2
    assert int(median(_u64(vals)).to_numpy()[0]) == 2


def test_group_quantile_oracle():
    rng = np.random.default_rng(2)
    n = 6000
    keys = rng.integers(0, 40, n).astype(np.uint64)
    vals = rng.integers(-500, 500, n, dtype=np.int64).astype(np.int32)
    import jax.numpy as jnp
    res = group_quantile(_u64(keys), jnp.asarray(vals), QS)
    ng = int(res.num_groups)
    gk = np.asarray(res.key.lo)[:ng]
    assert list(gk) == sorted({int(k) for k in keys})
    q = np.asarray(res.quantiles)[:, :ng]
    cnt = np.asarray(res.count)[:ng]
    for i, k in enumerate(gk):
        sel = vals[keys == k]
        assert cnt[i] == len(sel)
        for j, (num, sh) in enumerate(canon_qs(QS)):
            assert q[j, i] == _disc_oracle(sel, num, sh), (k, num, sh)


def test_group_quantile_single_row_groups_and_one_group():
    import jax.numpy as jnp
    keys = np.arange(100, dtype=np.uint64)          # every group 1 row
    vals = np.arange(100, dtype=np.uint32) * 7
    res = group_quantile(_u64(keys), jnp.asarray(vals), [0.0, 0.5, 1.0])
    ng = int(res.num_groups)
    assert ng == 100
    q = np.asarray(res.quantiles)[:, :ng]
    assert (q == vals[None, :]).all()               # any q = the row
    keys = np.zeros(1000, dtype=np.uint64)          # one group
    vals = np.arange(1000, dtype=np.uint32)
    res = group_quantile(_u64(keys), jnp.asarray(vals), [(1, 1)])
    assert int(np.asarray(res.quantiles)[0, 0]) == 499  # ceil(.5*1000)-1


@pytest.mark.parametrize("mg", [40, 64, 128])
def test_group_quantile_max_groups_matches_default(mg):
    # the searchsorted + bounded-gather extraction must equal the
    # compaction-sort default on the valid prefix (same recipe/test as
    # aggregate's max_groups path)
    rng = np.random.default_rng(5)
    n = 6000
    keys = rng.integers(0, 40, n).astype(np.uint64)
    vals = rng.integers(-500, 500, n, dtype=np.int64).astype(np.int32)
    import jax.numpy as jnp
    base = group_quantile(_u64(keys), jnp.asarray(vals), QS)
    got = group_quantile(_u64(keys), jnp.asarray(vals), QS,
                         max_groups=mg)
    ng = int(base.num_groups)
    assert int(got.num_groups) == ng
    assert int(got.overflow) == 0
    np.testing.assert_array_equal(np.asarray(got.key.lo)[:ng],
                                  np.asarray(base.key.lo)[:ng])
    np.testing.assert_array_equal(np.asarray(got.quantiles)[:, :ng],
                                  np.asarray(base.quantiles)[:, :ng])
    np.testing.assert_array_equal(np.asarray(got.count)[:ng],
                                  np.asarray(base.count)[:ng])


def test_group_quantile_max_groups_overflow_detected():
    import jax.numpy as jnp
    keys = np.arange(100, dtype=np.uint64)  # 100 groups > bound of 10
    vals = np.arange(100, dtype=np.uint32)
    res = group_quantile(_u64(keys), jnp.asarray(vals), [0.5],
                         max_groups=10)
    assert int(res.num_groups) == 100       # exact even past the bound
    assert int(res.overflow) == 1
    # the 10 extracted groups are the first 10 (ascending keys), correct
    np.testing.assert_array_equal(np.asarray(res.key.lo), np.arange(10))
    np.testing.assert_array_equal(np.asarray(res.quantiles)[0],
                                  np.arange(10))


def test_group_quantile_cont_max_groups_matches_default():
    from tpu_qe.ops.quantile import group_quantile_cont
    rng = np.random.default_rng(6)
    n = 4000
    keys = rng.integers(0, 30, n).astype(np.uint64)
    vals = rng.random(n).astype(np.float32)
    import jax.numpy as jnp
    base = group_quantile_cont(_u64(keys), jnp.asarray(vals),
                               [0.25, 0.75])
    got = group_quantile_cont(_u64(keys), jnp.asarray(vals),
                              [0.25, 0.75], max_groups=32)
    ng = int(base.num_groups)
    assert int(got.num_groups) == ng and int(got.overflow) == 0
    for f in ("lower", "upper", "frac", "value"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, f))[:, :ng],
            np.asarray(getattr(base, f))[:, :ng], err_msg=f)


def test_rank_math_exact_past_2_24():
    # the float path would mis-rank here: 0.5 * (2^24 + 3) isn't exact
    # in f32; the widening-multiply rank must hit ceil exactly
    n = (1 << 24) + 3
    assert disc_rank(1 << 19, 20, n) == ((n + 1) // 2) - 1


def test_spec_validation():
    with pytest.raises(ValueError, match="outside"):
        canon_qs([1.5])
    with pytest.raises(ValueError, match="bad"):
        canon_qs([(5, 2)])  # 5/4 > 1
    with pytest.raises(ValueError, match="at least one"):
        canon_qs([])


def test_device_rank_vs_python_ints():
    import jax.numpy as jnp
    from tpu_qe.ops.quantile import _disc_rank_device
    rng = np.random.default_rng(5)
    cnt = np.concatenate([
        rng.integers(1, 1 << 31, 4000, dtype=np.int64),
        np.array([1, 2, (1 << 24) + 1, (1 << 31) - 1])]).astype(np.uint32)
    for num, sh in canon_qs([0.0, 0.5, 0.9, 0.999, 1.0, (3, 5)]):
        got = np.asarray(_disc_rank_device(num, sh, jnp.asarray(cnt)))
        want = np.array([min(max(-((-num * int(c)) >> sh) - 1, 0),
                             int(c) - 1) for c in cnt], dtype=np.uint32)
        np.testing.assert_array_equal(got, want, err_msg=f"{num}/{1<<sh}")


def test_table_api():
    import jax.numpy as jnp
    from tpu_qe.table import Table
    rng = np.random.default_rng(9)
    n = 800
    keys = rng.integers(0, 10, n).astype(np.uint64)
    vals = rng.integers(0, 1000, n, dtype=np.int64).astype(np.uint32)
    t = Table.from_numpy({"key": keys, "v": vals})
    got = np.asarray(t.quantile([0.5], key="v"))
    assert got[0] == _disc_oracle(vals, *canon_qs([0.5])[0])
    res = t.group_quantile("key", "v", [(1, 1)])
    ng = int(res.num_groups)
    q = np.asarray(res.quantiles)[0, :ng]
    for i, k in enumerate(np.asarray(res.key.lo)[:ng]):
        assert q[i] == _disc_oracle(vals[keys == k], 1 << 19, 20)
