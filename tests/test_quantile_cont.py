"""PERCENTILE_CONT at every tier vs numpy's linear interpolation
(ops/quantile.py, exchange/dquantile.py, ops/bigquantile.py,
ops/dbigquantile.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_qe.bits import U64
from tpu_qe.exchange import make_mesh
from tpu_qe.exchange.dquantile import (distributed_group_quantile_cont,
                                       distributed_quantile_cont)
from tpu_qe.hashing import keygen_hash_numpy
from tpu_qe.ops.bigquantile import quantile_cont_big
from tpu_qe.ops.dbigquantile import quantile_cont_big_distributed
from tpu_qe.ops.quantile import (cont_rank, group_quantile_cont,
                                 quantile_cont)
from tpu_qe.table import Table

QS = [0.0, 0.25, (1, 1), 0.75, 0.9, 1.0]


def _exact(res, i):
    """The exact rational answer for q index i as a python Fraction-free
    float (f64 host arithmetic over exact integer fields)."""
    lo = np.asarray(res.lower)[i].astype(np.float64)
    up = np.asarray(res.upper)[i].astype(np.float64)
    return lo + (up - lo) * (res.frac_num[i] / (1 << res.shifts[i]))


def _np_cont(vals, q):
    # compare at the SNAPPED q (floats snap to the 2^-20 grid, module
    # docstring) — the snap moves the interpolation point itself, which
    # is semantics, not error
    qq = round(q * (1 << 20)) / (1 << 20)
    return np.percentile(vals.astype(np.float64), qq * 100,
                         method="linear")


def test_cont_rank_exact_ints():
    # q=0.75 of n=6: RN = 0.75*5 = 3.75 -> f=3, c=4, frac=0.75
    num, sh = 3, 2
    f, c, fr = cont_rank(num, sh, 6)
    assert (f, c) == (3, 4) and fr / (1 << sh) == 0.75
    # exact dyadic landing on an integer rank: frac == 0, f == c
    f, c, fr = cont_rank(1, 1, 5)    # 0.5*4 = 2.0
    assert (f, c, fr) == (2, 2, 0)


@pytest.mark.parametrize("dtype", [np.float32, np.int32, np.uint32])
def test_global_matches_numpy(dtype):
    rng = np.random.default_rng(0)
    if dtype == np.float32:
        vals = rng.normal(0, 100, 1 << 12).astype(dtype)
    else:
        vals = rng.integers(0, 1 << 20, 1 << 12).astype(dtype)
    res = quantile_cont(jnp.asarray(vals), QS)
    for i, q in enumerate([0.0, 0.25, 0.5, 0.75, 0.9, 1.0]):
        want = _np_cont(vals, q)
        assert abs(_exact(res, i) - want) < 1e-6 * max(1, abs(want)), \
            (q, _exact(res, i), want)
        got_f32 = float(np.asarray(res.value)[i])
        assert abs(got_f32 - want) < 1e-4 * max(1.0, abs(want))


def test_global_u64_exact_fields():
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 1 << 63, 1 << 10, dtype=np.uint64)
    res = quantile_cont(U64.from_numpy(vals), [0.5, 0.9])
    assert res.value is None
    sv = np.sort(vals)
    n = len(vals)
    for i, q in enumerate([0.5, 0.9]):
        f, c, fr = cont_rank(round(q * (1 << 20)), 20, n)
        assert res.lower.to_numpy()[i] == sv[f]
        assert res.upper.to_numpy()[i] == sv[c]
        assert res.frac_num[i] == fr


def test_group_cont_matches_loop_oracle():
    rng = np.random.default_rng(2)
    n, g = 1 << 12, 37
    keys = rng.integers(0, g, n).astype(np.uint64)
    vals = rng.normal(0, 50, n).astype(np.float32)
    res = group_quantile_cont(U64.from_numpy(keys), jnp.asarray(vals),
                              [0.25, (1, 1), 0.9])
    ng = int(res.num_groups)
    assert ng == len(np.unique(keys))
    gk = res.key.to_numpy()[:ng]
    lower = np.asarray(res.lower)[:, :ng]
    upper = np.asarray(res.upper)[:, :ng]
    frac = np.asarray(res.frac)[:, :ng]
    val = np.asarray(res.value)[:, :ng]
    for i, q in enumerate([0.25, 0.5, 0.9]):
        for j, k in enumerate(gk):
            grp = np.sort(vals[keys == k])
            want = _np_cont(grp, q)
            got = (lower[i, j].astype(np.float64)
                   + (upper[i, j].astype(np.float64) - lower[i, j])
                   * frac[i, j] / (1 << res.shifts[i]))
            assert abs(got - want) < 1e-6 * max(1, abs(want))
            assert abs(val[i, j] - want) < 1e-3 * max(1.0, abs(want))


def test_single_row_groups_degenerate():
    keys = np.arange(16, dtype=np.uint64)
    vals = np.arange(16, dtype=np.float32) * 3
    res = group_quantile_cont(U64.from_numpy(keys), jnp.asarray(vals),
                              [0.5])
    ng = int(res.num_groups)
    assert ng == 16
    np.testing.assert_array_equal(np.asarray(res.lower)[0, :ng],
                                  np.asarray(res.upper)[0, :ng])
    assert (np.asarray(res.frac)[0, :ng] == 0).all()


def test_table_api():
    rng = np.random.default_rng(3)
    vals = rng.normal(0, 1, 512).astype(np.float32)
    t = Table({"v": jnp.asarray(vals)})
    res = t.quantile_cont([0.5], key="v")
    assert abs(float(np.asarray(res.value)[0])
               - _np_cont(vals, 0.5)) < 1e-5


def test_distributed_global_bit_identical_to_incore():
    mesh = make_mesh(8)
    rng = np.random.default_rng(4)
    vals = rng.normal(0, 100, 1 << 12).astype(np.float32)
    inc = quantile_cont(jnp.asarray(vals), QS)
    res = distributed_quantile_cont(jnp.asarray(vals), QS, mesh)
    np.testing.assert_array_equal(np.asarray(res.lower),
                                  np.asarray(inc.lower))
    np.testing.assert_array_equal(np.asarray(res.upper),
                                  np.asarray(inc.upper))
    assert res.frac_num == inc.frac_num and res.shifts == inc.shifts


def test_distributed_global_u64():
    mesh = make_mesh(4)
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 1 << 60, 1 << 10, dtype=np.uint64)
    inc = quantile_cont(U64.from_numpy(vals), [0.5, 0.99])
    res = distributed_quantile_cont(U64.from_numpy(vals), [0.5, 0.99],
                                    mesh)
    np.testing.assert_array_equal(res.lower.to_numpy(),
                                  inc.lower.to_numpy())
    np.testing.assert_array_equal(res.upper.to_numpy(),
                                  inc.upper.to_numpy())


def test_distributed_group_cont_matches_incore():
    mesh = make_mesh(8)
    rng = np.random.default_rng(6)
    n, g = 1 << 12, 13
    keys = rng.integers(0, g, n).astype(np.uint64)
    vals = rng.normal(0, 50, n).astype(np.float32)
    inc = group_quantile_cont(U64.from_numpy(keys), jnp.asarray(vals),
                              [0.25, 0.9])
    gk, lower, upper, frac, shifts, val, cnt, ng, ovf = \
        distributed_group_quantile_cont(U64.from_numpy(keys),
                                        jnp.asarray(vals), [0.25, 0.9],
                                        mesh, max_groups=32)
    assert not int(ovf)
    ngi = int(ng)
    assert ngi == int(inc.num_groups) == g
    np.testing.assert_array_equal(gk.to_numpy()[:ngi],
                                  inc.key.to_numpy()[:ngi])
    np.testing.assert_array_equal(np.asarray(lower)[:, :ngi],
                                  np.asarray(inc.lower)[:, :ngi])
    np.testing.assert_array_equal(np.asarray(upper)[:, :ngi],
                                  np.asarray(inc.upper)[:, :ngi])
    np.testing.assert_array_equal(np.asarray(frac)[:, :ngi],
                                  np.asarray(inc.frac)[:, :ngi])
    np.testing.assert_array_equal(np.asarray(cnt)[:ngi],
                                  np.asarray(inc.count)[:ngi])


def test_bigquantile_cont_matches_numpy():
    n, rs = 1 << 12, 1 << 10
    res = quantile_cont_big(n, [0.5, 0.9], run_size=rs)
    assert res.all_ok
    keys = keygen_hash_numpy(np.arange(n, dtype=np.uint32), 7)
    sv = np.sort(keys)
    for i, q in enumerate([0.5, 0.9]):
        f, c, fr = cont_rank(round(q * (1 << 20)), 20, n)
        assert res.lower[i] == sv[f] and res.upper[i] == sv[c]
        assert res.frac_num[i] == fr


def test_dbigquantile_cont_matches_singlechip():
    mesh = make_mesh(4)
    n, rs = 1 << 12, 1 << 10
    single = quantile_cont_big(n, [0.5, 0.75], run_size=rs)
    dist = quantile_cont_big_distributed(n, [0.5, 0.75], mesh,
                                         run_size=rs)
    assert single.all_ok and dist.all_ok
    np.testing.assert_array_equal(dist.lower, single.lower)
    np.testing.assert_array_equal(dist.upper, single.upper)
    assert dist.frac_num == single.frac_num
