"""Whole-partition window functions (first_value / last_value / ntile /
percent_rank) vs numpy loop oracles, in-core + distributed
(ops/window.py, exchange/dwindow.py)."""

import numpy as np
import pytest

from tpu_qe.bits import U64
from tpu_qe.exchange import make_mesh
from tpu_qe.exchange.dwindow import distributed_window_numpy
from tpu_qe.ops.window import window

import jax.numpy as jnp


def _oracle(keys, order, vals, k_ntile):
    n = len(keys)
    out = {nm: np.zeros(n, np.uint32)
           for nm in ("fv", "lv", "nt")}
    out["pr"] = np.zeros(n, np.float32)
    for key in np.unique(keys):
        sel = np.flatnonzero(keys == key)
        o = sel[np.lexsort((sel, order[sel]))]   # order, then position
        cnt = len(o)
        out["fv"][o] = vals[o[0]]
        out["lv"][o] = vals[o[-1]]
        q, r = divmod(cnt, k_ntile)
        for j, row in enumerate(o):
            if j < r * (q + 1):
                out["nt"][row] = j // (q + 1) + 1
            else:
                out["nt"][row] = r + (j - r * (q + 1)) // max(q, 1) + 1
            rank = 1 + int((order[o] < order[row]).sum())
            out["pr"][row] = (rank - 1) / max(cnt - 1, 1)
    return out


FUNCS = {"fv": ("first_value", "v"), "lv": ("last_value", "v"),
         "nt": ("ntile", 3), "pr": ("percent_rank",)}


def _data(seed, n, n_part):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, n_part, n).astype(np.uint64)
    order = rng.integers(0, 40, n).astype(np.uint32)  # ties likely
    vals = rng.integers(1, 1 << 20, n).astype(np.uint32)
    return keys, order, vals


@pytest.mark.parametrize("n,n_part", [(257, 13), (1024, 1), (500, 499)])
def test_incore_matches_oracle(n, n_part):
    keys, order, vals = _data(n + n_part, n, n_part)
    res = window(U64.from_numpy(keys), FUNCS, order=jnp.asarray(order),
                 values={"v": jnp.asarray(vals)})
    want = _oracle(keys, order, vals, 3)
    for nm in ("fv", "lv", "nt"):
        np.testing.assert_array_equal(np.asarray(res.cols[nm]),
                                      want[nm], err_msg=nm)
    np.testing.assert_allclose(np.asarray(res.cols["pr"]), want["pr"],
                               rtol=1e-6)


def test_ntile_small_partitions():
    # cnt < k: buckets 1..cnt (each row its own bucket)
    keys = np.zeros(2, dtype=np.uint64)
    order = np.arange(2, dtype=np.uint32)
    res = window(U64.from_numpy(keys), {"nt": ("ntile", 5)},
                 order=jnp.asarray(order))
    np.testing.assert_array_equal(np.asarray(res.cols["nt"]), [1, 2])


def test_ntile_requires_int_k():
    with pytest.raises(ValueError):
        window(U64.from_numpy(np.zeros(4, np.uint64)),
               {"nt": ("ntile", "v")})


@pytest.mark.parametrize("n_dev", [2, 4, 8])
@pytest.mark.parametrize("n_part", [1, 7, 64])
def test_distributed_bit_identical(n_dev, n_part):
    mesh = make_mesh(n_dev)
    n = 1024
    keys, order, vals = _data(n_dev * 100 + n_part, n, n_part)
    got = distributed_window_numpy(keys, FUNCS, mesh, order=order,
                                   values={"v": vals},
                                   capacity_factor=float(n_dev))
    inc = window(U64.from_numpy(keys), FUNCS, order=jnp.asarray(order),
                 values={"v": jnp.asarray(vals)})
    for nm in FUNCS:
        np.testing.assert_array_equal(got[nm], np.asarray(inc.cols[nm]),
                                      err_msg=f"{nm} at D={n_dev}")


def test_distributed_with_running_mix():
    # whole-partition funcs alongside the existing carries in one spec
    mesh = make_mesh(4)
    n = 512
    keys, order, vals = _data(42, n, 5)
    funcs = dict(FUNCS)
    funcs["rs"] = ("running_sum", "v")
    funcs["rn"] = "row_number"
    got = distributed_window_numpy(keys, funcs, mesh, order=order,
                                   values={"v": vals},
                                   capacity_factor=4.0)
    inc = window(U64.from_numpy(keys), funcs, order=jnp.asarray(order),
                 values={"v": jnp.asarray(vals)})
    for nm in funcs:
        want = inc.cols[nm]
        if isinstance(want, U64):
            np.testing.assert_array_equal(got[nm], want.to_numpy(),
                                          err_msg=nm)
        else:
            np.testing.assert_array_equal(got[nm], np.asarray(want),
                                          err_msg=nm)
