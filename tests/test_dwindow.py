"""Distributed window tests: bit-equality vs the local operator
(exchange/dwindow.py vs ops/window.py) on the CPU mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_qe.bits import U64
from tpu_qe.exchange.dsort import make_mesh
from tpu_qe.exchange.dwindow import distributed_window_numpy
from tpu_qe.ops.window import window

FUNCS = {
    "rn": ("row_number",),
    "rk": ("rank",),
    "dr": ("dense_rank",),
    "cs": ("running_sum", "v"),
    "cm": ("running_min", "v"),
    "cx": ("running_max", "v"),
    "lg": ("lag", "v", 7),
    "ld": ("lead", "v", 9),
}


def _local(keys, order, values, funcs):
    res = window(U64.from_numpy(keys), funcs,
                 order=None if order is None else jnp.asarray(order),
                 values={k: jnp.asarray(v) for k, v in values.items()})
    out = {}
    for name, col in res.cols.items():
        out[name] = (col.to_numpy() if isinstance(col, U64)
                     else np.asarray(col))
    return out


def _check(keys, order, values, funcs, n_dev, **kw):
    mesh = make_mesh(n_dev)
    got = distributed_window_numpy(keys, funcs, mesh, order=order,
                                   values=values, **kw)
    want = _local(keys, order, values, funcs)
    for name in funcs:
        np.testing.assert_array_equal(got[name], want[name], err_msg=name)


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_matches_local_random(n_dev):
    rng = np.random.default_rng(n_dev)
    n = 8 * 1024
    keys = rng.integers(0, 50, n).astype(np.uint64)
    order = rng.integers(0, 4, n, dtype=np.uint32)  # heavy order ties
    values = {"v": rng.integers(0, 1 << 32, n).astype(np.uint32)}
    _check(keys, order, values, FUNCS, n_dev, capacity_factor=float(n_dev))


@pytest.mark.parametrize("n_dev", [2, 8])
def test_all_equal_keys_one_partition_spans_every_device(n_dev):
    # the adversarial case the carry chain exists for: ONE partition,
    # split across all devices by the skew-splitting router
    rng = np.random.default_rng(99)
    n = 4096
    keys = np.full(n, 42, np.uint64)
    order = rng.integers(0, 3, n, dtype=np.uint32)
    values = {"v": rng.integers(0, 1 << 32, n).astype(np.uint32)}
    _check(keys, order, values, FUNCS, n_dev, capacity_factor=float(n_dev))


def test_running_sum_exact_past_2_32_across_devices():
    n = 8192
    keys = np.zeros(n, np.uint64)
    values = {"v": np.full(n, 0xFFFFFFFF, np.uint32)}
    mesh = make_mesh(8)
    got = distributed_window_numpy(keys, {"cs": ("running_sum", "v")},
                                   mesh, values=values,
                                   capacity_factor=8.0)
    want = np.cumsum(np.full(n, 0xFFFFFFFF, np.uint64))
    np.testing.assert_array_equal(got["cs"], want)
    assert want[-1] > (1 << 40)


def test_float_running_sum_distributed():
    rng = np.random.default_rng(5)
    n = 4096
    keys = rng.integers(0, 9, n).astype(np.uint64)
    order = rng.random(n).astype(np.float32)
    values = {"v": rng.random(n).astype(np.float32)}
    mesh = make_mesh(4)
    got = distributed_window_numpy(
        keys, {"cs": ("running_sum", "v")}, mesh, order=order,
        values=values, capacity_factor=4.0)
    want = _local(keys, order, values, {"cs": ("running_sum", "v")})
    np.testing.assert_allclose(got["cs"], want["cs"], rtol=1e-4, atol=1e-5)


def test_int32_order_and_values():
    rng = np.random.default_rng(6)
    n = 2048
    keys = rng.integers(0, 20, n).astype(np.uint64)
    order = rng.integers(-1000, 1000, n, dtype=np.int32)
    values = {"v": rng.integers(-500, 500, n, dtype=np.int32)}
    funcs = {"rk": ("rank",), "cm": ("running_min", "v"),
             "lg": ("lag", "v", -1)}
    _check(keys, order, values, funcs, 4, capacity_factor=4.0)


def test_zipf_skew_auto_capacity():
    rng = np.random.default_rng(7)
    n = 16384
    keys = (rng.zipf(1.3, n) % 97).astype(np.uint64)
    order = rng.integers(0, 1 << 20, n, dtype=np.uint32)
    values = {"v": rng.integers(0, 1 << 16, n).astype(np.uint32)}
    _check(keys, order, values, FUNCS, 8, capacity_factor="auto")


def test_partition_boundary_lag_lead():
    # partitions engineered to straddle device boundaries: keys sorted
    # ascending so each device holds a contiguous slice, partitions of
    # width 100 (not dividing 512-per-device shards)
    n = 4096
    keys = (np.arange(n) // 100).astype(np.uint64)
    order = np.arange(n, dtype=np.uint32)
    values = {"v": np.arange(n, dtype=np.uint32) * 3 + 1}
    funcs = {"lg": ("lag", "v", 0), "ld": ("lead", "v", 0),
             "rn": ("row_number",)}
    _check(keys, order, values, funcs, 8, capacity_factor=8.0)


# -- round-5: whole-partition frames, avgs, lag/lead offset k -----------------

TOTAL_FUNCS = {
    "ts": ("total_sum", "vu"),
    "tsi": ("total_sum", "vi"),      # i32 with negatives: pair-exact
    "tmn": ("total_min", "vi"),
    "tmx": ("total_max", "vf"),
    "pc": ("partition_count",),
    "lg3": ("lag", "vu", 7, 3),
    "ld2": ("lead", "vi", -1, 2),
    "ld5": ("lead", "vf", 0.5, 5),
    "rs": ("running_sum", "vu"),
    "rn": ("row_number",),
}


def _vals3(rng, n):
    return {"vu": rng.integers(0, 1000, n).astype(np.uint32),
            "vi": rng.integers(-500, 500, n).astype(np.int32),
            "vf": rng.random(n).astype(np.float32)}


def _check3(keys, order, values, funcs, n_dev, float_names=(),
            rtol=2e-4, **kw):
    mesh = make_mesh(n_dev)
    got = distributed_window_numpy(keys, funcs, mesh, order=order,
                                   values=values, **kw)
    want = _local(keys, order, values, funcs)
    for name in funcs:
        a, b = want[name], got[name]
        if name in float_names:
            np.testing.assert_allclose(a, b, rtol=rtol, atol=1e-3,
                                       err_msg=name)
        else:
            np.testing.assert_array_equal(a, b, err_msg=name)


@pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_whole_partition_and_offsets_match_local(n_dev):
    rng = np.random.default_rng(10 + n_dev)
    n = 4096
    keys = rng.integers(0, 9, n).astype(np.uint64)
    order = rng.integers(0, 50, n).astype(np.uint32)
    _check3(keys, order, _vals3(rng, n), TOTAL_FUNCS, n_dev,
            float_names=("tmx", "ld5"), capacity_factor="auto")


@pytest.mark.parametrize("n_dev", [2, 8])
def test_avgs_match_local_to_f32(n_dev):
    # avgs divide patched sums by global denominators — same f32
    # association class as the local division, compared to tolerance
    rng = np.random.default_rng(20 + n_dev)
    n = 4096
    keys = rng.integers(0, 7, n).astype(np.uint64)
    order = rng.integers(0, 99, n).astype(np.uint32)
    funcs = {"ta": ("total_avg", "vu"), "ra": ("running_avg", "vu"),
             "taf": ("total_avg", "vf")}
    _check3(keys, order, _vals3(rng, n), funcs, n_dev,
            float_names=("ta", "ra", "taf"), capacity_factor="auto")


def test_one_partition_spans_every_device_totals():
    # the adversarial skew case: totals and offset halos must compose
    # across all 8 devices
    rng = np.random.default_rng(33)
    n = 4096
    keys = np.zeros(n, np.uint64)
    order = rng.integers(0, 50, n).astype(np.uint32)
    _check3(keys, order, _vals3(rng, n), TOTAL_FUNCS, 8,
            float_names=("tmx", "ld5"), rtol=2e-3,
            capacity_factor="auto")


def test_i32_negative_running_sums_distributed_exact():
    # the chain's sign-extended U64 pairs are two's-complement exact —
    # the former in-core-only guard is gone (round 5)
    rng = np.random.default_rng(44)
    n = 2048
    keys = rng.integers(0, 5, n).astype(np.uint64)
    order = rng.integers(0, 99, n).astype(np.uint32)
    vi = rng.integers(-500, 500, n).astype(np.int32)
    funcs = {"rs": ("running_sum", "vi"),
             "ms": ("moving_sum", "vi", 4)}
    for n_dev in (2, 8):
        got = distributed_window_numpy(keys, funcs, make_mesh(n_dev),
                                       order=order, values={"vi": vi},
                                       capacity_factor="auto")
        want = _local(keys, order, {"vi": vi}, funcs)
        for nm in funcs:
            a = want[nm].view(np.int64) if want[nm].dtype == np.uint64 \
                else want[nm]
            b = got[nm].view(np.int64) if got[nm].dtype == np.uint64 \
                else got[nm]
            np.testing.assert_array_equal(a, b, err_msg=nm)
