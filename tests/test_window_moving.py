"""Moving-frame window functions (ROWS BETWEEN k-1 PRECEDING AND
CURRENT ROW) vs a python loop oracle (ops/window.py::_moving)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_qe.bits import U64
from tpu_qe.ops.window import window


def _mk(n, n_part, seed, dtype=np.uint32, vmax=None):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, n_part, n).astype(np.uint64) * np.uint64(
        0x9E3779B97F4A7C15)
    order = rng.integers(0, 1 << 20, n).astype(np.uint32)
    if dtype == np.float32:
        vals = rng.standard_normal(n).astype(np.float32)
    elif dtype == np.int32:
        vals = rng.integers(-1000, 1000, n).astype(np.int32)
    else:
        vals = rng.integers(0, vmax or 1000, n).astype(np.uint32)
    return keys, order, vals


def _oracle_moving(keys, order, vals, kind, k):
    """Sorted-order loop oracle; returns values aligned with INPUT rows."""
    n = len(keys)
    pos = np.arange(n)
    perm = np.lexsort((pos, order, keys))
    sk, sv = keys[perm], vals[perm]
    res = np.zeros(n, object)
    part_start = 0
    for i in range(n):
        if i == 0 or sk[i] != sk[i - 1]:
            part_start = i
        lb = max(part_start, i - k + 1)
        w = sv[lb:i + 1]
        if kind == "moving_sum":
            if vals.dtype == np.float32:
                acc = np.float32(0)
                for x in w:
                    acc = np.float32(acc + x)
                res[i] = acc
            else:
                # signed ints sum exactly in two's complement mod 2^64
                # (int32 sign-extends into the hi plane); uint32 is the
                # plain exact u64 sum — both are `sum % 2^64`
                res[i] = sum(int(x) for x in w) % (1 << 64)
        elif kind == "moving_min":
            res[i] = w.min()
        elif kind == "moving_max":
            res[i] = w.max()
        else:  # moving_avg
            s = sum(int(x) for x in w) \
                if vals.dtype != np.float32 else None
            res[i] = (np.float32(s) if s is not None
                      else np.float32(w.astype(np.float64).sum())) \
                / np.float32(len(w))
    out = np.zeros(n, object)
    out[perm] = res
    return out


def _run(keys, order, vals, kind, k):
    key = U64(jnp.asarray((keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
              jnp.asarray((keys >> np.uint64(32)).astype(np.uint32)))
    res = window(key, {"m": (kind, "v", k)}, order=jnp.asarray(order),
                 values={"v": jnp.asarray(vals)})
    got = res.cols["m"]
    if isinstance(got, U64):
        return (np.asarray(got.lo).astype(np.uint64)
                | (np.asarray(got.hi).astype(np.uint64) << np.uint64(32)))
    return np.asarray(got)


@pytest.mark.parametrize("kind", ["moving_sum", "moving_min",
                                  "moving_max", "moving_avg"])
@pytest.mark.parametrize("k", [1, 3, 8, 13, 4096])
def test_moving_vs_oracle_u32(kind, k):
    keys, order, vals = _mk(2000, 17, seed=k)
    got = _run(keys, order, vals, kind, k)
    want = _oracle_moving(keys, order, vals, kind, k)
    if kind == "moving_avg":
        np.testing.assert_allclose(got, want.astype(np.float32),
                                   rtol=1e-6)
    else:
        assert np.array_equal(got.astype(np.uint64),
                              np.array([int(x) for x in want],
                                       np.uint64)), (kind, k)


@pytest.mark.parametrize("kind,k", [("moving_min", 7), ("moving_max", 7),
                                    ("moving_sum", 5)])
def test_moving_float(kind, k):
    keys, order, vals = _mk(1500, 11, seed=3, dtype=np.float32)
    got = _run(keys, order, vals, kind, k)
    want = _oracle_moving(keys, order, vals, kind, k)
    if kind == "moving_sum":
        # the prefix-difference formulation's rounding is proportional
        # to the PARTITION PREFIX magnitude (docstring), so near-zero
        # frame sums need an absolute bound, not a relative one
        np.testing.assert_allclose(got, want.astype(np.float32),
                                   rtol=1e-4, atol=1e-3)
    else:
        assert np.array_equal(got, want.astype(np.float32))


@pytest.mark.parametrize("kind,k", [("moving_min", 6), ("moving_max", 9)])
def test_moving_int32(kind, k):
    keys, order, vals = _mk(1200, 9, seed=5, dtype=np.int32)
    got = _run(keys, order, vals, kind, k)
    want = _oracle_moving(keys, order, vals, kind, k)
    assert np.array_equal(got, want.astype(np.int32))


@pytest.mark.parametrize("k", [1, 4, 11])
def test_moving_sum_int32_negatives_exact(k):
    # int32 with negatives: the U64 pair must be the exact SIGNED sum in
    # two's complement (i64-in-U64) — without sign extension each
    # negative row silently adds 2^32 (ADVICE round 3, medium)
    keys, order, vals = _mk(1500, 13, seed=k + 70, dtype=np.int32)
    assert (vals < 0).any()
    got = _run(keys, order, vals, "moving_sum", k)  # uint64 bit pattern
    want = _oracle_moving(keys, order, vals, "moving_sum", k)
    assert np.array_equal(got.astype(np.uint64),
                          np.array([int(x) for x in want], np.uint64))
    # and the i64 view reads as the true signed frame sums
    signed = got.astype(np.uint64).astype(np.int64)
    assert signed.min() < 0


@pytest.mark.parametrize("k", [1, 3, 9])
def test_moving_avg_int32_negatives(k):
    keys, order, vals = _mk(1500, 13, seed=k + 80, dtype=np.int32)
    assert (vals < 0).any()
    got = _run(keys, order, vals, "moving_avg", k)
    want = _oracle_moving(keys, order, vals, "moving_avg", k)
    np.testing.assert_allclose(got, want.astype(np.float32),
                               rtol=1e-6, atol=1e-6)
    assert got.min() < 0  # negatives surface, not ~1.8e19


def test_moving_sum_exact_past_2_32():
    # frame sums of large u32 values overflow 2^32 — the U64 pair must
    # stay exact (the repo convention: never silently wrap)
    keys, order, vals = _mk(600, 3, seed=9, vmax=(1 << 32) - 1)
    k = 128
    got = _run(keys, order, vals, "moving_sum", k)
    want = _oracle_moving(keys, order, vals, "moving_sum", k)
    assert any(int(x) > (1 << 32) for x in want)  # the case is exercised
    assert np.array_equal(got, np.array([int(x) for x in want],
                                        np.uint64))


def test_moving_one_partition_spanning_everything():
    keys = np.zeros(512, np.uint64)
    order = np.arange(512, dtype=np.uint32)
    vals = np.ones(512, np.uint32)
    got = _run(keys, order, vals, "moving_sum", 10)
    want = np.minimum(np.arange(512) + 1, 10).astype(np.uint64)
    assert np.array_equal(got, want)


def test_moving_requires_width():
    key = U64(jnp.zeros(4, jnp.uint32), jnp.zeros(4, jnp.uint32))
    with pytest.raises(ValueError, match="frame width"):
        window(key, {"m": ("moving_sum", "v")},
               values={"v": jnp.zeros(4, jnp.uint32)})


MFUNCS = {
    "ms": ("moving_sum", "v", 17),
    "mn": ("moving_min", "v", 9),
    "mx": ("moving_max", "v", 33),
    "ma": ("moving_avg", "v", 5),
    # a running function alongside, so the scalar carry chain and the
    # row halo coexist in one spec
    "cs": ("running_sum", "v"),
}


def _dist_check(keys, order, values, funcs, n_dev, **kw):
    from tpu_qe.exchange.dsort import make_mesh
    from tpu_qe.exchange.dwindow import distributed_window_numpy
    mesh = make_mesh(n_dev)
    got = distributed_window_numpy(keys, funcs, mesh, order=order,
                                   values=values, **kw)
    res = window(U64.from_numpy(keys), funcs,
                 order=jnp.asarray(order),
                 values={k: jnp.asarray(v) for k, v in values.items()})
    for name in funcs:
        col = res.cols[name]
        want = (col.to_numpy() if isinstance(col, U64)
                else np.asarray(col))
        np.testing.assert_array_equal(got[name], want, err_msg=name)


@pytest.mark.parametrize("n_dev", [1, 2, 4, 8])
def test_distributed_moving_matches_local(n_dev):
    # the O(k)-row halo chain: frames at device heads reach into the
    # previous devices' rows and must be bit-identical to the local op
    rng = np.random.default_rng(n_dev + 40)
    n = 2048
    keys = rng.integers(0, 23, n).astype(np.uint64)
    order = rng.integers(0, 1 << 16, n, dtype=np.uint32)
    values = {"v": rng.integers(0, 1 << 32, n).astype(np.uint32)}
    _dist_check(keys, order, values, MFUNCS, n_dev,
                capacity_factor=float(n_dev))


@pytest.mark.parametrize("n_dev", [2, 8])
def test_distributed_moving_int32_negatives(n_dev):
    # signed sums stay exact through the halo path: sign extension is
    # applied inside _moving, and pair differences are mod-2^64
    rng = np.random.default_rng(n_dev + 60)
    n = 2048
    keys = rng.integers(0, 23, n).astype(np.uint64)
    order = rng.integers(0, 1 << 16, n, dtype=np.uint32)
    values = {"v": rng.integers(-(1 << 20), 1 << 20, n).astype(np.int32)}
    funcs = {"ms": ("moving_sum", "v", 17), "ma": ("moving_avg", "v", 9),
             "cs": ("running_sum", "v")}
    _dist_check(keys, order, values, funcs, n_dev,
                capacity_factor=float(n_dev))


@pytest.mark.parametrize("n_dev", [2, 8])
def test_distributed_moving_sum_float32_close_not_bitexact(n_dev):
    # f32 moving_sum: when a partition extends back past the halo, the
    # forced prefix restart rounds differently than the local
    # full-partition prefix (dwindow halo comment) — the distributed
    # result matches within the operator's own prefix-difference error
    # bound, NOT bit-exactly. Values in [0, 1) over long partitions make
    # the association difference visible without blowing the bound.
    from tpu_qe.exchange.dsort import make_mesh
    from tpu_qe.exchange.dwindow import distributed_window_numpy
    rng = np.random.default_rng(n_dev + 90)
    n = 4096
    keys = rng.integers(0, 3, n).astype(np.uint64)  # long partitions
    order = rng.integers(0, 1 << 16, n, dtype=np.uint32)
    values = {"v": rng.random(n).astype(np.float32)}
    funcs = {"ms": ("moving_sum", "v", 33)}
    mesh = make_mesh(n_dev)
    got = distributed_window_numpy(keys, funcs, mesh, order=order,
                                   values=values,
                                   capacity_factor=float(n_dev))
    res = window(U64.from_numpy(keys), funcs, order=jnp.asarray(order),
                 values={k: jnp.asarray(v) for k, v in values.items()})
    want = np.asarray(res.cols["ms"])
    np.testing.assert_allclose(got["ms"], want, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("n_dev", [4, 8])
def test_distributed_moving_halo_spans_multiple_devices(n_dev):
    # k far larger than a device's rows: the incoming halo must compose
    # across SEVERAL predecessors (each contributes its full tail), and
    # one partition spans the whole mesh
    rng = np.random.default_rng(7)
    n = 1024
    keys = np.zeros(n, np.uint64)
    order = np.arange(n, dtype=np.uint32)
    values = {"v": rng.integers(0, 1 << 32, n).astype(np.uint32)}
    funcs = {"ms": ("moving_sum", "v", 700),
             "mn": ("moving_min", "v", 515)}
    _dist_check(keys, order, values, funcs, n_dev,
                capacity_factor=float(n_dev))


# -- round-5: FOLLOWING frames and RANGE frames -------------------------------

def _frame_oracle(keys, order, vals, a, b, agg):
    """Per-row ROWS [i-a, i+b] frame over (key, order, pos) order."""
    n = len(keys)
    perm = np.lexsort((np.arange(n), order, keys))
    inv = np.empty(n, np.int64)
    inv[perm] = np.arange(n)
    sk, sv = keys[perm], vals[perm].astype(np.float64)
    out = np.zeros(n, np.float64)
    for i in range(n):
        j = int(inv[i])
        s = j
        while s > 0 and sk[s - 1] == sk[j] \
                and (a is None or j - s < a):
            s -= 1
        e = j
        while e < n - 1 and sk[e + 1] == sk[j] and e - j < b:
            e += 1
        w = sv[s:e + 1]
        out[i] = {"sum": w.sum(), "min": w.min(), "max": w.max(),
                  "avg": w.mean()}[agg]
    return out


@pytest.mark.parametrize("a,b", [(2, 3), (0, 4), (4, 1), (None, 2)])
def test_following_frames_vs_oracle(a, b):
    rng = np.random.default_rng(7)
    n = 2000
    keys = rng.integers(0, 6, n).astype(np.uint64)
    order = rng.integers(0, 10 ** 6, n).astype(np.uint32)
    vu = rng.integers(0, 1000, n).astype(np.uint32)
    vi = rng.integers(-500, 500, n).astype(np.int32)
    k = None if a is None else a + 1
    funcs = {"s": ("moving_sum", "vu", k, b),
             "si": ("moving_sum", "vi", k, b),
             "mn": ("moving_min", "vi", k, b),
             "av": ("moving_avg", "vu", k, b)}
    res = window(U64.from_numpy(keys), funcs, order=jnp.asarray(order),
                 values={"vu": jnp.asarray(vu), "vi": jnp.asarray(vi)})
    for nm, vals, agg in [("s", vu, "sum"), ("si", vi, "sum"),
                          ("mn", vi, "min"), ("av", vu, "avg")]:
        got = res.cols[nm]
        if isinstance(got, U64):
            got = (np.asarray(got.lo).astype(np.uint64)
                   | (np.asarray(got.hi).astype(np.uint64)
                      << np.uint64(32))).view(np.int64)
        got = np.asarray(got).astype(np.float64)
        want = _frame_oracle(keys, order, vals, a, b, agg)
        if agg == "avg":
            np.testing.assert_allclose(got, want, rtol=1e-5,
                                       atol=1e-4, err_msg=nm)
        else:
            np.testing.assert_array_equal(got, want, err_msg=nm)


def test_range_frames_vs_oracle():
    rng = np.random.default_rng(8)
    n = 2000
    keys = rng.integers(0, 6, n).astype(np.uint64)
    order = rng.integers(0, 50, n).astype(np.uint32)   # heavy ties
    vu = rng.integers(0, 1000, n).astype(np.uint32)
    vi = rng.integers(-500, 500, n).astype(np.int32)
    funcs = {"ru": ("range_sum", "vu", "unbounded"),
             "rm": ("range_min", "vi", "unbounded"),
             "rx": ("range_sum", "vi", 7),
             "ra": ("range_avg", "vu", 12),
             "bm": ("range_min", "vi", 9),
             "bx": ("range_max", "vu", 4)}
    res = window(U64.from_numpy(keys), funcs, order=jnp.asarray(order),
                 values={"vu": jnp.asarray(vu), "vi": jnp.asarray(vi)})
    for nm, vals, x, agg in [("ru", vu, None, "sum"),
                             ("rm", vi, None, "min"),
                             ("rx", vi, 7, "sum"),
                             ("ra", vu, 12, "avg"),
                             ("bm", vi, 9, "min"),
                             ("bx", vu, 4, "max")]:
        got = res.cols[nm]
        if isinstance(got, U64):
            got = (np.asarray(got.lo).astype(np.uint64)
                   | (np.asarray(got.hi).astype(np.uint64)
                      << np.uint64(32))).view(np.int64)
        got = np.asarray(got).astype(np.float64)
        want = np.zeros(n, np.float64)
        for i in range(n):
            sel = (keys == keys[i]) & (order <= order[i])
            if x is not None:
                sel &= order.astype(np.int64) >= int(order[i]) - x
            w = vals[sel].astype(np.float64)
            want[i] = {"sum": w.sum(), "min": w.min(), "max": w.max(),
                       "avg": w.mean()}[agg]
        if agg == "avg":
            np.testing.assert_allclose(got, want, rtol=1e-5,
                                       atol=1e-4, err_msg=nm)
        else:
            np.testing.assert_array_equal(got, want, err_msg=nm)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_distributed_following_frames(n_dev):
    # the double-halo path: tail halo for the PRECEDING reach, head
    # halo (placed over the pad region) for the FOLLOWING reach
    from tpu_qe.exchange.dsort import make_mesh
    from tpu_qe.exchange.dwindow import distributed_window_numpy
    rng = np.random.default_rng(9)
    n = 4096
    keys = rng.integers(0, 9, n).astype(np.uint64)
    order = rng.integers(0, 10 ** 6, n).astype(np.uint32)
    vu = rng.integers(0, 1000, n).astype(np.uint32)
    vi = rng.integers(-500, 500, n).astype(np.int32)
    funcs = {"s": ("moving_sum", "vu", 3, 2),
             "si": ("moving_sum", "vi", 2, 4),
             "mn": ("moving_min", "vi", 4, 2),
             "av": ("moving_avg", "vu", 3, 3)}
    vals = {"vu": vu, "vi": vi}
    lres = window(U64.from_numpy(keys), funcs, order=jnp.asarray(order),
                  values={k: jnp.asarray(v) for k, v in vals.items()})
    dres = distributed_window_numpy(keys, funcs, make_mesh(n_dev),
                                    order=order, values=vals,
                                    capacity_factor="auto")
    for nm in funcs:
        a = lres.cols[nm]
        if isinstance(a, U64):
            a = (np.asarray(a.lo).astype(np.uint64)
                 | (np.asarray(a.hi).astype(np.uint64) << np.uint64(32)))
        else:
            a = np.asarray(a)
        b = dres[nm]
        if nm == "av":
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-3,
                                       err_msg=nm)
        else:
            np.testing.assert_array_equal(a, b, err_msg=nm)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_distributed_range_unbounded_vs_local(n_dev):
    # tie-aware RANGE frames across the mesh: forward partition-prefix
    # carry + backward run-suffix chain (exchange/dwindow.py S_run)
    from tpu_qe.exchange.dsort import make_mesh
    from tpu_qe.exchange.dwindow import distributed_window_numpy
    rng = np.random.default_rng(31)
    n = 4096
    keys = rng.integers(0, 4, n).astype(np.uint64)
    order = rng.integers(0, 6, n).astype(np.uint32)    # runs span devs
    vu = rng.integers(0, 1000, n).astype(np.uint32)
    vi = rng.integers(-500, 500, n).astype(np.int32)
    vf = rng.normal(size=n).astype(np.float32)
    funcs = {"rs": ("range_sum", "vu", "unbounded"),
             "ri": ("range_sum", "vi", "unbounded"),
             "rm": ("range_min", "vi", "unbounded"),
             "rx": ("range_max", "vf", "unbounded"),
             "ra": ("range_avg", "vu", "unbounded")}
    vals = {"vu": vu, "vi": vi, "vf": vf}
    lres = window(U64.from_numpy(keys), funcs, order=jnp.asarray(order),
                  values={k: jnp.asarray(v) for k, v in vals.items()})
    dres = distributed_window_numpy(keys, funcs, make_mesh(n_dev),
                                    order=order, values=vals,
                                    capacity_factor="auto")
    for nm in funcs:
        a = lres.cols[nm]
        if isinstance(a, U64):
            a = (np.asarray(a.lo).astype(np.uint64)
                 | (np.asarray(a.hi).astype(np.uint64) << np.uint64(32)))
        else:
            a = np.asarray(a)
        if nm in ("ra", "rx"):
            np.testing.assert_allclose(dres[nm], a, rtol=1e-5,
                                       atol=1e-4, err_msg=nm)
        else:
            np.testing.assert_array_equal(dres[nm], a, err_msg=nm)


def test_distributed_range_single_run_all_devices():
    # ONE partition with ONE order value spanning the whole mesh: the
    # S_run chain must walk through every intermediate single-run
    # device (trs_zero) to the run's true end
    from tpu_qe.exchange.dsort import make_mesh
    from tpu_qe.exchange.dwindow import distributed_window_numpy
    rng = np.random.default_rng(32)
    n = 2048
    keys = np.zeros(n, np.uint64)
    order = np.zeros(n, np.uint32)
    vi = rng.integers(-500, 500, n).astype(np.int32)
    funcs = {"ri": ("range_sum", "vi", "unbounded"),
             "rm": ("range_min", "vi", "unbounded")}
    vals = {"vi": vi}
    lres = window(U64.from_numpy(keys), funcs, order=jnp.asarray(order),
                  values={"vi": jnp.asarray(vi)})
    dres = distributed_window_numpy(keys, funcs, make_mesh(8),
                                    order=order, values=vals,
                                    capacity_factor="auto")
    a = lres.cols["ri"]
    a = (np.asarray(a.lo).astype(np.uint64)
         | (np.asarray(a.hi).astype(np.uint64) << np.uint64(32)))
    np.testing.assert_array_equal(dres["ri"], a)
    np.testing.assert_array_equal(dres["rm"], np.asarray(lres.cols["rm"]))
