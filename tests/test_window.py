"""Window function tests vs a numpy oracle (ops/window.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_qe.bits import U64
from tpu_qe.ops.window import window


def _oracle(keys, order, values, spec):
    """Reference window computation: stable sort + per-row python sweep.

    keys: (n,) uint64; order: (n,) or None; values: {name: np array};
    spec: list of (out_name, kind, col, fill). Returns out_name -> array
    aligned with the INPUT rows (uint64 for integer running_sum).
    """
    n = len(keys)
    pos = np.arange(n)
    if order is None:
        perm = np.lexsort((pos, keys))
    else:
        ob = order.view(np.uint32) if order.dtype == np.float32 else order
        if order.dtype == np.float32:
            sign = ob >> 31
            ob = np.where(sign == 1, ~ob, ob | np.uint32(0x80000000))
        perm = np.lexsort((pos, ob, keys))
    sk = keys[perm]
    so = order[perm] if order is not None else None
    out = {name: np.zeros(n, np.uint64 if kind == "row_number" or
                          kind in ("rank", "dense_rank") else
                          values[col].dtype if kind != "running_sum" or
                          values[col].dtype == np.float32 else np.uint64)
           for name, kind, col, fill in spec}
    for name, kind, col, fill in spec:
        res = np.zeros(n, out[name].dtype)
        part_start = 0
        run_start = 0
        dense = 0
        acc = None
        for i in range(n):
            new = i == 0 or sk[i] != sk[i - 1]
            onew = new or (so is not None and so[i] != so[i - 1])
            if new:
                part_start, dense, acc = i, 0, None
            if onew:
                run_start = i
                dense += 1
            if kind == "row_number":
                res[i] = i - part_start + 1
            elif kind == "rank":
                res[i] = run_start - part_start + 1
            elif kind == "dense_rank":
                res[i] = dense
            elif kind == "running_sum":
                v = values[col][perm[i]]
                if values[col].dtype == np.float32:
                    acc = v if acc is None else np.float32(acc + v)
                else:
                    a = int(v) & 0xFFFFFFFF
                    acc = a if acc is None else (int(acc) + a)
                res[i] = acc
            elif kind in ("running_min", "running_max"):
                v = values[col][perm[i]]
                f = min if kind == "running_min" else max
                acc = v if acc is None else f(acc, v)
                res[i] = acc
            elif kind == "lag":
                res[i] = fill if new else values[col][perm[i - 1]]
            elif kind == "lead":
                last = i == n - 1 or sk[i + 1] != sk[i]
                res[i] = fill if last else values[col][perm[i + 1]]
        out[name][perm] = res
    return out


def _to_np(x):
    return x.to_numpy() if isinstance(x, U64) else np.asarray(x)


def _run(keys, order, values, funcs, **kw):
    jvals = {k: jnp.asarray(v) for k, v in (values or {}).items()}
    return window(U64.from_numpy(keys), funcs,
                  order=None if order is None else jnp.asarray(order),
                  values=jvals, **kw)


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
SPEC = [(n, f[0], f[1] if len(f) > 1 else None, f[2] if len(f) > 2 else 0)
        for n, f in FUNCS.items()]


@pytest.mark.parametrize("n", [1, 255, 256, 257, 1024, 5000])
def test_all_funcs_vs_oracle(n):
    rng = np.random.default_rng(n)
    keys = rng.integers(0, max(n // 20, 2), n).astype(np.uint64)
    order = rng.integers(0, 5, n, dtype=np.uint32)  # heavy order ties
    values = {"v": rng.integers(0, 1 << 32, n, dtype=np.uint64
                                ).astype(np.uint32)}
    res = _run(keys, order, values, FUNCS)
    want = _oracle(keys, order, values, SPEC)
    for name in FUNCS:
        got = _to_np(res.cols[name])
        np.testing.assert_array_equal(got.astype(np.uint64),
                                      want[name].astype(np.uint64),
                                      err_msg=name)


def test_running_sum_exact_past_2_32():
    # one partition of large values: the u64 pair running sum must be
    # exact, not mod 2^32 (repo convention: no silent truncation)
    n = 4096
    keys = np.zeros(n, np.uint64)
    values = {"v": np.full(n, 0xFFFFFFFF, np.uint32)}
    res = _run(keys, None, values, {"cs": ("running_sum", "v")})
    got = res.cols["cs"].to_numpy()
    want = np.cumsum(np.full(n, 0xFFFFFFFF, np.uint64))
    np.testing.assert_array_equal(got, want)
    assert want[-1] > (1 << 32)


def test_running_sum_int32_negatives_signed_exact():
    # int32 sign-extends into the hi plane: the U64 pair is the exact
    # SIGNED running sum in two's complement (i64-in-U64), so negatives
    # never silently add 2^32 per row (ADVICE round 3)
    rng = np.random.default_rng(41)
    n = 3000
    keys = rng.integers(0, 37, n).astype(np.uint64)
    order = rng.integers(0, 1 << 16, n, dtype=np.uint32)
    vals = rng.integers(-(1 << 20), 1 << 20, n).astype(np.int32)
    assert (vals < 0).any()
    res = _run(keys, order, {"v": vals}, {"cs": ("running_sum", "v")})
    got = res.cols["cs"].to_numpy().astype(np.int64)  # two's complement
    # signed oracle
    pos = np.arange(n)
    perm = np.lexsort((pos, order, keys))
    sk, sv = keys[perm], vals[perm].astype(np.int64)
    want_sorted = np.zeros(n, np.int64)
    acc = 0
    for i in range(n):
        if i == 0 or sk[i] != sk[i - 1]:
            acc = 0
        acc += int(sv[i])
        want_sorted[i] = acc
    want = np.zeros(n, np.int64)
    want[perm] = want_sorted
    np.testing.assert_array_equal(got, want)
    assert got.min() < 0


def test_float_running_sum_and_minmax():
    rng = np.random.default_rng(3)
    n = 3000
    keys = rng.integers(0, 7, n).astype(np.uint64)
    order = rng.random(n).astype(np.float32)
    values = {"v": (rng.random(n).astype(np.float32) - 0.5)}
    res = _run(keys, order, values,
               {"cs": ("running_sum", "v"), "cm": ("running_min", "v"),
                "cx": ("running_max", "v")})
    want = _oracle(keys, order, values,
                   [("cs", "running_sum", "v", 0),
                    ("cm", "running_min", "v", 0),
                    ("cx", "running_max", "v", 0)])
    np.testing.assert_allclose(np.asarray(res.cols["cs"]), want["cs"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(res.cols["cm"]), want["cm"])
    np.testing.assert_array_equal(np.asarray(res.cols["cx"]), want["cx"])


def test_rank_requires_order():
    with pytest.raises(ValueError, match="order"):
        _run(np.zeros(4, np.uint64), None, {}, {"r": ("rank",)})


def test_missing_column_rejected():
    with pytest.raises(ValueError, match="missing column"):
        _run(np.zeros(4, np.uint64), None, {}, {"s": ("running_sum", "x")})


def test_unknown_func_rejected():
    with pytest.raises(ValueError, match="unknown window"):
        _run(np.zeros(4, np.uint64), None, {}, {"s": ("median", "x")})


def test_empty_input():
    res = _run(np.zeros(0, np.uint64), None,
               {"v": np.zeros(0, np.uint32)},
               {"rn": ("row_number",), "cs": ("running_sum", "v")})
    assert res.cols["rn"].shape == (0,)
    assert res.cols["cs"].lo.shape == (0,)


def test_sorted_output_mode_consistent():
    rng = np.random.default_rng(11)
    n = 2000
    keys = rng.integers(0, 13, n).astype(np.uint64)
    order = rng.integers(0, 1 << 30, n, dtype=np.uint32)
    values = {"v": rng.integers(0, 100, n, dtype=np.uint32)}
    a = _run(keys, order, values, FUNCS, output="input")
    b = _run(keys, order, values, FUNCS, output="sorted")
    pos = np.asarray(b.pos)
    assert sorted(pos) == list(range(n))
    for name in FUNCS:
        ga = _to_np(a.cols[name])
        gb = _to_np(b.cols[name])
        # scatter the sorted-mode rows back by pos: must equal input mode
        back = np.zeros_like(gb)
        back[pos] = gb
        np.testing.assert_array_equal(back, ga, err_msg=name)


def test_no_order_ties_break_by_position():
    # without ORDER BY, row_number numbers rows in input order
    keys = np.array([5, 5, 3, 5, 3], np.uint64)
    res = _run(keys, None, {}, {"rn": ("row_number",)})
    np.testing.assert_array_equal(np.asarray(res.cols["rn"]),
                                  [1, 2, 1, 3, 2])


def test_lag_lead_int32_fill():
    keys = np.array([1, 1, 1, 2, 2], np.uint64)
    order = np.arange(5, dtype=np.uint32)
    values = {"v": np.array([10, 20, 30, 40, 50], np.int32)}
    res = _run(keys, order, values,
               {"lg": ("lag", "v", -1), "ld": ("lead", "v", -1)})
    np.testing.assert_array_equal(np.asarray(res.cols["lg"]),
                                  [-1, 10, 20, -1, 40])
    np.testing.assert_array_equal(np.asarray(res.cols["ld"]),
                                  [20, 30, -1, 50, -1])


def test_table_window_method():
    from tpu_qe.table import Table
    rng = np.random.default_rng(21)
    n = 1000
    t = Table.from_numpy({
        "cell": rng.integers(0, 17, n).astype(np.uint64),
        "t": rng.integers(0, 1 << 20, n, dtype=np.uint32),
        "gain": rng.integers(0, 1000, n, dtype=np.uint32),
    })
    out = t.window("cell", {"rn": ("row_number",),
                            "cum": ("running_sum", "gain")}, order="t")
    assert out.num_rows == n
    got = out.to_numpy()
    want = _oracle(got["cell"], np.asarray(t["t"]),
                   {"gain": got["gain"]},
                   [("rn", "row_number", None, 0),
                    ("cum", "running_sum", "gain", 0)])
    np.testing.assert_array_equal(got["rn"].astype(np.uint64), want["rn"])
    np.testing.assert_array_equal(got["cum"], want["cum"])
    with pytest.raises(ValueError, match="already exists"):
        t.window("cell", {"gain": ("row_number",)}, order="t")


def test_whole_partition_aggregate_frames():
    """total_sum/min/max/avg, partition_count, running_avg vs a python
    loop oracle (int32 negatives: exact signed totals)."""
    import numpy as np

    from tpu_qe.bits import U64
    from tpu_qe.ops.window import window

    rng = np.random.default_rng(11)
    n = 3000
    k = rng.integers(0, 17, n).astype(np.uint32)
    v = rng.integers(-(1 << 20), 1 << 20, n).astype(np.int32)
    o = rng.permutation(n).astype(np.uint32)
    key = U64(jnp.asarray(k), jnp.zeros(n, jnp.uint32))
    res = window(key, {
        "ts": ("total_sum", "v"),
        "tmn": ("total_min", "v"),
        "tmx": ("total_max", "v"),
        "ta": ("total_avg", "v"),
        "pc": ("partition_count",),
        "ra": ("running_avg", "v"),
    }, order=jnp.asarray(o), values={"v": jnp.asarray(v)})
    ts = res.cols["ts"].to_numpy().view(np.int64)
    pc = np.asarray(res.cols["pc"])
    ta = np.asarray(res.cols["ta"])
    ra = np.asarray(res.cols["ra"])
    tmn, tmx = np.asarray(res.cols["tmn"]), np.asarray(res.cols["tmx"])
    for kk in np.unique(k):
        m = k == kk
        grp = v[m].astype(np.int64)
        assert (ts[m] == grp.sum()).all()
        assert (pc[m] == m.sum()).all()
        assert (tmn[m] == grp.min()).all() and (tmx[m] == grp.max()).all()
        np.testing.assert_allclose(ta[m], grp.sum() / len(grp),
                                   rtol=1e-5, atol=1e-2)
        # running average follows the ORDER BY column
        order_idx = np.argsort(o[m], kind="stable")
        want = (np.cumsum(grp[order_idx]).astype(np.float64)
                / np.arange(1, len(grp) + 1))
        np.testing.assert_allclose(ra[m][order_idx], want, rtol=1e-5,
                                   atol=1e-2)


def test_lag_lead_offsets_vs_loop():
    import numpy as np

    from tpu_qe.bits import U64
    from tpu_qe.ops.window import window

    rng = np.random.default_rng(12)
    n = 500
    k = rng.integers(0, 7, n).astype(np.uint32)
    v = rng.integers(0, 1000, n).astype(np.uint32)
    o = np.arange(n, dtype=np.uint32)
    key = U64(jnp.asarray(k), jnp.zeros(n, jnp.uint32))
    res = window(key, {"l3": ("lag", "v", 77, 3),
                       "d2": ("lead", "v", 88, 2)},
                 order=jnp.asarray(o), values={"v": jnp.asarray(v)})
    l3, d2 = np.asarray(res.cols["l3"]), np.asarray(res.cols["d2"])
    for kk in np.unique(k):
        m = np.where(k == kk)[0]     # already in order (o == position)
        for j, row in enumerate(m):
            assert l3[row] == (v[m[j - 3]] if j >= 3 else 77)
            assert d2[row] == (v[m[j + 2]] if j + 2 < len(m) else 88)
