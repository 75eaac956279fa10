"""Randomized differential fuzz: every operator vs a numpy oracle.

Each trial draws sizes, key skew, value dtypes, masks, and mesh widths at
random (seeded — failures reproduce from the trial number) and checks the
operator against a straightforward numpy reimplementation. Complements the
targeted unit tests with breadth across parameter combinations.
"""

from __future__ import annotations

import collections

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_qe.bits import U64
from tpu_qe.table import Table


def _keys(rng, n):
    """Random keys with randomized skew/width."""
    style = rng.integers(0, 4)
    if style == 0:    # uniform 64-bit
        return rng.integers(0, 1 << 64, n, dtype=np.uint64)
    if style == 1:    # few distinct values (heavy duplicates)
        k = int(rng.integers(1, 20))
        return rng.integers(0, k, n).astype(np.uint64) * np.uint64(0x9E37)
    if style == 2:    # zipf
        return (rng.zipf(1.3, n).astype(np.uint64)
                * np.uint64(0x9E3779B97F4A7C15))
    # boundary-heavy: zeros and all-ones mixed with uniform
    k = rng.integers(0, 1 << 64, n, dtype=np.uint64)
    k[rng.random(n) < 0.1] = 0
    k[rng.random(n) < 0.1] = np.uint64((1 << 64) - 1)
    return k


@pytest.mark.parametrize("trial", range(12))
def test_fuzz_sort_and_groupby(trial):
    rng = np.random.default_rng(1000 + trial)
    n = int(rng.integers(1, 6000))
    keys = _keys(rng, n)
    vals = rng.integers(0, 1 << 31, n, dtype=np.uint32)

    # sort (both stable backends agree with numpy stable argsort)
    from tpu_qe.sort import sort_u64_numpy
    pay = np.arange(n, dtype=np.uint32)
    order = np.argsort(keys, kind="stable")
    for backend in ("xla", "xla_tiebreak"):
        gk, gp = sort_u64_numpy(keys, pay, backend=backend)
        np.testing.assert_array_equal(gk, keys[order], err_msg=backend)
        np.testing.assert_array_equal(gp, order.astype(np.uint32),
                                      err_msg=backend)

    # group by with a random mask
    from tpu_qe.ops.aggregate import group_aggregate
    mask = rng.random(n) < rng.random()
    g = group_aggregate(U64.from_numpy(keys), jnp.asarray(vals),
                        aggs=("count", "sum", "min", "max",
                              "count_distinct"),
                        valid=jnp.asarray(mask))
    ng = int(g.num_groups)
    km, vm = keys[mask], vals[mask]
    want_cnt = collections.Counter(int(k) for k in km)
    assert ng == len(want_cnt)
    gk = g.key.to_numpy()[:ng]
    assert list(gk) == sorted(want_cnt)
    for i, k in enumerate(gk):
        sel = vm[km == k]
        assert int(np.asarray(g.aggs["count"])[i]) == len(sel)
        assert int(g.aggs["sum"].to_numpy()[i]) == int(sel.sum())  # exact
        assert int(np.asarray(g.aggs["min"])[i]) == sel.min()
        assert int(np.asarray(g.aggs["max"])[i]) == sel.max()
        assert (int(np.asarray(g.aggs["count_distinct"])[i])
                == len(np.unique(sel)))


@pytest.mark.parametrize("trial", range(8))
def test_fuzz_scan_join(trial):
    rng = np.random.default_rng(2000 + trial)
    from tpu_qe.ops.join import join_fk_scan

    n_r = int(rng.integers(1, 2000))
    rkeys = np.unique(_keys(rng, n_r))
    rvals = rng.integers(0, 1 << 31, len(rkeys), dtype=np.uint32)
    n_l = int(rng.integers(1, 3000))
    pick_hit = rng.random(n_l) < rng.random()
    lkeys = np.where(pick_hit, rkeys[rng.integers(0, len(rkeys), n_l)],
                     _keys(rng, n_l))
    left = Table.from_numpy({"i": np.arange(n_l, dtype=np.uint32)})
    right = Table.from_numpy({"v": rvals})
    out, matched = join_fk_scan(left, right, U64.from_numpy(lkeys),
                                U64.from_numpy(rkeys))
    matched = np.asarray(matched)
    pos = {int(k): i for i, k in enumerate(rkeys)}
    ov = np.asarray(out["v"])
    for i, k in enumerate(lkeys):
        if int(k) in pos:
            assert matched[i], (trial, i)
            assert ov[i] == rvals[pos[int(k)]], (trial, i)
        else:
            assert not matched[i], (trial, i)


@pytest.mark.parametrize("trial", range(4))
def test_fuzz_distributed(trial):
    rng = np.random.default_rng(3000 + trial)
    n_dev = int(rng.choice([2, 4, 8]))
    if len(jax.devices()) < n_dev:
        pytest.skip("needs devices")
    from tpu_qe.exchange import distributed_sort_numpy, make_mesh
    from tpu_qe.exchange.dops import distributed_aggregate_numpy

    mesh = make_mesh(n_dev)
    n = int(rng.integers(1, 40)) * n_dev * 8
    keys = _keys(rng, n)
    pay = np.arange(n, dtype=np.uint32)
    # alternate the demand-planned "auto" path with the explicit factor:
    # both must agree with the oracle (plan-vs-execute divergence would
    # surface here as overflow or wrong answers)
    cf = "auto" if trial % 2 == 0 else float(n_dev)
    k, p = distributed_sort_numpy(keys, pay, mesh, capacity_factor=cf)
    order = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(k, keys[order], err_msg=str(trial))
    np.testing.assert_array_equal(p, order.astype(np.uint32))

    vals = rng.integers(0, 1000, n, dtype=np.uint32)
    got = distributed_aggregate_numpy(keys, vals, mesh,
                                      aggs=("count", "sum"),
                                      capacity_factor=cf)
    want = collections.Counter(int(x) for x in keys)
    want_sum = collections.defaultdict(int)
    for kk, v in zip(keys, vals):
        want_sum[int(kk)] += int(v)
    assert set(got) == set(want)
    for kk in want:
        assert got[kk]["count"] == want[kk]
        assert got[kk]["sum"] == want_sum[kk]  # exact u64, not mod 2^32

    from tpu_qe.exchange.dops import distributed_count_distinct_numpy
    dvals = rng.integers(0, 30, n, dtype=np.int64).astype(np.uint32)
    got_cd = distributed_count_distinct_numpy(keys, dvals, mesh,
                                              capacity_factor=cf)
    for kk in want:
        assert got_cd[kk] == len(np.unique(dvals[keys == kk])), (trial, kk)
    assert set(got_cd) == set(want)


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_distributed_join(trial):
    rng = np.random.default_rng(4000 + trial)
    n_dev = int(rng.choice([2, 4, 8]))
    if len(jax.devices()) < n_dev:
        pytest.skip("needs devices")
    from tpu_qe.exchange import make_mesh
    from tpu_qe.exchange.dops import distributed_join_fk_numpy

    mesh = make_mesh(n_dev)
    # right tables from TINY (fewer rows per shard than n_dev-1, the
    # regression class) to moderately sized
    n_r = int(rng.choice([1, 2, 3])) * n_dev
    rkeys = np.unique(rng.integers(0, 1 << 40, 4 * n_r, dtype=np.uint64))[:n_r]
    rvals = rng.integers(0, 1 << 30, n_r, dtype=np.uint32)
    n_l = int(rng.integers(1, 30)) * n_dev * 8
    hit = rng.random(n_l) < rng.random()
    lkeys = np.where(hit, rkeys[rng.integers(0, n_r, n_l)],
                     rng.integers(0, 1 << 40, n_l, dtype=np.uint64)
                     | (np.uint64(1) << np.uint64(41)))
    if trial % 2 == 0:  # alternate demand-planned path with the factor
        matched, (rv,) = distributed_join_fk_numpy(
            lkeys, [], rkeys, [rvals], mesh, capacity_factor="auto")
    else:
        matched, (rv,) = distributed_join_fk_numpy(
            lkeys, [], rkeys, [rvals], mesh,
            capacity_factor=float(n_dev), capacity_factor_right=float(n_dev))
    pos = {int(k): i for i, k in enumerate(rkeys)}
    for i, k in enumerate(lkeys):
        if int(k) in pos:
            assert matched[i], (trial, i)
            assert rv[i] == rvals[pos[int(k)]], (trial, i)
        else:
            assert not matched[i], (trial, i)


@pytest.mark.parametrize("trial", range(10))
def test_fuzz_window(trial):
    """Window family (local + distributed) vs a vectorized numpy oracle:
    random sizes, key skew, order dtypes/presence, func subsets, mesh
    widths, and capacity modes."""
    from tpu_qe.exchange.dsort import make_mesh
    from tpu_qe.exchange.dwindow import distributed_window_numpy
    from tpu_qe.ops.window import window

    rng = np.random.default_rng(9_000 + trial)
    n = int(rng.integers(64, 4096))
    keys = _keys(rng, n)
    has_order = bool(rng.integers(0, 2))
    odt = rng.choice(["u32", "i32", "f32"])
    if has_order:
        if odt == "u32":
            order = rng.integers(0, max(int(rng.integers(2, 50)), 2),
                                 n).astype(np.uint32)  # heavy ties
        elif odt == "i32":
            order = rng.integers(-1000, 1000, n, dtype=np.int32)
        else:
            order = rng.standard_normal(n).astype(np.float32)
    else:
        order = None
    values = {"v": rng.integers(0, 1 << 32, n).astype(np.uint32)}
    funcs = {"rn": ("row_number",),
             "cs": ("running_sum", "v"),
             "lg": ("lag", "v", int(rng.integers(0, 9))),
             "ld": ("lead", "v", int(rng.integers(0, 9)))}
    if has_order:
        funcs["rk"] = ("rank",)
        funcs["dr"] = ("dense_rank",)

    # ---- vectorized numpy oracle ---------------------------------------
    pos = np.arange(n)
    if order is None:
        perm = np.lexsort((pos, keys))
        ob = None
    else:
        ob = order.view(np.uint32) if order.dtype == np.float32 else order
        if order.dtype == np.float32:
            s = ob >> 31
            ob = np.where(s == 1, ~ob, ob | np.uint32(0x80000000))
        perm = np.lexsort((pos, ob, keys))
    sk = keys[perm]
    sv = values["v"][perm]
    idx = np.arange(n)
    is_new = np.concatenate([[True], sk[1:] != sk[:-1]])
    if ob is None:
        order_new = is_new
    else:
        so = ob[perm]
        order_new = is_new | np.concatenate([[True], so[1:] != so[:-1]])
    part_start = np.maximum.accumulate(np.where(is_new, idx, 0))
    run_start = np.maximum.accumulate(np.where(order_new, idx, 0))
    want = {"rn": (idx - part_start + 1).astype(np.uint64)}
    if has_order:
        want["rk"] = (run_start - part_start + 1).astype(np.uint64)
        c = np.cumsum(order_new)
        base = np.maximum.accumulate(np.where(is_new, c - 1, 0))
        want["dr"] = (c - base).astype(np.uint64)
    cs = np.cumsum(sv.astype(np.uint64))
    prev_cs = np.concatenate([[np.uint64(0)], cs[:-1]])
    want["cs"] = cs - prev_cs[part_start]
    lgf = np.uint32(funcs["lg"][2])
    ldf = np.uint32(funcs["ld"][2])
    pvv = np.concatenate([[lgf], sv[:-1]])
    want["lg"] = np.where(is_new, lgf, pvv)
    is_last = np.concatenate([is_new[1:], [True]])
    nxt = np.concatenate([sv[1:], [ldf]])
    want["ld"] = np.where(is_last, ldf, nxt)
    inv = np.empty(n, np.int64)
    inv[perm] = idx
    want = {k: v[inv] for k, v in want.items()}  # back to input order

    # ---- local operator --------------------------------------------------
    res = window(U64.from_numpy(keys), funcs,
                 order=None if order is None else jnp.asarray(order),
                 values={"v": jnp.asarray(values["v"])})
    for nm in funcs:
        got = res.cols[nm]
        got = got.to_numpy() if isinstance(got, U64) else np.asarray(got)
        np.testing.assert_array_equal(got.astype(np.uint64),
                                      want[nm].astype(np.uint64),
                                      err_msg=f"local {nm}")

    # ---- distributed: bit-identical to local ----------------------------
    d = int(rng.choice([w for w in (1, 2, 4, 8) if n % w == 0]))
    mesh = make_mesh(d)
    cap = "auto" if rng.integers(0, 2) else float(d)
    got_d = distributed_window_numpy(keys, funcs, mesh, order=order,
                                     values=values, capacity_factor=cap)
    for nm in funcs:
        np.testing.assert_array_equal(
            got_d[nm].astype(np.uint64), want[nm].astype(np.uint64),
            err_msg=f"distributed {nm} (D={d}, cap={cap})")


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_orderby_quantile(trial):
    rng = np.random.default_rng(6000 + trial)
    from tpu_qe.ops.orderby import canon_by, sort_by_multi
    from tpu_qe.ops.quantile import canon_qs, disc_rank, group_quantile, quantile

    n = int(rng.integers(2, 5000))
    cols = {
        "a": _keys(rng, n),
        "b": rng.integers(-(1 << 20), 1 << 20, n,
                          dtype=np.int64).astype(np.int32),
        "f": rng.standard_normal(n).astype(np.float32),
        "pay": np.arange(n, dtype=np.uint32),
    }
    names = ["a", "b", "f"]
    rng.shuffle(names)
    by = [(nm, rng.choice(["asc", "desc"])) for nm in
          names[: int(rng.integers(1, 4))]]
    got = sort_by_multi(Table.from_numpy(cols), by).to_numpy()
    # oracle: stable lexsort over transformed planes
    planes = []
    for nm, d in canon_by(by):
        c = cols[nm]
        if c.dtype == np.uint64:
            sub = [(c >> np.uint64(32)).astype(np.uint32),
                   c.astype(np.uint32)]
        elif c.dtype == np.float32:
            b32 = c.view(np.uint32)
            sub = [np.where(b32 >> 31 == 1, ~b32,
                            b32 | np.uint32(0x80000000))]
        else:
            sub = [c.view(np.uint32) ^ np.uint32(0x80000000)]
        planes += [~p if d else p for p in sub]
    perm = np.lexsort(list(reversed(planes)))
    for nm in cols:
        np.testing.assert_array_equal(got[nm], cols[nm][perm],
                                      err_msg=f"{trial} {nm} {by}")

    # quantiles: global + per-group vs exact-rank numpy
    qs = sorted(rng.uniform(0, 1, int(rng.integers(1, 5))).tolist())
    import jax.numpy as jnp
    gq = np.asarray(quantile(jnp.asarray(cols["pay"]), qs))
    sp = np.sort(cols["pay"])
    for g, (num, sh) in zip(gq, canon_qs(qs)):
        assert g == sp[disc_rank(num, sh, n)], (trial, num, sh)
    keys = rng.integers(0, max(n // 50, 2), n).astype(np.uint64)
    res = group_quantile(U64.from_numpy(keys), jnp.asarray(cols["b"]), qs)
    ng = int(res.num_groups)
    klo = np.asarray(res.key.lo)[:ng]
    qv = np.asarray(res.quantiles)[:, :ng]
    for i, k in enumerate(klo):
        sel = np.sort(cols["b"][keys == k])
        for j, (num, sh) in enumerate(canon_qs(qs)):
            assert qv[j, i] == sel[disc_rank(num, sh, len(sel))], \
                (trial, int(k), num, sh)


@pytest.mark.parametrize("trial", range(4))
def test_fuzz_distributed_orderby_quantile(trial):
    rng = np.random.default_rng(7000 + trial)
    n_dev = int(rng.choice([2, 4, 8]))
    if len(jax.devices()) < n_dev:
        pytest.skip("needs devices")
    from tpu_qe.exchange import make_mesh
    from tpu_qe.exchange.dorderby import distributed_order_by_numpy
    from tpu_qe.exchange.dquantile import distributed_quantile_numpy
    from tpu_qe.ops.orderby import sort_by_multi
    from tpu_qe.ops.quantile import canon_qs, disc_rank

    mesh = make_mesh(n_dev)
    n = int(rng.integers(2, 60)) * n_dev * 8
    cols = {
        "k": _keys(rng, n),
        "b": rng.integers(-(1 << 10), 1 << 10, n,
                          dtype=np.int64).astype(np.int32),
        "i": np.arange(n, dtype=np.uint32),
    }
    by = [("k", rng.choice(["asc", "desc"])),
          ("b", rng.choice(["asc", "desc"]))]
    cf = "auto" if trial % 2 == 0 else float(n_dev)
    got, pos = distributed_order_by_numpy(cols, by, mesh,
                                          capacity_factor=cf)
    want = sort_by_multi(Table.from_numpy(cols), by).to_numpy()
    for nm in cols:
        np.testing.assert_array_equal(got[nm], want[nm],
                                      err_msg=f"{trial} {nm} {by}")

    qs = sorted(rng.uniform(0, 1, int(rng.integers(1, 4))).tolist())
    gq = distributed_quantile_numpy(cols["k"], qs, mesh)
    s = np.sort(cols["k"])
    for g, (num, sh) in zip(gq, canon_qs(qs)):
        assert g == s[disc_rank(num, sh, n)], (trial, num, sh)
