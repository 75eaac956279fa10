"""LEFT / FULL OUTER one-to-many joins vs numpy oracles
(ops/join.py::join_outer)."""

import jax.numpy as jnp
import numpy as np

from tpu_qe.bits import U64
from tpu_qe.ops.join import join_outer
from tpu_qe.table import Table


def _mk(keys, vals, vname="v"):
    return Table({"key": U64.from_numpy(keys.astype(np.uint64)),
                  vname: jnp.asarray(vals.astype(np.uint32))})


def _left_outer_oracle(lk, lv, rk, rv):
    """Rows in (left row order, right value order) as the engine emits
    (within a left row the right side is key-sorted; we make tie order
    irrelevant by comparing per-left-row multisets)."""
    out = []
    for i, k in enumerate(lk):
        hits = sorted(rv[rk == k].tolist())
        if hits:
            out.append((int(lv[i]), True, hits))
        else:
            out.append((int(lv[i]), False, [0]))
    return out


def _got_rows(res, n_l):
    num = int(res.num_out)
    li = np.asarray(res.left_index)[:num]
    lvals = np.asarray(res.table["lv"])[:num]
    rvals = np.asarray(res.table["v"])[:num]
    matched = np.asarray(res.matched)[:num]
    per_left = []
    for i in range(n_l):
        sel = li == i
        assert sel.any(), f"left row {i} missing from LEFT OUTER output"
        per_left.append((int(lvals[sel][0]),
                         bool(matched[sel].all()),
                         sorted(rvals[sel].tolist())))
        assert (matched[sel] == matched[sel][0]).all()
    return per_left


def test_left_outer_unique_right():
    rng = np.random.default_rng(0)
    lk = rng.integers(0, 50, 64)
    rk = np.unique(rng.integers(0, 50, 32))
    lv = np.arange(64) + 1000
    rv = rk * 7 + 1
    res = join_outer(_mk(lk, lv, "lv"), _mk(rk, rv),
                     out_budget=256)
    assert not int(res.overflow)
    assert int(res.num_out) == 64          # FK-like: one slot per left row
    got = _got_rows(res, 64)
    want = _left_outer_oracle(lk, lv, rk, rv)
    assert got == want


def test_left_outer_duplicate_right_keys():
    rng = np.random.default_rng(1)
    lk = rng.integers(0, 10, 40)
    rk = rng.integers(0, 10, 60)           # heavy duplicates
    lv = np.arange(40) + 1
    rv = rng.integers(1, 1 << 20, 60)
    res = join_outer(_mk(lk, lv, "lv"), _mk(rk, rv), out_budget=1024)
    assert not int(res.overflow)
    got = _got_rows(res, 40)
    want = _left_outer_oracle(lk, lv, rk, rv)
    assert got == want
    # exact count: sum over left rows of max(matches, 1)
    cnt = sum(max((rk == k).sum(), 1) for k in lk)
    assert int(res.num_out) == cnt


def test_full_outer_right_only_section():
    lk = np.array([1, 2, 3, 3])
    rk = np.array([3, 5, 5, 9, 2])
    lv = np.array([10, 20, 30, 31])
    rv = np.array([100, 200, 201, 300, 400])
    res = join_outer(_mk(lk, lv, "lv"), _mk(rk, rv), how="full",
                     out_budget=64)
    assert not int(res.overflow)
    # unmatched right keys: 5, 5, 9 (key 2 and 3 match)
    n_ro = int(res.num_right_only)
    assert n_ro == 3
    ro_k = res.right_only["key"].to_numpy()[:n_ro]
    ro_v = np.asarray(res.right_only["v"])[:n_ro]
    np.testing.assert_array_equal(ro_k, [5, 5, 9])
    assert sorted(ro_v.tolist()) == [200, 201, 300]
    got = _got_rows(res, 4)
    assert got == _left_outer_oracle(lk, lv, rk, rv)


def test_disjoint_sides():
    lk, rk = np.arange(8), np.arange(8) + 100
    res = join_outer(_mk(lk, lk, "lv"), _mk(rk, rk), how="full",
                     out_budget=32)
    assert int(res.num_out) == 8
    assert not np.asarray(res.matched)[:8].any()
    assert int(res.num_right_only) == 8
    np.testing.assert_array_equal(
        res.right_only["key"].to_numpy()[:8], np.sort(rk))


def test_overflow_detected_not_silent():
    lk = np.zeros(16, dtype=np.int64)
    rk = np.zeros(16, dtype=np.int64)      # 256 matches
    res = join_outer(_mk(lk, lk, "lv"), _mk(rk, rk), out_budget=32)
    assert int(res.overflow) and int(res.num_out) == 256


def test_table_api_right_outer_via_swap():
    lk, rk = np.array([1, 2]), np.array([2, 3])
    t_l = _mk(lk, np.array([10, 20]), "lv")
    t_r = _mk(rk, np.array([200, 300]))
    res = t_r.join_outer(t_l, how="left", out_budget=16)  # RIGHT OUTER
    assert int(res.num_out) == 2
    m = np.asarray(res.matched)[:2]
    keys = res.table["key"].to_numpy()[:2]
    assert set(keys[m].tolist()) == {2} and set(keys[~m].tolist()) == {3}
