"""Out-of-core SQL (sql/bigexec.py): virtual-table queries vs the
in-core SQL engine over the SAME materialized data at reduced scale.

The virtual table's generators run per 4K-row run (multiple runs, a
non-dividing tail); the oracle materializes the full column set once
and runs the identical query through the in-core executor — results
must agree exactly (integers) / to f32 tolerance (AVG, float sums
combine in a different association)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_qe.hashing import murmur_fmix32
from tpu_qe.sql import Database, SqlError

N = (1 << 12) * 3 + 17          # non-dividing tail run
RUN = 1 << 12


def _gens():
    return {
        "k": lambda i: murmur_fmix32(i) & jnp.uint32(63),
        "v": lambda i: ((murmur_fmix32(i ^ jnp.uint32(0xA5A5))
                         & jnp.uint32(0xFFFF)).astype(jnp.int32)
                        - jnp.int32(0x8000)),
        "u": lambda i: murmur_fmix32(i ^ jnp.uint32(7)) & jnp.uint32(999),
        "f": lambda i: (murmur_fmix32(i ^ jnp.uint32(3)) >> 8
                        ).astype(jnp.float32) * jnp.float32(2.0 ** -24),
        "id": lambda i: i,
    }


def _dim():
    # dimension keys cover 48 of the fact's 64 k-values (LEFT joins
    # surface real unmatched rows); unique keys (FK contract)
    dk = np.arange(48, dtype=np.uint32)
    return {"dk": dk,
            "w": (dk * np.uint32(2654435761)) >> np.uint32(22),
            "r": (dk % 5).astype(np.int32) - np.int32(2)}


@pytest.fixture(scope="module")
def dbs():
    big = Database()
    big.register_virtual("t", N, _gens())
    big.register("d", _dim())
    ref = Database()
    idx = jnp.arange(N, dtype=jnp.uint32)
    ref.register("t", {nm: np.asarray(fn(idx))
                       for nm, fn in _gens().items()})
    ref.register("d", _dim())
    return big, ref


def _cmp(got: dict, want: dict, float_cols=(), rtol=1e-5, atol=1e-3):
    assert sorted(got) == sorted(want)
    names = sorted(want)
    pg = np.lexsort([np.asarray(got[n]).astype(np.float64)
                     for n in reversed(names)])
    pw = np.lexsort([np.asarray(want[n]).astype(np.float64)
                     for n in reversed(names)])
    for n in names:
        a, b = np.asarray(got[n])[pg], np.asarray(want[n])[pw]
        assert len(a) == len(b), (n, len(a), len(b))
        if n in float_cols or a.dtype.kind == "f" or b.dtype.kind == "f":
            np.testing.assert_allclose(a.astype(np.float64),
                                       b.astype(np.float64),
                                       rtol=rtol, atol=atol, err_msg=n)
        else:
            np.testing.assert_array_equal(a.astype(np.int64),
                                          b.astype(np.int64), err_msg=n)


def test_group_aggregates(dbs):
    big, ref = dbs
    sql = ("SELECT k, COUNT(*) AS c, SUM(v) AS s, MIN(v) AS mn, "
           "MAX(v) AS mx, AVG(u) AS a FROM t GROUP BY k ORDER BY k")
    _cmp(big.sql(sql, run_size=RUN), ref.sql(sql), float_cols=("a",))


def test_where_having_limit(dbs):
    big, ref = dbs
    sql = ("SELECT k, SUM(u) AS s, COUNT(*) AS c FROM t "
           "WHERE v > 0 AND u % 3 <> 1 GROUP BY k "
           "HAVING COUNT(*) > 40 ORDER BY s DESC LIMIT 11")
    got, want = big.sql(sql, run_size=RUN), ref.sql(sql)
    for nm in want:   # fully ordered comparison
        np.testing.assert_array_equal(
            np.asarray(got[nm]).astype(np.int64),
            np.asarray(want[nm]).astype(np.int64), err_msg=nm)


def test_aggregate_expressions(dbs):
    big, ref = dbs
    sql = ("SELECT k, SUM(u * 2) AS s2, "
           "SUM(CASE WHEN v > 0 THEN u ELSE 0 END) AS cs "
           "FROM t GROUP BY k ORDER BY k")
    _cmp(big.sql(sql, run_size=RUN), ref.sql(sql))


def test_float_aggregates(dbs):
    big, ref = dbs
    sql = "SELECT k, SUM(f) AS s, MAX(f) AS mx FROM t GROUP BY k"
    _cmp(big.sql(sql, run_size=RUN), ref.sql(sql),
         float_cols=("s", "mx"), rtol=1e-4)


def test_percentiles(dbs):
    big, ref = dbs
    sql = ("SELECT k, MEDIAN(v) AS m, PERCENTILE_DISC(0.9) WITHIN "
           "GROUP (ORDER BY u) AS p90, PERCENTILE_CONT(0.25) WITHIN "
           "GROUP (ORDER BY v) AS pc FROM t GROUP BY k ORDER BY k")
    _cmp(big.sql(sql, run_size=RUN), ref.sql(sql), float_cols=("pc",),
         rtol=1e-5)


def test_percentile_with_where(dbs):
    big, ref = dbs
    sql = ("SELECT k, MEDIAN(u) AS m, COUNT(*) AS c FROM t "
           "WHERE v % 2 = 0 GROUP BY k ORDER BY k")
    _cmp(big.sql(sql, run_size=RUN), ref.sql(sql))


def test_overflow_detected(dbs):
    big, _ = dbs
    with pytest.raises(SqlError, match="max_groups"):
        big.sql("SELECT u, COUNT(*) AS c FROM t GROUP BY u",
                run_size=RUN, max_groups=16)


def test_count_only(dbs):
    big, ref = dbs
    sql = "SELECT k, COUNT(*) AS c FROM t GROUP BY k ORDER BY k"
    _cmp(big.sql(sql, run_size=RUN), ref.sql(sql))


def test_unsupported_shapes(dbs):
    big, _ = dbs
    # row-scale results still demand a LIMIT (readback boundary)
    with pytest.raises(SqlError, match="LIMIT"):
        big.sql("SELECT v FROM t ORDER BY v", run_size=RUN)
    with pytest.raises(SqlError, match="LIMIT"):
        big.sql("SELECT v FROM t", run_size=RUN)


def test_virtual_name_collision():
    db = Database()
    db.register("x", {"a": np.zeros(4, np.uint32)})
    with pytest.raises(SqlError, match="already"):
        db.register_virtual("x", 16, {"a": lambda i: i})
    db2 = Database()
    db2.register_virtual("y", 16, {"a": lambda i: i})
    with pytest.raises(SqlError, match="already"):
        db2.register("y", {"a": np.zeros(4, np.uint32)})


# -- review-finding regressions ---------------------------------------------

def test_median_expression_without_other_aggs():
    db = Database()
    db.register_virtual("t", 4096, {
        "k": lambda i: i & jnp.uint32(7),
        "v": lambda i: murmur_fmix32(i) & jnp.uint32(999)})
    got = db.sql("SELECT k, MEDIAN(v * 2) AS m FROM t GROUP BY k "
                 "ORDER BY k", run_size=1024)
    idx = jnp.arange(4096, dtype=jnp.uint32)
    k = np.asarray(idx & jnp.uint32(7))
    v2 = np.asarray(murmur_fmix32(idx) & jnp.uint32(999)) * 2
    for i, kk in enumerate(got["k"]):
        s = np.sort(v2[k == kk])
        assert got["m"][i] == s[(len(s) + 1) // 2 - 1], kk
    got2 = db.sql("SELECT k, COUNT(*) AS c, MEDIAN(v * 2) AS m FROM t "
                  "GROUP BY k", run_size=1024)
    assert (got2["c"] == 512).all()


def test_unaliased_duplicate_aggs_do_not_collide(dbs):
    big, ref = dbs
    sql = "SELECT k, SUM(u), SUM(v) FROM t GROUP BY k ORDER BY k"
    got, want = big.sql(sql, run_size=RUN), ref.sql(sql)
    assert sorted(got) == sorted(want) and len(got) == 3
    for nm in want:
        np.testing.assert_array_equal(
            np.asarray(got[nm]).astype(np.int64),
            np.asarray(want[nm]).astype(np.int64), err_msg=nm)


def test_run_size_u32_wrap_rejected():
    db = Database()
    db.register_virtual("t", (1 << 32) - 1, {"k": lambda i: i})
    with pytest.raises(SqlError, match="u32 index space"):
        db.sql("SELECT k, COUNT(*) AS c FROM t GROUP BY k",
               run_size=3 << 24)


# -- round-5 verbs: heads, ORDER BY/LIMIT, DISTINCT, global/2-col GROUP BY --

def test_head_limit_no_where(dbs):
    big, ref = dbs
    sql = "SELECT k, v, u FROM t LIMIT 37"
    got, want = big.sql(sql, run_size=RUN), ref.sql(sql)
    for nm in want:   # row order is index order on both engines
        np.testing.assert_array_equal(
            np.asarray(got[nm]).astype(np.int64),
            np.asarray(want[nm]).astype(np.int64), err_msg=nm)


def test_select_star_limit(dbs):
    big, ref = dbs
    sql = "SELECT * FROM t LIMIT 21"
    got, want = big.sql(sql, run_size=RUN), ref.sql(sql)
    assert sorted(got) == sorted(want)
    for nm in want:
        np.testing.assert_allclose(
            np.asarray(got[nm]).astype(np.float64),
            np.asarray(want[nm]).astype(np.float64), err_msg=nm)


def test_head_limit_where_spans_runs(dbs):
    # the predicate is sparse enough that the head spans several runs
    big, ref = dbs
    sql = "SELECT k, u, v % 7 AS m FROM t WHERE u % 97 = 3 LIMIT 60"
    got, want = big.sql(sql, run_size=RUN), ref.sql(sql)
    for nm in want:
        np.testing.assert_array_equal(
            np.asarray(got[nm]).astype(np.int64),
            np.asarray(want[nm]).astype(np.int64), err_msg=nm)


def test_orderby_limit(dbs):
    big, ref = dbs
    sql = ("SELECT k, v, u, id FROM t WHERE u % 3 = 1 "
           "ORDER BY v DESC, u, id LIMIT 25")
    got, want = big.sql(sql, run_size=RUN), ref.sql(sql)
    for nm in want:
        np.testing.assert_array_equal(
            np.asarray(got[nm]).astype(np.int64),
            np.asarray(want[nm]).astype(np.int64), err_msg=nm)


def test_orderby_limit_float_and_alias(dbs):
    big, ref = dbs
    sql = "SELECT id, f * 2 AS d FROM t ORDER BY d DESC, id LIMIT 13"
    got, want = big.sql(sql, run_size=RUN), ref.sql(sql)
    np.testing.assert_array_equal(got["id"], want["id"])
    np.testing.assert_allclose(got["d"], want["d"], rtol=1e-6)


def test_orderby_limit_exceeds_matches(dbs):
    big, ref = dbs
    sql = ("SELECT id FROM t WHERE u = 17 AND k = 3 "
           "ORDER BY id LIMIT 1000")
    got, want = big.sql(sql, run_size=RUN), ref.sql(sql)
    np.testing.assert_array_equal(got["id"], want["id"])


def test_select_distinct(dbs):
    big, ref = dbs
    sql = "SELECT DISTINCT k FROM t WHERE v > 0 ORDER BY k"
    got, want = big.sql(sql, run_size=RUN), ref.sql(sql)
    np.testing.assert_array_equal(got["k"], want["k"])


def test_select_distinct_two_cols(dbs):
    big, ref = dbs
    sql = ("SELECT DISTINCT k, u % 5 AS m FROM t "
           "ORDER BY k, m LIMIT 100")
    got, want = big.sql(sql, run_size=RUN), ref.sql(sql)
    np.testing.assert_array_equal(got["k"], want["k"])
    np.testing.assert_array_equal(got["m"], want["m"])


def test_global_aggregates(dbs):
    big, ref = dbs
    sql = ("SELECT COUNT(*) AS c, SUM(v) AS s, MIN(v) AS mn, "
           "MAX(u) AS mx, AVG(u) AS a FROM t WHERE u % 2 = 0")
    got, want = big.sql(sql, run_size=RUN), ref.sql(sql)
    for nm in ("c", "s", "mn", "mx"):
        np.testing.assert_array_equal(
            np.asarray(got[nm]).astype(np.int64),
            np.asarray(want[nm]).astype(np.int64), err_msg=nm)
    np.testing.assert_allclose(got["a"], want["a"], rtol=1e-6)


def test_global_median(dbs):
    big, ref = dbs
    sql = "SELECT MEDIAN(v) AS md, COUNT(*) AS c FROM t"
    got, want = big.sql(sql, run_size=RUN), ref.sql(sql)
    np.testing.assert_array_equal(got["md"], want["md"])
    np.testing.assert_array_equal(got["c"], want["c"])


def test_group_by_two_columns(dbs):
    big, ref = dbs
    sql = ("SELECT k, u % 3 AS m, COUNT(*) AS c, SUM(v) AS s, "
           "MIN(u) AS mn FROM t GROUP BY k, m ORDER BY k, m")
    got, want = big.sql(sql, run_size=RUN), ref.sql(sql)
    for nm in want:
        np.testing.assert_array_equal(
            np.asarray(got[nm]).astype(np.int64),
            np.asarray(want[nm]).astype(np.int64), err_msg=nm)


def test_group_by_two_columns_signed_and_median(dbs):
    big, ref = dbs
    sql = ("SELECT v % 5 AS m, k % 2 AS b, COUNT(*) AS c, "
           "MEDIAN(u) AS md FROM t GROUP BY m, b ORDER BY m, b")
    got, want = big.sql(sql, run_size=RUN), ref.sql(sql)
    for nm in want:
        np.testing.assert_array_equal(
            np.asarray(got[nm]).astype(np.int64),
            np.asarray(want[nm]).astype(np.int64), err_msg=nm)


def test_group_by_alias_expression(dbs):
    big, ref = dbs
    sql = ("SELECT u % 10 AS m, COUNT(*) AS c, SUM(v) AS s FROM t "
           "GROUP BY m ORDER BY m")
    _cmp(big.sql(sql, run_size=RUN), ref.sql(sql))


# -- JOIN over a virtual fact table x in-core dimension ----------------------

def test_join_group_by_dim_col(dbs):
    big, ref = dbs
    sql = ("SELECT d.r AS r, COUNT(*) AS c, SUM(v) AS s, MAX(w) AS mw "
           "FROM t JOIN d ON t.k = d.dk GROUP BY d.r ORDER BY r")
    _cmp(big.sql(sql, run_size=RUN), ref.sql(sql))


def test_left_join_matched_counts(dbs):
    big, ref = dbs
    sql = ("SELECT d__matched AS m, COUNT(*) AS c, SUM(u) AS s "
           "FROM t LEFT JOIN d ON k = dk GROUP BY m ORDER BY m")
    _cmp(big.sql(sql, run_size=RUN), ref.sql(sql))


def test_join_where_on_dim(dbs):
    big, ref = dbs
    sql = ("SELECT k, COUNT(*) AS c, SUM(w) AS sw FROM t "
           "JOIN d ON k = dk WHERE w > 500 AND v < 0 "
           "GROUP BY k ORDER BY k")
    _cmp(big.sql(sql, run_size=RUN), ref.sql(sql))


def test_join_orderby_limit(dbs):
    big, ref = dbs
    # unique global tiebreak (id) makes the top-20 deterministic
    sql = ("SELECT id, k, w FROM t JOIN d ON k = dk "
           "ORDER BY w DESC, id LIMIT 20")
    got, want = big.sql(sql, run_size=RUN), ref.sql(sql)
    for nm in want:
        np.testing.assert_array_equal(
            np.asarray(got[nm]).astype(np.int64),
            np.asarray(want[nm]).astype(np.int64), err_msg=nm)


def test_join_head_star(dbs):
    big, ref = dbs
    # WHERE narrows to fewer rows than LIMIT: both engines return the
    # full (order-free) match set — compare as sets of rows
    sql = "SELECT * FROM t JOIN d ON k = dk WHERE id < 50 LIMIT 100"
    _cmp(big.sql(sql, run_size=RUN), ref.sql(sql))


def test_left_join_head_null_fill(dbs):
    big, ref = dbs
    sql = ("SELECT id, k, dk, w, d__matched FROM t LEFT JOIN d "
           "ON k = dk WHERE id < 40 LIMIT 100")
    _cmp(big.sql(sql, run_size=RUN), ref.sql(sql))


def test_join_distinct(dbs):
    big, ref = dbs
    sql = "SELECT DISTINCT r FROM t JOIN d ON k = dk ORDER BY r"
    _cmp(big.sql(sql, run_size=RUN), ref.sql(sql))


def test_join_median_by_dim_group(dbs):
    big, ref = dbs
    sql = ("SELECT r, MEDIAN(v) AS md, COUNT(*) AS c FROM t "
           "JOIN d ON k = dk GROUP BY r ORDER BY r")
    _cmp(big.sql(sql, run_size=RUN), ref.sql(sql))


def test_join_unsupported_shapes(dbs):
    big, _ = dbs
    # virtual x virtual joins are supported (tests/test_sql_vvjoin.py)
    # but a self-join without aliases has ambiguous bindings
    with pytest.raises(SqlError, match="distinct table aliases"):
        big.sql("SELECT COUNT(*) AS c FROM t JOIN t ON k = k")
    with pytest.raises(SqlError, match="FULL OUTER"):
        big.sql("SELECT COUNT(*) AS c FROM t FULL JOIN d ON k = dk")


def test_join_duplicate_dim_keys_rejected():
    big = Database()
    big.register_virtual("t", 1 << 10, _gens())
    big.register("dup", {"dk": np.array([1, 1, 2], np.uint32),
                         "w": np.arange(3, dtype=np.uint32)})
    with pytest.raises(SqlError, match="not unique"):
        big.sql("SELECT COUNT(*) AS c FROM t JOIN dup ON k = dk")


# -- COUNT(DISTINCT) over big tables -----------------------------------------

def test_count_distinct_by_group(dbs):
    big, ref = dbs
    sql = ("SELECT k, COUNT(DISTINCT u) AS cd, COUNT(*) AS c FROM t "
           "GROUP BY k ORDER BY k")
    _cmp(big.sql(sql, run_size=RUN), ref.sql(sql))


def test_count_distinct_global_where(dbs):
    big, ref = dbs
    sql = "SELECT COUNT(DISTINCT k) AS cd FROM t WHERE v > 0"
    _cmp(big.sql(sql, run_size=RUN), ref.sql(sql))


def test_count_distinct_expression(dbs):
    big, ref = dbs
    sql = ("SELECT k % 4 AS m, COUNT(DISTINCT u % 50) AS cd, "
           "SUM(v) AS s FROM t GROUP BY m ORDER BY m")
    _cmp(big.sql(sql, run_size=RUN), ref.sql(sql))


def test_count_distinct_join(dbs):
    big, ref = dbs
    sql = ("SELECT r, COUNT(DISTINCT k) AS cd FROM t "
           "JOIN d ON k = dk GROUP BY r ORDER BY r")
    _cmp(big.sql(sql, run_size=RUN), ref.sql(sql))


def test_sum_distinct_rejected(dbs):
    big, _ = dbs
    with pytest.raises(SqlError, match="DISTINCT"):
        big.sql("SELECT k, SUM(DISTINCT u) AS s FROM t GROUP BY k",
                run_size=RUN)


# -- set operations over big tables ------------------------------------------

def test_union_distinct(dbs):
    big, ref = dbs
    sql = ("SELECT u FROM t WHERE u < 300 UNION "
           "SELECT u FROM t WHERE u >= 250 ORDER BY u")
    _cmp(big.sql(sql, run_size=RUN), ref.sql(sql))


def test_intersect_and_except(dbs):
    big, ref = dbs
    for op in ("INTERSECT", "EXCEPT"):
        sql = (f"SELECT u FROM t WHERE u < 400 {op} "
               "SELECT u FROM t WHERE u % 3 = 0 ORDER BY u")
        _cmp(big.sql(sql, run_size=RUN), ref.sql(sql))


def test_union_all_multiset(dbs):
    big, ref = dbs
    # single-column UNION ALL: multiset equality (both engines repeat
    # keys by exact multiplicity; _cmp sorts)
    sql = ("SELECT k FROM t WHERE v > 0 UNION ALL "
           "SELECT k FROM t WHERE v > 16000")
    _cmp(big.sql(sql, run_size=RUN), ref.sql(sql))


def test_setop_virtual_x_incore(dbs):
    big, ref = dbs
    sql = "SELECT u FROM t WHERE u < 60 INTERSECT SELECT dk FROM d"
    _cmp(big.sql(sql, run_size=RUN), ref.sql(sql))


def test_setop_incore_first_side(dbs):
    big, ref = dbs
    # in-core side FIRST: routing still lands out-of-core
    sql = "SELECT dk FROM d EXCEPT SELECT u FROM t WHERE u < 30"
    _cmp(big.sql(sql, run_size=RUN), ref.sql(sql))


def test_setop_signed_and_expression(dbs):
    big, ref = dbs
    sql = ("SELECT v % 7 AS m FROM t WHERE v > 0 UNION "
           "SELECT v % 5 AS m FROM t WHERE v < 0 ORDER BY m LIMIT 9")
    got, want = big.sql(sql, run_size=RUN), ref.sql(sql)
    np.testing.assert_array_equal(
        np.asarray(got["m"]).astype(np.int64),
        np.asarray(want["m"]).astype(np.int64))


def test_setop_dtype_mismatch_rejected(dbs):
    big, _ = dbs
    with pytest.raises(SqlError, match="dtype"):
        big.sql("SELECT u FROM t UNION SELECT f FROM t",
                run_size=RUN)


# -- window functions over big tables (LIMIT-bounded prefix exactness) -------

def _cmp_ordered(got: dict, want: dict, rtol=1e-5):
    assert sorted(got) == sorted(want)
    for nm in want:
        a, b = np.asarray(got[nm]), np.asarray(want[nm])
        assert len(a) == len(b), (nm, len(a), len(b))
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            np.testing.assert_allclose(a.astype(np.float64),
                                       b.astype(np.float64),
                                       rtol=rtol, atol=1e-4, err_msg=nm)
        else:
            np.testing.assert_array_equal(a.astype(np.int64),
                                          b.astype(np.int64), err_msg=nm)


def test_window_prefix_family(dbs):
    big, ref = dbs
    body = ("SELECT k, u, id, "
            "ROW_NUMBER() OVER (PARTITION BY k ORDER BY u) AS rn, "
            "RANK() OVER (PARTITION BY k ORDER BY u) AS rk, "
            "SUM(v) OVER (PARTITION BY k ORDER BY u) AS rs, "
            "LAG(u) OVER (PARTITION BY k ORDER BY u) AS lg "
            "FROM t")
    got = big.sql(body + " LIMIT 50", run_size=RUN)
    want = ref.sql(body + " ORDER BY k, u, id LIMIT 50")
    _cmp_ordered(got, want)


def test_window_whole_partition(dbs):
    big, ref = dbs
    body = ("SELECT k, id, COUNT(*) OVER (PARTITION BY k) AS pc, "
            "SUM(u) OVER (PARTITION BY k) AS ts, "
            "MIN(v) OVER (PARTITION BY k) AS mn, "
            "AVG(f) OVER (PARTITION BY k) AS av FROM t WHERE u < 700")
    got = big.sql(body + " LIMIT 64", run_size=RUN)
    want = ref.sql(body + " ORDER BY id LIMIT 64")
    _cmp_ordered(got, want, rtol=1e-4)


def test_window_mixed_specs(dbs):
    big, ref = dbs
    body = ("SELECT k, u, id, "
            "ROW_NUMBER() OVER (PARTITION BY k ORDER BY u) AS rn, "
            "COUNT(*) OVER (PARTITION BY u) AS pc2 "
            "FROM t WHERE v > 0")
    got = big.sql(body + " LIMIT 40", run_size=RUN)
    want = ref.sql(body + " ORDER BY k, u, id LIMIT 40")
    _cmp_ordered(got, want)


def test_window_lead_offset(dbs):
    big, ref = dbs
    body = ("SELECT k, u, id, "
            "LEAD(u, 3) OVER (PARTITION BY k ORDER BY u) AS ld, "
            "FIRST_VALUE(u) OVER (PARTITION BY k ORDER BY u) AS fv "
            "FROM t")
    got = big.sql(body + " LIMIT 30", run_size=RUN)
    want = ref.sql(body + " ORDER BY k, u, id LIMIT 30")
    _cmp_ordered(got, want)


def test_window_percent_rank_ntile(dbs):
    big, ref = dbs
    body = ("SELECT k, u, id, "
            "PERCENT_RANK() OVER (PARTITION BY k ORDER BY u) AS pr, "
            "NTILE(4) OVER (PARTITION BY k ORDER BY u) AS nt "
            "FROM t")
    got = big.sql(body + " LIMIT 50", run_size=RUN)
    want = ref.sql(body + " ORDER BY k, u, id LIMIT 50")
    _cmp_ordered(got, want)


def test_window_moving_frame(dbs):
    big, ref = dbs
    body = ("SELECT k, u, id, SUM(u) OVER (PARTITION BY k ORDER BY u "
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS ms FROM t")
    got = big.sql(body + " LIMIT 30", run_size=RUN)
    want = ref.sql(body + " ORDER BY k, u, id LIMIT 30")
    _cmp_ordered(got, want)


def test_window_unsupported_shapes(dbs):
    big, _ = dbs
    rn = "ROW_NUMBER() OVER (PARTITION BY k ORDER BY u) AS rn"
    with pytest.raises(SqlError, match="LIMIT"):
        big.sql(f"SELECT k, {rn} FROM t", run_size=RUN)
    with pytest.raises(SqlError, match="composite"):
        big.sql(f"SELECT k, {rn} FROM t ORDER BY k LIMIT 5",
                run_size=RUN)
    with pytest.raises(SqlError, match="last_value"):
        big.sql("SELECT LAST_VALUE(u) OVER (PARTITION BY k ORDER BY u)"
                " AS lv FROM t LIMIT 5", run_size=RUN)
    with pytest.raises(SqlError, match="share one"):
        big.sql(f"SELECT {rn}, RANK() OVER (PARTITION BY u ORDER BY v)"
                " AS r2 FROM t LIMIT 5", run_size=RUN)


def test_limit_offset_over_virtual_table():
    import jax.numpy as jnp
    db = Database()
    db.register_virtual("big", 1 << 14,
                        {"k": lambda i: i & jnp.uint32(63),
                         "v": lambda i: i})
    out = db.sql("SELECT v FROM big ORDER BY v DESC LIMIT 5 OFFSET 3",
                 run_size=1 << 12)
    np.testing.assert_array_equal(
        out["v"], (1 << 14) - 1 - 3 - np.arange(5))
    out2 = db.sql("SELECT v FROM big LIMIT 4 OFFSET 10",
                  run_size=1 << 12)
    np.testing.assert_array_equal(out2["v"], 10 + np.arange(4))
    out3 = db.sql("SELECT k, v, ROW_NUMBER() OVER (PARTITION BY k "
                  "ORDER BY v) AS rn FROM big LIMIT 4 OFFSET 2",
                  run_size=1 << 12)
    np.testing.assert_array_equal(out3["v"], 64 * (2 + np.arange(4)))
    np.testing.assert_array_equal(out3["rn"], 3 + np.arange(4))


def test_window_range_unbounded(dbs):
    # SQL's tie-aware default RANGE frame over a big table: the frame
    # runs through the row's LAST ORDER PEER, which extends past the
    # candidate prefix — composed from the prefix-exact cumulative
    # before the run + a G-bounded per-(partition, order)-run side
    # channel (u has only 1000 values, so runs straddle the LIMIT
    # boundary by construction)
    big, ref = dbs
    body = ("SELECT k, u, id, "
            "SUM(v) OVER (PARTITION BY k ORDER BY u RANGE BETWEEN "
            "UNBOUNDED PRECEDING AND CURRENT ROW) AS rs, "
            "MIN(v) OVER (PARTITION BY k ORDER BY u RANGE BETWEEN "
            "UNBOUNDED PRECEDING AND CURRENT ROW) AS rm, "
            "MAX(f) OVER (PARTITION BY k ORDER BY u RANGE BETWEEN "
            "UNBOUNDED PRECEDING AND CURRENT ROW) AS rx, "
            "AVG(v) OVER (PARTITION BY k ORDER BY u RANGE BETWEEN "
            "UNBOUNDED PRECEDING AND CURRENT ROW) AS ra FROM t")
    got = big.sql(body + " LIMIT 40", run_size=RUN)
    want = ref.sql(body + " ORDER BY k, u, id LIMIT 40")
    _cmp_ordered(got, want)


def test_window_range_where_offset(dbs):
    big, ref = dbs
    body = ("SELECT k, u, id, SUM(u) OVER (PARTITION BY k ORDER BY u "
            "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs "
            "FROM t WHERE u % 3 <> 1")
    got = big.sql(body + " LIMIT 25 OFFSET 7", run_size=RUN)
    want = ref.sql(body + " ORDER BY k, u, id LIMIT 25 OFFSET 7")
    _cmp_ordered(got, want)


def test_window_range_bounded_rejected(dbs):
    big, _ = dbs
    with pytest.raises(SqlError, match="bounded RANGE"):
        big.sql("SELECT SUM(v) OVER (PARTITION BY k ORDER BY u RANGE "
                "BETWEEN 5 PRECEDING AND CURRENT ROW) AS rs FROM t "
                "LIMIT 10", run_size=RUN)


def test_window_select_star(dbs):
    # SELECT * expands to the virtual table's columns (sorted name
    # order) alongside the window calls (round 5 — formerly a SqlError)
    big, ref = dbs
    got = big.sql("SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER "
                  "BY u) AS rn FROM t LIMIT 30", run_size=RUN)
    want = ref.sql("SELECT f, id, k, u, v, ROW_NUMBER() OVER "
                   "(PARTITION BY k ORDER BY u) AS rn FROM t "
                   "ORDER BY k, u, id LIMIT 30")
    _cmp_ordered(got, want)


def test_window_count_frames(dbs):
    # moving_count over a big table: backward clamp prefix-exact;
    # FOLLOWING clamp composes hidden row_number with the partition
    # count side channel (round 5)
    big, ref = dbs
    body = ("SELECT k, u, id, "
            "COUNT(*) OVER (PARTITION BY k ORDER BY u ROWS BETWEEN "
            "4 PRECEDING AND CURRENT ROW) AS c1, "
            "COUNT(*) OVER (PARTITION BY k ORDER BY u ROWS BETWEEN "
            "2 PRECEDING AND 3 FOLLOWING) AS c2, "
            "COUNT(*) OVER (PARTITION BY k ORDER BY u ROWS BETWEEN "
            "UNBOUNDED PRECEDING AND 5 FOLLOWING) AS c3 FROM t")
    got = big.sql(body + " LIMIT 30", run_size=RUN)
    want = ref.sql(body + " ORDER BY k, u, id LIMIT 30")
    _cmp_ordered(got, want)
