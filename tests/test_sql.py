"""SQL front-end vs the sqlite3 oracle (tpu_qe/sql/).

Every query runs through BOTH engines over identical data; results
compare exactly for integer columns and to f32-scale tolerance for
float aggregates (sqlite computes in f64, the engine in f32).

Alignment choices (documented in sql/executor.py):
- the engine is NULL-free: outer-join NULLs are zero-filled + a
  `<binding>__matched` mask column, so oracle queries wrap right
  columns in COALESCE(col, 0) and NULL-sensitive tests read the mask;
- window running sums are ROWS-framed; oracle queries say ROWS
  BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW explicitly (SQL's
  default RANGE frame merges order-ties) and use unique order values;
- LAG/LEAD default fill is 0 → LAG(x, 1, 0) in the oracle.
"""

import sqlite3

import numpy as np
import pytest

from tpu_qe.sql import Database, SqlError
from tpu_qe.sql.parser import parse


def _mk_data(seed=0, n=2000, m=500):
    rng = np.random.default_rng(seed)
    t = {
        "k": rng.integers(0, 12, n).astype(np.uint32),
        "g": rng.integers(0, 5, n).astype(np.uint32),
        "v": rng.integers(-1000, 1000, n).astype(np.int32),
        "u": rng.integers(0, 1000, n).astype(np.uint32),
        "f": (rng.random(n).astype(np.float32) * 10 - 5),
        "id": np.arange(n, dtype=np.uint32),
    }
    r = {
        "k": rng.integers(0, 16, m).astype(np.uint32),
        "w": rng.integers(0, 100, m).astype(np.int32),
        "rid": np.arange(m, dtype=np.uint32),
    }
    return t, r


@pytest.fixture(scope="module")
def engines():
    t, r = _mk_data()
    db = Database()
    db.register("t", t)
    db.register("r", r)
    con = sqlite3.connect(":memory:")
    for name, cols in (("t", t), ("r", r)):
        names = sorted(cols)
        con.execute(f"CREATE TABLE {name} ({', '.join(names)})")
        rows = list(zip(*[
            cols[c].astype(np.float64) if cols[c].dtype.kind == "f"
            else cols[c].astype(np.int64) for c in names]))
        con.executemany(
            f"INSERT INTO {name} VALUES ({','.join('?' * len(names))})",
            [tuple(float(x) if isinstance(x, np.floating) else int(x)
                   for x in row) for row in rows])
    return db, con


def _fetch_sqlite(con, sql):
    cur = con.execute(sql)
    names = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return {nm: np.array([row[i] for row in rows])
            for i, nm in enumerate(names)}


def _canon(cols: dict):
    """Row-order canonicalization: stable lexsort over every column
    (floats rounded to 1e-4 so engine/oracle rounding can't reorder)."""
    names = sorted(cols)
    n = len(cols[names[0]]) if names else 0
    keys = []
    for nm in reversed(names):
        c = np.asarray(cols[nm])
        keys.append(np.round(c.astype(np.float64), 4) if c.dtype.kind
                    == "f" else c)
    perm = np.lexsort(keys) if keys and n else np.arange(n)
    return {nm: np.asarray(cols[nm])[perm] for nm in names}


def check(db, con, sql, sqlite_sql=None, ordered=False, rtol=1e-5,
          atol=1e-4):
    got = db.sql(sql)
    want = _fetch_sqlite(con, sqlite_sql or sql)
    assert sorted(got) == sorted(want), (sorted(got), sorted(want))
    if not ordered:
        got, want = _canon(got), _canon(want)
    for nm in want:
        g, w = np.asarray(got[nm]), want[nm]
        assert len(g) == len(w), (nm, len(g), len(w), sql)
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            np.testing.assert_allclose(
                g.astype(np.float64), w.astype(np.float64),
                rtol=rtol, atol=atol, err_msg=f"{nm}: {sql}")
        else:
            np.testing.assert_array_equal(
                g.astype(np.int64), w.astype(np.int64),
                err_msg=f"{nm}: {sql}")


# ---------------------------------------------------------------------------
# projection / WHERE / expressions
# ---------------------------------------------------------------------------

class TestScanFilter:
    def test_projection_arithmetic(self, engines):
        check(*engines,
              "SELECT id, v + 2 * u AS a, v - u AS b FROM t "
              "WHERE k < 4 ORDER BY id", ordered=True)

    def test_where_and_or_not(self, engines):
        check(*engines,
              "SELECT id FROM t WHERE (k = 3 OR k = 5) AND NOT v < 0 "
              "ORDER BY id", ordered=True)

    def test_between_in(self, engines):
        check(*engines,
              "SELECT id, v FROM t WHERE v BETWEEN -10 AND 25 "
              "AND k IN (1, 2, 9) ORDER BY id", ordered=True)

    def test_case_when(self, engines):
        check(*engines,
              "SELECT id, CASE WHEN v < 0 THEN 0 - v WHEN v < 100 "
              "THEN v ELSE 100 END AS c FROM t ORDER BY id",
              ordered=True)

    def test_integer_division_truncates_toward_zero(self, engines):
        check(*engines,
              "SELECT id, v / 7 AS q, v % 7 AS r FROM t ORDER BY id",
              ordered=True)

    def test_float_compare_and_arith(self, engines):
        check(*engines,
              "SELECT id, f * 2.0 + 1.0 AS x FROM t WHERE f > 0.5 "
              "ORDER BY id", ordered=True)

    def test_select_star(self, engines):
        check(*engines, "SELECT * FROM r ORDER BY rid", ordered=True)

    def test_limit(self, engines):
        check(*engines,
              "SELECT id, v FROM t ORDER BY v, id LIMIT 17",
              ordered=True)


# ---------------------------------------------------------------------------
# GROUP BY / aggregates
# ---------------------------------------------------------------------------

class TestGroupBy:
    def test_count_sum_min_max(self, engines):
        check(*engines,
              "SELECT k, COUNT(*) AS c, SUM(v) AS s, MIN(v) AS mn, "
              "MAX(v) AS mx FROM t GROUP BY k ORDER BY k", ordered=True)

    def test_signed_sums_exact(self, engines):
        # int32 negatives: exact signed sums (the aggregate
        # sign-extension path)
        db, con = engines
        got = db.sql("SELECT k, SUM(v) AS s FROM t GROUP BY k ORDER BY k")
        want = _fetch_sqlite(con,
                             "SELECT k, SUM(v) AS s FROM t GROUP BY k "
                             "ORDER BY k")
        assert (want["s"] < 0).any() or (got["s"] < 0).any()
        np.testing.assert_array_equal(got["s"].astype(np.int64),
                                      want["s"])

    def test_avg(self, engines):
        check(*engines,
              "SELECT k, AVG(v) AS a, AVG(u) AS b FROM t GROUP BY k "
              "ORDER BY k", ordered=True)

    def test_two_column_group(self, engines):
        check(*engines,
              "SELECT k, g, COUNT(*) AS c, SUM(u) AS s FROM t "
              "GROUP BY k, g ORDER BY k, g", ordered=True)

    def test_group_by_int32_signed_keys(self, engines):
        check(*engines,
              "SELECT v % 5 AS m, COUNT(*) AS c FROM t GROUP BY m "
              "ORDER BY m",
              "SELECT v % 5 AS m, COUNT(*) AS c FROM t GROUP BY m "
              "ORDER BY m")

    def test_having(self, engines):
        check(*engines,
              "SELECT k, COUNT(*) AS c FROM t GROUP BY k "
              "HAVING COUNT(*) > 160 ORDER BY k", ordered=True)

    def test_having_on_sum(self, engines):
        check(*engines,
              "SELECT g, SUM(v) AS s FROM t GROUP BY g "
              "HAVING SUM(v) < 0 ORDER BY g", ordered=True)

    def test_count_distinct(self, engines):
        check(*engines,
              "SELECT k, COUNT(DISTINCT g) AS d, "
              "COUNT(DISTINCT v) AS dv FROM t GROUP BY k ORDER BY k",
              ordered=True)

    def test_global_aggregate_no_group_by(self, engines):
        check(*engines,
              "SELECT COUNT(*) AS c, SUM(v) AS s, MIN(f) AS mn, "
              "MAX(f) AS mx, AVG(u) AS a FROM t")

    def test_where_then_group(self, engines):
        check(*engines,
              "SELECT g, SUM(u) AS s FROM t WHERE v > 0 AND k <> 7 "
              "GROUP BY g ORDER BY g", ordered=True)

    def test_agg_expression(self, engines):
        check(*engines,
              "SELECT k, SUM(v) + COUNT(*) AS x, "
              "MAX(v) - MIN(v) AS spread FROM t GROUP BY k ORDER BY k",
              ordered=True)

    def test_float_sum(self, engines):
        check(*engines,
              "SELECT k, SUM(f) AS s FROM t GROUP BY k ORDER BY k",
              ordered=True, rtol=1e-4, atol=1e-2)


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------

class TestJoins:
    def test_inner_join(self, engines):
        check(*engines,
              "SELECT t.id, r.rid, t.v, r.w FROM t "
              "JOIN r ON t.k = r.k ORDER BY t.id, r.rid", ordered=True)

    def test_inner_join_aggregate(self, engines):
        check(*engines,
              "SELECT g, COUNT(*) AS c, SUM(w) AS s FROM t "
              "JOIN r ON t.k = r.k GROUP BY g ORDER BY g", ordered=True)

    def test_left_join_zero_fill(self, engines):
        # engine NULL convention: unmatched right columns read 0
        check(*engines,
              "SELECT id, w FROM t LEFT JOIN r ON t.k = r.k "
              "ORDER BY id, w",
              "SELECT id, COALESCE(w, 0) AS w FROM t "
              "LEFT JOIN r ON t.k = r.k ORDER BY id, COALESCE(w, 0)",
              ordered=True)

    def test_left_join_matched_mask(self, engines):
        check(*engines,
              "SELECT id, r__matched FROM t LEFT JOIN r ON t.k = r.k "
              "ORDER BY id, r__matched",
              "SELECT id, (w IS NOT NULL) AS r__matched FROM t "
              "LEFT JOIN r ON t.k = r.k ORDER BY id, 2", ordered=True)

    def test_join_on_value_columns(self, engines):
        # non-key-typed join columns (i32 = i32)
        check(*engines,
              "SELECT t.id, r.rid FROM t JOIN r ON t.v = r.w "
              "ORDER BY t.id, r.rid", ordered=True)

    def test_full_outer_counts(self, engines):
        db, con = engines
        got = db.sql("SELECT id, rid, r__matched, __left_matched "
                     "FROM t FULL JOIN r ON t.k = r.k")
        # sqlite (3.39+) supports FULL OUTER JOIN
        want = _fetch_sqlite(
            con, "SELECT id, rid, (rid IS NOT NULL) AS m, "
                 "(id IS NOT NULL) AS lm FROM t "
                 "FULL OUTER JOIN r ON t.k = r.k")
        assert len(got["id"]) == len(want["id"])
        assert int(got["r__matched"].sum()) == int(want["m"].sum())
        assert int(got["__left_matched"].sum()) == int(want["lm"].sum())


# ---------------------------------------------------------------------------
# DISTINCT / set operations
# ---------------------------------------------------------------------------

class TestSetOps:
    def test_select_distinct(self, engines):
        check(*engines,
              "SELECT DISTINCT k, g FROM t ORDER BY k, g", ordered=True)

    def test_union_distinct(self, engines):
        check(*engines,
              "SELECT k FROM t UNION SELECT k FROM r ORDER BY k",
              ordered=True)

    def test_union_all(self, engines):
        check(*engines,
              "SELECT v FROM t WHERE k = 1 UNION ALL "
              "SELECT w FROM r WHERE k = 1 ORDER BY v",
              "SELECT v FROM t WHERE k = 1 UNION ALL "
              "SELECT w AS v FROM r WHERE k = 1 ORDER BY v",
              ordered=True)

    def test_intersect(self, engines):
        check(*engines,
              "SELECT v FROM t INTERSECT SELECT w FROM r ORDER BY v",
              ordered=True)

    def test_except(self, engines):
        check(*engines,
              "SELECT k FROM t EXCEPT SELECT k FROM r ORDER BY k",
              ordered=True)

    def test_except_all_multiset(self, engines):
        # Postgres EXCEPT ALL semantics (sqlite has no EXCEPT ALL):
        # max(ca - cb, 0) copies of EVERY key — keys present in BOTH
        # sides with ca > cb must survive (round-5 fix: the old path
        # pre-filtered to except-distinct keys)
        db, _ = engines
        import numpy as np
        d2 = Database()
        d2.register("a", {"x": np.array([1, 1, 1, 2, 3], np.uint32)})
        d2.register("b", {"x": np.array([1, 3, 3], np.uint32)})
        out = d2.sql("SELECT x FROM a EXCEPT ALL SELECT x FROM b")
        assert sorted(out["x"].tolist()) == [1, 1, 2]
        out = d2.sql("SELECT x FROM a INTERSECT ALL SELECT x FROM b")
        assert sorted(out["x"].tolist()) == [1, 3]


# ---------------------------------------------------------------------------
# window functions
# ---------------------------------------------------------------------------

class TestWindows:
    def test_row_number_rank(self, engines):
        # unique order inside partitions: id is globally unique
        check(*engines,
              "SELECT id, ROW_NUMBER() OVER (PARTITION BY k ORDER BY id)"
              " AS rn, RANK() OVER (PARTITION BY k ORDER BY id) AS rk "
              "FROM t ORDER BY id", ordered=True)

    def test_rank_dense_rank_with_ties(self, engines):
        check(*engines,
              "SELECT id, RANK() OVER (PARTITION BY k ORDER BY g) AS rk,"
              " DENSE_RANK() OVER (PARTITION BY k ORDER BY g) AS dr "
              "FROM t ORDER BY id", ordered=True)

    def test_running_sum(self, engines):
        check(*engines,
              "SELECT id, SUM(v) OVER (PARTITION BY k ORDER BY id) AS s "
              "FROM t ORDER BY id",
              "SELECT id, SUM(v) OVER (PARTITION BY k ORDER BY id "
              "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s "
              "FROM t ORDER BY id", ordered=True)

    def test_running_min_max(self, engines):
        check(*engines,
              "SELECT id, MIN(v) OVER (PARTITION BY g ORDER BY id) AS a,"
              " MAX(v) OVER (PARTITION BY g ORDER BY id) AS b "
              "FROM t ORDER BY id",
              "SELECT id, MIN(v) OVER (PARTITION BY g ORDER BY id "
              "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a, "
              "MAX(v) OVER (PARTITION BY g ORDER BY id "
              "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS b "
              "FROM t ORDER BY id", ordered=True)

    def test_lag_lead(self, engines):
        check(*engines,
              "SELECT id, LAG(v) OVER (PARTITION BY k ORDER BY id) AS a,"
              " LEAD(v) OVER (PARTITION BY k ORDER BY id) AS b "
              "FROM t ORDER BY id",
              "SELECT id, LAG(v, 1, 0) OVER (PARTITION BY k ORDER BY id)"
              " AS a, LEAD(v, 1, 0) OVER (PARTITION BY k ORDER BY id) "
              "AS b FROM t ORDER BY id", ordered=True)

    def test_first_last_value(self, engines):
        check(*engines,
              "SELECT id, FIRST_VALUE(v) OVER (PARTITION BY k "
              "ORDER BY id) AS a, LAST_VALUE(v) OVER (PARTITION BY k "
              "ORDER BY id) AS b FROM t ORDER BY id",
              "SELECT id, FIRST_VALUE(v) OVER (PARTITION BY k "
              "ORDER BY id) AS a, LAST_VALUE(v) OVER (PARTITION BY k "
              "ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING AND "
              "UNBOUNDED FOLLOWING) AS b FROM t ORDER BY id",
              ordered=True)

    def test_ntile_percent_rank(self, engines):
        check(*engines,
              "SELECT id, NTILE(4) OVER (PARTITION BY k ORDER BY id) "
              "AS q, PERCENT_RANK() OVER (PARTITION BY k ORDER BY id) "
              "AS p FROM t ORDER BY id", ordered=True)

    def test_window_two_partition_columns(self, engines):
        check(*engines,
              "SELECT id, ROW_NUMBER() OVER (PARTITION BY k, g "
              "ORDER BY id) AS rn FROM t ORDER BY id", ordered=True)


# ---------------------------------------------------------------------------
# randomized fuzz: templates over random data vs sqlite
# ---------------------------------------------------------------------------

TEMPLATES = [
    ("SELECT id, v + u * 2 AS x FROM t WHERE v % {p} = {q} ORDER BY id",
     None),
    ("SELECT k, COUNT(*) AS c, SUM(v) AS s, MIN(u) AS m FROM t "
     "WHERE u > {q} GROUP BY k ORDER BY k", None),
    ("SELECT k, g, AVG(v) AS a FROM t GROUP BY k, g "
     "HAVING COUNT(*) > {p} ORDER BY k, g", None),
    ("SELECT g, SUM(w) AS s FROM t JOIN r ON t.k = r.k "
     "WHERE v > {q} GROUP BY g ORDER BY g", None),
    ("SELECT id, SUM(u) OVER (PARTITION BY g ORDER BY id) AS s FROM t "
     "WHERE k < {p} ORDER BY id",
     "SELECT id, SUM(u) OVER (PARTITION BY g ORDER BY id ROWS BETWEEN "
     "UNBOUNDED PRECEDING AND CURRENT ROW) AS s FROM t WHERE k < {p} "
     "ORDER BY id"),
    ("SELECT DISTINCT g, k FROM t WHERE v BETWEEN {q} AND {r} "
     "ORDER BY g, k", None),
    # aggregate-argument expressions (synthetic value columns)
    ("SELECT k, SUM(v % {p}) AS s, COUNT(DISTINCT u % {p}) AS d, "
     "AVG(v + u) AS a FROM t GROUP BY k ORDER BY k", None),
    ("SELECT g, SUM(CASE WHEN v > {q} THEN u ELSE 0 END) AS cs "
     "FROM t GROUP BY g ORDER BY g", None),
    # window ROWS frames (the moving_* family)
    ("SELECT id, SUM(u) OVER (PARTITION BY g ORDER BY id ROWS BETWEEN "
     "{p} PRECEDING AND CURRENT ROW) AS ms, MAX(u) OVER (PARTITION BY "
     "g ORDER BY id ROWS BETWEEN {p} PRECEDING AND CURRENT ROW) AS mm "
     "FROM t WHERE v > {q} ORDER BY id", None),
    # LAG with an explicit default
    ("SELECT id, LAG(v, 1, {q}) OVER (PARTITION BY g ORDER BY id) AS l "
     "FROM t ORDER BY id LIMIT 500", None),
]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_sql_fuzz(seed):
    rng = np.random.default_rng(seed)
    t, r = _mk_data(seed=seed + 100, n=1500, m=300)
    db = Database()
    db.register("t", t)
    db.register("r", r)
    con = sqlite3.connect(":memory:")
    for name, cols in (("t", t), ("r", r)):
        names = sorted(cols)
        con.execute(f"CREATE TABLE {name} ({', '.join(names)})")
        con.executemany(
            f"INSERT INTO {name} VALUES ({','.join('?' * len(names))})",
            [tuple(float(cols[c][i]) if cols[c].dtype.kind == "f"
                   else int(cols[c][i]) for c in names)
             for i in range(len(cols[names[0]]))])
    for tmpl, oracle_tmpl in TEMPLATES:
        p = int(rng.integers(2, 9))
        q = int(rng.integers(-50, 400))
        rr = q + int(rng.integers(10, 500))
        sql = tmpl.format(p=p, q=q, r=rr)
        o = (oracle_tmpl or tmpl).format(p=p, q=q, r=rr)
        check(db, con, sql, o, ordered=True)


# ---------------------------------------------------------------------------
# parser-level checks and error paths
# ---------------------------------------------------------------------------

class TestParserErrors:
    def test_parse_roundtrip_smoke(self):
        q = parse("SELECT a, SUM(b) AS s FROM t WHERE a > 1 AND b < 2 "
                  "GROUP BY a HAVING COUNT(*) > 3 ORDER BY a DESC "
                  "LIMIT 10")
        assert q.limit == 10
        assert q.selects[0].group_by[0].name == "a"
        assert q.order_by[0].desc

    def test_unknown_table(self):
        with pytest.raises(SqlError, match="unknown table"):
            Database().sql("SELECT x FROM nope")

    def test_unknown_column(self):
        db = Database()
        db.register("t", {"a": np.zeros(4, np.uint32)})
        with pytest.raises(SqlError, match="unknown column"):
            db.sql("SELECT b FROM t")

    def test_bad_syntax_position(self):
        with pytest.raises(SqlError, match="expected"):
            parse("SELECT FROM t")

    def test_ambiguous_after_join(self):
        db = Database()
        db.register("a", {"k": np.arange(4, dtype=np.uint32),
                          "v": np.arange(4, dtype=np.uint32)})
        db.register("b", {"k": np.arange(4, dtype=np.uint32),
                          "v": np.arange(4, dtype=np.uint32)})
        with pytest.raises(SqlError, match="unknown column"):
            db.sql("SELECT v FROM a JOIN b ON a.k = b.k")
        out = db.sql("SELECT a.v, b.v AS bv FROM a JOIN b ON a.k = b.k "
                     "ORDER BY a.v")
        assert len(out["v"]) == 4 and len(out["bv"]) == 4

    def test_u64_arithmetic_rejected(self):
        db = Database()
        db.register("t", {"h": np.arange(4, dtype=np.uint64),
                          "v": np.arange(4, dtype=np.uint32)})
        with pytest.raises(SqlError, match="u64"):
            db.sql("SELECT h + 1 AS x FROM t")

    def test_u64_group_and_compare(self):
        db = Database()
        h = np.array([5, 5, (1 << 40) + 1, (1 << 40) + 1, 7],
                     dtype=np.uint64)
        v = np.array([1, 2, 3, 4, 5], dtype=np.uint32)
        db.register("t", {"h": h, "v": v})
        out = db.sql("SELECT h, COUNT(*) AS c, SUM(v) AS s FROM t "
                     "GROUP BY h ORDER BY h")
        np.testing.assert_array_equal(out["h"],
                                      np.array([5, 7, (1 << 40) + 1],
                                               np.uint64))
        np.testing.assert_array_equal(out["c"], [2, 1, 2])
        np.testing.assert_array_equal(out["s"], [3, 5, 7])
        out2 = db.sql(f"SELECT v FROM t WHERE h > {1 << 39} ORDER BY v")
        np.testing.assert_array_equal(out2["v"], [3, 4])


# ---------------------------------------------------------------------------
# ordered-set aggregates: PERCENTILE_DISC / PERCENTILE_CONT / MEDIAN
# (numpy oracle — sqlite3 has no percentile functions)
# ---------------------------------------------------------------------------

def _disc_oracle(v: np.ndarray, q: float) -> float:
    s = np.sort(v)
    n = len(s)
    r = min(max(int(np.ceil(q * n)) - 1, 0), n - 1)
    return s[r]


class TestPercentiles:
    def test_global_median_and_disc(self):
        rng = np.random.default_rng(3)
        v = rng.integers(-500, 500, 1001).astype(np.int32)
        db = Database()
        db.register("t", {"v": v})
        out = db.sql("SELECT MEDIAN(v) AS m, "
                     "PERCENTILE_DISC(0.25) WITHIN GROUP (ORDER BY v) "
                     "AS p25 FROM t")
        assert out["m"][0] == _disc_oracle(v, 0.5)
        assert out["p25"][0] == _disc_oracle(v, 0.25)

    def test_group_percentile_disc(self):
        rng = np.random.default_rng(4)
        k = rng.integers(0, 7, 3000).astype(np.uint32)
        v = rng.integers(0, 10000, 3000).astype(np.uint32)
        db = Database()
        db.register("t", {"k": k, "v": v})
        out = db.sql("SELECT k, PERCENTILE_DISC(0.9) WITHIN GROUP "
                     "(ORDER BY v) AS p90, COUNT(*) AS c FROM t "
                     "GROUP BY k ORDER BY k")
        for i, kk in enumerate(out["k"]):
            grp = v[k == kk]
            assert out["p90"][i] == _disc_oracle(grp, 0.9), kk
            assert out["c"][i] == len(grp)

    def test_group_percentile_cont_matches_numpy_linear(self):
        rng = np.random.default_rng(5)
        k = rng.integers(0, 5, 2000).astype(np.uint32)
        v = rng.integers(0, 1000, 2000).astype(np.int32)
        db = Database()
        db.register("t", {"k": k, "v": v})
        out = db.sql("SELECT k, PERCENTILE_CONT(0.75) WITHIN GROUP "
                     "(ORDER BY v) AS p FROM t GROUP BY k ORDER BY k")
        for i, kk in enumerate(out["k"]):
            want = np.percentile(v[k == kk], 75, method="linear")
            np.testing.assert_allclose(out["p"][i], want, rtol=1e-5)

    def test_median_in_having(self):
        k = np.repeat(np.arange(4, dtype=np.uint32), 5)
        v = np.arange(20, dtype=np.int32)      # group g holds 5g..5g+4
        db = Database()
        db.register("t", {"k": k, "v": v})
        out = db.sql("SELECT k FROM t GROUP BY k "
                     "HAVING MEDIAN(v) > 7 ORDER BY k")
        np.testing.assert_array_equal(out["k"], [2, 3])

    def test_percentile_with_where_and_other_aggs(self):
        rng = np.random.default_rng(6)
        k = rng.integers(0, 3, 999).astype(np.uint32)
        v = rng.integers(-50, 50, 999).astype(np.int32)
        db = Database()
        db.register("t", {"k": k, "v": v})
        out = db.sql("SELECT k, SUM(v) AS s, MEDIAN(v) AS m FROM t "
                     "WHERE v <> 0 GROUP BY k ORDER BY k")
        sel = v != 0
        for i, kk in enumerate(out["k"]):
            grp = v[sel & (k == kk)]
            assert out["s"][i] == grp.sum()
            assert out["m"][i] == _disc_oracle(grp, 0.5)

    def test_percentile_requires_within(self):
        db = Database()
        db.register("t", {"v": np.arange(8, dtype=np.uint32)})
        with pytest.raises(SqlError, match="WITHIN GROUP"):
            db.sql("SELECT PERCENTILE_DISC(0.5) FROM t")

    def test_within_on_plain_agg_rejected(self):
        db = Database()
        db.register("t", {"v": np.arange(8, dtype=np.uint32)})
        with pytest.raises(SqlError, match="WITHIN GROUP"):
            db.sql("SELECT SUM(0.5) WITHIN GROUP (ORDER BY v) FROM t")


# ---------------------------------------------------------------------------
# device-resident ORDER BY / LIMIT (row-scale frames stay on device;
# the readback is LIMIT-bounded — executor._device_order_limit)
# ---------------------------------------------------------------------------

class TestDeviceOrderLimit:
    def test_order_limit_matches_host_semantics(self, engines):
        db, con = engines
        check(db, con,
              "SELECT id, v, f FROM t WHERE v > 0 "
              "ORDER BY v DESC, id LIMIT 17", ordered=True)

    def test_limit_without_order(self, engines):
        db, _ = engines
        out = db.sql("SELECT id FROM t LIMIT 5")
        assert len(out["id"]) == 5   # any 5 rows; engine takes the head
        np.testing.assert_array_equal(out["id"], np.arange(5))

    def test_order_by_bool_expression(self):
        db = Database()
        db.register("t", {"v": np.array([3, 1, 2, 4], np.int32)})
        out = db.sql("SELECT v, v > 2 AS big FROM t ORDER BY big, v")
        np.testing.assert_array_equal(out["v"], [1, 2, 3, 4])
        np.testing.assert_array_equal(out["big"],
                                      [False, False, True, True])

    def test_order_by_window_i64_sum_host_fallback(self):
        # i64 pair-sum window outputs take the host lexsort fallback
        k = np.zeros(6, np.uint32)
        v = np.array([5, -3, 10, -20, 1, 2], np.int32)
        o = np.arange(6, dtype=np.uint32)
        db = Database()
        db.register("t", {"k": k, "v": v, "o": o})
        out = db.sql("SELECT o, SUM(v) OVER (PARTITION BY k ORDER BY o)"
                     " AS s FROM t ORDER BY s LIMIT 3")
        want = np.sort(np.cumsum(v))[:3]
        np.testing.assert_array_equal(out["s"], want)


# ---------------------------------------------------------------------------
# expressions inside aggregate arguments (synthetic value columns)
# ---------------------------------------------------------------------------

class TestAggExpressions:
    def test_sum_product(self, engines):
        db, con = engines
        check(db, con, "SELECT k, SUM(v * 2) AS s, SUM(v + u) AS t2 "
                       "FROM t GROUP BY k ORDER BY k", ordered=True)

    def test_count_distinct_expr(self, engines):
        db, con = engines
        check(db, con, "SELECT g, COUNT(DISTINCT v % 7) AS d FROM t "
                       "GROUP BY g ORDER BY g", ordered=True)

    def test_avg_min_max_exprs(self, engines):
        db, con = engines
        check(db, con,
              "SELECT k, AVG(v - u) AS a, MIN(-v) AS mn, "
              "MAX(v % 13) AS mx FROM t GROUP BY k ORDER BY k",
              ordered=True)

    def test_case_inside_sum(self, engines):
        db, con = engines
        check(db, con,
              "SELECT g, SUM(CASE WHEN v > 0 THEN v ELSE 0 END) AS s "
              "FROM t GROUP BY g ORDER BY g", ordered=True)

    def test_shared_expr_evaluated_once(self, engines):
        db, con = engines
        check(db, con,
              "SELECT k, SUM(v % 5) AS s, AVG(v % 5) AS a FROM t "
              "GROUP BY k ORDER BY k", ordered=True)

    def test_median_of_expression(self):
        k = np.repeat(np.arange(3, dtype=np.uint32), 7)
        v = np.arange(21, dtype=np.int32)
        db = Database()
        db.register("t", {"k": k, "v": v})
        out = db.sql("SELECT k, MEDIAN(v * 2) AS m FROM t GROUP BY k "
                     "ORDER BY k")
        np.testing.assert_array_equal(
            out["m"], [2 * np.median(v[k == kk]) for kk in range(3)])

    def test_nested_agg_rejected(self, engines):
        db, _ = engines
        with pytest.raises(SqlError, match="nested"):
            db.sql("SELECT k, SUM(v + COUNT(*)) AS s FROM t GROUP BY k")


# ---------------------------------------------------------------------------
# window ROWS frames: SUM/MIN/MAX/AVG OVER (... ROWS BETWEEN k PRECEDING
# AND CURRENT ROW) -> the moving_* family (sqlite oracle)
# ---------------------------------------------------------------------------

class TestWindowFrames:
    def test_moving_sum_min_max(self, engines):
        db, con = engines
        check(db, con,
              "SELECT id, SUM(u) OVER (PARTITION BY g ORDER BY id "
              "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS ms, "
              "MIN(u) OVER (PARTITION BY g ORDER BY id "
              "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mn, "
              "MAX(u) OVER (PARTITION BY g ORDER BY id "
              "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mx "
              "FROM t ORDER BY id LIMIT 300", ordered=True)

    def test_moving_avg_signed(self, engines):
        db, con = engines
        check(db, con,
              "SELECT id, AVG(v) OVER (PARTITION BY g ORDER BY id "
              "ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS ma "
              "FROM t ORDER BY id LIMIT 300", ordered=True, atol=1e-2)

    def test_unbounded_preceding_is_running(self, engines):
        db, con = engines
        check(db, con,
              "SELECT id, SUM(u) OVER (PARTITION BY g ORDER BY id "
              "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs "
              "FROM t ORDER BY id LIMIT 300", ordered=True)

    def test_frame_without_order_rejected(self):
        db = Database()
        db.register("t", {"g": np.zeros(4, np.uint32),
                          "v": np.arange(4, dtype=np.uint32)})
        with pytest.raises(SqlError, match="ORDER BY"):
            db.sql("SELECT SUM(v) OVER (PARTITION BY g ROWS BETWEEN 2 "
                   "PRECEDING AND CURRENT ROW) AS s FROM t")

    def test_frame_on_rank_rejected(self):
        db = Database()
        db.register("t", {"g": np.zeros(4, np.uint32),
                          "o": np.arange(4, dtype=np.uint32)})
        with pytest.raises(SqlError, match="ROWS frame"):
            db.sql("SELECT RANK() OVER (PARTITION BY g ORDER BY o ROWS "
                   "BETWEEN 2 PRECEDING AND CURRENT ROW) AS r FROM t")


# -- review-finding regressions ---------------------------------------------

def test_contextual_keywords_stay_identifiers():
    db = Database()
    db.register("t", {"current": np.arange(4, dtype=np.uint32),
                      "rows": np.arange(4, dtype=np.uint32),
                      "within": np.arange(4, dtype=np.uint32)})
    out = db.sql("SELECT current, rows, within FROM t "
                 "ORDER BY current DESC LIMIT 2")
    np.testing.assert_array_equal(out["current"], [3, 2])
    np.testing.assert_array_equal(out["rows"], [3, 2])


def test_count_distinct_u64():
    # adversarial values sharing low 32 bits: dropping the hi plane
    # would undercount (5 and 5|2^32 collide) — the dense-rank path
    # must see 3 distinct values
    db = Database()
    db.register("t", {"k": np.zeros(4, np.uint32),
                      "h": np.array([5, 5 | (1 << 32), 5, 7],
                                    np.uint64)})
    out = db.sql("SELECT k, COUNT(DISTINCT h) AS d FROM t GROUP BY k")
    assert len(out["k"]) == 1 and int(out["d"][0]) == 3


class TestMultiColumnGroupBy:
    """GROUP BY beyond two 32-bit columns: the dense-group-id path
    (executor._dense_group_ids — one multi-plane sort instead of U64
    packing)."""

    def test_three_columns(self, engines):
        check(*engines,
              "SELECT k, g, u % 3 AS m, COUNT(*) AS c, SUM(u) AS s, "
              "MIN(v) AS mn, MAX(f) AS mx FROM t GROUP BY k, g, m "
              "ORDER BY k, g, m")

    def test_four_columns_where_having(self, engines):
        check(*engines,
              "SELECT k, g, u % 2 AS a, u % 3 AS b, COUNT(*) AS c "
              "FROM t WHERE v > -500 GROUP BY k, g, a, b "
              "HAVING COUNT(*) > 3 ORDER BY k, g, a, b")

    def test_u64_member_composite(self):
        # 2 columns with a u64 member also rides the dense-id path
        rng = np.random.default_rng(7)
        n = 512
        h = (rng.integers(0, 6, n).astype(np.uint64) << np.uint64(40)
             | rng.integers(0, 3, n).astype(np.uint64))
        k = rng.integers(0, 4, n).astype(np.uint32)
        v = rng.integers(0, 100, n).astype(np.uint32)
        db = Database()
        db.register("t", {"h": h, "k": k, "v": v})
        out = db.sql("SELECT h, k, COUNT(*) AS c, SUM(v) AS s "
                     "FROM t GROUP BY h, k ORDER BY h, k")
        packed = [(int(a), int(b)) for a, b in zip(h, k)]
        keys = sorted(set(packed))
        assert [(int(a), int(b)) for a, b in zip(out["h"], out["k"])] \
            == keys
        for i, kk in enumerate(keys):
            mask = np.array([p == kk for p in packed])
            assert int(out["c"][i]) == int(mask.sum())
            assert int(out["s"][i]) == int(v[mask].sum())

    def test_three_columns_median(self, engines):
        db, _con = engines
        out = db.sql("SELECT k, g, u % 2 AS m, COUNT(*) AS c, "
                     "MEDIAN(v) AS md FROM t GROUP BY k, g, m "
                     "ORDER BY k, g, m")
        t = db._tables["t"]
        k = np.asarray(t["k"])
        gc = np.asarray(t["g"])
        u = np.asarray(t["u"])
        v = np.asarray(t["v"])
        for i in range(len(out["k"])):
            mask = ((k == int(out["k"][i])) & (gc == int(out["g"][i]))
                    & (u % 2 == int(out["m"][i])))
            vals = np.sort(v[mask])
            assert int(out["c"][i]) == len(vals)
            # MEDIAN = percentile_disc(0.5): the lower middle element
            assert int(out["md"][i]) == int(vals[(len(vals) - 1) // 2])


# -- second review pass regressions -------------------------------------------

class TestReviewPass2:
    def test_large_u32_vs_int_literal(self):
        db = Database()
        db.register("t", {"u": np.array([3000000000, 5], np.uint32)})
        out = db.sql("SELECT u FROM t WHERE u > 5")
        np.testing.assert_array_equal(out["u"], [3000000000])
        # negative literal: every u32 is greater
        out = db.sql("SELECT u FROM t WHERE u > -1 ORDER BY u")
        np.testing.assert_array_equal(out["u"], [5, 3000000000])

    def test_large_u32_vs_i32_column_compare(self):
        db = Database()
        db.register("t", {"u": np.array([3000000000, 5], np.uint32),
                          "s": np.array([-2, 10], np.int32)})
        out = db.sql("SELECT u FROM t WHERE u > s ORDER BY u")
        np.testing.assert_array_equal(out["u"], [3000000000])

    def test_union_all_positional_columns(self):
        db = Database()
        db.register("t", {"a": np.array([1], np.uint32),
                          "b": np.array([2], np.uint32)})
        db.register("r", {"c": np.array([3], np.uint32),
                          "a2": np.array([4], np.uint32)})
        out = db.sql("SELECT a, b FROM t UNION ALL "
                     "SELECT c, a2 FROM r ORDER BY a")
        # positional: c lands under 'a', a2 under 'b'
        np.testing.assert_array_equal(out["a"], [1, 3])
        np.testing.assert_array_equal(out["b"], [2, 4])

    def test_select_star_join_keeps_join_key(self):
        db = Database()
        db.register("t", {"id": np.arange(3, dtype=np.uint32),
                          "v": np.arange(3, dtype=np.uint32) * 10})
        db.register("u", {"id": np.arange(3, dtype=np.uint32),
                          "w": np.arange(3, dtype=np.uint32) * 100})
        out = db.sql("SELECT * FROM t JOIN u ON id = id ORDER BY v")
        assert sorted(out) == ["t.id", "u.id", "v", "w"], sorted(out)
        np.testing.assert_array_equal(out["t.id"], [0, 1, 2])
        np.testing.assert_array_equal(out["u.id"], [0, 1, 2])

    def test_aggregate_aliased_to_group_name(self):
        db = Database()
        db.register("s", {"g": np.array([0, 0, 1], np.uint32),
                          "x": np.array([8, 9, 4], np.uint32)})
        out = db.sql("SELECT g AS gg, SUM(x) AS g FROM s GROUP BY g "
                     "ORDER BY gg")
        np.testing.assert_array_equal(out["gg"], [0, 1])
        np.testing.assert_array_equal(out["g"], [17, 4])

    def test_lag_default_and_offsets(self, engines):
        db, con = engines
        check(db, con,
              "SELECT id, LAG(v, 1, 42) OVER (PARTITION BY g ORDER BY "
              "id) AS l FROM t ORDER BY id LIMIT 200", ordered=True)
        # static offsets: relayout shifts + rank masks (previously
        # parsed and silently ignored, then rejected)
        check(db, con,
              "SELECT id, LAG(v, 3, -7) OVER (PARTITION BY g ORDER BY "
              "id) AS l, LEAD(u, 2, 0) OVER (PARTITION BY g ORDER BY "
              "id) AS ld FROM t ORDER BY id LIMIT 500", ordered=True)
        with pytest.raises(SqlError, match=">= 1"):
            db.sql("SELECT LAG(v, 0) OVER (PARTITION BY g ORDER BY id)"
                   " AS l FROM t")

    def test_min_without_order_is_partition_min(self):
        # MIN OVER (PARTITION BY g) without ORDER BY is the
        # whole-partition frame (a silent input-order prefix min before
        # the review fix; now the total_min window kind)
        db = Database()
        db.register("s", {"g": np.zeros(4, np.uint32),
                          "x": np.array([5, 3, 9, 4], np.uint32)})
        out = db.sql("SELECT MIN(x) OVER (PARTITION BY g) AS m FROM s")
        np.testing.assert_array_equal(out["m"], [3, 3, 3, 3])

    def test_join_on_either_operand_order(self):
        db = Database()
        db.register("t", {"k": np.arange(4, dtype=np.uint32),
                          "v": np.arange(4, dtype=np.uint32)})
        db.register("u", {"k": np.arange(0, 8, 2, dtype=np.uint32),
                          "w": np.arange(4, dtype=np.uint32)})
        a = db.sql("SELECT v, w FROM t JOIN u ON t.k = u.k ORDER BY v")
        b = db.sql("SELECT v, w FROM t JOIN u ON u.k = t.k ORDER BY v")
        np.testing.assert_array_equal(a["v"], b["v"])
        np.testing.assert_array_equal(a["w"], b["w"])


@pytest.mark.parametrize("seed", range(3))
def test_percentile_fuzz(seed):
    """Randomized percentile queries vs a numpy oracle (sqlite3 has no
    percentile functions)."""
    rng = np.random.default_rng(300 + seed)
    n = int(rng.integers(500, 3000))
    k = rng.integers(0, rng.integers(2, 9), n).astype(np.uint32)
    v = rng.integers(-1000, 1000, n).astype(np.int32)
    db = Database()
    db.register("t", {"k": k, "v": v})
    q = round(float(rng.uniform(0.05, 0.95)), 3)
    out = db.sql(f"SELECT k, PERCENTILE_DISC({q}) WITHIN GROUP "
                 f"(ORDER BY v) AS p, PERCENTILE_CONT({q}) WITHIN "
                 f"GROUP (ORDER BY v) AS pc FROM t GROUP BY k "
                 f"ORDER BY k")
    # the engine snaps q to the 2^-20 grid — exact for 3-decimal q
    # within float tolerance of ranks; use the snapped value
    from tpu_qe.ops.quantile import canon_qs, disc_rank
    (num, sh) = canon_qs([q])[0]
    for i, kk in enumerate(out["k"]):
        grp = np.sort(v[k == kk])
        assert out["p"][i] == grp[disc_rank(num, sh, len(grp))], (kk, q)
        t = num * (len(grp) - 1)
        fl, frac = t >> sh, (t - ((t >> sh) << sh)) / (1 << sh)
        want = grp[fl] + (grp[min(fl + 1, len(grp) - 1)]
                          - grp[fl]) * frac
        np.testing.assert_allclose(out["pc"][i], want, rtol=1e-5,
                                   atol=1e-3)


# ---------------------------------------------------------------------------
# whole-partition aggregate frames + running averages / counts
# ---------------------------------------------------------------------------

class TestWholePartitionFrames:
    def test_sum_min_max_over_partition(self, engines):
        check(*engines,
              "SELECT id, SUM(u) OVER (PARTITION BY g) AS s, "
              "MIN(v) OVER (PARTITION BY g) AS mn, "
              "MAX(v) OVER (PARTITION BY g) AS mx "
              "FROM t ORDER BY id LIMIT 400", ordered=True)

    def test_signed_total_sum(self, engines):
        check(*engines,
              "SELECT id, SUM(v) OVER (PARTITION BY k) AS s FROM t "
              "ORDER BY id LIMIT 400", ordered=True)

    def test_avg_over_partition_and_running(self, engines):
        db, con = engines
        check(db, con,
              "SELECT id, AVG(v) OVER (PARTITION BY g) AS a "
              "FROM t ORDER BY id LIMIT 400", ordered=True, atol=1e-2)
        check(db, con,
              "SELECT id, AVG(v) OVER (PARTITION BY g ORDER BY id) "
              "AS a FROM t ORDER BY id LIMIT 400",
              "SELECT id, AVG(v) OVER (PARTITION BY g ORDER BY id "
              "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS a "
              "FROM t ORDER BY id LIMIT 400", ordered=True, atol=1e-2)

    def test_count_over_partition_and_running(self, engines):
        db, con = engines
        check(db, con,
              "SELECT id, COUNT(*) OVER (PARTITION BY g) AS c "
              "FROM t ORDER BY id LIMIT 400", ordered=True)
        check(db, con,
              "SELECT id, COUNT(*) OVER (PARTITION BY g ORDER BY id) "
              "AS c FROM t ORDER BY id LIMIT 400",
              "SELECT id, COUNT(*) OVER (PARTITION BY g ORDER BY id "
              "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c "
              "FROM t ORDER BY id LIMIT 400", ordered=True)


class TestAdviceR4:
    """Regression tests for the round-4 advisor findings."""

    def test_union_all_mismatched_dtypes_rejected(self):
        # u64 UNION ALL f32 would silently promote to float64 and
        # corrupt u64 values > 2^53
        db = Database()
        db.register("t", {"a": np.array([(1 << 60) + 1], np.uint64)})
        db.register("r", {"b": np.array([1.5], np.float32)})
        with pytest.raises(SqlError, match="mismatched column dtypes"):
            db.sql("SELECT a FROM t UNION ALL SELECT b FROM r")

    def test_union_all_matched_u64_exact(self):
        db = Database()
        db.register("t", {"a": np.array([(1 << 60) + 1], np.uint64)})
        db.register("r", {"b": np.array([(1 << 61) + 3], np.uint64)})
        out = db.sql("SELECT a FROM t UNION ALL SELECT b FROM r "
                     "ORDER BY a")
        np.testing.assert_array_equal(
            out["a"], np.array([(1 << 60) + 1, (1 << 61) + 3],
                               np.uint64))

    def test_lag_non_integer_offset_rejected(self):
        db = Database()
        db.register("t", {"g": np.zeros(4, np.uint32),
                          "v": np.arange(4, dtype=np.uint32),
                          "id": np.arange(4, dtype=np.uint32)})
        with pytest.raises(SqlError, match="integer"):
            db.sql("SELECT LAG(v, 1.5) OVER (PARTITION BY g ORDER BY "
                   "id) AS l FROM t")

    def test_quantile_overflow_is_dedicated_type(self):
        from tpu_qe.exchange.dquantile import QuantileOverflow
        assert issubclass(QuantileOverflow, RuntimeError)


class TestFollowingAndRangeFrames:
    """Round-5 frames: ROWS ... b FOLLOWING (reversed-sweep
    composition, ops/window._moving_follow) and RANGE frames
    (tie-aware unbounded + the union-sort bounded search,
    ops/window._range_x)."""

    def test_rows_following_sum_min_max(self, engines):
        check(*engines,
              "SELECT id, SUM(v) OVER (PARTITION BY g ORDER BY id "
              "ROWS BETWEEN 2 PRECEDING AND 3 FOLLOWING) AS cs, "
              "MIN(v) OVER (PARTITION BY g ORDER BY id "
              "ROWS BETWEEN 4 PRECEDING AND 1 FOLLOWING) AS mn, "
              "MAX(f) OVER (PARTITION BY g ORDER BY id "
              "ROWS BETWEEN CURRENT ROW AND 5 FOLLOWING) AS mx "
              "FROM t ORDER BY id LIMIT 300", ordered=True)

    def test_rows_following_centered_avg(self, engines):
        # the VERDICT r4 'centered moving average' case
        check(*engines,
              "SELECT id, AVG(v) OVER (PARTITION BY g ORDER BY id "
              "ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS av "
              "FROM t ORDER BY id LIMIT 300", ordered=True)

    def test_rows_unbounded_preceding_following(self, engines):
        check(*engines,
              "SELECT id, SUM(v) OVER (PARTITION BY g ORDER BY id "
              "ROWS BETWEEN UNBOUNDED PRECEDING AND 2 FOLLOWING) AS us "
              "FROM t ORDER BY id LIMIT 300", ordered=True)

    def test_range_unbounded_tie_aware(self, engines):
        # SQL's default RANGE frame: peers of the current row included
        # (u % 7 gives heavy order ties)
        check(*engines,
              "SELECT id, SUM(v) OVER (PARTITION BY g ORDER BY k "
              "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
              "AS ru, MIN(v) OVER (PARTITION BY g ORDER BY k "
              "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
              "AS rm FROM t ORDER BY id LIMIT 300", ordered=True)

    def test_range_bounded_sum_avg(self, engines):
        check(*engines,
              "SELECT id, SUM(v) OVER (PARTITION BY g ORDER BY u "
              "RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS rx, "
              "AVG(v) OVER (PARTITION BY g ORDER BY u "
              "RANGE BETWEEN 150 PRECEDING AND CURRENT ROW) AS ra "
              "FROM t ORDER BY id LIMIT 300", ordered=True)

    def test_range_bounded_min_max(self, engines):
        # interval-min sparse table (ops/window._range_minmax): both
        # order-value bounds per row, tie-aware through the last peer
        check(*engines,
              "SELECT id, MIN(v) OVER (PARTITION BY g ORDER BY u "
              "RANGE BETWEEN 120 PRECEDING AND CURRENT ROW) AS mn, "
              "MAX(v) OVER (PARTITION BY g ORDER BY k "
              "RANGE BETWEEN 3 PRECEDING AND CURRENT ROW) AS mx "
              "FROM t ORDER BY id LIMIT 300", ordered=True)

    def test_row_number_frame_rejected(self, engines):
        db, _ = engines
        with pytest.raises(SqlError, match="frame"):
            db.sql("SELECT ROW_NUMBER() OVER (PARTITION BY g ORDER "
                   "BY id ROWS BETWEEN 1 PRECEDING AND 2 FOLLOWING) "
                   "AS r FROM t")


class TestLimitOffset:
    def test_order_by_offset(self, engines):
        check(*engines,
              "SELECT id, v FROM t ORDER BY v DESC, id LIMIT 10 "
              "OFFSET 25", ordered=True)

    def test_group_frame_offset(self, engines):
        check(*engines,
              "SELECT k, COUNT(*) AS c FROM t GROUP BY k ORDER BY k "
              "LIMIT 3 OFFSET 4", ordered=True)

    def test_where_offset(self, engines):
        check(*engines,
              "SELECT id FROM t WHERE v > 0 ORDER BY id LIMIT 7 "
              "OFFSET 100", ordered=True)

    def test_offset_past_end(self, engines):
        got, _ = engines
        out = got.sql("SELECT k FROM t GROUP BY k ORDER BY k "
                      "LIMIT 5 OFFSET 100")
        assert len(out["k"]) == 0


class TestExplain:
    def test_in_core_shapes(self, engines):
        db, _ = engines
        p = db.explain("SELECT k, g, u % 2 AS m, COUNT(*) AS c FROM t "
                       "WHERE v > 0 GROUP BY k, g, m ORDER BY k")
        assert "in-core" in p and "dense group ids" in p
        assert "where: device expression mask" in p
        p2 = db.explain("SELECT SUM(v) OVER (PARTITION BY g ORDER "
                        "BY id) AS s FROM t")
        assert "ops/window segmented sweeps" in p2
        p3 = db.explain("SELECT t.id, w FROM t JOIN r ON t.k = r.k")
        assert "scan-join" in p3

    def test_big_and_distributed_shapes(self):
        import jax.numpy as jnp
        from tpu_qe.exchange.dsort import make_mesh
        db = Database()
        db.register("t", {"k": np.arange(8, dtype=np.uint32),
                          "v": np.arange(8, dtype=np.uint32)})
        db.register_virtual("big", 1 << 16,
                            {"k": lambda i: i & jnp.uint32(255),
                             "v": lambda i: i})
        p = db.explain("SELECT k, MEDIAN(v) AS m FROM big GROUP BY k")
        assert "out-of-core" in p and "per-run partials" in p \
            and "bisection" in p
        p2 = db.explain("SELECT v FROM big ORDER BY v LIMIT 5")
        assert "_topk_idx" in p2
        p3 = db.explain("SELECT k, COUNT(*) AS c FROM t GROUP BY k",
                        mesh=make_mesh(2))
        assert "distributed" in p3 and "distributed_aggregate" in p3


class TestCountFrames:
    # COUNT(*) OVER (... ROWS frame): the clamped frame row count
    # min(rn0+1, k) + min(rn_end, b) — ops/window.py moving_count
    # (round 5; formerly a SqlError)
    def test_count_rows_frames(self, engines):
        check(*engines,
              "SELECT id, "
              "COUNT(*) OVER (PARTITION BY g ORDER BY id ROWS BETWEEN "
              "4 PRECEDING AND CURRENT ROW) AS c1, "
              "COUNT(v) OVER (PARTITION BY g ORDER BY id ROWS BETWEEN "
              "2 PRECEDING AND 3 FOLLOWING) AS c2, "
              "COUNT(*) OVER (PARTITION BY g ORDER BY id ROWS BETWEEN "
              "UNBOUNDED PRECEDING AND 2 FOLLOWING) AS c3 "
              "FROM t ORDER BY id LIMIT 300", ordered=True)
