"""Distributed SQL execution (Database.sql(..., mesh=)) vs the local
SQL path on the CPU virtual mesh — the front-end drives the exchange/
operators and must agree with the single-device plan bit-for-bit
(integers) / to f32 tolerance (float aggregates combine in a different
association across shards)."""

import numpy as np
import pytest

from tpu_qe.exchange.dsort import make_mesh
from tpu_qe.sql import Database, SqlError


def _db(seed=0, n=2048, m=1024):
    rng = np.random.default_rng(seed)
    db = Database()
    k = rng.integers(0, 12, n).astype(np.uint32)
    v = rng.integers(0, 1000, n).astype(np.uint32)
    db.register("t", {
        "k": k,
        "v": v,
        "sv": rng.integers(-500, 500, n).astype(np.int32),
        "f": rng.random(n).astype(np.float32),
        "id": np.arange(n, dtype=np.uint32),
        # derived columns (no extra rng draws — seeds stay stable):
        # g2 for multi-column grouping, h64 for u64 COUNT(DISTINCT)
        # with adversarial shared low bits
        "g2": (np.arange(n, dtype=np.uint32) % 7),
        "h64": ((v % 5).astype(np.uint64) << np.uint64(33))
        | (k % 3).astype(np.uint64),
    })
    db.register("r", {
        # UNIQUE keys (the FK/dimension shape the fused distributed
        # join requires); evens only, so odd t.k values go unmatched
        "k": (rng.permutation(m).astype(np.uint32) * 2),
        "w": rng.integers(0, 100, m).astype(np.uint32),
    })
    return db


def _cmp(local: dict, dist: dict, float_cols=(), rtol=1e-5):
    assert sorted(local) == sorted(dist)
    # canonicalize row order by the full row tuple
    names = sorted(local)
    perm_l = np.lexsort([np.asarray(local[n]).astype(np.float64)
                         for n in reversed(names)])
    perm_d = np.lexsort([np.asarray(dist[n]).astype(np.float64)
                         for n in reversed(names)])
    for n in names:
        a = np.asarray(local[n])[perm_l]
        b = np.asarray(dist[n])[perm_d]
        assert len(a) == len(b), (n, len(a), len(b))
        if n in float_cols or a.dtype.kind == "f" or b.dtype.kind == "f":
            np.testing.assert_allclose(a.astype(np.float64),
                                       b.astype(np.float64),
                                       rtol=rtol, atol=1e-3, err_msg=n)
        else:
            np.testing.assert_array_equal(a.astype(np.int64),
                                          b.astype(np.int64), err_msg=n)


@pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_group_by_aggregates(n_dev):
    db = _db(n_dev)
    sql = ("SELECT k, COUNT(*) AS c, SUM(v) AS s, MIN(v) AS mn, "
           "MAX(v) AS mx, AVG(v) AS a FROM t GROUP BY k ORDER BY k")
    _cmp(db.sql(sql), db.sql(sql, mesh=make_mesh(n_dev)))


@pytest.mark.parametrize("n_dev", [2, 8])
def test_count_distinct(n_dev):
    db = _db(n_dev + 10)
    sql = ("SELECT k, COUNT(DISTINCT sv) AS d FROM t GROUP BY k "
           "ORDER BY k")
    _cmp(db.sql(sql), db.sql(sql, mesh=make_mesh(n_dev)))


@pytest.mark.parametrize("n_dev", [2, 8])
def test_float_aggregate(n_dev):
    db = _db(n_dev + 20)
    sql = "SELECT k, SUM(f) AS s, MAX(f) AS mx FROM t GROUP BY k ORDER BY k"
    _cmp(db.sql(sql), db.sql(sql, mesh=make_mesh(n_dev)),
         float_cols=("s", "mx"), rtol=1e-4)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_fused_join_group_by(n_dev):
    db = _db(n_dev + 30)
    sql = ("SELECT t.k, COUNT(*) AS c, SUM(w) AS s FROM t "
           "JOIN r ON t.k = r.k GROUP BY t.k ORDER BY t.k")
    _cmp(db.sql(sql), db.sql(sql, mesh=make_mesh(n_dev)))


@pytest.mark.parametrize("n_dev", [2, 8])
def test_window(n_dev):
    db = _db(n_dev + 40)
    sql = ("SELECT id, ROW_NUMBER() OVER (PARTITION BY k ORDER BY id) "
           "AS rn, SUM(v) OVER (PARTITION BY k ORDER BY id) AS s "
           "FROM t ORDER BY id")
    _cmp(db.sql(sql), db.sql(sql, mesh=make_mesh(n_dev)))


@pytest.mark.parametrize("n_dev", [2, 8])
def test_order_by_limit(n_dev):
    db = _db(n_dev + 50)
    sql = ("SELECT id, sv, k FROM t ORDER BY sv DESC, k, id LIMIT 64")
    local = db.sql(sql)
    dist = db.sql(sql, mesh=make_mesh(n_dev))
    for nm in local:  # fully ordered: compare in place
        np.testing.assert_array_equal(
            np.asarray(local[nm]).astype(np.int64),
            np.asarray(dist[nm]).astype(np.int64), err_msg=nm)


@pytest.mark.parametrize("op", ["union", "intersect", "except"])
def test_set_ops(op):
    db = _db(60)
    kw = {"union": "UNION", "intersect": "INTERSECT",
          "except": "EXCEPT"}[op]
    sql = f"SELECT v FROM t {kw} SELECT w AS v FROM r ORDER BY v"
    local = db.sql(sql)
    dist = db.sql(sql, mesh=make_mesh(8))
    np.testing.assert_array_equal(
        np.sort(np.asarray(local["v"]).astype(np.uint64)),
        np.sort(np.asarray(dist["v"]).astype(np.uint64)))


def test_join_duplicate_right_keys_raise():
    # the fused distributed join is the FK join; duplicate right keys
    # (SQL one-to-many) must be detected, not silently pick-one
    rng = np.random.default_rng(3)
    db = Database()
    db.register("t", {"k": rng.integers(0, 8, 256).astype(np.uint32)})
    db.register("r", {"k": rng.integers(0, 8, 128).astype(np.uint32),
                      "w": rng.integers(0, 9, 128).astype(np.uint32)})
    with pytest.raises(SqlError, match="unique right join keys"):
        db.sql("SELECT t.k, COUNT(*) AS c, SUM(w) AS s FROM t "
               "JOIN r ON t.k = r.k GROUP BY t.k", mesh=make_mesh(2))


def test_unsupported_shapes_raise():
    db = _db(70)
    mesh = make_mesh(2)
    with pytest.raises(SqlError, match="one side"):
        # WHERE with JOIN pushes down single-side predicates only — a
        # predicate mixing both sides' columns keeps raising
        db.sql("SELECT t.k, COUNT(*) AS c, SUM(w) AS s FROM t "
               "JOIN r ON t.k = r.k WHERE v > 3 AND w < 50 "
               "GROUP BY t.k", mesh=mesh)
    with pytest.raises(SqlError, match="int32 with negatives"):
        db.sql("SELECT k, SUM(sv) AS s FROM t GROUP BY k", mesh=mesh)
    with pytest.raises(SqlError, match="HAVING"):
        # HAVING rides the GROUP BY family only; the fused join keeps
        # raising
        db.sql("SELECT t.k, COUNT(*) AS c FROM t JOIN r ON t.k = r.k "
               "GROUP BY t.k HAVING COUNT(*) > 2", mesh=mesh)


@pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_percentiles(n_dev):
    db = _db(7)
    sql = ("SELECT k, MEDIAN(v) AS m, PERCENTILE_DISC(0.9) WITHIN "
           "GROUP (ORDER BY v) AS p90, COUNT(*) AS c FROM t "
           "GROUP BY k ORDER BY k")
    _cmp(db.sql(sql), db.sql(sql, mesh=make_mesh(n_dev)))


@pytest.mark.parametrize("n_dev", [2, 8])
def test_percentile_cont(n_dev):
    db = _db(8)
    sql = ("SELECT k, PERCENTILE_CONT(0.75) WITHIN GROUP "
           "(ORDER BY v) AS p FROM t GROUP BY k ORDER BY k")
    _cmp(db.sql(sql), db.sql(sql, mesh=make_mesh(n_dev)),
         float_cols=("p",))


@pytest.mark.parametrize("n_dev", [2, 8])
def test_where_group_by(n_dev):
    db = _db(9)
    sql = ("SELECT k, COUNT(*) AS c, SUM(v) AS s, MEDIAN(v) AS m "
           "FROM t WHERE v % 3 = 1 AND k < 9 GROUP BY k ORDER BY k")
    _cmp(db.sql(sql), db.sql(sql, mesh=make_mesh(n_dev)))


def test_where_count_distinct():
    db = _db(10)
    sql = ("SELECT k, COUNT(DISTINCT v) AS d FROM t WHERE v > 100 "
           "GROUP BY k ORDER BY k")
    _cmp(db.sql(sql), db.sql(sql, mesh=make_mesh(8)))


def test_where_empty_result():
    db = _db(11)
    sql = ("SELECT k, COUNT(*) AS c FROM t WHERE v > 100000 "
           "GROUP BY k")
    out = db.sql(sql, mesh=make_mesh(4))
    assert len(out["k"]) == 0 and len(out["c"]) == 0


def test_non_dividing_rows():
    # 2049 rows over 4 devices: the pad-group machinery lifts the
    # rows-divide-the-mesh restriction
    rng = np.random.default_rng(12)
    db = Database()
    db.register("t", {"k": rng.integers(0, 9, 2049).astype(np.uint32),
                      "v": rng.integers(0, 99, 2049).astype(np.uint32)})
    sql = "SELECT k, SUM(v) AS s, COUNT(*) AS c FROM t GROUP BY k ORDER BY k"
    _cmp(db.sql(sql), db.sql(sql, mesh=make_mesh(4)))


@pytest.mark.parametrize("n_dev", [2, 8])
def test_window_rows_frame(n_dev):
    db = _db(13)
    sql = ("SELECT id, SUM(v) OVER (PARTITION BY k ORDER BY id ROWS "
           "BETWEEN 4 PRECEDING AND CURRENT ROW) AS ms, "
           "AVG(v) OVER (PARTITION BY k ORDER BY id ROWS "
           "BETWEEN 4 PRECEDING AND CURRENT ROW) AS ma FROM t")
    _cmp(db.sql(sql), db.sql(sql, mesh=make_mesh(n_dev)),
         float_cols=("ma",))


@pytest.mark.parametrize("n_dev", [2, 8])
def test_having(n_dev):
    db = _db(14)
    sql = ("SELECT k, COUNT(*) AS c, SUM(v) AS s FROM t GROUP BY k "
           "HAVING COUNT(*) > 150 AND MIN(v) < 100 ORDER BY k")
    _cmp(db.sql(sql), db.sql(sql, mesh=make_mesh(n_dev)))


def test_having_with_where_and_median():
    db = _db(15)
    sql = ("SELECT k, MEDIAN(v) AS m FROM t WHERE v % 2 = 0 GROUP BY k "
           "HAVING MEDIAN(v) > 400 ORDER BY k")
    _cmp(db.sql(sql), db.sql(sql, mesh=make_mesh(8)))


@pytest.mark.parametrize("n_dev", [2, 8])
def test_where_order_by(n_dev):
    db = _db(16)
    sql = ("SELECT id, v, f FROM t WHERE v % 3 = 1 "
           "ORDER BY v DESC, f, id")
    local = db.sql(sql)
    dist = db.sql(sql, mesh=make_mesh(n_dev))
    for nm in local:
        np.testing.assert_array_equal(
            np.asarray(local[nm]).astype(np.float64),
            np.asarray(dist[nm]).astype(np.float64), err_msg=nm)


def test_where_order_by_float_key_desc():
    db = _db(17)
    sql = "SELECT id, f FROM t WHERE f > 0.5 ORDER BY f DESC, id"
    local = db.sql(sql)
    dist = db.sql(sql, mesh=make_mesh(4))
    for nm in local:
        np.testing.assert_array_equal(
            np.asarray(local[nm]).astype(np.float64),
            np.asarray(dist[nm]).astype(np.float64), err_msg=nm)


def test_order_by_non_dividing_rows():
    rng = np.random.default_rng(18)
    db = Database()
    db.register("t", {"v": rng.integers(0, 50, 1027).astype(np.uint32),
                      "id": np.arange(1027, dtype=np.uint32)})
    sql = "SELECT id, v FROM t ORDER BY v, id"
    local = db.sql(sql)
    dist = db.sql(sql, mesh=make_mesh(4))
    for nm in local:
        np.testing.assert_array_equal(local[nm], dist[nm], err_msg=nm)


def test_u64_reserved_max_group_key_rejected():
    # a real group keyed 2^64-1 must be DETECTED, never silently
    # dropped as the padding group
    db = Database()
    db.register("t", {
        "k": np.array([1, 1, (1 << 64) - 1, (1 << 64) - 1], np.uint64),
        "v": np.arange(4, dtype=np.uint32)})
    with pytest.raises(SqlError, match="reserved"):
        db.sql("SELECT k, COUNT(*) AS c FROM t GROUP BY k",
               mesh=make_mesh(2))


@pytest.mark.parametrize("n_dev", [2, 8])
def test_where_window(n_dev):
    db = _db(19)
    sql = ("SELECT id, ROW_NUMBER() OVER (PARTITION BY k ORDER BY id) "
           "AS rn, SUM(v) OVER (PARTITION BY k ORDER BY id) AS s "
           "FROM t WHERE v % 2 = 0")
    _cmp(db.sql(sql), db.sql(sql, mesh=make_mesh(n_dev)))


def test_window_non_dividing_rows():
    rng = np.random.default_rng(20)
    db = Database()
    db.register("t", {"k": rng.integers(0, 5, 1027).astype(np.uint32),
                      "o": np.arange(1027, dtype=np.uint32),
                      "v": rng.integers(0, 9, 1027).astype(np.uint32)})
    sql = ("SELECT o, RANK() OVER (PARTITION BY k ORDER BY o) AS r "
           "FROM t")
    _cmp(db.sql(sql), db.sql(sql, mesh=make_mesh(4)))


def test_where_window_rows_frame():
    db = _db(21)
    sql = ("SELECT id, SUM(v) OVER (PARTITION BY k ORDER BY id ROWS "
           "BETWEEN 3 PRECEDING AND CURRENT ROW) AS ms FROM t "
           "WHERE v % 3 <> 2")
    _cmp(db.sql(sql), db.sql(sql, mesh=make_mesh(4)))


@pytest.mark.parametrize("n_dev", [2, 8])
def test_distributed_lag_lead_offset_k(n_dev):
    # offset-k boundary reach rides the row halo (round 5) — formerly
    # a SqlError("offset 1")
    db = _db(22)
    sql = ("SELECT id, LAG(v, 3, 777) OVER (PARTITION BY k ORDER BY "
           "id) AS l3, LEAD(v, 2, 888) OVER (PARTITION BY k ORDER BY "
           "id) AS d2 FROM t ORDER BY id")
    _cmp(db.sql(sql), db.sql(sql, mesh=make_mesh(n_dev)))


@pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_distributed_whole_partition_frames(n_dev):
    # total_sum/min/max, partition_count, total_avg distributed via
    # the forward prefix + backward suffix carries (round 5)
    db = _db(23)
    sql = ("SELECT id, SUM(v) OVER (PARTITION BY k) AS ts, "
           "SUM(sv) OVER (PARTITION BY k) AS tsi, "
           "MIN(sv) OVER (PARTITION BY k) AS tmn, "
           "MAX(f) OVER (PARTITION BY k) AS tmx, "
           "COUNT(v) OVER (PARTITION BY k) AS pc, "
           "AVG(v) OVER (PARTITION BY k) AS ta FROM t ORDER BY id")
    _cmp(db.sql(sql), db.sql(sql, mesh=make_mesh(n_dev)),
         float_cols=("ta",), rtol=2e-4)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_distributed_running_avg_and_signed_sums(n_dev):
    # running AVG + i32-negative running sums: the chain's sign-
    # extended U64 pairs are two's-complement exact (guard removed
    # in round 5)
    db = _db(24)
    sql = ("SELECT id, AVG(v) OVER (PARTITION BY k ORDER BY id) AS ra, "
           "SUM(sv) OVER (PARTITION BY k ORDER BY id) AS rs "
           "FROM t WHERE v > 100 ORDER BY id")
    _cmp(db.sql(sql), db.sql(sql, mesh=make_mesh(n_dev)),
         float_cols=("ra",), rtol=2e-4)


def test_u64_reserved_key_filtered_out_by_where_ok():
    # the reserved-key rejection must run on the FILTERED column: a
    # WHERE that removes every reserved-key row makes the query valid
    # (ADVICE r4)
    db = Database()
    db.register("t", {
        "k": np.array([1, 1, (1 << 64) - 1, 2], np.uint64),
        "v": np.array([10, 20, 30, 40], np.uint32)})
    out = db.sql("SELECT k, COUNT(*) AS c FROM t "
                 "WHERE v < 30 GROUP BY k ORDER BY k",
                 mesh=make_mesh(2))
    np.testing.assert_array_equal(out["k"], np.array([1], np.uint64))
    np.testing.assert_array_equal(out["c"], [2])


def test_distributed_group_quantile_overflow_type():
    # the retry loop must catch ONLY the dedicated overflow type
    from tpu_qe.exchange.dquantile import (QuantileOverflow,
                                           distributed_group_quantile_numpy)
    mesh = make_mesh(2)
    keys = np.arange(256, dtype=np.uint64)
    vals = np.zeros(256, np.uint32)
    with pytest.raises(QuantileOverflow):
        distributed_group_quantile_numpy(keys, vals, [(1, 1)], mesh,
                                         max_groups=16)


# -- round-5 wiring: multi-col GROUP BY, DISTINCT, u64 COUNT(DISTINCT),
# -- WHERE with JOIN ----------------------------------------------------------

@pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_group_by_three_columns(n_dev):
    # k >= 2 group columns rank-pack into one u64 (_group_pack)
    db = _db(90)
    sql = ("SELECT k, g2, sv % 3 = 0 AS e, COUNT(*) AS c, SUM(v) AS s "
           "FROM t GROUP BY k, g2, e ORDER BY k, g2, e")
    _cmp(db.sql(sql), db.sql(sql, mesh=make_mesh(n_dev)))


@pytest.mark.parametrize("n_dev", [2, 8])
def test_group_by_two_columns_where(n_dev):
    db = _db(91)
    sql = ("SELECT k, g2, COUNT(*) AS c, MAX(v) AS mx FROM t "
           "WHERE v > 200 GROUP BY k, g2 ORDER BY k, g2")
    _cmp(db.sql(sql), db.sql(sql, mesh=make_mesh(n_dev)))


@pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_select_distinct(n_dev):
    db = _db(92)
    sql = "SELECT DISTINCT k FROM t ORDER BY k"
    _cmp(db.sql(sql), db.sql(sql, mesh=make_mesh(n_dev)))


def test_select_distinct_two_columns_where():
    db = _db(93)
    sql = "SELECT DISTINCT k, g2 FROM t WHERE v > 600 ORDER BY k, g2"
    _cmp(db.sql(sql), db.sql(sql, mesh=make_mesh(8)))


@pytest.mark.parametrize("n_dev", [2, 8])
def test_count_distinct_u64(n_dev):
    # h64 values share low bits across distinct hi words — the
    # dictionary-rank path must separate them
    db = _db(94)
    sql = ("SELECT k, COUNT(DISTINCT h64) AS d FROM t GROUP BY k "
           "ORDER BY k")
    _cmp(db.sql(sql), db.sql(sql, mesh=make_mesh(n_dev)))


@pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_where_with_join_left(n_dev):
    db = _db(95)
    sql = ("SELECT t.k, COUNT(*) AS c, SUM(w) AS s FROM t "
           "JOIN r ON t.k = r.k WHERE v > 300 GROUP BY t.k "
           "ORDER BY t.k")
    _cmp(db.sql(sql), db.sql(sql, mesh=make_mesh(n_dev)))


def test_where_with_join_right_side():
    db = _db(96)
    sql = ("SELECT t.k, COUNT(*) AS c, SUM(w) AS s FROM t "
           "JOIN r ON t.k = r.k WHERE w < 50 GROUP BY t.k "
           "ORDER BY t.k")
    _cmp(db.sql(sql), db.sql(sql, mesh=make_mesh(2)))


@pytest.mark.parametrize("n_dev", [2, 8])
def test_whole_partition_rides_ordered_spec(n_dev):
    # order-independent whole-partition calls may share one program
    # with ordered calls over the same partition column
    db = _db(25)
    sql = ("SELECT id, SUM(v) OVER (PARTITION BY k) AS ts, "
           "SUM(v) OVER (PARTITION BY k ORDER BY id) AS rs "
           "FROM t ORDER BY id")
    _cmp(db.sql(sql), db.sql(sql, mesh=make_mesh(n_dev)))


def test_order_by_limit_offset():
    db = _db(26)
    sql = "SELECT id, v FROM t ORDER BY v DESC, id LIMIT 16 OFFSET 8"
    local = db.sql(sql)
    dist = db.sql(sql, mesh=make_mesh(4))
    for nm in local:
        np.testing.assert_array_equal(
            np.asarray(local[nm]).astype(np.int64),
            np.asarray(dist[nm]).astype(np.int64), err_msg=nm)


@pytest.mark.parametrize("n_dev", [1, 2, 8])
def test_distributed_range_unbounded_frames(n_dev):
    # SQL's tie-aware default RANGE frame distributed (round 5): the
    # forward partition-prefix carry plus the backward run-suffix
    # chain (S_run) — ORDER BY g2 gives heavy order ties so runs span
    # devices
    db = _db(25)
    sql = ("SELECT id, SUM(v) OVER (PARTITION BY k ORDER BY g2 RANGE "
           "BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs, "
           "SUM(sv) OVER (PARTITION BY k ORDER BY g2 RANGE "
           "BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ri, "
           "MIN(sv) OVER (PARTITION BY k ORDER BY g2 RANGE "
           "BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rm, "
           "MAX(f) OVER (PARTITION BY k ORDER BY g2 RANGE "
           "BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rx, "
           "AVG(v) OVER (PARTITION BY k ORDER BY g2 RANGE "
           "BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ra "
           "FROM t ORDER BY id")
    _cmp(db.sql(sql), db.sql(sql, mesh=make_mesh(n_dev)),
         float_cols=("ra", "rx"), rtol=2e-4)


def test_distributed_range_bounded_rejected():
    db = _db(26)
    with pytest.raises(SqlError, match="in-core only"):
        db.sql("SELECT SUM(v) OVER (PARTITION BY k ORDER BY g2 RANGE "
               "BETWEEN 5 PRECEDING AND CURRENT ROW) AS rs FROM t",
               mesh=make_mesh(2))


@pytest.mark.parametrize("op", ["UNION ALL", "INTERSECT ALL",
                                "EXCEPT ALL"])
def test_distributed_set_op_all_variants(op):
    # ALL multiset semantics from the operator's exact per-key
    # (count_a, count_b): ca+cb / min / clamped difference over the
    # union key set (round 5 — formerly a SqlError)
    db = _db(27)
    q = f"SELECT k FROM t {op} SELECT k FROM r"
    local = db.sql(q)
    for ndev in (2, 8):
        dist = db.sql(q, mesh=make_mesh(ndev))
        np.testing.assert_array_equal(
            np.sort(np.asarray(dist["k"])),
            np.sort(np.asarray(local["k"])), err_msg=f"{op} D={ndev}")


def test_distributed_set_op_dtype_mismatch_rejected():
    db = _db(28)
    with pytest.raises(SqlError, match="dtypes differ"):
        db.sql("SELECT k FROM t UNION ALL SELECT f FROM t",
               mesh=make_mesh(2))


@pytest.mark.parametrize("n_dev", [2, 8])
def test_distributed_count_frames(n_dev):
    # moving_count distributed: global rn0 via the forward count carry,
    # global rn_end via the backward partition-size suffix (round 5)
    db = _db(29)
    sql = ("SELECT id, COUNT(*) OVER (PARTITION BY k ORDER BY id ROWS "
           "BETWEEN 4 PRECEDING AND CURRENT ROW) AS c1, "
           "COUNT(v) OVER (PARTITION BY k ORDER BY id ROWS BETWEEN "
           "2 PRECEDING AND 3 FOLLOWING) AS c2, "
           "COUNT(*) OVER (PARTITION BY k ORDER BY id ROWS BETWEEN "
           "UNBOUNDED PRECEDING AND 2 FOLLOWING) AS c3 "
           "FROM t ORDER BY id")
    _cmp(db.sql(sql), db.sql(sql, mesh=make_mesh(n_dev)))
