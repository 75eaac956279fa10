"""Out-of-core SQL: GROUP BY aggregates over VIRTUAL tables.

Completes the SQL front door's composition matrix: the in-core executor
(executor.py) runs HBM-resident Tables, the distributed layer shards
them over a mesh (executor._sql_distributed), and this module runs
tables LARGER than one device's HBM — the same per-run-partials shape
as ops/bigagg.py (aggregation IS the compression: only the G-bounded
partial group table survives each run).

Virtual tables: the out-of-core tier cannot stream rows from the host
(the tunnel moves ~25-30 MB/s — BASELINE.md), so big tables are
DEVICE-GENERATED: each column is a traceable fn(idx: u32 array) ->
u32/i32/f32 array of the same shape. That is the house data model for
everything out-of-core (hash-of-index = regenerable, verifiable; see
sort/bigsort.py) and matches production fact-table scans where columns
derive from a compact seed (synthetic benchmarks, simulation grids,
regenerated projections).

Execution shape for
    SELECT g, COUNT(*), SUM(v), MIN(v), MAX(v), AVG(v), MEDIAN(v)
    FROM big [WHERE p(row)] GROUP BY g [HAVING ...] [ORDER BY ...]:

  phase A (device, out-of-core): ONE jitted run program evaluated per
    run r — generate columns from idx, evaluate the WHERE mask and the
    aggregate argument expressions through the same expression engine
    the in-core executor uses (executor._eval), and partially aggregate
    via ops/aggregate.group_aggregate_multi(valid=mask,
    max_groups=cap). Only the padded partial table leaves the run
    (g-bounded device head slices — executor._head_np).
  phase A' (device, percentiles): MEDIAN / PERCENTILE_DISC|CONT ride
    bigquantile's machinery shape — per-run (key, value)-sorted planes
    stay RESIDENT and 32 host-driven bisection rounds of per-run
    searchsorted counts answer every (group, q) exactly with no merge
    phase (see ops/bigquantile.py; here vectorized per group over the
    combined group table).
  phase B (host, G-bounded): numpy combine of the R partial tables
    (np.unique + add/minimum/maximum.at). Integer sums stay EXACT: u32
    partials are exact u64 pairs summed into u64 (total < 2^64 because
    n < 2^32 rows of u32 values), int32 partials are two's-complement
    i64 (|total| < 2^63). HAVING / ORDER BY / LIMIT finish on the
    G-bounded host frame — the engine's readback boundary.

Reference contrast: the reference sorts one fixed in-memory buffer
(/root/reference/src/main.rs:376-688); out-of-core declarative
aggregation is SURVEY.md §5's scaled mandate composed with the SQL
surface.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tpu_qe.bits import U64
from tpu_qe.table import Table
from tpu_qe.sql import parser as P
from tpu_qe.sql.executor import (Frame, SqlError, _RowEnv, _calls, _eval,
                                 _frame_order_limit, _head_np, _lift_key,
                                 _materialize, _np_binop, _tag_of,
                                 _unlift_key, _AGG_FUNCS, _PCT_FUNCS)


@dataclasses.dataclass
class VirtualTable:
    """Device-generated table: column = fn(idx u32 array) -> array."""
    n: int
    columns: dict            # name -> fn(idx) -> u32/i32/f32 array
    tags: dict               # name -> "u32"|"i32"|"f32" (probed)


def probe_virtual(n: int, columns: dict) -> VirtualTable:
    """Validate generators on an 8-row probe and record column tags."""
    idx = jnp.arange(8, dtype=jnp.uint32)
    tags = {}
    for nm, fn in columns.items():
        c = fn(idx)
        if isinstance(c, U64):
            raise SqlError(f"virtual column {nm!r}: u64 generators are "
                           "not supported (32-bit columns only)")
        if c.shape != (8,):
            raise SqlError(f"virtual column {nm!r}: generator must "
                           "preserve the index shape")
        tags[nm] = _tag_of(c)
    assert 0 < n < (1 << 32), n
    return VirtualTable(int(n), dict(columns), tags)


# ---------------------------------------------------------------------------
# phase A: the per-run partial-aggregation program
# ---------------------------------------------------------------------------

def _gen_env(vt: VirtualTable, idx) -> _RowEnv:
    cols = {nm: fn(idx) for nm, fn in vt.columns.items()}
    return _RowEnv(Table(cols), {nm: nm for nm in cols}, dict(vt.tags))


def _make_run_fn(vt: VirtualTable, where, gname: str, value_exprs: dict,
                 aggspec: dict, run_size: int, cap: int):
    """One jitted program shared by every run (r is a traced scalar)."""
    from tpu_qe.ops.aggregate import group_aggregate, group_aggregate_multi

    def run(r):
        idx = (r * jnp.uint32(run_size)
               + jnp.arange(run_size, dtype=jnp.uint32))
        env = _gen_env(vt, idx)
        valid = idx < jnp.uint32(vt.n)      # tail-run mask
        if where is not None:
            tv = _eval(where, env, run_size)
            if tv.tag != "bool":
                raise SqlError("WHERE must be boolean")
            valid = valid & jnp.broadcast_to(tv.arr, (run_size,))
        gtv = env.col(P.Col(gname))
        gkey = _lift_key(gtv.arr, gtv.tag)
        vals = {}
        for vn, expr in value_exprs.items():
            tv = _eval(expr, env, run_size)
            arr = tv.arr
            if tv.tag == "bool":
                arr = arr.astype(jnp.uint32)
            if not hasattr(arr, "shape") or arr.shape == ():
                arr = jnp.broadcast_to(arr, (run_size,))
            vals[vn] = arr
        res = (group_aggregate_multi(gkey, vals, aggspec, valid=valid,
                                     max_groups=cap)
               if vals else group_aggregate(gkey, aggs=("count",),
                                            valid=valid, max_groups=cap))
        return {"klo": res.key.lo, "khi": res.key.hi,
                "ng": res.num_groups, "ovf": res.overflow,
                "aggs": dict(res.aggs or {})}

    return jax.jit(run)


# ---------------------------------------------------------------------------
# phase B: exact host combine of G-bounded partial tables
# ---------------------------------------------------------------------------

def _combine_partials(parts: list, tags_of_agg: dict):
    """np.unique-based merge of per-run partial group tables.

    parts: [(keys u64 np, {agg_name: np array}), ...]. Integer sums are
    u64 (u32 columns, total < 2^64) or i64 (int32 columns, |total| <
    2^63) — both exact in their numpy dtype.
    """
    keys = np.concatenate([k for k, _ in parts])
    uk, inv = np.unique(keys, return_inverse=True)
    g = len(uk)
    out: dict[str, np.ndarray] = {}
    offs = np.cumsum([0] + [len(k) for k, _ in parts])
    for name, kind in tags_of_agg.items():
        if kind in ("count", "sum_u64", "sum_i64"):
            dt = np.int64 if kind == "sum_i64" else np.uint64
            acc = np.zeros(g, dt)
            for (k, aggs), o in zip(parts, offs):
                np.add.at(acc, inv[o:o + len(k)],
                          aggs[name].astype(dt))
            out[name] = acc
        elif kind == "sum_f32":
            acc = np.zeros(g, np.float64)
            for (k, aggs), o in zip(parts, offs):
                np.add.at(acc, inv[o:o + len(k)],
                          aggs[name].astype(np.float64))
            out[name] = acc
        elif kind in ("min", "max"):
            first = parts[0][1][name]
            if first.dtype.kind == "f":
                init = np.inf if kind == "min" else -np.inf
                acc = np.full(g, init, np.float64)
            else:
                info = np.iinfo(first.dtype)
                acc = np.full(g, info.max if kind == "min"
                              else info.min, np.int64)
            red = np.minimum if kind == "min" else np.maximum
            for (k, aggs), o in zip(parts, offs):
                red.at(acc, inv[o:o + len(k)],
                       aggs[name].astype(acc.dtype))
            out[name] = (acc if first.dtype.kind != "f"
                         else acc.astype(np.float32))
        else:
            raise AssertionError(kind)
    return uk, out


# ---------------------------------------------------------------------------
# the out-of-core SELECT
# ---------------------------------------------------------------------------

def select_big(vt: VirtualTable, q: P.Query, run_size: int = 1 << 26,
               max_groups: int = 1 << 16, verbose: bool = False,
               stats: dict | None = None) -> dict:
    """Execute one parsed GROUP BY query over a virtual table.

    stats (optional dict): filled with phase timings — compile_s (the
    AOT-compiled run program, excluded from the other numbers per the
    house benching rule), runs_s (phase A dispatch + g-bounded
    readbacks), combine_s (host merge), pct_s (percentile bisection
    rounds incl. their first-use compiles)."""
    if len(q.selects) != 1:
        raise SqlError("set operations over big tables are not "
                       "supported")
    sel = q.selects[0]
    if sel.joins or sel.distinct:
        raise SqlError("big-table SQL supports single-table GROUP BY "
                       "aggregates (no JOIN / DISTINCT)")
    if len(sel.group_by) != 1:
        raise SqlError("big-table SQL needs GROUP BY exactly one "
                       "column")
    gname = sel.group_by[0].name
    if gname not in vt.columns:
        raise SqlError(f"unknown column {gname!r}")

    # collect aggregate calls (select items + HAVING)
    aggcalls = []
    for it in sel.items:
        if it.expr == "*":
            raise SqlError("SELECT * over a big table")
        aggcalls += _calls(it.expr, window=False)
        if _calls(it.expr, window=True):
            raise SqlError("window functions over big tables are not "
                           "supported")
    if sel.having is not None:
        aggcalls += _calls(sel.having, window=False)

    value_exprs: dict[str, object] = {}
    expr_names: dict[str, str] = {}
    pct_specs: dict[tuple, list] = {}     # (vname, kind) -> [(num, sh)]
    pct_of: dict[int, tuple] = {}

    def _value_of(arg) -> str:
        if isinstance(arg, P.Col):
            if arg.name not in vt.columns:
                raise SqlError(f"unknown column {arg.key!r}")
            return arg.name
        rep = repr(arg)
        if rep in expr_names:
            return expr_names[rep]
        if _calls(arg, window=False) or _calls(arg, window=True):
            raise SqlError("nested calls inside aggregate arguments")
        nm = f"__e{len(expr_names)}"
        expr_names[rep] = nm
        value_exprs[nm] = arg
        return nm

    aggspec: dict[str, tuple] = {}
    from tpu_qe.ops.quantile import canon_qs
    for c in aggcalls:
        if c.func in _PCT_FUNCS:
            if c.func == "median":
                if len(c.args) != 1 or c.within_order is not None:
                    raise SqlError("MEDIAN takes one column or "
                                   "expression")
                vn, kind, qq = _value_of(c.args[0]), "disc", (1, 1)
            else:
                if c.within_order is None:
                    raise SqlError(f"{c.func} needs WITHIN GROUP "
                                   "(ORDER BY col)")
                kind = ("disc" if c.func == "percentile_disc"
                        else "cont")
                vn = _value_of(c.within_order)
                (qq,) = canon_qs([float(c.args[0].value)])
            qlist = pct_specs.setdefault((vn, kind), [])
            if qq not in qlist:
                qlist.append(qq)
            pct_of[id(c)] = (vn, kind, qlist.index(qq))
            continue
        if c.func not in _AGG_FUNCS or c.window is not None:
            raise SqlError(f"unknown aggregate {c.func}")
        if c.distinct:
            raise SqlError("COUNT(DISTINCT) over big tables is not "
                           "supported (use ops/bigdistinct directly)")
        if c.func == "count":
            continue
        if len(c.args) != 1:
            raise SqlError(f"{c.func} takes one argument")
        vn = _value_of(c.args[0])
        want = {"avg": ("sum",)}.get(c.func, (c.func,))
        aggspec[vn] = tuple(sorted(set(aggspec.get(vn, ()))
                                   | set(want)))
    for vn in aggspec:
        if isinstance(vn, str) and vn in vt.columns:
            value_exprs.setdefault(vn, P.Col(vn))
    # count always rides (COUNT(*), AVG denominators, HAVING)
    if aggspec:
        first = sorted(aggspec)[0]
        aggspec[first] = tuple(sorted(set(aggspec[first]) | {"count"}))

    n_runs = (vt.n + run_size - 1) // run_size
    if n_runs * run_size >= (1 << 32):
        # idx = r*run_size + arange(run_size) must not wrap u32: wrapped
        # tail indices would pass the `idx < n` mask and double-count
        raise SqlError(f"run_size {run_size} does not tile n={vt.n} "
                       "inside u32 index space — pick a run_size whose "
                       "rounded-up tiling stays below 2^32")
    cap = min(max_groups, run_size)
    # only columns with an aggregate spec enter the run program —
    # percentile-only expressions are (re)generated by the pct phase's
    # own sorted-planes program, never wastefully evaluated here
    run_values = {vn: value_exprs[vn] for vn in aggspec}
    run_fn = _make_run_fn(vt, sel.where, gname, run_values, aggspec,
                          run_size, cap)
    # static signedness of integer-sum columns, probed ONCE (not per
    # run inside the readback loop)
    sum_signed = {vn: _expr_tag(vt, value_exprs[vn]) == "i32"
                  for vn in aggspec}
    import time as _time
    np.asarray(jnp.zeros(8, jnp.uint32)[:1])    # tunnel warmup
    tc = _time.perf_counter()
    run_exec = run_fn.lower(jnp.uint32(0)).compile()
    compile_s = _time.perf_counter() - tc

    # queue every run before the first readback (dispatch round trips
    # cost ~35-70 ms each on the tunnel — CLAUDE.md)
    ta = _time.perf_counter()
    pend = [run_exec(jnp.uint32(r)) for r in range(n_runs)]
    parts = []
    tags_of_agg: dict[str, str] = {}
    for r, res in enumerate(pend):
        ng = int(np.asarray(res["ng"]))
        if res["ovf"] is not None and int(np.asarray(res["ovf"])):
            raise SqlError(
                f"run {r}: more than max_groups={cap} groups per run — "
                "raise max_groups (exact overflow detection, outputs "
                "never silently truncated)")
        klo = _head_np(res["klo"], ng).astype(np.uint64)
        khi = _head_np(res["khi"], ng).astype(np.uint64)
        aggs_np = {}
        for name, arr in res["aggs"].items():
            if isinstance(arr, U64):
                raw = _head_np(arr, ng)
                src = name.rsplit("_", 1)[0]
                signed = sum_signed.get(src, False)
                aggs_np[name] = (raw.view(np.int64) if signed else raw)
                tags_of_agg[name] = "sum_i64" if signed else "sum_u64"
            else:
                aggs_np[name] = _head_np(arr, ng)
                if name.endswith("_count") or name == "count":
                    tags_of_agg[name] = "count"
                elif name.endswith("_sum"):
                    tags_of_agg[name] = "sum_f32"
                elif name.endswith("_min"):
                    tags_of_agg[name] = "min"
                else:
                    tags_of_agg[name] = "max"
        parts.append(((khi << np.uint64(32)) | klo, aggs_np))
    runs_s = _time.perf_counter() - ta
    tb = _time.perf_counter()
    uk, agg_host = _combine_partials(parts, tags_of_agg)
    combine_s = _time.perf_counter() - tb
    g = len(uk)

    # percentiles: bigquantile-shaped bisection over resident runs
    tp = _time.perf_counter()
    pct_host: dict[tuple, np.ndarray] = {}
    pct_compile = [0.0]
    if pct_specs:
        for (vn, kind), qlist in pct_specs.items():
            pct_host.update(_big_group_quantiles(
                vt, sel.where, gname, value_exprs.get(vn, P.Col(vn)),
                vn, kind, qlist, uk, run_size, pct_compile))
    if stats is not None:
        stats.update(compile_s=compile_s + pct_compile[0],
                     runs_s=runs_s, combine_s=combine_s,
                     pct_s=_time.perf_counter() - tp - pct_compile[0],
                     n_runs=n_runs, groups=g)

    # host frame: select items / HAVING over the G-bounded arrays
    gtag = vt.tags[gname]
    gvals = _unlift_key(uk.astype(np.uint32), gtag)
    if aggspec:
        first = sorted(aggspec)[0]
        cnt = agg_host[f"{first}_count"].astype(np.int64)
    else:
        cnt = agg_host["count"].astype(np.int64)

    def eval_g(e) -> np.ndarray:
        if isinstance(e, P.Call):
            if e.func in _PCT_FUNCS:
                return pct_host[pct_of[id(e)]]
            if e.func == "count":
                return cnt
            vn = _value_of(e.args[0])
            if e.func == "avg":
                s = agg_host[f"{vn}_sum"].astype(np.float64)
                return s / np.maximum(cnt.astype(np.float64), 1)
            return agg_host[f"{vn}_{e.func}"]
        if isinstance(e, P.Col):
            if e.name == gname:
                return gvals
            raise SqlError(f"column {e.key!r} is not in GROUP BY")
        if isinstance(e, P.Lit):
            return np.asarray(e.value)
        if isinstance(e, P.Unary):
            v = eval_g(e.operand)
            return ~v.astype(bool) if e.op == "not" else -v
        if isinstance(e, P.Binary):
            return _np_binop(e.op, eval_g(e.left), eval_g(e.right))
        raise SqlError(f"unsupported grouped expression "
                       f"{type(e).__name__}")

    keep = np.ones(g, bool)
    if sel.having is not None:
        keep = np.broadcast_to(eval_g(sel.having).astype(bool), (g,))
    from tpu_qe.sql.executor import Database as _Database
    cols, tags = {}, {}
    for i, it in enumerate(sel.items):
        # same auto-naming as the in-core executor (duplicate functions
        # get positional suffixes instead of silently colliding)
        name = it.alias or _Database._auto_name(it.expr, i)
        v = np.broadcast_to(eval_g(it.expr), (g,))
        cols[name] = np.asarray(v)[keep]
        tags[name] = str(cols[name].dtype)
    fr = _frame_order_limit(Frame(cols, tags), q.order_by, q.limit)
    return dict(_materialize(fr).cols)


def _expr_tag(vt: VirtualTable, expr) -> str | None:
    """Static tag of an aggregate argument (column tag, or probe an
    expression on 8 generated rows)."""
    if expr is None:
        return None
    if isinstance(expr, P.Col):
        return vt.tags.get(expr.name)
    idx = jnp.arange(8, dtype=jnp.uint32)
    tv = _eval(expr, _gen_env(vt, idx), 8)
    return "u32" if tv.tag == "bool" else tv.tag


# ---------------------------------------------------------------------------
# out-of-core per-group percentiles: bisection over per-run sorted
# planes (the bigquantile shape — no merge phase)
# ---------------------------------------------------------------------------

def _big_group_quantiles(vt, where, gname, vexpr, vname, kind, qlist,
                         uk: np.ndarray, run_size: int,
                         compile_acc: list | None = None):
    """Exact per-group PERCENTILE over the virtual table: per-run
    (group, value)-sorted planes stay resident; per-(group, q) ranks
    bisect over the value's 32 sortable bits with one
    searchsorted-count program per round (ops/bigquantile.py's
    selection composed with GROUP BY; counts here come from the
    already-combined group table, so only the bisection runs).
    """
    from tpu_qe.bits import sortable_u32, sortable_u32_inverse

    g = len(uk)
    n_runs = (vt.n + run_size - 1) // run_size
    uk_lo = jnp.asarray((uk & np.uint64(0xFFFFFFFF)).astype(np.uint32))

    # Virtual group columns are 32-bit (probe_virtual rejects u64), so
    # the lifted key's hi plane is 0 for valid rows: each run keeps TWO
    # resident u32 planes sorted lexicographically (group lo, value
    # bits) — no device u64 (house rule: u64 = u32 pairs on device; the
    # TPU has no native 64-bit integer lanes). Invalid rows (tail mask
    # / WHERE) sort as all-ones pairs to the tail; probes clamp to the
    # valid prefix so even a real group key 0xFFFFFFFF with max value
    # bits cannot collide with them.
    @jax.jit
    def run_planes(r):
        idx = (r * jnp.uint32(run_size)
               + jnp.arange(run_size, dtype=jnp.uint32))
        env = _gen_env(vt, idx)
        valid = idx < jnp.uint32(vt.n)
        if where is not None:
            tv = _eval(where, env, run_size)
            valid = valid & jnp.broadcast_to(tv.arr, (run_size,))
        gtv = env.col(P.Col(gname))
        gk = _lift_key(gtv.arr, gtv.tag)
        tv = _eval(vexpr, env, run_size)
        bits = sortable_u32(tv.arr if tv.tag != "bool"
                            else tv.arr.astype(jnp.uint32))
        ones = jnp.uint32(0xFFFFFFFF)
        gp = jnp.where(valid, gk.lo, ones)
        vp = jnp.where(valid, bits, ones)
        sg, sv = jax.lax.sort([gp, vp], num_keys=2, is_stable=False)
        n_valid = jnp.sum(valid.astype(jnp.uint32))
        return sg, sv, n_valid

    import time as _time
    tc = _time.perf_counter()
    run_exec = run_planes.lower(jnp.uint32(0)).compile()
    c_run = _time.perf_counter() - tc
    packed_runs = [run_exec(jnp.uint32(r)) for r in range(n_runs)]

    def _count_le(sg, sv, n_valid, glo, cand):
        """Per group: #valid rows of that group with value bits <= cand
        in this run — a hand-rolled vectorized binary search over the
        lexicographic (sg, sv) pairs (the dquantile._count_lt_trip
        pattern; jnp.searchsorted takes one plane only). Trace-time
        helper, composed into the one-dispatch programs below."""
        n = sg.shape[0]
        lo_b = jnp.zeros(glo.shape, jnp.uint32)
        hi_b = jnp.full(glo.shape, n, jnp.uint32)

        def body(_, carry):
            lo_b, hi_b = carry
            mid = (lo_b + hi_b) // 2
            i = jnp.minimum(mid, jnp.uint32(n - 1))
            mg, mv = jnp.take(sg, i), jnp.take(sv, i)
            le = (mg < glo) | ((mg == glo) & (mv <= cand))
            open_ = lo_b < hi_b
            lo_b = jnp.where(open_ & le, mid + 1, lo_b)
            hi_b = jnp.where(open_ & ~le, mid, hi_b)
            return lo_b, hi_b

        lo_b, _ = jax.lax.fori_loop(0, n.bit_length() + 1, body,
                                    (lo_b, hi_b))
        end = jnp.minimum(lo_b, n_valid)
        start = jnp.minimum(
            jnp.searchsorted(sg, glo, side="left").astype(jnp.uint32),
            n_valid)
        # u32 totals stay exact across runs: a group's count across
        # ALL runs is <= n < 2^32
        return (end - start).astype(jnp.uint32)

    def _count_all(runs_in, glo, cand):
        tot = jnp.zeros(glo.shape, jnp.uint32)
        for sg, sv, nv in runs_in:
            tot = tot + _count_le(sg, sv, nv, glo, cand)
        return tot

    @jax.jit
    def group_counts(runs_in, glo):
        return _count_all(runs_in, glo,
                          jnp.full(glo.shape, 0xFFFFFFFF, jnp.uint32))

    @jax.jit
    def select_ranks_device(runs_in, glo, ranks):
        """Greedy 32-round bisection for the (r+1)-th smallest value
        bit pattern per group, ENTIRELY on device: every round counts
        across all resident runs inside this one program (the per-round
        per-run host dispatch variant paid ~512 round trips at 1B/16
        runs — 74.5 s of pct phase; this is one dispatch total)."""
        def per_bit(j, cand):
            trial = cand | (jnp.uint32(1)
                            << (jnp.uint32(31) - j.astype(jnp.uint32)))
            below = _count_all(runs_in, glo, trial - jnp.uint32(1))
            # if strictly-below is still <= rank, the rank element has
            # this bit set
            return jnp.where(below <= ranks, trial, cand)

        return jax.lax.fori_loop(0, 32, per_bit,
                                 jnp.zeros(glo.shape, jnp.uint32))

    tc = _time.perf_counter()
    cnt_exec = group_counts.lower(packed_runs, uk_lo).compile()
    sel_exec = select_ranks_device.lower(
        packed_runs, uk_lo, jnp.zeros(g, jnp.uint32)).compile()
    if compile_acc is not None:
        compile_acc[0] += c_run + (_time.perf_counter() - tc)
    cnt = np.asarray(cnt_exec(packed_runs, uk_lo)).astype(np.int64)

    def rank_of(num, sh):
        r = np.minimum(np.maximum(
            -((-num * cnt) >> sh) - 1, 0), np.maximum(cnt - 1, 0))
        return r

    def select_rank(ranks: np.ndarray) -> np.ndarray:
        assert (ranks < (1 << 32)).all() and (ranks >= 0).all()
        return np.asarray(sel_exec(packed_runs,
                                   uk_lo,
                                   jnp.asarray(ranks.astype(np.uint32))))

    vtag = _expr_tag(vt, vexpr) or "u32"

    def unbits(b: np.ndarray) -> np.ndarray:
        return np.asarray(sortable_u32_inverse(jnp.asarray(b),
                                               {"u32": jnp.uint32,
                                                "i32": jnp.int32,
                                                "f32": jnp.float32}[
                                                   vtag]))

    out = {}
    for qi, (num, sh) in enumerate(qlist):
        if kind == "disc":
            ranks = rank_of(num, sh)
            out[(vname, kind, qi)] = unbits(select_rank(ranks))
        else:
            t = num * (cnt - 1)
            fl = t >> sh
            frac = (t - (fl << sh)).astype(np.float64) / (1 << sh)
            lo_v = unbits(select_rank(fl)).astype(np.float64)
            up_v = unbits(select_rank(
                np.minimum(fl + (frac > 0), np.maximum(cnt - 1, 0)))
            ).astype(np.float64)
            out[(vname, kind, qi)] = (lo_v + (up_v - lo_v)
                                      * frac).astype(np.float32)
    return out
