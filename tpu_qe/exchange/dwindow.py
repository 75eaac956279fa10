"""Distributed window functions over a device mesh (shard_map + carries).

A window function is a segmented scan over the (partition, order,
position)-sorted stream, and segmented scans compose across ANY block
boundary through a monoid carry — ops/segscan.py exploits this across
1024-row blocks within one device; this module applies the identical
composition ACROSS devices:

1.  rows are globally sorted by (key, order, position) with the dsort
    splitter exchange (exchange/shuffle.py): (key, position) splitters
    keep destinations balanced even when one hot partition dominates —
    hot partitions simply SPLIT across consecutive devices, which is
    exactly the case the carry chain exists for;
2.  each device computes its local window planes with a forced segment
    start at its first row — by the segscan argument, each device's
    tail-partition running values are then precisely the monoid fold
    elements the cross-device combine needs;
3.  one all_gather of O(D) per-device summary scalars (first/last key,
    boundary order values, tail counts/ranks/aggregates, edge values for
    lag/lead) feeds a D-step carry chain, replicated on every device,
    and the resulting carries patch ONLY the rows of each device's
    boundary partition (mask: local partition-start index == 0).

The patched result is exactly the single-stream window of ops/window.py
on the concatenated runs (tests assert bit-equality vs the local
operator and a numpy oracle, including all-equal keys where ONE
partition spans every device). Total interconnect beyond the row
exchange itself: one (D, S) scalar gather — the same O(D) cost class as
dsort's splitter gather.

Reference contrast: the reference is single-device with one queue submit
(/root/reference/src/main.rs:727); this is the SURVEY §2c mandated
scale-out applied to the window family (ops/window.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P, Mesh
from jax import shard_map

from tpu_qe.bits import U64
from tpu_qe.exchange.shuffle import (AXIS, exchange,
                                     route_by_splitters_multi,
                                     sample_splitters_multi)
from tpu_qe.ops.window import (_canon_funcs, _window_sorted_cols,
                               _moving, _pair_to_f32_signed, _shift_k,
                               _MOVING, _RANGE, _RUNNING)

_ONES = jnp.uint32(0xFFFFFFFF)


def _order_bits(order: jnp.ndarray) -> jnp.ndarray:
    """Order column -> u32 whose unsigned order matches the value order
    (exchange columns travel as u32): IEEE trick for f32, sign-bit flip
    for i32, identity for u32. Equality is preserved, so boundary
    comparisons on the bits plane are exact."""
    if order.dtype == jnp.float32:
        b = order.view(jnp.uint32)
        sign = b >> 31
        return jnp.where(sign == 1, ~b, b | jnp.uint32(0x80000000))
    if order.dtype == jnp.int32:
        return order.view(jnp.uint32) ^ jnp.uint32(0x80000000)
    return order


def _bitcast(x: jnp.ndarray, dtype) -> jnp.ndarray:
    return x if x.dtype == dtype else jax.lax.bitcast_convert_type(x, dtype)


class DistWindowResult(NamedTuple):
    """Padded per-device (key, order, position)-sorted runs.

    Device d's run: the first valid[d] rows are real, globally sorted
    when runs concatenate in mesh order. `pos` maps each row to its
    global input position (scatter by pos to recover input order on the
    host). cols: out_name -> plane (U64 for integer running_sum).
    """

    key: U64
    pos: jnp.ndarray
    cols: dict
    valid: jnp.ndarray


def _dwindow_shard(lo, hi, *rest, n_dev: int, samples_per_dev: int,
                   capacity: int, spec: tuple, has_order: bool,
                   colnames: tuple, dtypes: tuple):
    """Per-shard body: exchange + local window + carry chain + patch."""
    n_local = lo.shape[0]
    my = jax.lax.axis_index(AXIS).astype(jnp.uint32)
    gpos = (my * jnp.uint32(n_local)
            + jnp.arange(n_local, dtype=jnp.uint32))
    n_ord = 1 if has_order else 0
    # splitters sample the FULL window order (key, order, position) —
    # dsort's (key, position) splitters are NOT enough here: a
    # partition's rows would split across devices by position while the
    # window order within the partition is (order, position), breaking
    # the global concatenation order the carry chain assumes. The unique
    # position plane still splits hot (key, order) runs across devices.
    route_planes = [hi, lo] + list(rest[:n_ord]) + [gpos]
    sps = sample_splitters_multi(route_planes, n_dev, samples_per_dev)
    dest = route_by_splitters_multi(route_planes, sps)
    cols = [lo, hi] + list(rest[:n_ord]) + [gpos] + list(rest[n_ord:])
    pads = ([_ONES, _ONES] + [_ONES] * n_ord
            + [jnp.uint32(0)] * (1 + len(colnames)))
    recv, flag, rank, counts, overflow = exchange(dest, cols, pads,
                                                  n_dev, capacity)
    # pads sort last: key and order pads are all-ones, and the flag bit
    # above the stability rank breaks (key, order) ties real-first.
    flagkey = (flag << jnp.uint32(31)) | rank
    keys = [recv[1], recv[0]] + ([recv[2]] if has_order else []) + [flagkey]
    res = jax.lax.sort(keys + recv[2 + n_ord:], num_keys=len(keys),
                       is_stable=False)
    shi, slo = res[0], res[1]
    sorder = res[2] if has_order else None
    spad = (res[2 + n_ord] >> jnp.uint32(31)).astype(bool)
    spos = res[3 + n_ord]
    svals = {nm: _bitcast(c, dt)
             for nm, dt, c in zip(colnames, dtypes, res[4 + n_ord:])}

    L = slo.shape[0]
    idx = jnp.arange(L, dtype=jnp.uint32)
    # dtype pinned: under x64 (tests) jnp.sum would promote u32 -> u64,
    # and the summary bitcast to u32 would grow a trailing dimension
    n_v = jnp.sum(counts, dtype=jnp.uint32)

    def prev(x):
        return jnp.concatenate([jnp.zeros((1,), x.dtype), x[:-1]])

    first = idx == 0
    is_new = (first | (slo != prev(slo)) | (shi != prev(shi))
              | (spad & ~prev(spad)))  # pads own their (fake) segment
    order_new = is_new | ((sorder != prev(sorder)) if has_order
                          else jnp.zeros((L,), bool))
    is_last = jnp.concatenate([is_new[1:], jnp.ones((1,), bool)])

    def _haloed(s):
        # lag/lead with offset k > 1 (canon packs it as a (fill, k)
        # fill) compute through the row halo, not the scalar chain
        return s[1] in ("lag", "lead") and isinstance(s[3], tuple)

    # avg kinds flow through the chain as SUMS (an average is not
    # patchable — prefix/suffix contributions add in the numerator
    # only); the division by the global denominator happens after the
    # patch (see the avg finalization below)
    # range_avg's numerator is a range_sum; its denominator (the global
    # count through the row's ORDER-RUN end) is patched separately in
    # the avg finalization below
    _AVG = {"total_avg": "total_sum", "running_avg": "running_sum",
            "range_avg": "range_sum"}
    spec_calc = tuple((nm, _AVG.get(k, k), c, f)
                      for nm, k, c, f in spec)
    base_spec = tuple(s for s in spec_calc
                      if s[1] not in _MOVING and not _haloed(s))
    out, aux = _window_sorted_cols(base_spec, svals, idx, is_new,
                                   order_new, is_last, need_aux=True)
    part_start, run_start = aux["part_start"], aux["run_start"]
    part_end = aux["part_end"]      # set iff a count-needing kind ran
    _TOTALS = ("total_sum", "total_min", "total_max")
    _CNT_KINDS = ("ntile", "percent_rank", "partition_count",
                  "total_avg", "moving_count")
    has_cnt = any(k in _CNT_KINDS for _, k, _, _ in spec)
    from tpu_qe.ops.segscan import cummax_u32 as _cummax
    if has_cnt and part_end is None:
        # total_avg computes as total_sum above, which does not force
        # part_end in _window_sorted_cols — derive it here
        b = jnp.flip(is_last)
        rev_start = _cummax(jnp.where(b, idx, jnp.uint32(0)))
        part_end = jnp.uint32(L - 1) - jnp.flip(rev_start)
    # tie-aware RANGE frames: each row's local frame runs through the
    # end of its ORDER RUN — t_idx (run-end index) feeds the summary
    # head-run fields and range_avg's denominator
    any_range = any(k in _RANGE for _, k, _, _ in spec_calc)
    any_range_avg = any(k == "range_avg" for _, k, _, _ in spec)
    t_idx = None
    if any_range:
        run_last = jnp.concatenate([order_new[1:],
                                    jnp.ones((1,), bool)])
        rev_r = _cummax(jnp.where(jnp.flip(run_last), idx,
                                  jnp.uint32(0)))
        t_idx = jnp.uint32(L - 1) - jnp.flip(rev_r)

    # ---- moving frames: halo exchange, then globally-exact locally ----
    # a width-k frame at a device's head rows reaches into the previous
    # devices' rows — an O(k)-ROW halo, not the O(1)-scalar carry below.
    # Every device gathers every device's (H = max_k - 1)-row valid
    # tail, composes ITS incoming halo as the last H valid rows over its
    # predecessors (replicated selection; a predecessor with > H rows
    # caps at H, so the composition is exact for any skew), prepends it,
    # and computes the moving planes over the concatenation — after
    # which they are already globally exact (no patch; frames clamp at
    # true partition starts because halo rows carry their real keys,
    # and the forced break at concat position 0 only ever lands exactly
    # k-1 rows before a head row, i.e. at the frame's own lower bound).
    # "Exact" is bit-exact for INTEGER moving_sum (u64 pair differences
    # are mod-2^64, indifferent to where the prefix restarts) and for
    # moving_min/max (idempotent). f32 moving_sum is the one exception:
    # when a partition extends back past the halo, the forced break
    # restarts the f32 prefix, so the prefix difference ROUNDS
    # differently than the local full-partition prefix — same exact
    # value in reals, different f32 association; callers get the same
    # error class as the local operator's own prefix-difference bound
    # (error proportional to the partition prefix), not bit-identity.
    movA_spec = tuple(s for s in spec_calc if s[1] in _MOVING)
    mov_spec = tuple(s for s in movA_spec if not isinstance(s[3], tuple))
    movF_spec = tuple(s for s in movA_spec if isinstance(s[3], tuple))
    lagk_spec = tuple(s for s in spec_calc
                      if s[1] == "lag" and isinstance(s[3], tuple))
    leadk_spec = tuple(s for s in spec_calc
                       if s[1] == "lead" and isinstance(s[3], tuple))
    if mov_spec or lagk_spec or movF_spec:
        H = max([int(f) - 1 for _, _, _, f in mov_spec]
                + [int(f[1]) for _, _, _, f in lagk_spec]
                + [int(f[0]) - 1 for _, _, _, f in movF_spec])
        mcols = tuple(sorted({c for _, _, c, _ in mov_spec}
                             | {c for _, _, c, _ in lagk_spec}
                             | {c for _, _, c, _ in movF_spec}))
        if H > 0:
            st = jnp.maximum(n_v.astype(jnp.int32) - H, 0)
            t_planes = [
                jax.lax.dynamic_slice(p, (st,), (H,))
                for p in [slo, shi]
                + [_bitcast(svals[c], jnp.uint32) for c in mcols]]
            t_pos = st.astype(jnp.uint32) + jnp.arange(H, dtype=jnp.uint32)
            t_planes.append((t_pos < n_v).astype(jnp.uint32))
            gt = jax.lax.all_gather(jnp.stack(t_planes), AXIS)  # (D,P,H)
            dev = jnp.arange(n_dev, dtype=jnp.uint32)[:, None]
            vf = ((gt[:, -1, :] > 0) & (dev < my)).reshape(-1)
            cum = jnp.cumsum(vf.astype(jnp.uint32), dtype=jnp.uint32)
            v_tot = cum[-1]
            h = jnp.arange(H, dtype=jnp.uint32)
            have = (h + v_tot) >= jnp.uint32(H)
            tgt = jnp.where(have, v_tot - jnp.uint32(H) + h + 1,
                            jnp.uint32(0))
            src = jnp.searchsorted(cum, tgt, side="left").astype(jnp.int32)

            def pick(pi, fill):
                x = jnp.take(gt[:, pi, :].reshape(-1), src)
                return jnp.where(have, x, fill)

            h_lo, h_hi = pick(0, _ONES), pick(1, _ONES)
            h_vals = {c: pick(2 + i, jnp.uint32(0))
                      for i, c in enumerate(mcols)}
            c_lo = jnp.concatenate([h_lo, slo])
            c_hi = jnp.concatenate([h_hi, shi])
        else:
            c_lo, c_hi = slo, shi
            h_vals = {}
        cidx = jnp.arange(H + L, dtype=jnp.uint32)

        def prevc(x):
            return jnp.concatenate([jnp.zeros((1,), x.dtype), x[:-1]])

        c_new = ((cidx == 0) | (c_lo != prevc(c_lo))
                 | (c_hi != prevc(c_hi)))
        from tpu_qe.ops.segscan import cummax_u32 as _cummax
        c_ps = _cummax(jnp.where(c_new, cidx, jnp.uint32(0)))
        c_rn0 = cidx - c_ps
        for name, kind, col, fill in mov_spec:
            cv = svals[col]
            if H > 0:
                cv = jnp.concatenate(
                    [_bitcast(h_vals[col], cv.dtype), cv])
            mv = _moving(kind, cv, int(fill), c_new, c_rn0)
            out[name] = (U64(mv.lo[H:], mv.hi[H:])
                         if isinstance(mv, U64) else mv[H:])
        # lag offset k > 1: a static relayout shift over the SAME
        # halo-prepended stream + a rank-within-partition mask. The
        # halo holds the k (<= H) globally-preceding valid rows with
        # their real keys, so c_rn0 >= k iff the row has k same-
        # partition predecessors globally (a partition reaching back
        # past the halo makes every halo row same-partition, so
        # c_rn0 >= H >= k) — exact for any device skew.
        for name, kind, col, fill in lagk_spec:
            f_, k_ = fill
            cv = svals[col]
            if H > 0:
                cv = jnp.concatenate(
                    [_bitcast(h_vals[col], cv.dtype), cv])
            sh_ = _shift_k(cv, int(k_), f_)
            lg = jnp.where(c_rn0 >= jnp.uint32(k_), sh_,
                           jnp.asarray(f_, cv.dtype))
            out[name] = lg[H:]

    # ---- lead offset k: FORWARD halo from successor devices ----------
    # mirror of the tail halo: every device gathers every device's
    # first-Hf valid rows; my incoming forward halo is the first Hf
    # valid rows over my successors, PLACED at my valid prefix's end
    # (dynamic_update_slice over the pad region) so a static left
    # shift reads true successor rows; a shifted-key equality mask
    # clamps at partition ends (missing rows carry all-ones keys).
    if leadk_spec or movF_spec:
        Hf = max([int(f[1]) for _, _, _, f in leadk_spec]
                 + [int(f[1]) for _, _, _, f in movF_spec])
        fcols = tuple(sorted({c for _, _, c, _ in leadk_spec}
                             | {c for _, _, c, _ in movF_spec}))
        hp = [p[:Hf] for p in [slo, shi]
              + [_bitcast(svals[c], jnp.uint32) for c in fcols]]
        hp.append((jnp.arange(Hf, dtype=jnp.uint32)
                   < n_v).astype(jnp.uint32))
        gt2 = jax.lax.all_gather(jnp.stack(hp), AXIS)     # (D, P, Hf)
        dev2 = jnp.arange(n_dev, dtype=jnp.uint32)[:, None]
        vf2 = ((gt2[:, -1, :] > 0) & (dev2 > my)).reshape(-1)
        cum2 = jnp.cumsum(vf2.astype(jnp.uint32), dtype=jnp.uint32)
        v_tot2 = cum2[-1]
        h2 = jnp.arange(Hf, dtype=jnp.uint32)
        have2 = h2 < v_tot2
        src2 = jnp.searchsorted(
            cum2, jnp.where(have2, h2 + 1, jnp.uint32(0)),
            side="left").astype(jnp.int32)

        def pick2(pi, fillv):
            x = jnp.take(gt2[:, pi, :].reshape(-1), src2)
            return jnp.where(have2, x, fillv)

        nvi = n_v.astype(jnp.int32)

        def place(base, halo, padv):
            ext = jnp.concatenate(
                [base, jnp.full((Hf,), padv, base.dtype)])
            return jax.lax.dynamic_update_slice(ext, halo, (nvi,))

        e_lo = place(slo, pick2(0, _ONES), _ONES)
        e_hi = place(shi, pick2(1, _ONES), _ONES)
        placed_vals = {}
        for c in fcols:
            v_ = svals[c]
            hv_ = _bitcast(pick2(2 + fcols.index(c), jnp.uint32(0)),
                           v_.dtype)
            placed_vals[c] = place(v_, hv_, jnp.zeros((), v_.dtype))
        for name, kind, col, fill in leadk_spec:
            f_, k_ = fill
            k_ = int(k_)
            v = svals[col]
            ev = placed_vals[col]
            nxt = jnp.concatenate([ev[k_:],
                                   jnp.full((k_,), f_, v.dtype)])
            same = ((jnp.concatenate([e_lo[k_:],
                                      jnp.full((k_,), 0, jnp.uint32)])
                     == e_lo)
                    & (jnp.concatenate([e_hi[k_:],
                                        jnp.full((k_,), 0, jnp.uint32)])
                       == e_hi))
            out[name] = jnp.where(same, nxt,
                                  jnp.asarray(f_, v.dtype))[:L]

        # FOLLOWING moving frames: _moving_follow over the DOUBLE-halo
        # stream [tail halo (H); local valid prefix; head halo placed
        # at n_v (Hf)] — backward reach k-1 <= H rides the tail halo,
        # forward reach b <= Hf the head halo; frames clamp at true
        # partition bounds because halo rows carry real keys, and a
        # valid row's forward reach never touches my own pads
        # (i + b <= n_v - 1 + Hf). Globally exact for integer sums /
        # min / max; f32 sums get the same prefix-restart rounding
        # class as the single-halo moving frames above.
        if movF_spec:
            if H > 0:
                x_lo = jnp.concatenate([h_lo, e_lo])
                x_hi = jnp.concatenate([h_hi, e_hi])
            else:
                x_lo, x_hi = e_lo, e_hi
            M = x_lo.shape[0]
            xidx = jnp.arange(M, dtype=jnp.uint32)

            def prevx(x):
                return jnp.concatenate([jnp.zeros((1,), x.dtype),
                                        x[:-1]])
            x_new = ((xidx == 0) | (x_lo != prevx(x_lo))
                     | (x_hi != prevx(x_hi)))
            x_last = jnp.concatenate([x_new[1:], jnp.ones((1,), bool)])
            from tpu_qe.ops.segscan import cummax_u32 as _cx
            x_ps = _cx(jnp.where(x_new, xidx, jnp.uint32(0)))
            x_rn0 = xidx - x_ps
            rev = _cx(jnp.where(jnp.flip(x_last), xidx, jnp.uint32(0)))
            x_pe = jnp.uint32(M - 1) - jnp.flip(rev)
            x_rne = x_pe - xidx
            from tpu_qe.ops.window import _moving_follow
            for name, kind, col, fill in movF_spec:
                kk, bb = fill
                xv = placed_vals[col]
                if H > 0:
                    xv = jnp.concatenate(
                        [_bitcast(h_vals[col], xv.dtype), xv])
                mv = _moving_follow(kind, xv, int(kk), int(bb), x_new,
                                    x_last, x_rn0, x_rne)
                out[name] = (U64(mv.lo[H:H + L], mv.hi[H:H + L])
                             if isinstance(mv, U64) else mv[H:H + L])

    # ---- per-device summary vector ------------------------------------
    li = jnp.maximum(n_v, 1) - 1  # last valid row (clamped; masked if 0)

    def at_last(x):
        return jnp.take(x, li)

    summ, names = [], []

    def put(name, val):
        names.append(name)
        summ.append(_bitcast(val.astype(val.dtype), jnp.uint32)
                    if val.dtype != jnp.uint32 else val)

    put("nv", n_v)
    put("fk_lo", slo[0]); put("fk_hi", shi[0])
    put("lk_lo", at_last(slo)); put("lk_hi", at_last(shi))
    if has_order:
        put("fo", sorder[0]); put("lo_", at_last(sorder))
    tps = at_last(part_start)
    trs = at_last(run_start)
    put("tps", tps)
    put("tail_cnt", li - tps + 1)
    put("trs_zero", (trs == 0).astype(jnp.uint32))
    put("tail_rank", trs - tps + 1)
    if has_cnt:
        # valid rows of the HEAD partition (pads form their own
        # segments, so part_end[0] never reaches into them)
        put("hcnt", part_end[0] + 1)
    if any_range_avg:
        # local row count of the device's HEAD order run (row 0's run)
        put("hrc", t_idx[0] + 1)
    for name, kind, col, fill_ in spec_calc:
        if kind == "dense_rank":
            put(f"td:{name}", at_last(out[name]))
        elif kind in ("running_sum", "total_sum", "range_sum") \
                and isinstance(out[name], U64):
            # at_last(range plane) = running through the device end —
            # the same partition-prefix fold element as running_sum
            put(f"ta:{name}:lo", at_last(out[name].lo))
            put(f"ta:{name}:hi", at_last(out[name].hi))
            if kind == "total_sum":    # backward chain: head-partition
                put(f"ha:{name}:lo", out[name].lo[0])   # local total
                put(f"ha:{name}:hi", out[name].hi[0])
            if kind == "range_sum":    # backward chain: head-RUN local
                put(f"hr:{name}:lo", out[name].lo[0])   # aggregate
                put(f"hr:{name}:hi", out[name].hi[0])
        elif (kind in _RUNNING or kind in _TOTALS
              or kind in ("range_sum", "range_min", "range_max")):
            put(f"ta:{name}", _bitcast(at_last(out[name]), jnp.uint32))
            if kind in _TOTALS:
                put(f"ha:{name}", _bitcast(out[name][0], jnp.uint32))
            if kind.startswith("range_"):
                put(f"hr:{name}", _bitcast(out[name][0], jnp.uint32))
        elif kind == "lag" and not isinstance(fill_, tuple):
            put(f"lv:{name}", _bitcast(at_last(svals[col]), jnp.uint32))
        elif kind == "lead" and not isinstance(fill_, tuple):
            put(f"fv:{name}", _bitcast(svals[col][0], jnp.uint32))
        elif kind == "first_value":
            # the tail partition's LOCAL first value (chain origin)
            put(f"tfv:{name}",
                _bitcast(jnp.take(svals[col], tps), jnp.uint32))
        elif kind == "last_value":
            # the head partition's LOCAL last value: row 0 of the local
            # whole-partition last_value plane
            put(f"hlv:{name}", _bitcast(out[name][0], jnp.uint32))
    vec = jnp.stack(summ)
    g = jax.lax.all_gather(vec, AXIS)          # (D, S), replicated work
    col_of = {nm: i for i, nm in enumerate(names)}

    def gv(e, nm):
        return g[e, col_of[nm]]

    # ---- carry chain over devices (D static: plain Python fold) -------
    u0, f0 = jnp.uint32(0), jnp.float32(0)
    ex = jnp.zeros((), bool)
    plk_lo = plk_hi = plord = u0
    pvals = {name: u0 for name, k, _, f in spec_calc
             if k == "lag" and not isinstance(f, tuple)}
    C_cnt = C_dense = C_rank = u0
    def _int_sum(kind, col):
        return (kind in ("running_sum", "total_sum", "range_sum")
                and dtypes[colnames.index(col)] != jnp.float32)

    # range kinds ride the SAME forward partition-prefix carry as the
    # running family (their device-end fold element is identical); the
    # extra run-suffix patch they need is the backward S_run chain
    _MMLIKE = _RUNNING + _TOTALS + ("range_min", "range_max")
    C_agg = {}
    for name, kind, col, _ in spec_calc:
        if _int_sum(kind, col):
            C_agg[name] = (u0, u0)
        elif kind in _MMLIKE or kind == "range_sum":
            C_agg[name] = u0
    C_first = {name: u0 for name, k, _, _ in spec if k == "first_value"}
    rec = {k: [] for k in ("cont", "cont_o", "C_cnt", "C_dense", "C_rank")}
    rec_agg = {nm: [] for nm in C_agg}
    rec_lag = {nm: [] for nm in pvals}
    rec_first = {nm: [] for nm in C_first}
    for e in range(n_dev):
        nv = gv(e, "nv")
        nonempty = nv > 0
        cont = (ex & nonempty & (gv(e, "fk_lo") == plk_lo)
                & (gv(e, "fk_hi") == plk_hi))
        cont_o = cont & ((gv(e, "fo") == plord) if has_order
                         else jnp.ones((), bool))
        rec["cont"].append(cont)
        rec["cont_o"].append(cont_o)
        rec["C_cnt"].append(C_cnt)
        rec["C_dense"].append(C_dense)
        rec["C_rank"].append(C_rank)
        for nm in C_agg:
            rec_agg[nm].append(C_agg[nm])
        for nm in pvals:
            rec_lag[nm].append(pvals[nm])
        for nm in C_first:
            rec_first[nm].append(C_first[nm])

        whole = cont & (gv(e, "tps") == 0)  # tail partition spans shard
        nC_cnt = gv(e, "tail_cnt") + jnp.where(whole, C_cnt, u0)
        nC_rank = jnp.where(
            gv(e, "trs_zero") == 0,
            gv(e, "tail_rank") + jnp.where(whole, C_cnt, u0),
            jnp.where(cont_o, C_rank,
                      gv(e, "tail_rank") + jnp.where(cont, C_cnt, u0)))
        nC_dense = C_dense
        nC_agg = {}
        for name, kind, col, _ in spec_calc:
            if kind == "dense_rank":
                td = gv(e, f"td:{name}")
                nC_dense = td + jnp.where(
                    whole, C_dense - cont_o.astype(jnp.uint32), u0)
            elif _int_sum(kind, col):
                tlo = gv(e, f"ta:{name}:lo")
                thi = gv(e, f"ta:{name}:hi")
                alo = tlo + C_agg[name][0]
                ahi = (thi + C_agg[name][1]
                       + (alo < tlo).astype(jnp.uint32))
                nC_agg[name] = (jnp.where(whole, alo, tlo),
                                jnp.where(whole, ahi, thi))
            elif kind in ("running_sum", "total_sum", "range_sum"):
                tv = _bitcast(gv(e, f"ta:{name}"), jnp.float32)
                cv = _bitcast(C_agg[name], jnp.float32)
                nC_agg[name] = _bitcast(
                    jnp.where(whole, cv + tv, tv), jnp.uint32)
            elif kind in _MMLIKE:
                dt = dtypes[colnames.index(col)]
                tv = _bitcast(gv(e, f"ta:{name}"), dt)
                cv = _bitcast(C_agg[name], dt)
                op = jnp.minimum if kind.endswith("min") else jnp.maximum
                nC_agg[name] = _bitcast(
                    jnp.where(whole, op(cv, tv), tv), jnp.uint32)

        upd = lambda new, old: jnp.where(nonempty, new, old)  # noqa: E731
        C_cnt = upd(nC_cnt, C_cnt)
        C_rank = upd(nC_rank, C_rank)
        C_dense = upd(nC_dense, C_dense)
        for nm in C_first:
            # the chain's first value: keep the origin's when the tail
            # partition merely continues through this device
            C_first[nm] = upd(jnp.where(whole, C_first[nm],
                                        gv(e, f"tfv:{nm}")), C_first[nm])
        for nm in C_agg:
            if isinstance(C_agg[nm], tuple):
                C_agg[nm] = (upd(nC_agg[nm][0], C_agg[nm][0]),
                             upd(nC_agg[nm][1], C_agg[nm][1]))
            else:
                C_agg[nm] = upd(nC_agg[nm], C_agg[nm])
        plk_lo = upd(gv(e, "lk_lo"), plk_lo)
        plk_hi = upd(gv(e, "lk_hi"), plk_hi)
        if has_order:
            plord = upd(gv(e, "lo_"), plord)
        for name, kind, _, f_ in spec_calc:
            if kind == "lag" and not isinstance(f_, tuple):
                pvals[name] = upd(gv(e, f"lv:{name}"), pvals[name])
        ex = ex | nonempty

    # reverse chain: does the NEXT non-empty device continue my tail
    # partition, and with what first value (lead patch)? The whole-
    # partition functions ride the same chain backward: the continuing
    # partition's GLOBAL last value (last_value) and its row count on
    # later devices (ntile/percent_rank suffix).
    nex = jnp.zeros((), bool)
    nfk_lo = nfk_hi = u0
    nfv = {name: u0 for name, k, _, f in spec_calc
           if k == "lead" and not isinstance(f, tuple)}
    B_last = {name: u0 for name, k, _, _ in spec if k == "last_value"}
    A_cnt = u0
    # whole-partition aggregates: suffix contribution of later devices
    # to MY tail partition (mirror of the forward prefix C_agg)
    S_tot = {}
    for name, kind, col, _ in spec_calc:
        if kind == "total_sum" and _int_sum(kind, col):
            S_tot[name] = (u0, u0)
        elif kind in _TOTALS:
            S_tot[name] = u0
    # tie-aware RANGE: suffix contribution of later devices to MY tail
    # ORDER RUN (run-level mirror of S_tot's partition suffix) — chains
    # through successors whose whole device is one run (trs_zero)
    nfo = u0
    S_run = {}
    for name, kind, col, _ in spec_calc:
        if kind == "range_sum" and _int_sum(kind, col):
            S_run[name] = (u0, u0)
        elif kind in ("range_sum", "range_min", "range_max"):
            S_run[name] = u0
    S_rcnt = u0
    rec_lead_cont, rec_lead_val = [], {nm: [] for nm in nfv}
    rec_last = {nm: [] for nm in B_last}
    rec_suffix = []
    rec_tot = {nm: [] for nm in S_tot}
    rec_rcont, rec_rcnt = [], []
    rec_run = {nm: [] for nm in S_run}
    for e in range(n_dev - 1, -1, -1):
        nv = gv(e, "nv")
        nonempty = nv > 0
        ncont = (nex & (gv(e, "lk_lo") == nfk_lo)
                 & (gv(e, "lk_hi") == nfk_hi))
        rec_lead_cont.append(ncont)
        if any_range:
            # run continuation: same partition AND same order value
            ncont_r = ncont & (gv(e, "lo_") == nfo)
            rec_rcont.append(ncont_r)
            for nm in S_run:
                rec_run[nm].append(S_run[nm])
            if any_range_avg:
                rec_rcnt.append(S_rcnt)
        for nm in nfv:
            rec_lead_val[nm].append(nfv[nm])
        for nm in B_last:
            rec_last[nm].append(B_last[nm])
        if has_cnt:
            rec_suffix.append(A_cnt)
        for nm in S_tot:
            rec_tot[nm].append(S_tot[nm])
        upd = lambda new, old: jnp.where(nonempty, new, old)  # noqa: E731
        # single-partition device: its head partition IS its tail
        single = gv(e, "tps") == 0
        sn = single & ncont
        for nm in B_last:
            # global last value of THIS device's head partition: from
            # later devices when the partition runs through, else local
            h = jnp.where(sn, B_last[nm], gv(e, f"hlv:{nm}"))
            B_last[nm] = upd(h, B_last[nm])
        if has_cnt:
            hg = gv(e, "hcnt") + jnp.where(sn, A_cnt, u0)
            A_cnt = upd(hg, A_cnt)
        for name, kind, col, _ in spec_calc:
            if name not in S_tot:
                continue
            if isinstance(S_tot[name], tuple):
                hlo = gv(e, f"ha:{name}:lo")
                hhi = gv(e, f"ha:{name}:hi")
                alo = hlo + jnp.where(sn, S_tot[name][0], u0)
                ahi = (hhi + jnp.where(sn, S_tot[name][1], u0)
                       + (alo < hlo).astype(jnp.uint32))
                S_tot[name] = (upd(alo, S_tot[name][0]),
                               upd(ahi, S_tot[name][1]))
            elif kind == "total_sum":
                h = _bitcast(gv(e, f"ha:{name}"), jnp.float32)
                s_ = _bitcast(S_tot[name], jnp.float32)
                S_tot[name] = upd(_bitcast(
                    h + jnp.where(sn, s_, jnp.float32(0)), jnp.uint32),
                    S_tot[name])
            else:
                dt = dtypes[colnames.index(col)]
                h = _bitcast(gv(e, f"ha:{name}"), dt)
                s_ = _bitcast(S_tot[name], dt)
                op = (jnp.minimum if kind.endswith("min")
                      else jnp.maximum)
                S_tot[name] = upd(_bitcast(
                    jnp.where(sn, op(s_, h), h), jnp.uint32),
                    S_tot[name])
        if any_range:
            single_run = gv(e, "trs_zero") == 1
            snr = single_run & ncont_r
            for name, kind, col, _ in spec_calc:
                if name not in S_run:
                    continue
                if isinstance(S_run[name], tuple):
                    hlo = gv(e, f"hr:{name}:lo")
                    hhi = gv(e, f"hr:{name}:hi")
                    alo = hlo + jnp.where(snr, S_run[name][0], u0)
                    ahi = (hhi + jnp.where(snr, S_run[name][1], u0)
                           + (alo < hlo).astype(jnp.uint32))
                    S_run[name] = (upd(alo, S_run[name][0]),
                                   upd(ahi, S_run[name][1]))
                elif kind == "range_sum":
                    h = _bitcast(gv(e, f"hr:{name}"), jnp.float32)
                    s_ = _bitcast(S_run[name], jnp.float32)
                    S_run[name] = upd(_bitcast(
                        h + jnp.where(snr, s_, jnp.float32(0)),
                        jnp.uint32), S_run[name])
                else:
                    dt = dtypes[colnames.index(col)]
                    h = _bitcast(gv(e, f"hr:{name}"), dt)
                    s_ = _bitcast(S_run[name], dt)
                    op = (jnp.minimum if kind.endswith("min")
                          else jnp.maximum)
                    S_run[name] = upd(_bitcast(
                        jnp.where(snr, op(s_, h), h), jnp.uint32),
                        S_run[name])
            if any_range_avg:
                hc = gv(e, "hrc") + jnp.where(snr, S_rcnt, u0)
                S_rcnt = upd(hc, S_rcnt)
            nfo = upd(gv(e, "fo"), nfo)
        nfk_lo = upd(gv(e, "fk_lo"), nfk_lo)
        nfk_hi = upd(gv(e, "fk_hi"), nfk_hi)
        for name, kind, _, f_ in spec_calc:
            if kind == "lead" and not isinstance(f_, tuple):
                nfv[name] = upd(gv(e, f"fv:{name}"), nfv[name])
        nex = nex | nonempty
    rec_lead_cont.reverse()
    for nm in rec_lead_val:
        rec_lead_val[nm].reverse()
    for nm in rec_last:
        rec_last[nm].reverse()
    rec_suffix.reverse()
    for nm in rec_tot:
        rec_tot[nm].reverse()
    rec_rcont.reverse()
    rec_rcnt.reverse()
    for nm in rec_run:
        rec_run[nm].reverse()

    def mine(lst):
        return jnp.take(jnp.stack(lst), my)

    cont = mine(rec["cont"])
    cont_o = mine(rec["cont_o"])
    cc = mine(rec["C_cnt"])
    cd = mine(rec["C_dense"])
    cr = mine(rec["C_rank"])

    # ---- patch my boundary-partition rows ------------------------------
    validrow = idx < n_v
    head = validrow & (part_start == 0) & cont
    ncont_m = mine(rec_lead_cont)
    tail = validrow & (part_start == tps) & ncont_m
    if any_range:
        rcont_m = mine(rec_rcont)
        tail_run = validrow & (run_start == trs) & rcont_m
    if has_cnt:
        suffix = jnp.where(ncont_m, mine(rec_suffix), u0)
        local_cnt = part_end - part_start + 1
        gcnt = (local_cnt + jnp.where(head, cc, u0)
                + jnp.where(tail, suffix, u0))
    for name, kind, col, fill in spec_calc:
        o = out[name]
        if kind in ("lag", "lead") and isinstance(fill, tuple):
            continue        # offset-k: already exact via the row halo
        if kind == "row_number":
            out[name] = o + jnp.where(head, cc, u0)
        elif kind == "rank":
            in_head_run = head & (run_start == 0) & cont_o
            out[name] = jnp.where(in_head_run, cr,
                                  o + jnp.where(head, cc, u0))
        elif kind == "dense_rank":
            out[name] = o + jnp.where(
                head, cd - cont_o.astype(jnp.uint32), u0)
        elif kind == "running_sum" and isinstance(o, U64):
            clo = mine([t[0] for t in rec_agg[name]])
            chi = mine([t[1] for t in rec_agg[name]])
            nlo = o.lo + clo
            nhi = o.hi + chi + (nlo < clo).astype(jnp.uint32)
            out[name] = U64(jnp.where(head, nlo, o.lo),
                            jnp.where(head, nhi, o.hi))
        elif kind == "running_sum":
            cf = _bitcast(mine(rec_agg[name]), jnp.float32)
            out[name] = o + jnp.where(head, cf, f0)
        elif kind == "range_sum" and isinstance(o, U64):
            # forward partition prefix on head rows + backward run
            # suffix on tail-run rows (both exact mod-2^64)
            clo = mine([t[0] for t in rec_agg[name]])
            chi = mine([t[1] for t in rec_agg[name]])
            rlo = mine([t[0] for t in rec_run[name]])
            rhi = mine([t[1] for t in rec_run[name]])
            a1 = jnp.where(head, clo, u0)
            nlo = o.lo + a1
            nhi = (o.hi + jnp.where(head, chi, u0)
                   + (nlo < a1).astype(jnp.uint32))
            a2 = jnp.where(tail_run, rlo, u0)
            mlo = nlo + a2
            mhi = (nhi + jnp.where(tail_run, rhi, u0)
                   + (mlo < a2).astype(jnp.uint32))
            out[name] = U64(mlo, mhi)
        elif kind == "range_sum":
            cf = _bitcast(mine(rec_agg[name]), jnp.float32)
            sf = _bitcast(mine(rec_run[name]), jnp.float32)
            out[name] = (o + jnp.where(head, cf, f0)
                         + jnp.where(tail_run, sf, f0))
        elif kind in ("range_min", "range_max"):
            cv = _bitcast(mine(rec_agg[name]), o.dtype)
            sv_ = _bitcast(mine(rec_run[name]), o.dtype)
            op = jnp.minimum if kind.endswith("min") else jnp.maximum
            t1 = jnp.where(head, op(cv, o), o)
            out[name] = jnp.where(tail_run, op(sv_, t1), t1)
        elif kind in _RUNNING:
            cv = _bitcast(mine(rec_agg[name]), o.dtype)
            op = jnp.minimum if kind == "running_min" else jnp.maximum
            out[name] = jnp.where(head, op(cv, o), o)
        elif kind == "lag":
            pv = _bitcast(mine(rec_lag[name]), o.dtype)
            m = first & cont & validrow
            out[name] = jnp.where(m, pv, o)
        elif kind == "lead":
            nv_ = _bitcast(mine(rec_lead_val[name]), o.dtype)
            m = validrow & (idx == jnp.maximum(n_v, 1) - 1) & ncont_m
            out[name] = jnp.where(m, nv_, o)
        elif kind == "first_value":
            fv = _bitcast(mine(rec_first[name]), o.dtype)
            out[name] = jnp.where(head, fv, o)
        elif kind == "last_value":
            bv = _bitcast(mine(rec_last[name]), o.dtype)
            out[name] = jnp.where(tail, bv, o)
        elif kind == "moving_count":
            # pure index arithmetic over GLOBAL partition offsets:
            # min(grn0+1, k) + min(grn_end, b)
            kk, bb = fill
            grn0 = (idx - part_start) + jnp.where(head, cc, u0)
            back = (grn0 + 1 if kk is None
                    else jnp.minimum(grn0 + 1, jnp.uint32(kk)))
            v = back + jnp.minimum(gcnt - 1 - grn0, jnp.uint32(bb))
            out[name] = jnp.where(validrow, v, o)
        elif kind == "ntile":
            k = jnp.uint32(fill)
            grn0 = (idx - part_start) + jnp.where(head, cc, u0)
            q, r = gcnt // k, gcnt % k
            big = r * (q + 1)
            lo_b = grn0 // (q + 1)
            hi_b = r + (grn0 - big) // jnp.maximum(q, jnp.uint32(1))
            nt = jnp.where(grn0 < big, lo_b, hi_b) + 1
            out[name] = jnp.where(validrow, nt, o)
        elif kind == "percent_rank":
            in_head_run = head & (run_start == 0) & cont_o
            grank0 = jnp.where(
                in_head_run, cr - 1,
                (run_start - part_start) + jnp.where(head, cc, u0))
            den = jnp.maximum(gcnt - 1, jnp.uint32(1)).astype(jnp.float32)
            out[name] = jnp.where(validrow,
                                  grank0.astype(jnp.float32) / den, o)
        elif kind == "partition_count":
            out[name] = jnp.where(validrow, gcnt, o)
        elif kind == "total_sum" and isinstance(o, U64):
            clo = mine([t[0] for t in rec_agg[name]])
            chi = mine([t[1] for t in rec_agg[name]])
            tlo = mine([t[0] for t in rec_tot[name]])
            thi = mine([t[1] for t in rec_tot[name]])
            a1 = jnp.where(head, clo, u0)
            nlo = o.lo + a1
            nhi = (o.hi + jnp.where(head, chi, u0)
                   + (nlo < a1).astype(jnp.uint32))
            a2 = jnp.where(tail, tlo, u0)
            mlo = nlo + a2
            mhi = (nhi + jnp.where(tail, thi, u0)
                   + (mlo < a2).astype(jnp.uint32))
            out[name] = U64(mlo, mhi)
        elif kind == "total_sum":
            cf = _bitcast(mine(rec_agg[name]), jnp.float32)
            sf = _bitcast(mine(rec_tot[name]), jnp.float32)
            out[name] = (o + jnp.where(head, cf, f0)
                         + jnp.where(tail, sf, f0))
        elif kind in ("total_min", "total_max"):
            cv = _bitcast(mine(rec_agg[name]), o.dtype)
            sv_ = _bitcast(mine(rec_tot[name]), o.dtype)
            op = jnp.minimum if kind.endswith("min") else jnp.maximum
            t1 = jnp.where(head, op(cv, o), o)
            out[name] = jnp.where(tail, op(sv_, t1), t1)

    # avg finalization: the chain patched the NUMERATOR sums; divide by
    # the global denominator (partition size for total_avg, global
    # row_number for running_avg) — same f32 association class as the
    # local operator's own division
    for name, kind, col, fill in spec:
        if kind not in ("total_avg", "running_avg", "range_avg"):
            continue
        o = out[name]
        if isinstance(o, U64):
            numf = _pair_to_f32_signed(
                o.lo, o.hi,
                dtypes[colnames.index(col)] == jnp.int32)
        else:
            numf = o
        if kind == "total_avg":
            den = jnp.maximum(gcnt, jnp.uint32(1)).astype(jnp.float32)
        elif kind == "range_avg":
            # global count through the row's run end: local run-end
            # offset + partition prefix rows on earlier devices + run
            # continuation rows on later devices
            grc = ((t_idx - part_start + 1) + jnp.where(head, cc, u0)
                   + jnp.where(tail_run, mine(rec_rcnt), u0))
            den = jnp.maximum(grc, jnp.uint32(1)).astype(jnp.float32)
        else:
            grn = (idx - part_start + 1) + jnp.where(head, cc, u0)
            den = jnp.maximum(grn, jnp.uint32(1)).astype(jnp.float32)
        out[name] = numf / den

    planes = []
    for name, kind, _, _ in spec:
        v = out[name]
        if isinstance(v, U64):
            planes += [v.lo, v.hi]
        else:
            planes.append(_bitcast(v, jnp.uint32))
    outs = [slo, shi, spos] + planes
    return (*outs, n_v.reshape(1), overflow.reshape(1))


def _plan_shard(lo, hi, *rest, n_dev: int, samples_per_dev: int):
    """Planning pass: route on (key, [order,] position) EXACTLY like
    _dwindow_shard, return the max off-diagonal bucket demand."""
    from tpu_qe.exchange.shuffle import offdiag_demand

    n_local = lo.shape[0]
    my = jax.lax.axis_index(AXIS).astype(jnp.uint32)
    gpos = (my * jnp.uint32(n_local)
            + jnp.arange(n_local, dtype=jnp.uint32))
    planes = [hi, lo] + list(rest) + [gpos]
    sps = sample_splitters_multi(planes, n_dev, samples_per_dev)
    dest = route_by_splitters_multi(planes, sps)
    return offdiag_demand(dest, n_dev).reshape(1)


@functools.partial(jax.jit, static_argnames=("mesh", "samples_per_dev"))
def plan_window_capacity(key: U64, order, mesh: Mesh,
                         samples_per_dev: int = 128):
    """Exact off-diagonal demand of the window exchange (its routing
    includes the order plane, so dsort.plan_sort_capacity does NOT
    apply). Same contract as plan_sort_capacity."""
    n_dev = mesh.shape[AXIS]
    spec_p = P(AXIS)
    args = [key.lo, key.hi]
    if order is not None:
        args.append(_order_bits(order))
    fn = shard_map(
        functools.partial(_plan_shard, n_dev=n_dev,
                          samples_per_dev=samples_per_dev),
        mesh=mesh, in_specs=tuple([spec_p] * len(args)),
        out_specs=spec_p, check_vma=False)
    return fn(*args)


def auto_window_capacity(key: U64, order, mesh: Mesh,
                         samples_per_dev: int = 128,
                         slack: float = 1.05) -> int:
    from tpu_qe.exchange.shuffle import pow2_capacity
    demand = int(np.asarray(plan_window_capacity(
        key, order, mesh, samples_per_dev=samples_per_dev)).max())
    return pow2_capacity(demand, slack)


@functools.partial(jax.jit,
                   static_argnames=("mesh", "spec", "has_order", "colnames",
                                    "samples_per_dev", "capacity_factor",
                                    "capacity"))
def _distributed_window(key, order, cols, mesh, spec, has_order, colnames,
                        samples_per_dev, capacity_factor, capacity):
    n_dev = mesh.shape[AXIS]
    n = key.lo.shape[0]
    assert n % n_dev == 0, (n, n_dev)
    assert n < (1 << 32), n
    n_local = n // n_dev
    if capacity is None:
        capacity = int(np.ceil(capacity_factor * n_local / n_dev))
    capacity = max(capacity, 16)
    assert n_dev * max(capacity, n_local) < (1 << 31), (n_dev, capacity)
    dtypes = tuple(c.dtype for c in cols)
    ucols = tuple(_bitcast(c, jnp.uint32) for c in cols)

    body = functools.partial(
        _dwindow_shard, n_dev=n_dev, samples_per_dev=samples_per_dev,
        capacity=capacity, spec=spec, has_order=has_order,
        colnames=colnames, dtypes=dtypes)
    spec_p = P(AXIS)
    n_in = 2 + (1 if has_order else 0) + len(cols)
    n_planes = sum(2 if (k in ("running_sum", "moving_sum",
                               "total_sum", "range_sum")
                         and dtypes[colnames.index(c)] != jnp.float32)
                   else 1 for _, k, c, _ in spec)
    fn = shard_map(body, mesh=mesh, in_specs=tuple([spec_p] * n_in),
                   out_specs=tuple([spec_p] * (3 + n_planes + 2)),
                   check_vma=False)
    args = [key.lo, key.hi]
    if has_order:
        args.append(_order_bits(order))
    res = fn(*args, *ucols)
    slo, shi, spos = res[0], res[1], res[2]
    out, j = {}, 3
    for name, kind, col, _ in spec:
        if (kind in ("running_sum", "moving_sum", "total_sum",
                     "range_sum")
                and dtypes[colnames.index(col)] != jnp.float32):
            out[name] = U64(res[j], res[j + 1])
            j += 2
        elif kind in _RUNNING + ("moving_sum", "moving_min",
                                 "moving_max", "lag", "lead",
                                 "first_value", "last_value",
                                 "total_sum", "total_min",
                                 "total_max", "range_sum",
                                 "range_min", "range_max"):
            out[name] = _bitcast(res[j], dtypes[colnames.index(col)])
            j += 1
        elif kind in ("percent_rank", "moving_avg", "total_avg",
                      "running_avg", "range_avg"):
            out[name] = _bitcast(res[j], jnp.float32)
            j += 1
        else:
            out[name] = res[j]
            j += 1
    valid, overflow = res[j], res[j + 1]
    return DistWindowResult(U64(slo, shi), spos, out, valid), overflow


def distributed_window(key: U64, funcs: dict, mesh: Mesh,
                       order: jnp.ndarray | None = None,
                       values: dict | None = None,
                       samples_per_dev: int = 128,
                       capacity_factor: float = 2.0,
                       capacity: int | None = None):
    """Window functions over a mesh-sharded table (see module docstring).

    Same spec language as ops.window.window. key (and order/values) are
    (n,)-sharded over the 1-D mesh, n divisible by the mesh size.
    `capacity` as in distributed_sort (routing is identical, so
    dsort.plan_sort_capacity / auto_capacity apply verbatim).

    Returns (DistWindowResult, overflow): rows come back in global
    (key, order, input-position) order as per-device valid-prefix runs;
    scatter by `pos` to recover input alignment. Bit-identical to the
    single-device ops.window.window on the same rows (tests assert it).
    """
    spec = _canon_funcs(funcs)
    if order is None and any(k in ("rank", "dense_rank", "percent_rank")
                             for _, k, _, _ in spec):
        raise ValueError("rank/dense_rank/percent_rank require an "
                         "order column")
    if any(k in _MOVING and isinstance(f, tuple) and f[0] is None
           for _, k, _, f in spec):
        raise ValueError("UNBOUNDED PRECEDING with a FOLLOWING bound "
                         "is in-core only (distributed frames ride "
                         "bounded row halos)")
    if any(k in _RANGE and f != "unbounded" for _, k, _, f in spec):
        raise ValueError("bounded RANGE frames are in-core only (an "
                         "order-VALUE bound reaches back an unbounded "
                         "number of rows — no finite row halo covers "
                         "it)")
    if order is None and any(k in _RANGE for _, k, _, _ in spec):
        raise ValueError("RANGE frames require an order column")
    values = values or {}
    needed = tuple(sorted({c for _, _, c, _ in spec if c is not None}))
    for c in needed:
        if c not in values:
            raise ValueError(f"window spec references missing column {c!r}")
    return _distributed_window(
        key, order, tuple(values[c] for c in needed), mesh, spec,
        order is not None, needed, samples_per_dev, capacity_factor,
        capacity)


def distributed_window_numpy(keys: np.ndarray, funcs: dict, mesh: Mesh,
                             order: np.ndarray | None = None,
                             values: dict | None = None, **kw):
    """Host wrapper for tests/benches: shard inputs, run, scatter the
    sorted runs back to input order by `pos`. capacity_factor="auto"
    plans the exchange demand first (plan_window_capacity — the window's
    routing includes the order plane)."""
    n_dev = mesh.shape[AXIS]
    key = U64.from_numpy(keys)
    sh = NamedSharding(mesh, P(AXIS))
    key = U64(jax.device_put(key.lo, sh), jax.device_put(key.hi, sh))
    jorder = (None if order is None
              else jax.device_put(jnp.asarray(order), sh))
    jvals = {nm: jax.device_put(jnp.asarray(v), sh)
             for nm, v in (values or {}).items()}
    if kw.get("capacity_factor") == "auto":
        kw = dict(kw)
        del kw["capacity_factor"]
        if n_dev > 1:
            kw["capacity"] = auto_window_capacity(
                key, jorder, mesh,
                samples_per_dev=kw.get("samples_per_dev", 128))
    res, overflow = distributed_window(key, funcs, mesh, order=jorder,
                                       values=jvals, **kw)
    if int(np.asarray(overflow).max()):
        raise RuntimeError("exchange capacity overflow; raise "
                           "capacity_factor")
    n = len(keys)
    valid = np.asarray(res.valid).reshape(n_dev)
    pos_r = np.asarray(res.pos).reshape(n_dev, -1)
    out = {}
    for name, col in res.cols.items():
        if isinstance(col, U64):
            flat = (np.asarray(col.lo).reshape(n_dev, -1).astype(np.uint64)
                    | (np.asarray(col.hi).reshape(n_dev, -1)
                       .astype(np.uint64) << np.uint64(32)))
        else:
            flat = np.asarray(col).reshape(n_dev, -1)
        o = np.zeros(n, flat.dtype)
        for d in range(n_dev):
            v = int(valid[d])
            o[pos_r[d, :v]] = flat[d, :v]
        out[name] = o
    return out
