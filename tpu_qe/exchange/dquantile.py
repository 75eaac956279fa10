"""Distributed exact quantiles with ZERO row movement.

Every other distributed operator here earns its answer by moving rows
(splitter exchange). Selection does not have to: the (r+1)-th smallest
element of mesh-sharded data is the largest value v with
count_lt(v) <= r, count_lt is monotone in v, and a monotone predicate
over the u64 domain is solved by 64 greedy bit rounds — each round ONE
binary search per device over its locally sorted shard (O(log n_local)
scalar gathers) plus ONE psum of a (Q,) count vector. Total
interconnect: 64 scalar-vector psums, no all_to_all, no row exchange —
the cheapest possible distributed operator on this transport (the
headline cost model in BASELINE.md prices a row exchange at
16-20 B/row x (1 - 1/D); this is O(Q) bytes per round).

All Q quantiles ride the same rounds (the count probe vectorizes over
candidates), and the greedy state is replicated — every device derives
the identical answer, so the result needs no gather.

PERCENTILE_DISC rank semantics match ops/quantile.py (the in-core
operator); tests assert bit-equality against it and numpy.

Reference contrast: the reference is single-device
(/root/reference/src/main.rs:727); SURVEY §2c mandates the distributed
layer; this adds the selection shape to it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P, Mesh
from jax import shard_map

from tpu_qe.bits import U64, sortable_u32, sortable_u32_inverse
from tpu_qe.exchange.shuffle import AXIS
from tpu_qe.ops.quantile import (ContQuantileResult, canon_qs, cont_rank,
                                 disc_rank)

_ONES = jnp.uint32(0xFFFFFFFF)


class QuantileOverflow(RuntimeError):
    """Distinct group keys exceeded max_groups (exact detection; the
    caller may retry with a larger cap). A dedicated type so retry
    loops never swallow unrelated RuntimeErrors (ADVICE r4)."""


def _count_lt_pair(shi, slo, c_hi, c_lo):
    """#rows with (hi, lo) < (c_hi, c_lo), per candidate. shi/slo is the
    locally (hi, lo)-sorted shard; candidates are (Q,) u32 vectors.
    A vectorized binary search: O(log n) one-element gathers per round."""
    n = shi.shape[0]
    lo_b = jnp.zeros(c_hi.shape, dtype=jnp.uint32)
    hi_b = jnp.full(c_hi.shape, n, dtype=jnp.uint32)

    def body(_, carry):
        lo_b, hi_b = carry
        mid = (lo_b + hi_b) // 2
        i = jnp.minimum(mid, jnp.uint32(n - 1))
        mh, ml = jnp.take(shi, i), jnp.take(slo, i)
        lt = (mh < c_hi) | ((mh == c_hi) & (ml < c_lo))
        open_ = lo_b < hi_b
        lo_b = jnp.where(open_ & lt, mid + 1, lo_b)
        hi_b = jnp.where(open_ & ~lt, mid, hi_b)
        return lo_b, hi_b

    lo_b, _ = jax.lax.fori_loop(0, n.bit_length() + 1, body, (lo_b, hi_b))
    return lo_b


def _dq_shard(lo, hi, *, ranks: tuple, is_pair: bool):
    """Per-shard body: one local sort, then 64 (or 32) greedy bit rounds
    building the largest v with global count_lt(v) <= rank."""
    if is_pair:
        shi, slo = jax.lax.sort([hi, lo], num_keys=2, is_stable=False)
    else:
        (slo,) = jax.lax.sort([lo], num_keys=1, is_stable=False)
        shi = jnp.zeros_like(slo)
    r = jnp.asarray(ranks, dtype=jnp.uint32)
    p_lo = jnp.zeros(len(ranks), dtype=jnp.uint32)
    p_hi = jnp.zeros(len(ranks), dtype=jnp.uint32)
    n_bits = 64 if is_pair else 32
    for b in range(n_bits - 1, -1, -1):
        if b >= 32:
            c_hi = p_hi | jnp.uint32(1 << (b - 32))
            c_lo = p_lo
        else:
            c_hi = p_hi
            c_lo = p_lo | jnp.uint32(1 << b)
        cnt = jax.lax.psum(_count_lt_pair(shi, slo, c_hi, c_lo), AXIS)
        take = cnt <= r
        p_lo = jnp.where(take, c_lo, p_lo)
        p_hi = jnp.where(take, c_hi, p_hi)
    # replicated answer: every device computed the same greedy state
    return p_lo.reshape(1, -1), p_hi.reshape(1, -1)


@functools.partial(jax.jit, static_argnames=("mesh", "ranks", "is_pair"))
def _dq(lo, hi, mesh: Mesh, ranks: tuple, is_pair: bool):
    spec = P(AXIS)
    fn = shard_map(
        functools.partial(_dq_shard, ranks=ranks, is_pair=is_pair),
        mesh=mesh, in_specs=(spec, spec),
        out_specs=(P(AXIS, None), P(AXIS, None)), check_vma=False)
    return fn(lo, hi)


def distributed_quantile(col, qs, mesh: Mesh):
    """Exact global PERCENTILE_DISC over a mesh-sharded column.

    col: U64 (sharded planes) or a sharded uint32/int32/float32 array.
    Returns values in col's type, one per q — replicated (identical on
    every device; row 0 of the per-device stack is returned).
    """
    spec = canon_qs(qs)
    if isinstance(col, U64):
        n = col.lo.shape[0]
        ranks = tuple(disc_rank(num, sh, n) for num, sh in spec)
        p_lo, p_hi = _dq(col.lo, col.hi, mesh, ranks, True)
        return U64(p_lo[0], p_hi[0])
    n = col.shape[0]
    ranks = tuple(disc_rank(num, sh, n) for num, sh in spec)
    bits = sortable_u32(col)
    p_lo, _ = _dq(bits, jnp.zeros_like(bits), mesh, ranks, False)
    return sortable_u32_inverse(p_lo[0], col.dtype)


def distributed_quantile_cont(col, qs, mesh: Mesh) -> ContQuantileResult:
    """Exact global PERCENTILE_CONT over a mesh-sharded column: the
    floor/ceil rank elements ride the SAME zero-row-movement bisection
    (2Q candidates instead of Q); the exact fractional numerators are
    host integers. Returns ops/quantile.ContQuantileResult (f32
    interpolation for 32-bit columns; exact fields only for U64)."""
    from tpu_qe.bits import sortable_u32 as _s32
    from tpu_qe.ops.quantile import _interp_f32

    spec = canon_qs(qs)
    n = col.lo.shape[0] if isinstance(col, U64) else col.shape[0]
    trip = [cont_rank(num, sh, n) for num, sh in spec]
    ranks = tuple(r for f, c, _ in trip for r in (f, c))
    fracs = tuple(fr for _, _, fr in trip)
    shifts = tuple(sh for _, sh in spec)
    if isinstance(col, U64):
        p_lo, p_hi = _dq(col.lo, col.hi, mesh, ranks, True)
        return ContQuantileResult(U64(p_lo[0][0::2], p_hi[0][0::2]),
                                  U64(p_lo[0][1::2], p_hi[0][1::2]),
                                  fracs, shifts, None)
    bits = _s32(col)
    p_lo, _ = _dq(bits, jnp.zeros_like(bits), mesh, ranks, False)
    lower = sortable_u32_inverse(p_lo[0][0::2], col.dtype)
    upper = sortable_u32_inverse(p_lo[0][1::2], col.dtype)
    val = _interp_f32(lower, upper,
                      [fr / (1 << sh) for fr, sh in zip(fracs, shifts)])
    return ContQuantileResult(lower, upper, fracs, shifts, val)


def distributed_quantile_cont_numpy(vals: np.ndarray, qs, mesh: Mesh
                                    ) -> ContQuantileResult:
    """Host wrapper for distributed_quantile_cont over a numpy column."""
    sh = NamedSharding(mesh, P(AXIS))
    if vals.dtype == np.uint64:
        u = U64.from_numpy(vals)
        col = U64(jax.device_put(u.lo, sh), jax.device_put(u.hi, sh))
    else:
        col = jax.device_put(jnp.asarray(vals), sh)
    return distributed_quantile_cont(col, qs, mesh)


def distributed_quantile_numpy(vals: np.ndarray, qs, mesh: Mesh):
    """Host wrapper: shard a numpy column, return numpy quantiles."""
    sh = NamedSharding(mesh, P(AXIS))
    if vals.dtype == np.uint64:
        u = U64.from_numpy(vals)
        col = U64(jax.device_put(u.lo, sh), jax.device_put(u.hi, sh))
        return distributed_quantile(col, qs, mesh).to_numpy()
    col = jax.device_put(jnp.asarray(vals), sh)
    return np.asarray(distributed_quantile(col, qs, mesh))


# --------------------------------------------------------------------------
# per-group distributed quantiles (GROUP BY key, PERCENTILE_DISC(q))
# --------------------------------------------------------------------------

def _count_lt_trip(shi, slo, sv, c_hi, c_lo, c_v, le: bool = False):
    """#rows lexicographically < (or <= with le) the (hi, lo, v) triple,
    per candidate, over the locally (hi, lo, v)-sorted shard."""
    n = shi.shape[0]
    lo_b = jnp.zeros(c_hi.shape, dtype=jnp.uint32)
    hi_b = jnp.full(c_hi.shape, n, dtype=jnp.uint32)

    def body(_, carry):
        lo_b, hi_b = carry
        mid = (lo_b + hi_b) // 2
        i = jnp.minimum(mid, jnp.uint32(n - 1))
        mh, ml, mv = jnp.take(shi, i), jnp.take(slo, i), jnp.take(sv, i)
        veq = (mv <= c_v) if le else (mv < c_v)
        lt = ((mh < c_hi) | ((mh == c_hi) & (ml < c_lo))
              | ((mh == c_hi) & (ml == c_lo) & veq))
        open_ = lo_b < hi_b
        lo_b = jnp.where(open_ & lt, mid + 1, lo_b)
        hi_b = jnp.where(open_ & ~lt, mid, hi_b)
        return lo_b, hi_b

    lo_b, _ = jax.lax.fori_loop(0, n.bit_length() + 1, body, (lo_b, hi_b))
    return lo_b


def _dgq_shard(lo, hi, v, *, spec: tuple, max_groups: int,
               cont: bool = False):
    """Per-shard body: one local (key, value) sort, a replicated global
    key table (the only gather — G keys, not rows), then per-(group, q)
    greedy bit rounds over the VALUE domain. Zero row movement.

    cont: PERCENTILE_CONT mode — the floor AND ceil rank elements ride
    the same rounds (2Q candidate rows) and the exact per-group
    fractional numerators are returned as an extra (Q, G) plane."""
    from tpu_qe.ops.aggregate import _shift_right_one
    from tpu_qe.ops.quantile import _cont_rank_device, _disc_rank_device

    n_local = lo.shape[0]
    shi, slo, sv = jax.lax.sort([hi, lo, v], num_keys=3, is_stable=False)
    # local distinct keys, compacted to a max_groups prefix
    pos = jnp.arange(n_local, dtype=jnp.uint32)
    is_new = ((pos == 0) | (slo != _shift_right_one(slo, 0))
              | (shi != _shift_right_one(shi, 0)))
    m_local = jnp.sum(is_new.astype(jnp.uint32))
    packed = jnp.where(is_new, pos, pos | jnp.uint32(1 << 31))
    _, clo, chi = jax.lax.sort([packed, slo, shi], num_keys=1,
                               is_stable=False)
    k = min(max_groups, n_local)
    in_pref = jnp.arange(k, dtype=jnp.uint32) < m_local
    glo = jnp.where(in_pref, jax.lax.slice(clo, (0,), (k,)), _ONES)
    ghi = jnp.where(in_pref, jax.lax.slice(chi, (0,), (k,)), _ONES)
    # union over shards (replicated work): D*k candidate keys -> dedup
    ulo = jax.lax.all_gather(glo, AXIS).reshape(-1)
    uhi = jax.lax.all_gather(ghi, AXIS).reshape(-1)
    suhi, sulo = jax.lax.sort([uhi, ulo], num_keys=2, is_stable=False)
    m = sulo.shape[0]
    upos = jnp.arange(m, dtype=jnp.uint32)
    sent = (sulo == _ONES) & (suhi == _ONES)
    u_new = ((upos == 0) | (sulo != _shift_right_one(sulo, 0))
             | (suhi != _shift_right_one(suhi, 0))) & ~sent
    n_groups = jnp.sum(u_new.astype(jnp.uint32))
    # overflow: union exceeded the bound, OR any shard had to truncate
    # its local distinct-key prefix (the union would then undercount)
    local_trunc = (m_local > jnp.uint32(k)).astype(jnp.uint32)
    overflow = jnp.maximum(
        (n_groups > jnp.uint32(max_groups)).astype(jnp.uint32),
        jax.lax.pmax(local_trunc, AXIS))
    # a real all-ones key is indistinguishable from the pad here —
    # detected, not silent (callers keep one key below 2^64-1)
    upacked = jnp.where(u_new, upos, upos | jnp.uint32(1 << 31))
    _, gklo, gkhi = jax.lax.sort([upacked, sulo, suhi], num_keys=1,
                                 is_stable=False)
    # the union stack holds D*k keys, which may be SMALLER than
    # max_groups (tiny shards with a generous bound): slice what exists
    # and sentinel-pad the rest (pad rows are masked by g_valid)
    gk = min(max_groups, m)
    gklo = jax.lax.slice(gklo, (0,), (gk,))
    gkhi = jax.lax.slice(gkhi, (0,), (gk,))
    if gk < max_groups:
        pad = jnp.full(max_groups - gk, _ONES, dtype=jnp.uint32)
        gklo = jnp.concatenate([gklo, pad])
        gkhi = jnp.concatenate([gkhi, pad])
    g_valid = jnp.arange(max_groups, dtype=jnp.uint32) < n_groups

    # exact global per-group row counts (start/end by key-only probes:
    # v = 0 / all-ones are the value-domain extremes in sortable bits)
    zero = jnp.zeros(max_groups, dtype=jnp.uint32)
    start = _count_lt_trip(shi, slo, sv, gkhi, gklo, zero, le=False)
    end = _count_lt_trip(shi, slo, sv, gkhi, gklo,
                         jnp.full(max_groups, _ONES), le=True)
    start = jax.lax.psum(start, AXIS)
    cnt = jax.lax.psum(end, AXIS) - start

    # greedy 32 bit rounds over the value domain, all (G, Q) at once
    if cont:
        rank_rows, frac_rows = [], []
        for num, sh in spec:
            f, c, frac = _cont_rank_device(num, sh, cnt)
            rank_rows += [f, c]
            frac_rows.append(frac)
        q_n = 2 * len(spec)
        ranks = jnp.stack(rank_rows)                  # (2Q, G)
        fracs = jnp.stack(frac_rows)                  # (Q, G)
    else:
        q_n = len(spec)
        ranks = jnp.stack([_disc_rank_device(num, sh, cnt)
                           for num, sh in spec])      # (Q, G)
    p = jnp.zeros((q_n, max_groups), dtype=jnp.uint32)
    khiQ = jnp.broadcast_to(gkhi, (q_n, max_groups)).reshape(-1)
    kloQ = jnp.broadcast_to(gklo, (q_n, max_groups)).reshape(-1)
    startQ = jnp.broadcast_to(start, (q_n, max_groups)).reshape(-1)

    def bit_round(i, p):
        b = jnp.uint32(31) - i.astype(jnp.uint32)
        c = p | (jnp.uint32(1) << b)
        cl = _count_lt_trip(shi, slo, sv, khiQ, kloQ, c.reshape(-1),
                            le=False)
        cnt_lt = jax.lax.psum(cl, AXIS) - startQ
        take = cnt_lt.reshape(q_n, max_groups) <= ranks
        return jnp.where(take, c, p)

    p = jax.lax.fori_loop(0, 32, bit_round, p)
    outs = (gklo.reshape(1, -1), gkhi.reshape(1, -1),
            p.reshape(1, q_n, max_groups), cnt.reshape(1, -1),
            n_groups.reshape(1), overflow.reshape(1))
    if cont:
        outs = outs + (fracs.reshape(1, len(spec), max_groups),)
    return outs


@functools.partial(jax.jit, static_argnames=("mesh", "spec", "max_groups",
                                             "cont"))
def _dgq(lo, hi, v, mesh: Mesh, spec: tuple, max_groups: int,
         cont: bool = False):
    specP = P(AXIS)
    out_specs = (P(AXIS, None), P(AXIS, None), P(AXIS, None, None),
                 P(AXIS, None), P(AXIS), P(AXIS))
    if cont:
        out_specs = out_specs + (P(AXIS, None, None),)
    fn = shard_map(
        functools.partial(_dgq_shard, spec=spec, max_groups=max_groups,
                          cont=cont),
        mesh=mesh, in_specs=(specP, specP, specP),
        out_specs=out_specs, check_vma=False)
    return fn(lo, hi, v)


def distributed_group_quantile(key: U64, value, qs, mesh: Mesh,
                               max_groups: int):
    """Per-group exact PERCENTILE_DISC over mesh-sharded rows with ZERO
    row movement: the global-quantile greedy bisection vectorized over
    (group, q) — one local (key, value) sort, one all_gather of the
    G-bounded distinct-key table (the only non-scalar traffic), then 32
    bit rounds of (local 3-plane binary search + one (G*Q,) psum).

    Returns (key: U64 padded to max_groups, quantiles (Q, max_groups)
    in value dtype, count (max_groups,), num_groups, overflow) — all
    replicated (row 0 of each per-device stack). overflow != 0 means
    distinct keys exceeded max_groups (outputs truncated, never
    silently wrong).
    """
    from tpu_qe.ops.quantile import canon_qs

    spec = canon_qs(qs)
    bits = sortable_u32(value)
    gklo, gkhi, p, cnt, ng, ovf = _dgq(key.lo, key.hi, bits, mesh,
                                       spec, max_groups)
    vals = sortable_u32_inverse(p[0], value.dtype)
    return (U64(gklo[0], gkhi[0]), vals, cnt[0], ng.reshape(-1)[0],
            ovf.reshape(-1).max())


def distributed_group_quantile_cont(key: U64, value, qs, mesh: Mesh,
                                    max_groups: int):
    """Per-group exact PERCENTILE_CONT over mesh-sharded rows with ZERO
    row movement: the floor/ceil rank elements of every (group, q) ride
    the same 32 bisection rounds (2Q*G candidates) and the exact
    fractional numerators come back as a (Q, G) plane.

    Returns (key, lower (Q, G) in value dtype, upper, frac (Q, G) u32,
    shifts, value (Q, G) f32 interpolation, count, num_groups,
    overflow) — replicated; exact answer = lower + (upper-lower) *
    frac/2^shift per (q, group)."""
    from tpu_qe.ops.quantile import canon_qs

    spec = canon_qs(qs)
    bits = sortable_u32(value)
    gklo, gkhi, p, cnt, ng, ovf, fracs = _dgq(
        key.lo, key.hi, bits, mesh, spec, max_groups, cont=True)
    lower = sortable_u32_inverse(p[0][0::2], value.dtype)
    upper = sortable_u32_inverse(p[0][1::2], value.dtype)
    frac = fracs[0]
    lo_f = lower.astype(jnp.float32)
    scale = jnp.asarray([1.0 / (1 << sh) for _, sh in spec],
                        jnp.float32).reshape(-1, 1)
    val = lo_f + ((upper.astype(jnp.float32) - lo_f)
                  * frac.astype(jnp.float32) * scale)
    return (U64(gklo[0], gkhi[0]), lower, upper, frac,
            tuple(sh for _, sh in spec), val, cnt[0],
            ng.reshape(-1)[0], ovf.reshape(-1).max())


def distributed_group_quantile_numpy(keys, values, qs, mesh: Mesh,
                                     max_groups: int):
    """Host wrapper: {key -> [q values...]} over all shards."""
    sh = NamedSharding(mesh, P(AXIS))
    u = U64.from_numpy(keys)
    key = U64(jax.device_put(u.lo, sh), jax.device_put(u.hi, sh))
    val = jax.device_put(jnp.asarray(values), sh)
    gk, vals, cnt, ng, ovf = distributed_group_quantile(
        key, val, qs, mesh, max_groups)
    if int(ovf):
        raise QuantileOverflow("distinct keys exceed max_groups")
    ng = int(ng)
    klo = np.asarray(gk.lo)[:ng].astype(np.uint64)
    khi = np.asarray(gk.hi)[:ng].astype(np.uint64)
    v = np.asarray(vals)[:, :ng]
    return {int((h << np.uint64(32)) | l): list(v[:, i])
            for i, (h, l) in enumerate(zip(khi, klo))}


def distributed_group_quantile_cont_numpy(keys, values, qs, mesh: Mesh,
                                          max_groups: int):
    """Host wrapper for distributed_group_quantile_cont:
    {key -> [f32 interpolated PERCENTILE_CONT per q]} over all shards
    (the exact rational fields stay available on the device API)."""
    sh = NamedSharding(mesh, P(AXIS))
    u = U64.from_numpy(keys)
    key = U64(jax.device_put(u.lo, sh), jax.device_put(u.hi, sh))
    val = jax.device_put(jnp.asarray(values), sh)
    gk, _lo, _up, _fr, _sh, v, cnt, ng, ovf = \
        distributed_group_quantile_cont(key, val, qs, mesh, max_groups)
    if int(ovf):
        raise QuantileOverflow("distinct keys exceed max_groups")
    ng = int(ng)
    klo = np.asarray(gk.lo)[:ng].astype(np.uint64)
    khi = np.asarray(gk.hi)[:ng].astype(np.uint64)
    vv = np.asarray(v)[:, :ng]
    return {int((h << np.uint64(32)) | l): list(vv[:, i])
            for i, (h, l) in enumerate(zip(khi, klo))}
