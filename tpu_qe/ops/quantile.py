"""Exact quantiles (SQL PERCENTILE_DISC / PERCENTILE_CONT), global and
per group.

PERCENTILE_DISC(q) WITHIN GROUP (ORDER BY v): the first value whose
cumulative distribution reaches q — element rank ceil(q*n) - 1
(0-based; q = 0 -> rank 0). Always an ELEMENT of the data, never an
interpolation, so it is well-defined for u64 keys.

PERCENTILE_CONT(q): linear interpolation at row number q*(n-1) —
between the elements at ranks floor(q*(n-1)) and ceil(q*(n-1)). With
q = num/2^shift dyadic, num*(n-1) is an exact integer whose high bits
are the floor rank and whose low `shift` bits are the EXACT fractional
numerator, so every *_cont operator returns (lower, upper, frac_num,
shift) — an exact rational representation of the SQL answer — plus the
f32 interpolation for 32-bit numeric columns (f32's ~1e-7 relative
error is the only inexact step, and it is confined to that convenience
value; U64 columns get the exact fields only).

Global quantiles are one sort + static slices (ranks are host
constants). Per-group quantiles ride the same two-sort structure as
GROUP BY (ops/aggregate.py): sort (key, value), find group boundaries,
compact (start, count) per group, then gather rank positions — the rank
arithmetic ceil(num * cnt / 2^QBITS) runs EXACTLY on device via the
widening u32 multiply (bits.mul_u32_wide): float rank math would lose
integer precision past 2^24-row groups.

q values are snapped to the num / 2^QBITS grid (QBITS = 20): dyadic
quantiles (0.5, 0.25, ...) are exact; others are within 2^-20 of the
request, which moves the selected rank only when q*cnt sits within
cnt/2^20 of an integer. Pass an (num, den_pow2_exponent) tuple for
exact control at any dyadic resolution up to 2^31.

The reference has no query operators; this extends SURVEY §7's operator
mandate on the same sorting machinery (see ops/topk.py for the measured
case that sorting IS selection's envelope on this hardware class).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpu_qe.bits import U64, mul_u32_wide, sortable_u32, sortable_u32_inverse

QBITS = 20


def canon_qs(qs) -> tuple[tuple[int, int], ...]:
    """Normalize quantile specs to (num, shift) pairs meaning num/2^shift.

    Items are floats in [0, 1] (snapped to the 2^-QBITS grid) or
    (num, shift) integer pairs (exact dyadic rationals)."""
    out = []
    for q in ([qs] if isinstance(qs, (int, float)) else list(qs)):
        if isinstance(q, tuple):
            num, shift = q
            if not (isinstance(num, int) and isinstance(shift, int)
                    and 0 <= shift <= 31 and 0 <= num <= (1 << shift)):
                raise ValueError(f"bad (num, shift) quantile {q!r}")
            out.append((num, shift))
        else:
            if not 0.0 <= q <= 1.0:
                raise ValueError(f"quantile {q!r} outside [0, 1]")
            out.append((round(q * (1 << QBITS)), QBITS))
    if not out:
        raise ValueError("need at least one quantile")
    return tuple(out)


def disc_rank(num: int, shift: int, n: int) -> int:
    """Host-side exact PERCENTILE_DISC rank: ceil(num * n / 2^shift) - 1,
    clamped to [0, n-1]."""
    r = -((-num * n) >> shift) - 1  # ceil via negated floor (exact ints)
    return min(max(r, 0), n - 1)


def _disc_rank_device(num: int, shift: int, cnt: jnp.ndarray) -> jnp.ndarray:
    """Exact on-device rank per group: ceil(num * cnt / 2^shift) - 1
    clamped to [0, cnt-1]; cnt u32 (may exceed 2^24 — float math would
    mis-rank there, hence the widening multiply)."""
    lo, hi = mul_u32_wide(cnt, jnp.uint32(num))
    add = jnp.uint32((1 << shift) - 1)
    lo2 = lo + add
    hi2 = hi + (lo2 < lo).astype(jnp.uint32)
    if shift == 0:
        r = lo2  # num/1: rank = cnt (then -1 below)
    else:
        r = (lo2 >> shift) | (hi2 << (32 - shift))
    r = jnp.maximum(r, jnp.uint32(1)) - jnp.uint32(1)
    return jnp.minimum(r, jnp.maximum(cnt, jnp.uint32(1)) - jnp.uint32(1))


def cont_rank(num: int, shift: int, n: int) -> tuple[int, int, int]:
    """Host-side exact PERCENTILE_CONT rank split: (floor_rank,
    ceil_rank, frac_num) with the interpolation point at
    num*(n-1)/2^shift — frac_num/2^shift is the EXACT fractional part."""
    prod = num * (n - 1)
    f = prod >> shift
    frac = prod & ((1 << shift) - 1)
    c = min(f + (1 if frac else 0), n - 1)
    return f, c, frac


def _cont_rank_device(num: int, shift: int, cnt: jnp.ndarray):
    """Exact on-device CONT rank split per group: floor/ceil ranks of
    num*(cnt-1)/2^shift + the exact frac numerator (u32: shift <= 31).
    cnt u32 (may exceed 2^24 — hence the widening multiply); padded-tail
    garbage is clamped into bounds like _disc_rank_device."""
    cnt1 = jnp.maximum(cnt, jnp.uint32(1)) - jnp.uint32(1)
    lo, hi = mul_u32_wide(cnt1, jnp.uint32(num))
    if shift == 0:
        f = lo
        frac = jnp.zeros_like(lo)
    else:
        f = (lo >> shift) | (hi << (32 - shift))
        frac = lo & jnp.uint32((1 << shift) - 1)
    f = jnp.minimum(f, cnt1)
    c = jnp.minimum(f + (frac != 0).astype(jnp.uint32), cnt1)
    return f, c, frac


@functools.partial(jax.jit, static_argnames=("ranks", "is_u64"))
def _sorted_pick(planes: tuple, ranks: tuple, is_u64: bool):
    if is_u64:
        hi, lo = jax.lax.sort(list(planes), num_keys=2, is_stable=False)
        return (jnp.stack([lo[r] for r in ranks]),
                jnp.stack([hi[r] for r in ranks]))
    (b,) = jax.lax.sort([planes[0]], num_keys=1, is_stable=False)
    return (jnp.stack([b[r] for r in ranks]),)


def quantile(col, qs):
    """Exact global PERCENTILE_DISC over a column.

    col: U64 or a uint32/int32/float32 array. qs: see canon_qs.
    Returns values with col's type, one per q (U64 -> U64 of len(qs))."""
    spec = canon_qs(qs)
    if isinstance(col, U64):
        n = col.lo.shape[0]
        assert n > 0, "quantile of an empty column"
        ranks = tuple(disc_rank(num, sh, n) for num, sh in spec)
        lo, hi = _sorted_pick((col.hi, col.lo), ranks, True)
        return U64(lo, hi)
    n = col.shape[0]
    assert n > 0, "quantile of an empty column"
    ranks = tuple(disc_rank(num, sh, n) for num, sh in spec)
    (b,) = _sorted_pick((sortable_u32(col),), ranks, False)
    return sortable_u32_inverse(b, col.dtype)


class GroupQuantileResult(NamedTuple):
    """Padded per-group quantiles: first num_groups rows are valid."""

    key: U64                  # unique group keys, ascending
    quantiles: jnp.ndarray    # (len(qs), n_padded) in value dtype
    count: jnp.ndarray        # (n_padded,) u32 rows per group
    num_groups: jnp.ndarray   # scalar u32, exact
    overflow: jnp.ndarray | None = None  # u32, only when max_groups set


def _group_layout(key: U64, value: jnp.ndarray):
    """Shared per-group machinery: one (key, value) sort + the packed
    compaction sort (the house compaction, see ops/aggregate.py) ->
    (sorted value bits, group keys, start, count, num_groups)."""
    from tpu_qe.ops.aggregate import _shift_right_one

    n = key.lo.shape[0]
    assert n > 0, "group quantile of an empty stream"
    assert n < (1 << 31), n
    vbits = sortable_u32(value)
    shi, slo, sv = jax.lax.sort([key.hi, key.lo, vbits], num_keys=3,
                                is_stable=False)
    pos = jnp.arange(n, dtype=jnp.uint32)
    is_new = ((pos == 0) | (slo != _shift_right_one(slo, 0))
              | (shi != _shift_right_one(shi, 0)))
    is_end = jnp.concatenate([is_new[1:], jnp.ones((1,), bool)])
    num_groups = jnp.sum(is_end.astype(jnp.uint32))
    pos1 = pos + 1
    packed = jnp.where(is_end, pos1, pos1 | jnp.uint32(1 << 31))
    res2 = jax.lax.sort([packed, slo, shi], num_keys=1, is_stable=False)
    pos_end = res2[0] & jnp.uint32(0x7FFFFFFF)
    klo, khi = res2[1], res2[2]
    start = _shift_right_one(pos_end, 0)
    cnt = pos_end - start
    return sv, U64(klo, khi), start, cnt, num_groups


def _group_layout_mg(key: U64, value: jnp.ndarray, max_groups: int):
    """max_groups variant of _group_layout (the aggregate.py
    low-cardinality recipe): the packed compaction sort is replaced by a
    binary search over the boundary cumsum + max_groups-sized gathers —
    and crucially the caller's rank gathers shrink from n to max_groups
    entries. At 134M rows x 16K groups the default path's Q full-length
    gathers (~68 M elem/s each) dominated the whole operator (~2 s per
    q); with the bound they cost microseconds. Returns
    (sv, gkey, start, cnt, num_groups, overflow, valid_g) where the
    per-group planes are (max_groups,) and padded entries carry
    all-ones keys / garbage counts (mask with valid_g)."""
    from tpu_qe.ops.aggregate import _searchsorted_u32, _shift_right_one
    from tpu_qe.ops.segscan import cumsum_u32

    n = key.lo.shape[0]
    assert n > 0, "group quantile of an empty stream"
    assert n < (1 << 31), n
    assert max_groups >= 1
    vbits = sortable_u32(value)
    shi, slo, sv = jax.lax.sort([key.hi, key.lo, vbits], num_keys=3,
                                is_stable=False)
    pos = jnp.arange(n, dtype=jnp.uint32)
    is_new = ((pos == 0) | (slo != _shift_right_one(slo, 0))
              | (shi != _shift_right_one(shi, 0)))
    is_end = jnp.concatenate([is_new[1:], jnp.ones((1,), bool)])
    cum_end = cumsum_u32(is_end.astype(jnp.uint32))
    num_groups = cum_end[-1]
    overflow = (num_groups > jnp.uint32(max_groups)).astype(jnp.uint32)
    j1 = jnp.arange(1, max_groups + 1, dtype=jnp.uint32)
    posc = jnp.minimum(_searchsorted_u32(cum_end, j1),
                       n - 1).astype(jnp.uint32)
    valid_g = jnp.arange(max_groups, dtype=jnp.uint32) < num_groups
    ones = jnp.uint32(0xFFFFFFFF)
    klo = jnp.where(valid_g, jnp.take(slo, posc), ones)
    khi = jnp.where(valid_g, jnp.take(shi, posc), ones)
    pos_end = jnp.where(valid_g, posc + 1, jnp.uint32(0))
    # groups are consecutive in the sorted stream: group g starts where
    # g-1 ended (the valid prefix; padded entries are masked downstream)
    start = _shift_right_one(pos_end, 0)
    cnt = pos_end - start
    return sv, U64(klo, khi), start, cnt, num_groups, overflow, valid_g


@functools.partial(jax.jit, static_argnames=("spec", "max_groups"))
def _group_quantile(key: U64, value: jnp.ndarray, spec: tuple,
                    max_groups: int | None = None) -> GroupQuantileResult:
    n = key.lo.shape[0]
    if max_groups is not None:
        sv, gkey, start, cnt, num_groups, overflow, valid_g = \
            _group_layout_mg(key, value, max_groups)
    else:
        sv, gkey, start, cnt, num_groups = _group_layout(key, value)
        overflow = valid_g = None
    qs_out = []
    for num, sh in spec:
        r = _disc_rank_device(num, sh, cnt)
        # clamp the padded tail (cnt garbage there) into bounds
        p = jnp.minimum(start + r, jnp.uint32(n - 1))
        v = jnp.take(sv, p)
        if valid_g is not None:
            v = jnp.where(valid_g, v, jnp.uint32(0))
        qs_out.append(sortable_u32_inverse(v, value.dtype))
    if valid_g is not None:
        cnt = jnp.where(valid_g, cnt, jnp.uint32(0))
    return GroupQuantileResult(gkey, jnp.stack(qs_out), cnt, num_groups,
                               overflow)


def group_quantile(key: U64, value: jnp.ndarray, qs,
                   max_groups: int | None = None) -> GroupQuantileResult:
    """Exact per-group PERCENTILE_DISC: GROUP BY key, PERCENTILE_DISC(q)
    WITHIN GROUP (ORDER BY value) for each q.

    One (key, value) sort + the packed compaction sort + len(qs)
    rank gathers. Rank arithmetic is exact at any group size (widening
    u32 multiply — see module docstring for the q grid).

    max_groups: when the caller can bound the group count, outputs pad
    to max_groups and BOTH the compaction sort and the n-sized rank
    gathers collapse to max_groups-bounded work (_group_layout_mg) —
    at 134M rows x 16K groups this is the difference between the
    gathers dominating the operator and costing nothing. num_groups
    stays exact; past the bound the overflow flag is set (outputs
    truncated, never silently wrong)."""
    return _group_quantile(key, value, canon_qs(qs),
                           max_groups=max_groups)


def median(col):
    """Exact PERCENTILE_DISC(0.5) (the lower median element)."""
    return quantile(col, [(1, 1)])


# --------------------------------------------------------------------------
# PERCENTILE_CONT: interpolation between the floor/ceil rank elements
# --------------------------------------------------------------------------

class ContQuantileResult(NamedTuple):
    """Exact rational PERCENTILE_CONT: the SQL answer is
    lower + (upper - lower) * frac_num/2^shift per q. `value` is the f32
    interpolation convenience (None for U64 columns)."""

    lower: object             # U64 or (Q,) array in col dtype
    upper: object
    frac_num: tuple           # per-q exact fractional numerators (host ints)
    shifts: tuple             # per-q denominators as 2^shift exponents
    value: jnp.ndarray | None  # (Q,) f32 interpolation, 32-bit cols only


def _interp_f32(lower, upper, fracs):
    lo_f = lower.astype(jnp.float32)
    return lo_f + ((upper.astype(jnp.float32) - lo_f)
                   * jnp.asarray(fracs, jnp.float32))


def quantile_cont(col, qs) -> ContQuantileResult:
    """Exact global PERCENTILE_CONT over a column (module docstring)."""
    spec = canon_qs(qs)
    n = col.lo.shape[0] if isinstance(col, U64) else col.shape[0]
    assert n > 0, "quantile_cont of an empty column"
    trip = [cont_rank(num, sh, n) for num, sh in spec]
    ranks = tuple(r for f, c, _ in trip for r in (f, c))
    fracs = tuple(fr for _, _, fr in trip)
    shifts = tuple(sh for _, sh in spec)
    if isinstance(col, U64):
        lo, hi = _sorted_pick((col.hi, col.lo), ranks, True)
        return ContQuantileResult(U64(lo[0::2], hi[0::2]),
                                  U64(lo[1::2], hi[1::2]),
                                  fracs, shifts, None)
    (b,) = _sorted_pick((sortable_u32(col),), ranks, False)
    lower = sortable_u32_inverse(b[0::2], col.dtype)
    upper = sortable_u32_inverse(b[1::2], col.dtype)
    val = _interp_f32(lower, upper,
                      [fr / (1 << sh) for fr, sh in zip(fracs, shifts)])
    return ContQuantileResult(lower, upper, fracs, shifts, val)


class GroupContQuantileResult(NamedTuple):
    """Padded per-group PERCENTILE_CONT: first num_groups rows valid.
    Exact answer per (q, group): lower + (upper-lower)*frac/2^shift."""

    key: U64
    lower: jnp.ndarray        # (Q, n_padded) in value dtype
    upper: jnp.ndarray
    frac: jnp.ndarray         # (Q, n_padded) u32 exact numerators
    shifts: tuple             # per-q 2^shift exponents
    value: jnp.ndarray        # (Q, n_padded) f32 interpolation
    count: jnp.ndarray
    num_groups: jnp.ndarray
    overflow: jnp.ndarray | None = None  # u32, only when max_groups set


@functools.partial(jax.jit, static_argnames=("spec", "max_groups"))
def _group_quantile_cont(key: U64, value: jnp.ndarray, spec: tuple,
                         max_groups: int | None = None
                         ) -> GroupContQuantileResult:
    n = key.lo.shape[0]
    if max_groups is not None:
        sv, gkey, start, cnt, num_groups, overflow, valid_g = \
            _group_layout_mg(key, value, max_groups)
    else:
        sv, gkey, start, cnt, num_groups = _group_layout(key, value)
        overflow = valid_g = None
    lows, ups, fracs, vals = [], [], [], []
    for num, sh in spec:
        f, c, frac = _cont_rank_device(num, sh, cnt)
        pf = jnp.minimum(start + f, jnp.uint32(n - 1))
        pc = jnp.minimum(start + c, jnp.uint32(n - 1))
        lo_b, up_b = jnp.take(sv, pf), jnp.take(sv, pc)
        if valid_g is not None:
            lo_b = jnp.where(valid_g, lo_b, jnp.uint32(0))
            up_b = jnp.where(valid_g, up_b, jnp.uint32(0))
            frac = jnp.where(valid_g, frac, jnp.uint32(0))
        lower = sortable_u32_inverse(lo_b, value.dtype)
        upper = sortable_u32_inverse(up_b, value.dtype)
        lo_f = lower.astype(jnp.float32)
        frac_f = frac.astype(jnp.float32) * jnp.float32(1.0 / (1 << sh))
        lows.append(lower)
        ups.append(upper)
        fracs.append(frac)
        vals.append(lo_f + (upper.astype(jnp.float32) - lo_f) * frac_f)
    if valid_g is not None:
        cnt = jnp.where(valid_g, cnt, jnp.uint32(0))
    return GroupContQuantileResult(
        gkey, jnp.stack(lows), jnp.stack(ups), jnp.stack(fracs),
        tuple(sh for _, sh in spec), jnp.stack(vals), cnt, num_groups,
        overflow)


def group_quantile_cont(key: U64, value: jnp.ndarray, qs,
                        max_groups: int | None = None
                        ) -> GroupContQuantileResult:
    """Exact per-group PERCENTILE_CONT: GROUP BY key,
    PERCENTILE_CONT(q) WITHIN GROUP (ORDER BY value) for each q — the
    same one-sort layout as group_quantile with two rank gathers per q
    and the exact fractional numerator riding along. max_groups: see
    group_quantile (the gathers shrink from n to max_groups)."""
    return _group_quantile_cont(key, value, canon_qs(qs),
                                max_groups=max_groups)
