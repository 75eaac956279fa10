"""SQL set operations over u64 key columns: UNION / INTERSECT / EXCEPT.

DISTINCT semantics (the SQL default) in ONE sort: concatenate both
sides with a side flag, sort by (key, side), and each key run's
side-0/side-1 membership falls out of one cumsum difference — then the
house packed-position compaction emits the qualifying distinct keys:

  union       present in A or B       (every key run qualifies)
  intersect   present in A and B      (count_A > 0 and count_B > 0)
  except      present in A, not in B  (count_A > 0 and count_B == 0)

Per-key multiplicities (count_A, count_B) ride along, so ALL semantics
(bag: intersect = min, except = saturating difference) are one
expand_ranges call away (ops/join.py's scatter-free cumsum segment
replication) — returned, not materialized, because materialization
needs a caller-owned static budget.

UNION ALL is a concatenation; it needs no operator.

The reference has no query operators; this extends SURVEY §7's operator
mandate with the set-algebra shape on the same sorting machinery.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu_qe.bits import U64
from tpu_qe.ops.aggregate import _shift_right_one
from tpu_qe.ops.segscan import cumsum_u32

_OPS = ("union", "intersect", "except")


def _qualifies(op: str, in_a, in_b):
    if op == "union":
        return in_a | in_b
    if op == "intersect":
        return in_a & in_b
    return in_a & ~in_b  # except


@functools.partial(jax.jit, static_argnames=("op",))
def _set_op(a: U64, b: U64, op: str):
    n_a, n_b = a.lo.shape[0], b.lo.shape[0]
    n = n_a + n_b
    assert n < (1 << 31), n
    lo = jnp.concatenate([a.lo, b.lo])
    hi = jnp.concatenate([a.hi, b.hi])
    side = jnp.concatenate([jnp.zeros(n_a, jnp.uint32),
                            jnp.ones(n_b, jnp.uint32)])
    shi, slo, ss = jax.lax.sort([hi, lo, side], num_keys=3,
                                is_stable=False)
    pos = jnp.arange(n, dtype=jnp.uint32)
    key_new = ((pos == 0) | (slo != _shift_right_one(slo, 0))
               | (shi != _shift_right_one(shi, 0)))
    key_end = jnp.concatenate([key_new[1:], jnp.ones((1,), bool)])
    cum_b = cumsum_u32(ss)                   # B rows so far (inclusive)
    # compact key-end rows carrying (total position, B-count) — counts
    # per key follow from consecutive differences
    pos1 = pos + 1
    packed = jnp.where(key_end, pos1, pos1 | jnp.uint32(1 << 31))
    res = jax.lax.sort([packed, slo, shi, cum_b], num_keys=1,
                       is_stable=False)
    pe = res[0] & jnp.uint32(0x7FFFFFFF)
    cnt = pe - _shift_right_one(pe, 0)
    cb = res[3] - _shift_right_one(res[3], 0)
    ca = cnt - cb
    n_keys = jnp.sum(key_end.astype(jnp.uint32), dtype=jnp.uint32)
    kvalid = pos < n_keys
    keep = kvalid & _qualifies(op, ca > 0, cb > 0)
    num = jnp.sum(keep.astype(jnp.uint32), dtype=jnp.uint32)
    # second compaction: qualifying keys (+ their counts) to the front
    packed2 = jnp.where(keep, pos, pos | jnp.uint32(1 << 31))
    res2 = jax.lax.sort([packed2, res[1], res[2], ca, cb], num_keys=1,
                        is_stable=False)
    valid = pos < num
    out_lo = jnp.where(valid, res2[1], jnp.uint32(0xFFFFFFFF))
    out_hi = jnp.where(valid, res2[2], jnp.uint32(0xFFFFFFFF))
    return (U64(out_lo, out_hi),
            jnp.where(valid, res2[3], 0), jnp.where(valid, res2[4], 0),
            num)


def set_op(a: U64, b: U64, op: str):
    """DISTINCT-semantics set operation over two u64 key columns.

    Returns (keys: U64 ascending padded with all-ones, count_a,
    count_b, num): the first `num` rows are the result keys with each
    side's multiplicity (for ALL semantics via expand_ranges —
    intersect ALL repeats min(count_a, count_b) times, except ALL
    max(count_a - count_b, 0) times)."""
    if op not in _OPS:
        raise ValueError(f"op must be one of {_OPS}, got {op!r}")
    return _set_op(a, b, op)
