"""Distributed query operators: FK join and GROUP BY over a device mesh.

Data-parallel operators per SURVEY.md §2c ("DP = hash-partitioned tables"):
both are one keyed shuffle (tpu_qe.exchange.shuffle) + the corresponding
local operator per shard.

distributed_join_fk
    Route BOTH sides with the same splitters (sampled from the union of
    both key distributions) so equal keys co-locate, then run the local
    scan join per shard
    with validity masks over the exchange padding. Results return in a
    per-shard padded layout carrying each left row's GLOBAL index, so the
    host wrapper can restore original order.

distributed_aggregate
    Classic two-phase aggregation: (1) local group_aggregate per shard —
    this is also the exchange-volume reducer; (2) shuffle the (far fewer)
    partial groups by key; (3) local combine per shard. Padding slots carry
    neutral elements (count/sum 0, min 0xFFFFFFFF, max 0), so a real
    all-ones key group absorbs them harmlessly and a purely-padding group
    shows count 0 and is dropped by the wrapper.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tpu_qe.bits import U64
from tpu_qe.exchange.shuffle import (AXIS, exchange,
                                     route_by_splitters,
                                     sample_splitters)
from tpu_qe.table import Table

_ONES = jnp.uint32(0xFFFFFFFF)


# --------------------------------------------------------------------------
# distributed FK join
# --------------------------------------------------------------------------

def _djoin_shard(llo, lhi, lval_cols, rlo, rhi, rval_cols, *, n_dev,
                 samples_per_dev, cap_l, cap_r):
    from tpu_qe.ops.join import join_fk_scan

    n_local_l = llo.shape[0]
    my = jax.lax.axis_index(AXIS).astype(jnp.uint32)
    gidx = my * jnp.uint32(n_local_l) + jnp.arange(n_local_l,
                                                   dtype=jnp.uint32)

    # splitters from BOTH sides' key distributions: sampling only the right
    # side hotspots devices when left-key mass falls outside the right key
    # range (any splitter set is correct — equal keys co-locate — but
    # balance needs the union distribution)
    sp_lo, sp_hi = sample_splitters(
        jnp.concatenate([rlo, llo]), jnp.concatenate([rhi, lhi]),
        n_dev, samples_per_dev)

    dest_r = route_by_splitters(rlo, rhi, sp_lo, sp_hi)
    recv_r, flag_r, _, ovf_r = exchange(
        dest_r, [rlo, rhi] + list(rval_cols),
        [_ONES, _ONES] + [jnp.uint32(0)] * len(rval_cols), n_dev, cap_r)

    dest_l = route_by_splitters(llo, lhi, sp_lo, sp_hi)
    recv_l, flag_l, _, ovf_l = exchange(
        dest_l, [llo, lhi, gidx] + list(lval_cols),
        [_ONES, _ONES, _ONES] + [jnp.uint32(0)] * len(lval_cols),
        n_dev, cap_l)

    lkey = U64(recv_l[0], recv_l[1])
    g = recv_l[2]
    rkey = U64(recv_r[0], recv_r[1])
    left = Table({f"_l{i}": c for i, c in enumerate(recv_l[3:])})
    right = Table({f"_r{i}": c for i, c in enumerate(recv_r[2:])})
    out, matched = join_fk_scan(left, right, lkey, rkey,
                                l_valid=flag_l == 0, r_valid=flag_r == 0)
    overflow = (ovf_r | ovf_l).reshape(1)
    outs = [g, matched.astype(jnp.uint32), flag_l]
    outs += [out[f"_l{i}"] for i in range(len(lval_cols))]
    outs += [out[f"_r{i}"] for i in range(len(rval_cols))]
    return (*outs, overflow)


@functools.partial(jax.jit, static_argnames=("mesh", "samples_per_dev",
                                             "capacity_factor",
                                             "capacity_factor_right"))
def distributed_join_fk(lkey: U64, left_cols: tuple, rkey: U64,
                        right_cols: tuple, mesh: Mesh,
                        samples_per_dev: int = 128,
                        capacity_factor: float = 2.0,
                        capacity_factor_right: float | None = None):
    """FK equi-join of mesh-sharded tables.

    Args:
      lkey/rkey: U64 keys, globally (n_l,)/(n_r,), sharded over the mesh.
      left_cols/right_cols: tuples of u32 value columns, sharded likewise.
    Returns (global_left_index, matched, pad_flag, out_left_cols,
    out_right_cols, overflow), each per-shard padded; rows with pad_flag==0
    are real, identified by global_left_index.
    """
    n_dev = mesh.shape[AXIS]
    n_l, n_r = lkey.lo.shape[0], rkey.lo.shape[0]
    assert n_l % n_dev == 0 and n_r % n_dev == 0
    # Splitters balance the UNION of both key distributions, so the side
    # with less mass can legitimately concentrate (e.g. a small dimension
    # table whose key range covers a fraction of the union quantiles) —
    # give it its own factor, up to n_dev for full concentration.
    cf_r = capacity_factor if capacity_factor_right is None else capacity_factor_right
    cap_l = max(int(np.ceil(capacity_factor * (n_l // n_dev) / n_dev)), 16)
    cap_r = max(int(np.ceil(cf_r * (n_r // n_dev) / n_dev)), 16)

    spec = P(AXIS)
    n_out = 3 + len(left_cols) + len(right_cols) + 1
    fn = shard_map(
        lambda llo, lhi, lvs, rlo, rhi, rvs: _djoin_shard(
            llo, lhi, lvs, rlo, rhi, rvs, n_dev=n_dev,
            samples_per_dev=samples_per_dev, cap_l=cap_l, cap_r=cap_r),
        mesh=mesh,
        in_specs=(spec, spec, tuple([spec] * len(left_cols)),
                  spec, spec, tuple([spec] * len(right_cols))),
        out_specs=tuple([spec] * n_out),
        check_vma=False,
    )
    return fn(lkey.lo, lkey.hi, tuple(left_cols), rkey.lo, rkey.hi,
              tuple(right_cols))


def distributed_join_fk_numpy(lkeys, lvals, rkeys, rvals, mesh, **kw):
    """Host wrapper: returns (matched, right-values) in original left order."""
    n_dev = mesh.shape[AXIS]
    sh = NamedSharding(mesh, P(AXIS))

    def put64(x):
        u = U64.from_numpy(x)
        return U64(jax.device_put(u.lo, sh), jax.device_put(u.hi, sh))

    def put32(x):
        return jax.device_put(jnp.asarray(x, dtype=jnp.uint32), sh)

    res = distributed_join_fk(put64(lkeys), tuple(put32(v) for v in lvals),
                              put64(rkeys), tuple(put32(v) for v in rvals),
                              mesh=mesh, **kw)
    overflow = int(np.asarray(res[-1]).max())
    if overflow:
        raise RuntimeError("exchange capacity overflow; raise capacity_factor")
    g = np.asarray(res[0])
    matched = np.asarray(res[1]) > 0
    flag = np.asarray(res[2])
    rcols = [np.asarray(c) for c in res[3 + len(lvals):-1]]
    real = flag == 0
    n_l = len(lkeys)
    out_matched = np.zeros(n_l, dtype=bool)
    out_rvals = [np.zeros(n_l, dtype=np.uint32) for _ in rcols]
    gi = g[real]
    out_matched[gi] = matched[real]
    for o, c in zip(out_rvals, rcols):
        o[gi] = c[real]
    return out_matched, out_rvals


# --------------------------------------------------------------------------
# distributed GROUP BY aggregate
# --------------------------------------------------------------------------

_NEUTRAL = {"count": 0, "sum": 0, "min": 0xFFFFFFFF, "max": 0}


def _dagg_shard(lo, hi, val, *, n_dev, samples_per_dev, capacity,
                inner_aggs):
    from tpu_qe.ops.aggregate import group_aggregate

    # Phase 1: local partial aggregation (volume reduction). Results are
    # padded to n_local with key=all-ones; their agg payloads are set to
    # the agg's neutral element so later combining ignores them.
    # 'count' is ALWAYS among inner_aggs (appended by the caller if not
    # requested): the host wrapper needs it to distinguish a purely-padding
    # group from a real all-ones key group.
    part = group_aggregate(U64(lo, hi), val, aggs=inner_aggs)
    n_local = lo.shape[0]
    idx = jnp.arange(part.key.lo.shape[0], dtype=jnp.uint32)
    is_real = idx < part.num_groups
    klo = jnp.where(is_real, part.key.lo, _ONES)
    khi = jnp.where(is_real, part.key.hi, _ONES)
    partials = []
    for a in inner_aggs:
        neutral = jnp.uint32(_NEUTRAL[a])
        partials.append(jnp.where(is_real, part.aggs[a], neutral))
    del n_local

    # Phase 2: shuffle partial groups by key. Padding slots carry neutral
    # values, so spread them round-robin instead of letting them all route
    # to the top device (where key=all-ones would overflow its capacity).
    # Sample only the REAL group prefix ([0, num_groups)) — a strided
    # sample over the padded array would be dominated by all-ones pads
    # whenever groups are few, collapsing every real group onto device 0.
    ng = jnp.maximum(part.num_groups.astype(jnp.uint32), jnp.uint32(1))
    stride = jnp.maximum(ng // jnp.uint32(samples_per_dev), jnp.uint32(1))
    s_idx = (jnp.arange(samples_per_dev, dtype=jnp.uint32) * stride) % ng
    g_lo = jax.lax.all_gather(jnp.take(klo, s_idx), AXIS).reshape(-1)
    g_hi = jax.lax.all_gather(jnp.take(khi, s_idx), AXIS).reshape(-1)
    g_hi, g_lo = jax.lax.sort([g_hi, g_lo], num_keys=2, is_stable=False)
    total = n_dev * samples_per_dev
    sp_pos = (jnp.arange(1, n_dev) * total) // n_dev
    sp_lo, sp_hi = g_lo[sp_pos], g_hi[sp_pos]
    dest = route_by_splitters(klo, khi, sp_lo, sp_hi)
    dest = jnp.where(is_real, dest,
                     (idx % jnp.uint32(n_dev)).astype(jnp.uint32))
    pads = [_ONES, _ONES] + [jnp.uint32(_NEUTRAL[a]) for a in inner_aggs]
    recv, _, _, overflow = exchange(dest, [klo, khi] + partials, pads,
                                    n_dev, capacity)

    # Phase 3: combine received partials per key. count/sum combine by sum;
    # min/max by min/max.
    rklo, rkhi = recv[0], recv[1]
    out_key = None
    out_aggs = []
    num_groups = None
    for a, col in zip(inner_aggs, recv[2:]):
        combine = {"count": ("sum",), "sum": ("sum",), "min": ("min",),
                   "max": ("max",)}[a]
        r = group_aggregate(U64(rklo, rkhi), col, aggs=combine)
        out_key, num_groups = r.key, r.num_groups
        out_aggs.append(r.aggs[combine[0]])
    return (out_key.lo, out_key.hi, *out_aggs,
            num_groups.reshape(1).astype(jnp.uint32), overflow.reshape(1))


@functools.partial(jax.jit, static_argnames=("mesh", "samples_per_dev",
                                             "capacity_factor", "aggs"))
def distributed_aggregate(key: U64, value: jnp.ndarray, mesh: Mesh,
                          aggs=("count", "sum"), samples_per_dev: int = 128,
                          capacity_factor: float = 2.0):
    """GROUP BY over mesh-sharded rows (two-phase aggregation).

    Returns (klo, khi, *agg_columns_in_inner_order, num_groups, overflow)
    where inner order = requested aggs plus a trailing 'count' if it was
    not requested (used to identify padding groups).
    """
    n_dev = mesh.shape[AXIS]
    n = key.lo.shape[0]
    assert n % n_dev == 0
    inner_aggs = tuple(aggs) if "count" in aggs else tuple(aggs) + ("count",)
    capacity = max(int(np.ceil(capacity_factor * (n // n_dev) / n_dev)), 16)
    spec = P(AXIS)
    n_out = 2 + len(inner_aggs) + 2
    fn = shard_map(
        functools.partial(_dagg_shard, n_dev=n_dev,
                          samples_per_dev=samples_per_dev,
                          capacity=capacity, inner_aggs=inner_aggs),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=tuple([spec] * n_out),
        check_vma=False,
    )
    return fn(key.lo, key.hi, value)


def distributed_aggregate_numpy(keys, values, mesh, aggs=("count", "sum"),
                                **kw):
    """Host wrapper: returns {key -> {agg -> value}} over all shards."""
    sh = NamedSharding(mesh, P(AXIS))
    u = U64.from_numpy(keys)
    key = U64(jax.device_put(u.lo, sh), jax.device_put(u.hi, sh))
    val = jax.device_put(jnp.asarray(values, dtype=jnp.uint32), sh)
    res = distributed_aggregate(key, val, mesh=mesh, aggs=tuple(aggs), **kw)
    if int(np.asarray(res[-1]).max()):
        raise RuntimeError("exchange capacity overflow; raise capacity_factor")
    n_dev = mesh.shape[AXIS]
    klo = np.asarray(res[0]).reshape(n_dev, -1)
    khi = np.asarray(res[1]).reshape(n_dev, -1)
    cols = [np.asarray(c).reshape(n_dev, -1) for c in res[2:-2]]
    inner = tuple(aggs) if "count" in aggs else tuple(aggs) + ("count",)
    ng = np.asarray(res[-2]).reshape(n_dev)
    out = {}
    for d in range(n_dev):
        for i in range(int(ng[d])):
            k = int(klo[d, i]) | (int(khi[d, i]) << 32)
            row = {a: int(c[d, i]) for a, c in zip(inner, cols)}
            if row["count"] == 0:
                continue  # purely-padding group
            out[k] = {a: row[a] for a in aggs}
    return out
