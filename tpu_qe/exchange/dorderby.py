"""Distributed multi-column ORDER BY over a device mesh.

The distributed_sort pattern generalized to SQL's mixed-type, mixed-
direction key lists (ops/orderby.py): every key column contributes its
order-preserving u32 bit planes (DESC = inverted bits — the transform
composes with routing because it is order-reversing and bijective), the
global input position rides as the FINAL plane, and

1. lexicographic splitters are sampled over (key planes..., position)
   (shuffle.sample_splitters_multi) — the unique position plane splits
   hot key runs across consecutive devices exactly as in dsort/dwindow;
2. one two-tier exchange moves all table planes;
3. each device runs ONE local lexicographic sort with the position as
   the last key: position is globally unique, so an unstable sort is
   stable in the SQL sense AND exchange pads (all-ones in every plane)
   sort to the tail, where the received-count sum marks the valid
   prefix.

Concatenating the per-device valid prefixes in mesh order IS the
globally ordered table (tests assert bit-equality vs the in-core
operator and a numpy lexsort oracle).

Reference contrast: single-device, single-u64-plane ordering at
/root/reference/src/main.rs:60-74; SURVEY §2c mandates the scaled
exchange, applied here to the ORDER BY surface.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P, Mesh
from jax import shard_map

from tpu_qe.bits import U64
from tpu_qe.exchange.shuffle import (AXIS, exchange,
                                     route_by_splitters_multi,
                                     sample_splitters_multi)
from tpu_qe.ops.orderby import canon_by, key_planes, reconstruct_keys
from tpu_qe.table import Table

_ONES = jnp.uint32(0xFFFFFFFF)


def _dob_shard(*planes, n_key_planes: int, n_dev: int,
               samples_per_dev: int, capacity: int):
    """Per-shard body. planes = key planes (major->minor, transformed)
    then payload planes; gpos is appended here."""
    n_local = planes[0].shape[0]
    my = jax.lax.axis_index(AXIS).astype(jnp.uint32)
    gpos = (my * jnp.uint32(n_local)
            + jnp.arange(n_local, dtype=jnp.uint32))
    kp = list(planes[:n_key_planes])
    route_planes = kp + [gpos]
    sps = sample_splitters_multi(route_planes, n_dev, samples_per_dev)
    dest = route_by_splitters_multi(route_planes, sps)
    cols = kp + [gpos] + list(planes[n_key_planes:])
    pads = [_ONES] * (n_key_planes + 1) + [jnp.uint32(0)] * (
        len(planes) - n_key_planes)
    recv, _, _, counts, overflow = exchange(dest, cols, pads, n_dev,
                                            capacity)
    # local lexicographic sort; (key planes..., position) — the position
    # is globally unique so the unstable sort is stable, and pads
    # (all-ones everywhere) sort to the tail past every real row
    res = jax.lax.sort(list(recv), num_keys=n_key_planes + 1,
                       is_stable=False)
    n_v = jnp.sum(counts, dtype=jnp.uint32)
    return (*res, n_v.reshape(1), overflow.reshape(1))


def _dob_plan_shard(*kp, n_dev: int, samples_per_dev: int):
    from tpu_qe.exchange.shuffle import offdiag_demand

    n_local = kp[0].shape[0]
    my = jax.lax.axis_index(AXIS).astype(jnp.uint32)
    gpos = (my * jnp.uint32(n_local)
            + jnp.arange(n_local, dtype=jnp.uint32))
    planes = list(kp) + [gpos]
    sps = sample_splitters_multi(planes, n_dev, samples_per_dev)
    dest = route_by_splitters_multi(planes, sps)
    return offdiag_demand(dest, n_dev).reshape(1)


@functools.partial(jax.jit, static_argnames=("mesh", "samples_per_dev"))
def _plan(planes: tuple, mesh: Mesh, samples_per_dev: int = 128):
    n_dev = mesh.shape[AXIS]
    spec_p = P(AXIS)
    fn = shard_map(
        functools.partial(_dob_plan_shard, n_dev=n_dev,
                          samples_per_dev=samples_per_dev),
        mesh=mesh, in_specs=tuple([spec_p] * len(planes)),
        out_specs=spec_p, check_vma=False)
    return fn(*planes)


def plan_order_by_capacity(table: Table, by, mesh: Mesh,
                           samples_per_dev: int = 128):
    """Measured off-diagonal row demand of the ORDER BY exchange
    (routing includes every key plane + position)."""
    planes, _ = key_planes(table, canon_by(by))
    return _plan(tuple(planes), mesh, samples_per_dev=samples_per_dev)


@functools.partial(jax.jit, static_argnames=("mesh", "n_key_planes",
                                             "samples_per_dev",
                                             "capacity_factor", "capacity"))
def _execute(planes: tuple, mesh: Mesh, n_key_planes: int,
             samples_per_dev: int, capacity_factor: float,
             capacity: int | None):
    n_dev = mesh.shape[AXIS]
    n = planes[0].shape[0]
    assert n % n_dev == 0, (n, n_dev)
    assert n < (1 << 32) - 1, n  # gpos pad (all-ones) must sort last
    if capacity is None:
        capacity = max(int(np.ceil(capacity_factor * (n // n_dev) / n_dev)),
                       16)
    capacity = max(capacity, 16)
    spec_p = P(AXIS)
    fn = shard_map(
        functools.partial(_dob_shard, n_key_planes=n_key_planes,
                          n_dev=n_dev, samples_per_dev=samples_per_dev,
                          capacity=capacity),
        mesh=mesh, in_specs=tuple([spec_p] * len(planes)),
        out_specs=tuple([spec_p] * (len(planes) + 3)), check_vma=False)
    return fn(*planes)


def distributed_order_by(table: Table, by, mesh: Mesh,
                         samples_per_dev: int = 128,
                         capacity_factor: float = 2.0,
                         capacity: int | None = None):
    """Multi-column ORDER BY over a mesh-sharded Table.

    Returns (sorted_table, pos, valid, overflow): per-device padded runs
    whose first valid[d] rows are real; concatenating the valid
    prefixes in mesh order is the globally ordered table. `pos` is each
    row's global input position (stability witness / restore handle).
    """
    spec = canon_by(by)
    kp, meta = key_planes(table, spec)
    key_names = {nm for nm, _ in spec}
    pay_names, payloads, kinds = [], [], []
    for nm in table:
        if nm in key_names:
            continue
        c = table[nm]
        pay_names.append(nm)
        if isinstance(c, U64):
            payloads += [c.lo, c.hi]
            kinds.append("u64")
        else:
            payloads.append(c.view(jnp.uint32)
                            if c.dtype != jnp.uint32 else c)
            kinds.append(str(c.dtype))
    res = _execute(tuple(kp) + tuple(payloads), mesh, len(kp),
                   samples_per_dev, capacity_factor, capacity)
    cols = reconstruct_keys(res[: len(kp)], meta)
    pos = res[len(kp)]
    i = len(kp) + 1
    for nm, kind in zip(pay_names, kinds):
        if kind == "u64":
            cols[nm] = U64(res[i], res[i + 1])
            i += 2
        else:
            c = res[i]
            cols[nm] = c.view(kind) if kind != "uint32" else c
            i += 1
    valid, overflow = res[i], res[i + 1]
    return (Table({nm: cols[nm] for nm in table}), pos, valid, overflow)


def distributed_order_by_numpy(cols_np: dict, by, mesh: Mesh, **kw):
    """Host wrapper: shard a numpy column dict, run, concatenate the
    per-device valid prefixes (the globally ordered table) and the
    position witness. capacity_factor="auto" plans demand first."""
    from tpu_qe.exchange.shuffle import pow2_capacity

    n_dev = mesh.shape[AXIS]
    sh = NamedSharding(mesh, P(AXIS))
    t = Table.from_numpy(cols_np)
    t = jax.tree.map(lambda c: jax.device_put(c, sh), t)
    if kw.get("capacity_factor") == "auto":
        kw = dict(kw)
        del kw["capacity_factor"]
        if n_dev > 1:
            demand = int(np.asarray(
                plan_order_by_capacity(
                    t, by, mesh,
                    samples_per_dev=kw.get("samples_per_dev", 128))).max())
            kw["capacity"] = pow2_capacity(demand)
    st, pos, valid, overflow = distributed_order_by(t, by, mesh, **kw)
    if int(np.asarray(overflow).max()):
        raise RuntimeError("exchange capacity overflow; raise "
                           "capacity_factor")
    valid = np.asarray(valid).reshape(n_dev)
    parts = st.to_numpy()
    out = {}
    for nm, flat in parts.items():
        rows = flat.reshape(n_dev, -1)
        out[nm] = np.concatenate([rows[d, : valid[d]]
                                  for d in range(n_dev)])
    posr = np.asarray(pos).reshape(n_dev, -1)
    out_pos = np.concatenate([posr[d, : valid[d]] for d in range(n_dev)])
    return out, out_pos
