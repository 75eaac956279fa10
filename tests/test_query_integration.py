"""End-to-end query composition: the engine's operators chained like SQL.

Workload (TPC-H flavored, scaled down):

    SELECT o.region, count(*), sum(l.amount), max(l.amount)
    FROM lineitem l JOIN orders o ON l.order_key = o.order_key
    WHERE l.quantity < Q
    GROUP BY o.region

lineitem rows carry morton-style 64-bit order keys; orders is the unique
(FK) side. Every step runs through the public Table API and the result is
checked against a pandas-free numpy reimplementation.
"""

from __future__ import annotations

import collections

import jax.numpy as jnp
import numpy as np

from tpu_qe.bits import U64
from tpu_qe.table import Table


def test_filter_join_groupby_pipeline():
    rng = np.random.default_rng(99)
    n_orders = 1 << 10
    n_items = 1 << 13

    order_keys = np.unique(
        rng.integers(0, 1 << 48, 2 * n_orders, dtype=np.uint64))[:n_orders]
    regions = rng.integers(0, 5, n_orders, dtype=np.uint32)
    orders = Table.from_numpy({"key": order_keys, "region": regions})

    item_order = order_keys[rng.integers(0, n_orders, n_items)]
    quantity = rng.integers(0, 100, n_items, dtype=np.uint32)
    amount = rng.integers(1, 10_000, n_items, dtype=np.uint32)
    lineitem = Table.from_numpy({
        "key": item_order, "quantity": quantity, "amount": amount})

    # WHERE quantity < 42  (compaction keeps selected rows in front)
    filtered, count = lineitem.filter(
        lambda t: t["quantity"] < jnp.uint32(42))
    n_sel = int(count)

    # JOIN orders (FK: order keys unique)
    joined, matched = filtered.join(orders, key="key")
    assert bool(np.all(np.asarray(matched)[:n_sel]))

    # GROUP BY region: count(*), sum(amount), max(amount), over the
    # selected prefix only (fused valid mask instead of slicing)
    sel_mask = jnp.arange(filtered.num_rows) < count
    region_key = U64(joined["region"], jnp.zeros_like(joined["region"]))
    from tpu_qe.ops.aggregate import group_aggregate_multi
    res = group_aggregate_multi(
        region_key, {"amount": joined["amount"]},
        {"amount": ("count", "sum", "max")}, valid=sel_mask)

    # numpy oracle
    sel = quantity < 42
    pos = {int(k): int(r) for k, r in zip(order_keys, regions)}
    want_cnt = collections.Counter()
    want_sum = collections.defaultdict(int)
    want_max = collections.defaultdict(int)
    for k, a in zip(item_order[sel], amount[sel]):
        r = pos[int(k)]
        want_cnt[r] += 1
        want_sum[r] += int(a)
        want_max[r] = max(want_max[r], int(a))

    ng = int(res.num_groups)
    assert ng == len(want_cnt)
    got_regions = res.key.to_numpy()[:ng]
    assert sorted(got_regions) == sorted(want_cnt)
    for i, r in enumerate(got_regions):
        assert int(np.asarray(res.aggs["amount_count"])[i]) == want_cnt[r]
        assert int(res.aggs["amount_sum"].to_numpy()[i]) == want_sum[r]
        assert int(np.asarray(res.aggs["amount_max"])[i]) == want_max[r]


def test_pipeline_then_query():
    """The reference's domain meets the query layer: morton-index a scene,
    then GROUP BY coarse morton cell to count triangles per spatial bucket."""
    import jax.numpy as jnp

    from tpu_qe.pipeline import build_scene_index

    idx = build_scene_index()
    # coarse cell = top 16 bits of the sorted morton codes
    cell = U64(idx.code.hi >> 16, jnp.zeros_like(idx.code.hi))
    from tpu_qe.ops.aggregate import group_aggregate
    g = group_aggregate(cell, aggs=("count",))
    ng = int(g.num_groups)
    counts = np.asarray(g.aggs["count"])[:ng]
    assert counts.sum() == 3000
    codes = idx.code.to_numpy()
    want = collections.Counter(int(c) >> 48 for c in codes)
    got = {int(k): int(c) for k, c in zip(g.key.to_numpy()[:ng], counts)}
    assert got == dict(want)
