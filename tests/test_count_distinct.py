"""COUNT(DISTINCT value) GROUP BY key vs a numpy dedup oracle.

The operator rides group_aggregate's (key, value) sort: a distinct-pair
boundary cumsum differenced at group ends (ops/aggregate.py). Reference
scope note: GROUP BY families are engine extensions beyond the reference
sort pipeline (SURVEY.md §2c); the sort itself mirrors
/root/reference/src/main.rs radix dataflow.
"""

import numpy as np
import pytest

from tpu_qe.bits import U64
from tpu_qe.ops.aggregate import (group_aggregate, group_aggregate_multi,
                                  group_aggregate_sorted)


def _oracle(keys, values, valid=None):
    """unique key -> number of distinct value BIT PATTERNS (u32 view)."""
    if valid is not None:
        keys, values = keys[valid], values[valid]
    bits = values.view(np.uint32) if values.dtype != np.uint32 else values
    out = {}
    for k in np.unique(keys):
        out[int(k)] = len(np.unique(bits[keys == k]))
    return out


def _got(res):
    ng = int(res.num_groups)
    klo = np.asarray(res.key.lo)[:ng]
    khi = np.asarray(res.key.hi)[:ng].astype(np.uint64)
    cd = np.asarray(res.aggs["count_distinct"])[:ng]
    return {int((h << np.uint64(32)) | np.uint64(l)): int(c)
            for h, l, c in zip(khi, klo, cd)}


def _u64(keys64):
    k = keys64.astype(np.uint64)
    return U64(k.astype(np.uint32), (k >> np.uint64(32)).astype(np.uint32))


def test_known_small():
    keys = np.array([5, 5, 5, 9, 9, 2], dtype=np.uint64)
    vals = np.array([7, 7, 3, 1, 1, 4], dtype=np.uint32)
    res = group_aggregate(_u64(keys), vals, aggs=("count", "count_distinct"))
    assert _got(res) == {5: 2, 9: 1, 2: 1}
    ng = int(res.num_groups)
    assert list(np.asarray(res.aggs["count"])[:ng]) == [1, 3, 2]  # keys 2,5,9


@pytest.mark.parametrize("n", [1, 255, 256, 257, 1024, 5000])
@pytest.mark.parametrize("vrange", [1, 4, 1 << 30])
def test_fuzz_int(n, vrange):
    rng = np.random.default_rng(n * 31 + vrange)
    keys = rng.integers(0, max(n // 8, 2), n).astype(np.uint64) << np.uint64(33)
    vals = rng.integers(0, vrange, n, dtype=np.int64).astype(np.uint32)
    res = group_aggregate(_u64(keys), vals, aggs=("count_distinct",))
    assert _got(res) == _oracle(keys, vals)


def test_fuzz_with_valid_and_other_aggs():
    rng = np.random.default_rng(7)
    n = 3000
    keys = rng.integers(0, 50, n).astype(np.uint64)
    vals = rng.integers(0, 9, n, dtype=np.int64).astype(np.uint32)
    valid = rng.random(n) < 0.6
    res = group_aggregate(_u64(keys), vals, valid=valid,
                          aggs=("count", "sum", "min", "max",
                                "count_distinct"))
    assert _got(res) == _oracle(keys, vals, valid)
    # cross-check another agg rode along unharmed
    ng = int(res.num_groups)
    klo = np.asarray(res.key.lo)[:ng]
    mx = np.asarray(res.aggs["max"])[:ng]
    for k, m in zip(klo, mx):
        assert m == vals[valid & (keys == k)].max()


def test_float_bit_semantics():
    keys = np.zeros(6, dtype=np.uint64)
    vals = np.array([0.0, -0.0, 1.5, 1.5, -2.0, np.inf], dtype=np.float32)
    res = group_aggregate(_u64(keys), vals, aggs=("count_distinct",))
    # -0.0 and +0.0 are distinct bit patterns (documented semantics)
    assert _got(res) == {0: 5}


@pytest.mark.parametrize("max_groups", [4, 50, 64])
def test_max_groups_path(max_groups):
    rng = np.random.default_rng(max_groups)
    n = 2000
    keys = rng.integers(0, 40, n).astype(np.uint64)
    vals = rng.integers(0, 6, n, dtype=np.int64).astype(np.uint32)
    res = group_aggregate(_u64(keys), vals,
                          aggs=("count", "count_distinct"),
                          max_groups=max_groups)
    want = _oracle(keys, vals)
    if max_groups >= len(want):
        assert int(res.overflow) == 0
        assert _got(res) == want
    else:
        assert int(res.overflow) == 1
        assert int(res.num_groups) == len(want)


def test_all_equal_all_distinct_and_empty():
    n = 512
    keys = np.full(n, 3, dtype=np.uint64)
    same = np.full(n, 9, dtype=np.uint32)
    res = group_aggregate(_u64(keys), same, aggs=("count_distinct",))
    assert _got(res) == {3: 1}
    uniq = np.arange(n, dtype=np.uint32)
    res = group_aggregate(_u64(keys), uniq, aggs=("count_distinct",))
    assert _got(res) == {3: n}
    res = group_aggregate(_u64(np.zeros(0, np.uint64)),
                          np.zeros(0, np.uint32), aggs=("count_distinct",))
    assert int(res.num_groups) == 0


def test_rejected_paths():
    k = _u64(np.zeros(8, np.uint64))
    v = np.zeros(8, np.uint32)
    with pytest.raises(ValueError, match="value-sorted"):
        group_aggregate_sorted(k, v, aggs=("count_distinct",))
    with pytest.raises(ValueError, match="multi-column"):
        group_aggregate_multi(k, {"v": v}, {"v": ("count_distinct",)})
    with pytest.raises(ValueError, match="value column required"):
        group_aggregate(k, None, aggs=("count_distinct",))


def test_table_api():
    from tpu_qe.table import Table
    rng = np.random.default_rng(1)
    n = 1000
    keys = rng.integers(0, 20, n).astype(np.uint64)
    vals = rng.integers(0, 5, n, dtype=np.int64).astype(np.uint32)
    t = Table.from_numpy({"key": keys, "v": vals})
    res = t.group_by("key", "v", aggs=("count_distinct",))
    assert _got(res) == _oracle(keys, vals)
    uk, num = t.distinct("key")
    assert list(np.asarray(uk.lo)[: int(num)]) == sorted(set(keys.tolist()))
