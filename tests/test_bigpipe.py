"""Fused out-of-core join -> GROUP BY (ops/bigpipe.py) vs numpy oracle."""

import numpy as np
import pytest

from tpu_qe.ops.bigpipe import group_of_join_key_numpy, join_aggregate_big
from tpu_qe.hashing import keygen_hash_numpy, murmur_fmix32_numpy




def _oracle(n_l, n_r, n_groups):
    """GROUP BY of the joined values over the construction's match set
    (bigjoin data model: matches are exactly the even left indices)."""
    j = np.arange(n_l, dtype=np.uint32)
    i = (j * np.uint32(2654435761)) % np.uint32(n_r)
    lkeys = keygen_hash_numpy(i) & ~np.uint64(1)
    matched = (j % 2) == 0
    vals = murmur_fmix32_numpy(
        (lkeys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        ^ (lkeys >> np.uint64(32)).astype(np.uint32)
        ^ np.uint32(0xABCD1234)).astype(np.uint64)
    g = group_of_join_key_numpy(lkeys, n_groups)
    cnt = np.zeros(n_groups, np.int64)
    np.add.at(cnt, g[matched], 1)
    sums = np.zeros(n_groups, np.uint64)
    np.add.at(sums, g[matched], vals[matched])
    keep = cnt > 0
    return (np.nonzero(keep)[0].astype(np.uint32),
            cnt[keep].astype(np.uint32), sums[keep])


@pytest.mark.parametrize("n_l,n_r,g,b", [
    (1 << 12, 1 << 12, 1 << 8, 2),
    (1 << 13, 1 << 11, 1 << 6, 4),    # left-heavy, few groups
    (1 << 11, 1 << 13, 1 << 12, 3),   # right-heavy, many groups
])
def test_join_aggregate_big_oracle(n_l, n_r, g, b):
    res, table = join_aggregate_big(n_l, n_r, n_groups=g, n_buckets=b,
                                    collect=True)
    assert res.all_ok, res
    assert res.matched == (n_l + 1) // 2
    okey, ocnt, osum = _oracle(n_l, n_r, g)
    assert np.array_equal(table["key"], okey)
    assert np.array_equal(table["count"], ocnt)
    assert np.array_equal(table["sum"], osum)


def test_single_group():
    res, table = join_aggregate_big(1 << 12, 1 << 12, n_groups=1,
                                    n_buckets=2, collect=True)
    assert res.all_ok
    assert table["count"][0] == 1 << 11
