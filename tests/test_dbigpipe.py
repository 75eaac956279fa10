"""Fused distributed x out-of-core join -> GROUP BY vs the bigjoin
data-model oracle and the single-chip fused pipeline
(ops/dbigpipe.py)."""

import numpy as np
import pytest

from tpu_qe.exchange import make_mesh
from tpu_qe.hashing import keygen_hash_numpy, murmur_fmix32_numpy
from tpu_qe.ops.bigpipe import group_of_join_key_numpy, join_aggregate_big
from tpu_qe.ops.dbigpipe import join_aggregate_big_distributed


def _oracle(n_l, n_r, n_groups):
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


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_matches_oracle(n_dev):
    mesh = make_mesh(n_dev)
    n, rs, g = 1 << 13, 1 << 10, 1 << 7
    res, table = join_aggregate_big_distributed(
        n, n, mesh, n_groups=g, run_size=rs, collect=True)
    assert res.all_ok, res
    wk, wc, ws = _oracle(n, n, g)
    np.testing.assert_array_equal(table["key"], wk)
    np.testing.assert_array_equal(table["count"], wc)
    np.testing.assert_array_equal(table["sum"], ws)  # exact u64


def test_matches_singlechip_fused():
    n, rs, g = 1 << 12, 1 << 10, 1 << 6
    mesh = make_mesh(4)
    res_d, t_d = join_aggregate_big_distributed(
        n, n, mesh, n_groups=g, run_size=rs, collect=True)
    res_s, t_s = join_aggregate_big(n, n, n_groups=g, n_buckets=4,
                                    collect=True)
    assert res_d.all_ok and res_s.all_ok
    for nm in ("key", "count", "sum"):
        np.testing.assert_array_equal(t_d[nm], t_s[nm], err_msg=nm)


def test_d1_delegates():
    mesh1 = make_mesh(1)
    n, rs = 1 << 12, 1 << 10
    res = join_aggregate_big_distributed(n, n, mesh1, n_groups=64,
                                         run_size=rs)
    from tpu_qe.ops.bigpipe import BigPipeResult
    assert isinstance(res, BigPipeResult) and res.all_ok


def test_asymmetric_sides():
    mesh = make_mesh(4)
    rs = 1 << 10
    res, table = join_aggregate_big_distributed(
        1 << 13, 1 << 12, mesh, n_groups=32, run_size=rs, collect=True)
    assert res.all_ok
    wk, wc, ws = _oracle(1 << 13, 1 << 12, 32)
    np.testing.assert_array_equal(table["key"], wk)
    np.testing.assert_array_equal(table["sum"], ws)
