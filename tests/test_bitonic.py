"""Bitonic chunk-sort kernel tests (interpret mode on the CPU backend)."""

from __future__ import annotations

import numpy as np
import pytest

from tpu_qe.kernels.bitonic import sort_chunks


def _to_u64(lo, hi):
    return (np.asarray(lo).astype(np.uint64)
            | (np.asarray(hi).astype(np.uint64) << np.uint64(32)))


@pytest.mark.parametrize("rows,nb", [(8, 3), (16, 2), (64, 1)])
def test_sort_chunks_sorts_each_chunk(rows, nb):
    n = rows * 128
    rng = np.random.default_rng(42)
    lo = rng.integers(0, 1 << 32, (nb, n), dtype=np.uint32)
    hi = rng.integers(0, 1 << 32, (nb, n), dtype=np.uint32)
    pay = np.arange(nb * n, dtype=np.uint32).reshape(nb, n)
    slo, shi, spay = sort_chunks(lo, hi, pay, rows=rows)
    got = _to_u64(slo, shi)
    ref = _to_u64(lo, hi)
    for b in range(nb):
        assert np.array_equal(np.sort(ref[b]), got[b])
        # payload travels with its key
        order = {int(k): int(p) for k, p in zip(ref[b], pay[b])}
        assert all(order[int(k)] == int(p)
                   for k, p in zip(got[b], np.asarray(spay[b])))


def test_sort_chunks_duplicates_and_extremes():
    rows, n = 8, 1024
    lo = np.zeros((1, n), dtype=np.uint32)
    hi = np.zeros((1, n), dtype=np.uint32)
    lo[0, : n // 2] = 0xFFFFFFFF
    hi[0, : n // 4] = 0xFFFFFFFF
    slo, shi = sort_chunks(lo, hi, rows=rows)
    got = _to_u64(slo, shi)[0]
    assert np.array_equal(np.sort(_to_u64(lo, hi)[0]), got)


def test_sort_chunks_no_payload_many_chunks():
    rows, nb = 8, 5
    n = rows * 128
    rng = np.random.default_rng(7)
    lo = rng.integers(0, 1 << 32, (nb, n), dtype=np.uint32)
    hi = rng.integers(0, 4, (nb, n), dtype=np.uint32)  # heavy hi-word ties
    slo, shi = sort_chunks(lo, hi, rows=rows)
    got = _to_u64(slo, shi)
    ref = _to_u64(lo, hi)
    for b in range(nb):
        assert np.array_equal(np.sort(ref[b]), got[b])
