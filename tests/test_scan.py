"""Grid-sequential Pallas exclusive scan vs numpy (interpret mode)."""

import numpy as np
import pytest

from tpu_qe.kernels.scan import exclusive_scan


@pytest.mark.parametrize("n", [1024, 8192, 3 * 8192, 1 << 16])
def test_exclusive_scan_matches_numpy(n):
    rng = np.random.default_rng(n)
    x = rng.integers(0, 1 << 16, n, dtype=np.uint32)
    got = np.asarray(exclusive_scan(x))
    want = (np.cumsum(x, dtype=np.uint32) - x)
    np.testing.assert_array_equal(got, want)


def test_exclusive_scan_wraparound():
    x = np.full(2048, 0xF0000000, dtype=np.uint32)
    got = np.asarray(exclusive_scan(x))
    want = np.cumsum(x, dtype=np.uint32) - x  # wraps mod 2^32
    np.testing.assert_array_equal(got, want)


def test_carry_crosses_blocks():
    # multiple grid steps: values chosen so block sums differ
    n = 4 * 1024
    x = np.arange(n, dtype=np.uint32)
    got = np.asarray(exclusive_scan(x, block_rows=8))
    np.testing.assert_array_equal(got, np.cumsum(x, dtype=np.uint32) - x)
