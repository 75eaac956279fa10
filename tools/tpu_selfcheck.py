#!/usr/bin/env python
"""On-chip self-check: every Pallas kernel + sort backend, compiled on the
real TPU, validated against its CPU/C++ oracle.

The pytest suite runs kernels in interpret mode on the CPU backend (fast,
deterministic); this script is the complement — it exercises the MOSAIC-
compiled kernels on actual hardware. Run manually or from CI-with-TPU:

    python tools/tpu_selfcheck.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def check(name, fn):
    try:
        fn()
        print(f"PASS  {name}")
        return True
    except Exception as e:
        print(f"FAIL  {name}: {type(e).__name__}: {str(e)[:140]}")
        return False


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tpu_qe import morton, native
        from tpu_qe.kernels.bitonic import sort_chunks
    from tpu_qe.kernels.histogram import (block_histogram,
                                          block_rank_and_histogram)
    from tpu_qe.kernels.morton import encode_quantized_lut as pallas_lut
    from tpu_qe.kernels.rank_mxu import block_rank_and_histogram_mxu
    from tpu_qe.kernels.scan import exclusive_scan
    from tpu_qe.sort import sort_u64_numpy

    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(7)
    ok = True

    def c_hist():
        lo = rng.integers(0, 1 << 32, (4, 4096), dtype=np.uint32)
        hi = rng.integers(0, 1 << 32, (4, 4096), dtype=np.uint32)
        got = np.asarray(block_histogram(lo, hi, 16, 8))
        keys = lo.astype(np.uint64) | (hi.astype(np.uint64) << 32)
        want = native.digit_major_histogram(keys.reshape(-1), 2, 8, 4096)
        np.testing.assert_array_equal(got, want)
    ok &= check("block_histogram vs C++ oracle", c_hist)

    def c_rank():
        lo = rng.integers(0, 1 << 32, (2, 2048), dtype=np.uint32)
        hi = rng.integers(0, 1 << 32, (2, 2048), dtype=np.uint32)
        r1, h1 = block_rank_and_histogram(lo, hi, 40, 8)
        r2, h2 = block_rank_and_histogram_mxu(lo, hi, 40)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    ok &= check("rank VPU == rank MXU (on-chip)", c_rank)

    def c_scan():
        x = rng.integers(0, 1 << 16, 1 << 14, dtype=np.uint32)
        got = np.asarray(exclusive_scan(x, block_rows=8))
        np.testing.assert_array_equal(got, np.cumsum(x, dtype=np.uint32) - x)
    ok &= check("exclusive_scan vs numpy", c_scan)

    def c_bitonic():
        lo = rng.integers(0, 1 << 32, (4, 8192), dtype=np.uint32)
        hi = rng.integers(0, 1 << 32, (4, 8192), dtype=np.uint32)
        slo, shi = sort_chunks(lo, hi, rows=64)
        got = (np.asarray(slo).astype(np.uint64)
               | (np.asarray(shi).astype(np.uint64) << 32))
        ref = lo.astype(np.uint64) | (hi.astype(np.uint64) << 32)
        for b in range(4):
            np.testing.assert_array_equal(np.sort(ref[b]), got[b])
    ok &= check("bitonic chunk sort", c_bitonic)

    def c_morton():
        verts, tris, smin, smax = native.scene_generate(200, 600, 7)
        params = morton.MortonParams.for_scene(smin, smax)
        q = rng.integers(0, 1 << 20, (2048, 3), dtype=np.uint32)
        j = rng.integers(0, 1 << 12, 2048, dtype=np.uint32)
        got = pallas_lut(jnp.asarray(q), jnp.asarray(j), params.lut_lo,
                         params.lut_hi, block_rows=8)
        want = native.morton_encode_direct(
            np.concatenate([q, j[:, None]], axis=1))
        got64 = (np.asarray(got.lo).astype(np.uint64)
                 | (np.asarray(got.hi).astype(np.uint64) << 32))
        np.testing.assert_array_equal(got64, want)
    ok &= check("pallas morton LUT vs C++ direct encode", c_morton)

    def c_backends():
        keys = rng.integers(0, 1 << 64, 200_000, dtype=np.uint64)
        pay = np.arange(len(keys), dtype=np.uint32)
        want_k, want_p = native.lsd_sort(keys, pay)
        for backend in ("xla", "xla_tiebreak", "hybrid"):
            got_k, got_p = sort_u64_numpy(keys, pay, backend=backend)
            np.testing.assert_array_equal(got_k, want_k, err_msg=backend)
            np.testing.assert_array_equal(got_p, want_p, err_msg=backend)
    ok &= check("sort backends vs C++ oracle (200K keys)", c_backends)

    def c_pipeline():
        from tpu_qe.pipeline import build_scene_index
        idx = build_scene_index()
        codes, order = native.pipeline_oracle(1000, 3000, 7)
        np.testing.assert_array_equal(idx.code.to_numpy(), codes)
        np.testing.assert_array_equal(np.asarray(idx.order), order)
    ok &= check("flagship pipeline vs C++ oracle", c_pipeline)

    print("SELFCHECK", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
