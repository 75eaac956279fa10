"""Pallas morton LUT kernel vs the jnp LUT path and the native builder."""

from __future__ import annotations

import numpy as np

from tpu_qe import morton, native
from tpu_qe.kernels.morton import encode_quantized_lut as pallas_encode


def _params(seed=7):
    verts, tris, smin, smax = native.scene_generate(200, 600, seed)
    return morton.MortonParams.for_scene(smin, smax), verts, tris


def test_matches_jnp_lut_path():
    import jax.numpy as jnp

    params, verts, tris = _params()
    rng = np.random.default_rng(0)
    n = 8 * 128 * 3
    q = rng.integers(0, 1 << 20, (n, 3), dtype=np.uint32)
    j = rng.integers(0, 1 << 12, n, dtype=np.uint32)
    got = pallas_encode(jnp.asarray(q), jnp.asarray(j),
                        params.lut_lo, params.lut_hi, block_rows=8)
    want = morton.encode_quantized_lut(jnp.asarray(q), jnp.asarray(j), params)
    np.testing.assert_array_equal(np.asarray(got.lo), np.asarray(want.lo))
    np.testing.assert_array_equal(np.asarray(got.hi), np.asarray(want.hi))


def test_matches_native_end_to_end():
    import jax.numpy as jnp

    params, verts, tris = _params(seed=11)
    gen = native.MortonGen(
        np.asarray(params.offset),  # offset == scene_min in the builder
        np.asarray(params.offset) + 1.0 / np.asarray(params.multiplier)
        * (1 << 20))
    # quantize on device, encode via pallas, compare with the direct path
    q, j = morton.quantize(jnp.asarray(verts),
                           jnp.asarray(tris.astype(np.int32)), params)
    n = q.shape[0]
    pad = -(-n // 1024) * 1024 - n
    qp = jnp.pad(q, ((0, pad), (0, 0)))
    jp = jnp.pad(j, (0, pad))
    got = pallas_encode(qp, jp, params.lut_lo, params.lut_hi, block_rows=8)
    want = morton.encode_quantized(q, j)
    np.testing.assert_array_equal(np.asarray(got.lo)[:n], np.asarray(want.lo))
    np.testing.assert_array_equal(np.asarray(got.hi)[:n], np.asarray(want.hi))


def test_encode_points_matches_degenerate_triangles():
    """A point == a degenerate triangle (all three vertices equal, size 0)."""
    import jax.numpy as jnp

    params, _, _ = _params(seed=3)
    rng = np.random.default_rng(4)
    pts = rng.uniform(-1, 1, (500, 3)).astype(np.float32) * 50
    # degenerate triangles: each references one vertex three times
    tris = np.repeat(np.arange(500, dtype=np.int32)[:, None], 3, axis=1)
    want = morton.encode(jnp.asarray(pts), jnp.asarray(tris), params)
    got = morton.encode_points(jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]),
                               jnp.asarray(pts[:, 2]), params)
    np.testing.assert_array_equal(np.asarray(got.lo), np.asarray(want.lo))
    np.testing.assert_array_equal(np.asarray(got.hi), np.asarray(want.hi))
