"""Tests for the C++ native core (data gen, morton LUTs, CPU oracles).

Parity model: the reference's CPU unit tests (/root/reference/src/tests.rs)
— digit extraction across all passes, block-local stable rank, dispatch math —
plus ChaCha8 stream validation against the published keystream vector.
"""

import numpy as np
import pytest

from tpu_qe import native


class TestChaCha8:
    def test_raw_block_matches_published_vector(self):
        # ChaCha8 keystream, zero key, zero nonce, block 0 (djb test vector).
        out = native.chacha8_raw_block(bytes(32), 0).tobytes()
        assert out[:32].hex() == (
            "3e00ef2f895f40d67f5bb8e81f09a5a1"
            "2c840ec3ce9a7f3b181be188ef711a1e"
        )

    def test_stream_is_deterministic(self):
        a = native.chacha8_u32(7, 256)
        b = native.chacha8_u32(7, 256)
        assert (a == b).all()
        c = native.chacha8_u32(8, 256)
        assert (a != c).any()

    def test_f32_in_unit_interval(self):
        f = native.chacha8_f32(7, 10000)
        assert (f >= 0).all() and (f < 1).all()
        # 24-bit fraction grid (rand 0.8 Standard f32 semantics)
        assert np.allclose(f * (1 << 24), np.round(f * (1 << 24)))


class TestScene:
    def test_scene_shapes_and_ranges(self):
        v, t, smin, smax = native.scene_generate(1000, 3000, 7)
        assert v.shape == (1000, 3) and t.shape == (3000, 3)
        assert (t < 1000).all()
        assert (v >= 0).all() and (v < 1).all()

    def test_aabb_over_used_vertices_only(self):
        # reference tracks min/max over vertices referenced by triangles only
        # (/root/reference/src/main.rs:129-154)
        v, t, smin, smax = native.scene_generate(1000, 30, 7)
        used = np.unique(t.ravel())
        np.testing.assert_array_equal(smin, v[used].min(axis=0))
        np.testing.assert_array_equal(smax, v[used].max(axis=0))

    def test_deterministic(self):
        a = native.scene_generate(100, 300, 7)
        b = native.scene_generate(100, 300, 7)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


class TestMorton:
    def setup_method(self):
        self.v, self.t, smin, smax = native.scene_generate(1000, 3000, 7)
        self.gen = native.MortonGen(smin, smax)

    def test_lut_shapes_match_reference_layout(self):
        # 4608 = 9 groups x 256 bytes x (lo,hi); 8192 = 4096 x (lo,hi)
        # (/root/reference/src/main.rs:183,189)
        assert self.gen.lut_flat.shape == (4608,)
        assert self.gen.size_lut_flat.shape == (8192,)

    def test_lut_path_equals_direct_interleave(self):
        q = self.gen.quantize(self.v, self.t)
        np.testing.assert_array_equal(
            self.gen.encode(self.v, self.t), native.morton_encode_direct(q)
        )

    def test_quantized_ranges(self):
        q = self.gen.quantize(self.v, self.t)
        assert (q[:, :3] < (1 << native.COORD_BITS)).all()
        assert (q[:, 3] < (1 << native.SIZE_INDEX_BITS)).all()

    def test_spatial_ordering(self):
        # identical degenerate triangles at two corners: the near-origin one
        # must get the smaller code.
        v = np.array(
            [[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]], dtype=np.float32
        )
        t = np.array([[0, 0, 0], [1, 1, 1]], dtype=np.uint32)
        g = native.MortonGen(v.min(axis=0), v.max(axis=0))
        c = g.encode(v, t)
        assert c[0] < c[1]

    def test_bit_budget(self):
        # every code uses only the defined 64-bit layout; x MSB is bit 63
        q = np.array([[(1 << 20) - 1, 0, 0, 0]], dtype=np.uint32)
        c = native.morton_encode_direct(q)
        assert c[0] >> 63 == 1


class TestDigitOracles:
    def test_digit_8(self):
        # parity with reference digit_test_8 (/root/reference/src/tests.rs:133-143)
        for i in range(8):
            y = (255 << (i * 8)) & ((1 << 64) - 1)
            assert native.select_digit8(i, y & 0xFFFFFFFF, y >> 32) == 255

    def test_digit_6(self):
        # parity with reference digit_test (/root/reference/src/tests.rs:116-130)
        for i in range(11):
            y = (63 << (i * 6)) & ((1 << 64) - 1)
            got = native.select_digit6(i, y & 0xFFFFFFFF, y >> 32)
            assert got == (63 if i < 10 else 15)


class TestOracleSort:
    @pytest.mark.parametrize("n", [0, 1, 255, 256, 257, 1023, 1024, 1025, 3000])
    def test_matches_numpy_stable(self, n):
        rng = np.random.default_rng(n)
        keys = rng.integers(0, 1 << 64, size=n, dtype=np.uint64)
        payload = np.arange(n, dtype=np.uint32)
        k, p = native.lsd_sort(keys, payload)
        order = np.argsort(keys, kind="stable")
        np.testing.assert_array_equal(k, keys[order])
        np.testing.assert_array_equal(p, order.astype(np.uint32))

    def test_partial_passes_sort_low_bits_only(self):
        rng = np.random.default_rng(0)
        keys = rng.integers(0, 1 << 64, size=1000, dtype=np.uint64)
        k = native.lsd_sort(keys, num_passes=2)
        masked = k & np.uint64(0xFFFF)
        assert (np.diff(masked.astype(np.int64)) >= 0).all()


class TestBlockOracles:
    def test_block_rank_counting(self):
        # stable rank among equal digits — semantics of the reference's
        # ballot-based workgroup_local_index_test (tests.rs:31-102)
        rng = np.random.default_rng(7)
        for _ in range(20):
            digits = rng.integers(0, 256, size=256).astype(np.uint32)
            ranks = native.block_rank(digits, 256)
            hist = np.bincount(digits, minlength=256)
            base = np.concatenate([[0], np.cumsum(hist)[:-1]])
            out = np.empty(256, dtype=np.uint32)
            out[base[digits] + ranks] = digits
            assert (np.diff(out.astype(np.int64)) >= 0).all()

    def test_digit_major_histogram_layout(self):
        keys = np.arange(600, dtype=np.uint64)
        hist = native.digit_major_histogram(keys, 0, 8, 256)
        assert hist.shape == (256, 3)
        # block 0 holds keys 0..255: one of each digit
        np.testing.assert_array_equal(hist[:, 0], np.ones(256))
        # block 2 holds keys 512..599 -> digits 0..87
        np.testing.assert_array_equal(hist[:88, 2], np.ones(88))
        np.testing.assert_array_equal(hist[88:, 2], np.zeros(168))

    def test_scatter_locations_sort_one_pass(self):
        rng = np.random.default_rng(3)
        keys = rng.integers(0, 1 << 64, size=3000, dtype=np.uint64)
        locs = native.scatter_locations(keys, 0, 8, 256)
        assert np.array_equal(np.sort(locs), np.arange(3000))
        out = np.empty_like(keys)
        out[locs] = keys
        digits = (out & np.uint64(0xFF)).astype(np.int64)
        assert (np.diff(digits) >= 0).all()
        # stability: within a digit, original order preserved
        src = np.empty(3000, dtype=np.int64)
        src[locs] = np.arange(3000)
        for d in range(256):
            seg = src[digits == d]
            assert (np.diff(seg) > 0).all()


class TestPipelineOracle:
    def test_end_to_end_sorted_and_stable(self):
        codes, idx = native.pipeline_oracle(1000, 3000, 7)
        assert (np.diff(codes.astype(np.uint64)).astype(np.int64) >= 0).all()
        # permutation of all triangle ids
        assert np.array_equal(np.sort(idx), np.arange(3000))


def test_scene_generate_rejects_zero_vertices():
    import pytest
    with pytest.raises(ValueError, match="num_vertices"):
        native.scene_generate(0, 5, 7)
