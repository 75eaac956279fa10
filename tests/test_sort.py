"""Sort driver + kernel tests against the C++ oracle.

Test strategy per SURVEY.md §4: scalar oracles for every kernel's tricky
sub-algorithm plus end-to-end bit-exactness on seeded random data, with
property tests over sizes straddling block/tile boundaries.
"""

import numpy as np
import pytest

from tpu_qe import native
from tpu_qe.bits import U64
from tpu_qe.kernels.histogram import block_histogram, block_rank_and_histogram
from tpu_qe.sort import sort_u64_numpy


def _rand_keys(n, seed=0, bits=64):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << bits, size=n, dtype=np.uint64)


def _blocked(keys, block):
    n = len(keys)
    nb = -(-n // block)
    padded = np.full(nb * block, 0xFFFFFFFFFFFFFFFF, dtype=np.uint64)
    padded[:n] = keys
    lo = (padded & np.uint64(0xFFFFFFFF)).astype(np.uint32).reshape(nb, block)
    hi = (padded >> np.uint64(32)).astype(np.uint32).reshape(nb, block)
    return lo, hi, padded


class TestBlockHistogramKernel:
    @pytest.mark.parametrize("shift,bits", [(0, 8), (8, 8), (28, 8), (32, 8),
                                            (56, 8), (0, 6), (30, 6), (0, 4)])
    def test_matches_oracle(self, shift, bits):
        keys = _rand_keys(4096, seed=shift * 64 + bits)
        block = 1024
        lo, hi, padded = _blocked(keys, block)
        got = np.asarray(block_histogram(lo, hi, shift, bits))
        want = native.digit_major_histogram(
            (padded >> np.uint64(shift)) & np.uint64((1 << bits) - 1),
            0, bits, block)
        np.testing.assert_array_equal(got, want)

    def test_counts_sum_to_n(self):
        keys = _rand_keys(8192, seed=1)
        lo, hi, _ = _blocked(keys, 2048)
        hist = np.asarray(block_histogram(lo, hi, 16, 8))
        assert hist.sum() == 8192
        assert hist.shape == (256, 4)


class TestBlockRankKernel:
    @pytest.mark.parametrize("shift,bits", [(0, 8), (24, 8), (28, 8), (60, 4)])
    def test_ranks_match_counting_oracle(self, shift, bits):
        keys = _rand_keys(2048, seed=9)
        block = 1024
        lo, hi, padded = _blocked(keys, block)
        ranks, hist = block_rank_and_histogram(lo, hi, shift, bits)
        ranks, hist = np.asarray(ranks), np.asarray(hist)
        digits = ((padded >> np.uint64(shift)) &
                  np.uint64((1 << bits) - 1)).astype(np.uint32)
        for b in range(2):
            want = native.block_rank(digits[b * block:(b + 1) * block],
                                     1 << bits)
            np.testing.assert_array_equal(ranks[b], want)
        want_hist = native.digit_major_histogram(digits, 0, bits, block)
        np.testing.assert_array_equal(hist, want_hist)


class TestSortDrivers:
    @pytest.mark.parametrize("backend", ["xla", "hybrid"])
    @pytest.mark.parametrize("n", [1, 255, 256, 1023, 1024, 1025, 3000, 20000])
    def test_full_u64_sort_bit_exact(self, backend, n):
        keys = _rand_keys(n, seed=n)
        payload = np.arange(n, dtype=np.uint32)
        k, p = sort_u64_numpy(keys, payload, backend=backend, block=1024)
        order = np.argsort(keys, kind="stable")
        np.testing.assert_array_equal(k, keys[order])
        np.testing.assert_array_equal(p, order.astype(np.uint32))

    @pytest.mark.parametrize("backend", ["xla", "hybrid"])
    def test_matches_cpp_oracle(self, backend):
        keys = _rand_keys(3000, seed=7)
        payload = np.arange(3000, dtype=np.uint32)
        ok, op = native.lsd_sort(keys, payload)
        k, p = sort_u64_numpy(keys, payload, backend=backend, block=1024)
        np.testing.assert_array_equal(k, ok)
        np.testing.assert_array_equal(p, op)

    @pytest.mark.parametrize("backend", ["xla", "hybrid"])
    def test_partial_key_bits_stable(self, backend):
        # Sorting by the low 16 bits only: equal-digit elements keep input
        # order (stability), and only masked bits are ordered — semantics of
        # the reference's select_bits verification (main.rs:1042-1051).
        keys = _rand_keys(5000, seed=3)
        payload = np.arange(5000, dtype=np.uint32)
        k, p = sort_u64_numpy(keys, payload, backend=backend, key_bits=16,
                              block=1024)
        masked = k & np.uint64(0xFFFF)
        assert (np.diff(masked.astype(np.int64)) >= 0).all()
        order = np.argsort(keys & np.uint64(0xFFFF), kind="stable")
        np.testing.assert_array_equal(p, order.astype(np.uint32))
        np.testing.assert_array_equal(k, keys[order])

    @pytest.mark.parametrize("backend", ["xla", "hybrid"])
    def test_duplicate_heavy_keys(self, backend):
        rng = np.random.default_rng(11)
        keys = rng.integers(0, 4, size=4000, dtype=np.uint64)
        payload = np.arange(4000, dtype=np.uint32)
        k, p = sort_u64_numpy(keys, payload, backend=backend, block=1024)
        order = np.argsort(keys, kind="stable")
        np.testing.assert_array_equal(p, order.astype(np.uint32))

    def test_hybrid_6bit_digits(self):
        keys = _rand_keys(3000, seed=5)
        payload = np.arange(3000, dtype=np.uint32)
        k, p = sort_u64_numpy(keys, payload, backend="hybrid",
                              bits_per_pass=6, block=1024)
        order = np.argsort(keys, kind="stable")
        np.testing.assert_array_equal(k, keys[order])
        np.testing.assert_array_equal(p, order.astype(np.uint32))

    def test_multiple_payload_columns(self):
        import jax.numpy as jnp
        from tpu_qe.sort import sort_u64
        keys = _rand_keys(2000, seed=2)
        p1 = np.arange(2000, dtype=np.uint32)
        p2 = (np.arange(2000, dtype=np.uint32) * 7) % 2000
        k, (s1, s2) = sort_u64(U64.from_numpy(keys), jnp.asarray(p1),
                               jnp.asarray(p2), backend="hybrid", block=1024)
        order = np.argsort(keys, kind="stable")
        np.testing.assert_array_equal(np.asarray(s1), p1[order])
        np.testing.assert_array_equal(np.asarray(s2), p2[order])


class TestMortonJax:
    def test_quantize_and_encode_match_native(self):
        import jax.numpy as jnp
        from tpu_qe import morton
        v, t, smin, smax = native.scene_generate(1000, 3000, 7)
        gen = native.MortonGen(smin, smax)
        params = morton.MortonParams.from_native(gen)
        qj = gen.quantize(v, t)
        q, j = morton.quantize(jnp.asarray(v), jnp.asarray(t.astype(np.int32)),
                               params)
        np.testing.assert_array_equal(np.asarray(q), qj[:, :3])
        np.testing.assert_array_equal(np.asarray(j), qj[:, 3])
        code = morton.encode_quantized(q, j)
        np.testing.assert_array_equal(
            U64(*code).to_numpy(), gen.encode(v, t))

    def test_lut_path_matches_direct(self):
        import jax.numpy as jnp
        from tpu_qe import morton
        v, t, smin, smax = native.scene_generate(500, 2000, 3)
        params = morton.MortonParams.for_scene(smin, smax)
        tj = jnp.asarray(t.astype(np.int32))
        direct = morton.encode(jnp.asarray(v), tj, params, use_lut=False)
        lut = morton.encode(jnp.asarray(v), tj, params, use_lut=True)
        np.testing.assert_array_equal(U64(*direct).to_numpy(),
                                      U64(*lut).to_numpy())

    def test_end_to_end_pipeline_matches_oracle(self):
        # scene -> morton -> sort on device vs tq_pipeline_oracle
        import jax.numpy as jnp
        from tpu_qe import morton
        from tpu_qe.sort import sort_u64
        v, t, smin, smax = native.scene_generate(1000, 3000, 7)
        params = morton.MortonParams.for_scene(smin, smax)
        code = morton.encode(jnp.asarray(v), jnp.asarray(t.astype(np.int32)),
                             params)
        idx = jnp.arange(3000, dtype=jnp.uint32)
        sk, (sp,) = sort_u64(code, idx, backend="hybrid", block=1024)
        ocodes, oidx = native.pipeline_oracle(1000, 3000, 7)
        np.testing.assert_array_equal(U64(*sk).to_numpy(), ocodes)
        np.testing.assert_array_equal(np.asarray(sp), oidx)


class TestTiebreakBackend:
    @pytest.mark.parametrize("n", [1, 255, 1024, 3000])
    def test_equals_stable_with_unique_payload(self, n):
        rng = np.random.default_rng(n)
        # heavy duplicates so the tiebreak actually decides order
        keys = rng.integers(0, 16, n).astype(np.uint64) * np.uint64(977)
        payload = np.arange(n, dtype=np.uint32)
        k1, p1 = sort_u64_numpy(keys, payload, backend="xla")
        k2, p2 = sort_u64_numpy(keys, payload, backend="xla_tiebreak")
        np.testing.assert_array_equal(k1, k2)
        np.testing.assert_array_equal(p1, p2)

    def test_masked_key_bits_variant(self):
        rng = np.random.default_rng(9)
        keys = rng.integers(0, 1 << 64, 2000, dtype=np.uint64)
        payload = np.arange(2000, dtype=np.uint32)
        k1, p1 = sort_u64_numpy(keys, payload, backend="xla", key_bits=24)
        k2, p2 = sort_u64_numpy(keys, payload, backend="xla_tiebreak",
                                key_bits=24)
        np.testing.assert_array_equal(k1, k2)
        np.testing.assert_array_equal(p1, p2)


class TestMxuRankKernel:
    @pytest.mark.parametrize("nb,block,shift",
                             [(2, 1024, 0), (1, 2048, 24), (3, 1024, 56)])
    def test_matches_vpu_kernel(self, nb, block, shift):
        from tpu_qe.kernels.rank_mxu import block_rank_and_histogram_mxu

        rng = np.random.default_rng(nb * 100 + shift)
        lo = rng.integers(0, 1 << 32, (nb, block), dtype=np.uint32)
        hi = rng.integers(0, 1 << 32, (nb, block), dtype=np.uint32)
        r1, h1 = block_rank_and_histogram(lo.reshape(nb, block),
                                          hi.reshape(nb, block), shift, 8)
        r2, h2 = block_rank_and_histogram_mxu(lo, hi, shift)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))


def test_mxu_rank_skewed_digits():
    """Regression: bf16 prefix cast corrupted ranks once any digit's
    running count exceeded 256 (e.g. heavy-key blocks)."""
    from tpu_qe.kernels.rank_mxu import block_rank_and_histogram_mxu

    rng = np.random.default_rng(5)
    lo = rng.integers(0, 2, (1, 2048)).astype(np.uint32)  # digits {0,1}
    hi = np.zeros((1, 2048), dtype=np.uint32)
    r1, h1 = block_rank_and_histogram(lo, hi, 0, 8)
    r2, h2 = block_rank_and_histogram_mxu(lo, hi, 0)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
