"""Per-kernel benchmarks vs the speed-of-light model (real chip).

The per-kernel achieved-bandwidth accounting the reference does manually in
NSight (SURVEY.md §5); one JSON line per kernel. All timings are chained
differential (tpu_qe/utils/timing.py).
"""

from __future__ import annotations

import functools
import json

import jax
import jax.numpy as jnp
import numpy as np

from tpu_qe.bench.sol import device_kind
from tpu_qe.utils.profiling import profile_kernel


def _chain(fn, *arrays):
    """chain_fn factory: fn maps arrays -> pytree of same-dtype arrays of
    which the first must be xor-perturbable uint32.

    An optimization barrier separates iterations: purely-elementwise
    kernels otherwise fuse across the whole chain into ONE pass over
    memory, reporting impossible >SOL bandwidths (observed 25x SOL for
    the direct morton encode before the barrier)."""
    def make(k):
        @jax.jit
        def run(*args):
            def body(i, carry):
                carry = (carry[0] ^ i.astype(jnp.uint32),) + carry[1:]
                out = fn(*carry)
                return jax.lax.optimization_barrier(out)
            return jax.lax.fori_loop(0, k, body, args)
        return functools.partial(run, *arrays)
    return make


def bench_morton(n: int = 1 << 24):
    from tpu_qe import morton, native
    from tpu_qe.kernels.morton import encode_quantized_lut as pallas_lut

    verts, tris, smin, smax = native.scene_generate(100, 300, 7)
    params = morton.MortonParams.for_scene(smin, smax)
    rng = np.random.default_rng(0)
    qx = jnp.asarray(rng.integers(0, 1 << 20, n, dtype=np.uint32))
    qy = jnp.asarray(rng.integers(0, 1 << 20, n, dtype=np.uint32))
    qz = jnp.asarray(rng.integers(0, 1 << 20, n, dtype=np.uint32))
    j = jnp.asarray(rng.integers(0, 1 << 12, n, dtype=np.uint32))
    bytes_moved = n * (4 * 4 + 8)  # read q3+j, write lo+hi

    def pallas_fn(qx, qy, qz, j):
        q = jnp.stack([qx, qy, qz], axis=1)
        k = pallas_lut(q, j, params.lut_lo, params.lut_hi)
        return (k.lo & jnp.uint32(0xFFFFF), qy, qz, j)

    def jnp_lut_fn(qx, qy, qz, j):
        q = jnp.stack([qx, qy, qz], axis=1)
        k = morton.encode_quantized_lut(q, j, params)
        return (k.lo & jnp.uint32(0xFFFFF), qy, qz, j)

    def jnp_direct_fn(qx, qy, qz, j):
        q = jnp.stack([qx, qy, qz], axis=1)
        k = morton.encode_quantized(q, j)
        return (k.lo & jnp.uint32(0xFFFFF), qy, qz, j)

    out = []
    for name, fn in (("morton_lut_pallas", pallas_fn),
                     ("morton_lut_xla_take", jnp_lut_fn),
                     ("morton_direct_xla", jnp_direct_fn)):
        # the direct path runs ~1ms/iter: the differential needs a long
        # chain to rise above the ~35ms round-trip noise
        k_big = 3 if "take" in name else 33
        s = profile_kernel(name, _chain(fn, qx, qy, qz, j), bytes_moved, n,
                           k_big=k_big)
        out.append(_emit(name, s))
    return out


def bench_sort_kernels(n: int = 1 << 24):
    from tpu_qe.kernels.bitonic import sort_chunks
    from tpu_qe.kernels.histogram import block_histogram, \
        block_rank_and_histogram

    rng = np.random.default_rng(1)
    block = min(1 << 16, n)
    nb = n // block
    lo = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32)
                     .reshape(nb, block))
    hi = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32)
                     .reshape(nb, block))
    out = []

    def hist_fn(lo, hi):
        h = block_histogram(lo, hi, 8, 8)
        # fold the output back into the carry to keep iterations live
        return (lo ^ jnp.sum(h).astype(jnp.uint32), hi)
    s = profile_kernel("block_histogram_r256", _chain(hist_fn, lo, hi),
                       n * 8, n)
    out.append(_emit("block_histogram_r256", s))

    def rank_fn(lo, hi):
        r, h = block_rank_and_histogram(lo, hi, 8, 8)
        return (r ^ jnp.sum(h).astype(jnp.uint32), hi)
    s = profile_kernel("block_rank_r256", _chain(rank_fn, lo, hi),
                       n * 12, n)
    out.append(_emit("block_rank_r256", s))

    chunk = min(8192, n)
    nb8 = n // chunk
    lo8 = lo.reshape(nb8, chunk)
    hi8 = hi.reshape(nb8, chunk)
    pay = jnp.arange(n, dtype=jnp.uint32).reshape(nb8, chunk)

    def bitonic_fn(lo, hi, pay):
        return sort_chunks(lo, hi, pay, rows=chunk // 128)
    s = profile_kernel("bitonic_chunk8192", _chain(bitonic_fn, lo8, hi8, pay),
                       n * 24, n)
    out.append(_emit("bitonic_chunk8192", s))
    return out


def _emit(name, stats):
    row = {
        "metric": f"kernel {name}",
        "value": round(stats.elements_per_s / 1e6, 1),
        "unit": "M elem/s",
        "time_s": round(stats.seconds, 5),
        "achieved_gbps": round(stats.achieved_gbps, 1),
        "sol_fraction": round(stats.sol_fraction, 4),
        "device": device_kind(),
    }
    print(json.dumps(row), flush=True)
    return row


def main(argv=None) -> None:
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1 << 24)
    a = p.parse_args(argv)
    bench_morton(a.n)
    bench_sort_kernels(a.n)


if __name__ == "__main__":
    main()
