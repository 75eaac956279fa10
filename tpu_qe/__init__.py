"""tpu_qe — a TPU-native vectorized query-execution engine.

A from-scratch JAX/Pallas framework with the capabilities of the reference
wgpu morton-code radix sort harness (Andrewp2/wgpu_morton_code_radix_sort_test),
generalized into a columnar query engine:

- ``tpu_qe.native``   — C++ core: seeded data gen, morton LUTs, CPU oracles
- ``tpu_qe.morton``   — morton encoding on TPU (JAX + Pallas)
- ``tpu_qe.kernels``  — Pallas TPU kernels (histogram, scan, partition, scatter)
- ``tpu_qe.sort``     — multi-pass LSD radix sort drivers
- ``tpu_qe.exchange`` — multi-chip collectives: distributed sort/shuffle
- ``tpu_qe.table``    — columnar HBM-resident tables
- ``tpu_qe.ops``      — query operators: filter, hash aggregate, hash join
- ``tpu_qe.bench``    — speed-of-light model + benchmark matrix
"""

__version__ = "0.2.0"

import os as _os

from tpu_qe import constants  # noqa: F401


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache (opt out: TPU_QE_NO_COMPILE_CACHE).

    Remote compiles over this environment's TPU tunnel cost minutes and
    are the dominant wall-clock term for large programs (measured: 670 s
    for the out-of-core sort executables at 128M); the persistent cache
    makes every recompile across processes a disk hit instead.
    """
    if _os.environ.get("TPU_QE_NO_COMPILE_CACHE"):
        return
    try:
        import jax
        if jax.config.jax_compilation_cache_dir is None:
            cache = _os.environ.get(
                "TPU_QE_COMPILE_CACHE_DIR",
                _os.path.join(_os.path.dirname(_os.path.dirname(
                    _os.path.abspath(__file__))), ".cache", "xla"))
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # cache is an optimization; never block import
        pass


_enable_compile_cache()
