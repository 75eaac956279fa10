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
            # XLA:CPU persistent caching is BROKEN on this stack: the
            # executable (de)serializer segfaults the process — on READ
            # for entries AOT-compiled on a different host (this
            # container migrates machines; cpu_aot_loader warns of the
            # feature mismatch) and on WRITE even into a fresh dir
            # (both observed 2026-08-18 inside compilation_cache.
            # {get,put}_executable_and_time). CPU compiles are local and
            # cheap; only remote-TPU compiles (minutes each) need the
            # cache — cpu-intended runs get NO persistent cache and the
            # shared dir stays TPU-only.
            # cpu-intended iff EITHER source's primary backend is cpu:
            # pytest's conftest sets jax.config (the global env stays
            # axon), while a `JAX_PLATFORMS=cpu python -m tpu_qe` run
            # sets the env (the site hook overwrites jax.config with
            # "axon,cpu" regardless — cpu there is only the fallback)
            def _primary(s):
                return str(s or "").split(",")[0].strip().lower()

            cpu_run = "cpu" in (
                _primary(getattr(jax.config, "jax_platforms", "")),
                _primary(_os.environ.get("JAX_PLATFORMS", "")))
            if cpu_run:
                return
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # cache is an optimization; never block import
        pass


_enable_compile_cache()
