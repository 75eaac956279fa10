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

__version__ = "0.1.0"

from tpu_qe import constants  # noqa: F401
