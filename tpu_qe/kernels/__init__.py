"""Pallas TPU kernels for the query engine.

Each kernel has a scalar/CPU oracle in tpu_qe.native and runs in interpret
mode automatically when the default JAX backend is not TPU (the test suite
runs on a fake CPU mesh — SURVEY.md §4's "fake backend").
"""

from __future__ import annotations

import functools

import jax


@functools.cache
def use_interpret() -> bool:
    """True when Pallas kernels must run interpreted (non-TPU backend)."""
    return jax.default_backend() != "tpu"
