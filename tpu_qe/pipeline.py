"""The flagship pipeline: scene -> extended morton codes -> sorted index.

Public composition of the engine's core path — what the reference's
run_compute_shaders encodes as 41 GPU dispatches
(/root/reference/src/main.rs:376-688) is here ONE jitted program: morton
encoding fused with the multi-pass sort by XLA's dataflow scheduling.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_qe import morton, native
from tpu_qe.bits import U64
from tpu_qe.config import SceneConfig, SortConfig
from tpu_qe.sort import sort_u64


class MortonIndex(NamedTuple):
    """Sorted (morton code, triangle index) pairs."""

    code: U64             # sorted morton codes
    order: jnp.ndarray    # triangle index per sorted position


@functools.partial(jax.jit, static_argnames=("backend", "key_bits"))
def sorted_morton_index(verts: jnp.ndarray, tris: jnp.ndarray,
                        params: morton.MortonParams,
                        backend: str = "xla_tiebreak",
                        key_bits: int = 64) -> MortonIndex:
    """Encode triangles and sort (code, index) — one jitted program.

    Default backend is xla_tiebreak: the payload is the unique triangle
    index, so the unstable 3-key sort returns the stable-by-code result
    ~24% faster (see sort/driver.py).
    """
    code = morton.encode(verts, tris, params)
    idx = jnp.arange(tris.shape[0], dtype=jnp.uint32)
    skey, (sidx,) = sort_u64(code, idx, backend=backend, key_bits=key_bits)
    return MortonIndex(skey, sidx)


def build_scene_index(scene: SceneConfig | None = None,
                      sort: SortConfig | None = None) -> MortonIndex:
    """Generate the seeded reference scene and build its sorted index.

    When no sort config is given, the pipeline defaults to the tiebreak
    backend (the payload is the unique triangle index, so the result is
    bit-identical to the stable sort).
    """
    scene = scene or SceneConfig()
    sort = sort or SortConfig(backend="xla_tiebreak")
    verts, tris, smin, smax = native.scene_generate(
        scene.num_vertices, scene.num_triangles, scene.seed)
    params = morton.MortonParams.for_scene(smin, smax)
    return sorted_morton_index(
        jnp.asarray(verts), jnp.asarray(tris.astype(np.int32)), params,
        backend=sort.backend, key_bits=sort.key_bits)
