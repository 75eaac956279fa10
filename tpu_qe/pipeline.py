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


def sorted_morton_index_distributed(x, y, z, params: morton.MortonParams,
                                    mesh, size=None,
                                    capacity_factor="auto",
                                    overlap: int = 1):
    """Mesh-sharded flagship: encode columnar points + distributed sort.

    The multi-chip generalization of sorted_morton_index for point data:
    morton encoding is elementwise (zero communication — each shard
    encodes its rows), and the sorted index comes from the splitter-based
    distributed sample sort (exchange.dsort), optionally with demand-
    sized capacity planning ("auto") and k-way exchange/compute overlap.

    Args:
      x, y, z (+optional size): (n,) f32 numpy or jax arrays; n divisible
        by the mesh size.
    Returns (DistSortResult, overflow) — see exchange.dsort: device d's
    run holds the d-th quantile of the global code order with the
    original row index as payload.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpu_qe.exchange.dsort import auto_capacity, distributed_sort

    sharding = NamedSharding(mesh, P("x"))
    xd = jax.device_put(jnp.asarray(x, jnp.float32), sharding)
    yd = jax.device_put(jnp.asarray(y, jnp.float32), sharding)
    zd = jax.device_put(jnp.asarray(z, jnp.float32), sharding)
    sd = (None if size is None
          else jax.device_put(jnp.asarray(size, jnp.float32), sharding))
    n = xd.shape[0]

    @jax.jit
    def encode(xd, yd, zd, sd):
        code = morton.encode_points(xd, yd, zd, params, size=sd)
        idx = jax.lax.with_sharding_constraint(
            jnp.arange(n, dtype=jnp.uint32), sharding)
        return code, idx

    code, idx = encode(xd, yd, zd, sd)
    kw = {}
    if capacity_factor == "auto":
        if mesh.shape["x"] > 1:
            kw["capacity"] = auto_capacity(code, mesh)
    else:
        kw["capacity_factor"] = capacity_factor
    return distributed_sort(code, idx, mesh=mesh, overlap=overlap, **kw)


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
