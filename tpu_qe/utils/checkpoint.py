"""Table checkpoint/restore (orbax-backed).

The reference persists nothing beyond cfg-gated text dumps
(/root/reference/src/main.rs:751-766 — covered by tpu_qe.utils.dump); a
production engine needs durable columnar state, so Tables serialize through
orbax (the TPU-native checkpointing stack) with dtype-exact round-trips,
including u64 columns (stored as their (lo, hi) u32 planes).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from tpu_qe.bits import U64
from tpu_qe.table import Table


def _flatten(table: Table) -> dict:
    out = {}
    for name in table:
        if name.endswith("@lo") or name.endswith("@hi"):
            raise ValueError(
                f"column name {name!r} collides with the u64 plane "
                "encoding (reserved suffixes '@lo'/'@hi')")
        c = table[name]
        if isinstance(c, U64):
            out[f"{name}@lo"] = c.lo
            out[f"{name}@hi"] = c.hi
        else:
            out[name] = c
    return out


def _unflatten(tree: dict) -> Table:
    cols = {}
    for k, v in tree.items():
        if k.endswith("@lo"):
            cols[k[:-3]] = U64(jnp.asarray(v),
                               jnp.asarray(tree[k[:-3] + "@hi"]))
        elif k.endswith("@hi"):
            continue
        else:
            cols[k] = jnp.asarray(v)
    return Table(cols)


def save_table(table: Table, path: str) -> str:
    """Write a Table checkpoint to `path` (a directory). Returns the path."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, _flatten(table), force=True)
    ckpt.wait_until_finished()
    return path


def load_table(path: str) -> Table:
    """Restore a Table checkpoint written by save_table."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    tree = ckpt.restore(path)
    return _unflatten(tree)


def save_table_npz(table: Table, path: str) -> str:
    """Dependency-light alternative: single-file .npz checkpoint."""
    np.savez(path, **{k: np.asarray(v) for k, v in _flatten(table).items()})
    return os.path.abspath(path)


def load_table_npz(path: str) -> Table:
    with np.load(path) as z:
        return _unflatten({k: z[k] for k in z.files})
