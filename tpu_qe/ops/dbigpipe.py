"""Distributed x out-of-core fused join -> GROUP BY: the last cell.

Composes the two fused pipelines that already exist — in-core
(join_fk_scan stream + group_aggregate_sorted), distributed
(exchange/dops.py distributed_join_aggregate), out-of-core
(ops/bigpipe.py) — at the remaining scale point: both join sides exceed
the mesh's resident capacity AND the joined stream never materializes.

  phases A/B/X   ops/dbigjoin.py verbatim (per-device sorted runs of
                 both sides, union splitters, segment exchange);
  phase C        each bucket's join program ALSO partially aggregates
                 the joined values in-program (join_big_distributed's
                 aggregate_groups hook): only the G-bounded sentinel-
                 padded partial table leaves each bucket;
  phase D        dbigagg's combiner verbatim — per device, merge the B
                 bucket tables, all_gather the compacted local tables,
                 replicated global merge with exact u64 pair sums and
                 device-side verification.

The closed form survives the full composition: the combined group-count
total must equal the join's matched total must equal (n_l+1)//2
(bigjoin's construction — matches are exactly the even left indices);
per-group sums are numpy-oracle-checked at test scale.

Reference contrast: the reference keeps every intermediate of its
41-dispatch chain in GPU buffers on ONE device
(/root/reference/src/main.rs:376-688); here the intermediate join
stream of a mesh-and-HBM-exceeding join is consumed at production on
every device in parallel and never exists anywhere.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from tpu_qe.exchange.shuffle import AXIS
from tpu_qe.ops.dbigagg import _combiner_fn
from tpu_qe.ops.dbigjoin import join_big_distributed


@dataclasses.dataclass(frozen=True)
class DBigPipeResult:
    n_l: int
    n_r: int
    n_dev: int
    matched: int
    n_groups: int
    seconds: float
    rows_per_s: float
    join_ok: bool
    count_ok: bool
    keys_ok: bool
    compile_s: float

    @property
    def all_ok(self) -> bool:
        return self.join_ok and self.count_ok and self.keys_ok


def join_aggregate_big_distributed(n_l: int, n_r: int, mesh: Mesh,
                                   n_groups: int = 1 << 16,
                                   run_size: int = 1 << 26,
                                   buckets_per_dev: int | None = None,
                                   seed: int = 7, verbose: bool = False,
                                   collect: bool = False,
                                   force_composed: bool = False):
    """Fused distributed out-of-core FK join -> GROUP BY (module
    docstring). Both sides divisible by D * run_size. D == 1 delegates
    to the single-chip fused pipeline (ops/bigpipe.py)."""
    n_dev = int(mesh.shape[AXIS])
    if n_dev == 1 and not force_composed:
        from tpu_qe.ops.bigpipe import join_aggregate_big
        return join_aggregate_big(n_l, n_r, n_groups=n_groups,
                                  n_buckets=buckets_per_dev, seed=seed,
                                  verbose=verbose, collect=collect)

    jres, partials = join_big_distributed(
        n_l, n_r, mesh, run_size=run_size,
        buckets_per_dev=buckets_per_dev, seed=seed, verbose=verbose,
        force_composed=force_composed, aggregate_groups=n_groups)

    n_b = len(partials)
    pc_global = partials[0][0].shape[0]          # D * partial_cap
    local_cap = min(n_groups, n_b * (pc_global // n_dev))
    tc0 = time.perf_counter()
    combiner = _combiner_fn(mesh, n_runs=n_b, local_cap=local_cap,
                            minmax=False, collect=collect)
    flat = [a for tbl in partials for a in tbl]
    comb_exec = combiner.lower(*flat).compile()
    compile_s = time.perf_counter() - tc0
    t1 = time.perf_counter()
    out = comb_exec(*flat)
    scal = [int(np.asarray(x)) for x in out[:6]]
    ng, total_cnt, _, _, ks, _ = scal
    t_d = time.perf_counter() - t1

    dt = jres.seconds + t_d
    res = DBigPipeResult(
        n_l=n_l, n_r=n_r, n_dev=n_dev, matched=jres.matched, n_groups=ng,
        seconds=dt, rows_per_s=n_l / dt, join_ok=jres.all_ok,
        count_ok=(total_cnt == jres.matched == (n_l + 1) // 2),
        keys_ok=bool(ks), compile_s=jres.compile_s + compile_s)
    if verbose:
        print(f"dbigpipe: {n_l}x{n_r} -> {jres.matched} matches -> "
              f"{ng} groups in {dt:.2f}s ok={res.all_ok}")
    if collect:
        from tpu_qe.ops.bigagg import _host_table
        return res, _host_table(
            [np.asarray(x) for x in out[6:]], minmax=False)
    return res
