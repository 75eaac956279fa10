"""CLI entry point: `python -m tpu_qe <subcommand>`.

The TPU-native replacement for the reference's fn main()
(/root/reference/src/main.rs:1035-1040), which cfg-dispatches between a
windowed profiling run and a headless verify run. Here run modes are proper
subcommands instead of compile-time cfg flags:

  verify   headless verify run: scene -> morton -> 8-pass sort on TPU,
           sortedness + all-zeros checks, bit-exact C++ oracle comparison
           (the reference's radix_sort_readback path, main.rs:690-1033, with
           its disabled CPU oracle turned into a live check)
  dump     golden-file dump of morton codes + triangle indices
           (the morton_code_readback path, main.rs:735-770)
  bench    headline benchmark (see bench.py at the repo root)
  info     device + configuration report

plus the measurement family: bench-matrix (operator configs),
bench-kernels (Pallas microbenches), and the out-of-core drivers
bench-big / bench-bigjoin / bench-bigagg / bench-bigpipe /
bench-bigtopk / bench-bigwindow / bench-bigquantile / bench-bigdistinct /
bench-bigsetops / bench-bigsql (declarative GROUP BY over a virtual
out-of-core table through sql/bigexec.py)
(each prints one JSON line and exits nonzero if on-device verification
fails; --distributed runs the mesh-composed variant where one exists).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

# Honor JAX_PLATFORMS before anything imports jax: this container's site
# hook registers the TPU plugin at interpreter start, so the env var alone
# is ignored and a CPU-intended `python -m tpu_qe` would hang on tunnel
# init (same shim as bench.py; CLAUDE.md "Platform gotchas"). ONLY when
# executing as the CLI entry (__main__): the container profile exports
# JAX_PLATFORMS=axon, so applying this on a mere import would override a
# host's explicit jax.config (pytest's conftest sets cpu) with the
# tunnel backend.
if __name__ == "__main__" and os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

log = logging.getLogger("tpu_qe")


def _cmd_verify(args) -> int:
    import jax.numpy as jnp
    import numpy as np

    from tpu_qe import morton, native
    from tpu_qe.bits import U64, is_sorted_u64, masked_key
    from tpu_qe.config import EngineConfig, SceneConfig, SortConfig
    from tpu_qe.sort import sort_u64
    from tpu_qe.utils.profiling import marker, trace_session

    cfg = EngineConfig(
        sort=SortConfig(backend=args.backend,
                        bits_per_pass=args.bits_per_pass,
                        num_passes=args.num_passes),
        scene=SceneConfig(num_vertices=args.vertices,
                          num_triangles=args.triangles, seed=args.seed),
        trace_dir=args.trace_dir,
    )
    sc = cfg.scene
    log.info("verify run: %d vertices, %d triangles, seed %d, backend %s",
             sc.num_vertices, sc.num_triangles, sc.seed, cfg.sort.backend)

    verts, tris, smin, smax = native.scene_generate(
        sc.num_vertices, sc.num_triangles, sc.seed)
    params = morton.MortonParams.for_scene(smin, smax)

    with trace_session(cfg.trace_dir):
        with marker("compute morton code"):
            code = morton.encode(jnp.asarray(verts),
                                 jnp.asarray(tris.astype(np.int32)), params)
        idx = jnp.arange(sc.num_triangles, dtype=jnp.uint32)
        with marker("radix sort"):
            skey, (sidx,) = sort_u64(code, idx, backend=cfg.sort.backend,
                                     key_bits=cfg.sort.key_bits,
                                     bits_per_pass=cfg.sort.bits_per_pass)
        mlo, mhi = masked_key(skey.lo, skey.hi, cfg.sort.key_bits)
        ok_sorted = bool(is_sorted_u64(mlo, mhi))

    keys_np = U64(skey.lo, skey.hi).to_numpy()
    idx_np = np.asarray(sidx)

    # All-zeros detector (reference main.rs:852-864).
    num_zero = int(np.count_nonzero(keys_np == 0))
    all_zeros = num_zero == sc.num_triangles

    # Live C++ oracle (the reference's disabled if-false oracle,
    # main.rs:923-1028, enabled): bit-exact sorted (code, index) stream.
    oracle_codes, oracle_idx = native.pipeline_oracle(
        sc.num_vertices, sc.num_triangles, sc.seed)
    keys_exact = bool(np.array_equal(keys_np, oracle_codes))
    idx_exact = bool(np.array_equal(idx_np, oracle_idx))

    if ok_sorted and not all_zeros:
        log.info("Sorted !!!!!!!!!")         # verdict parity: main.rs:857
    else:
        bad = int(np.count_nonzero(keys_np[1:] < keys_np[:-1]))
        log.error("Not sorted!!! %d", bad)   # verdict parity: main.rs:861
    log.info("oracle keys bit-exact: %s, payload order exact: %s",
             keys_exact, idx_exact)

    ok = ok_sorted and not all_zeros and keys_exact and idx_exact
    print("VERIFY PASS" if ok else "VERIFY FAIL")
    return 0 if ok else 1


def _cmd_dump(args) -> int:
    import numpy as np

    from tpu_qe import native
    from tpu_qe.utils.dump import dump_indices, dump_morton_codes

    verts, tris, smin, smax = native.scene_generate(
        args.vertices, args.triangles, args.seed)
    gen = native.MortonGen(smin, smax)
    codes = gen.encode(verts, tris, quirk=args.quirk_lut)
    p1 = dump_morton_codes(codes, args.codes_path)
    p2 = dump_indices(tris, args.indices_path)
    print(f"wrote {p1}\nwrote {p2}")
    return 0


def _cmd_bench(args) -> int:
    sys.argv = ["bench.py"] + (args.rest or [])
    # bench.py lives at the repo root (driver contract), not in the
    # package — load it by path so `python -m tpu_qe bench` works from
    # any CWD and from an installed console script.
    import importlib.util
    import pathlib
    path = pathlib.Path(__file__).resolve().parent.parent / "bench.py"
    if path.exists():
        spec = importlib.util.spec_from_file_location("bench", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main()
    else:  # installed layout without the repo checkout: try CWD import
        import bench
        bench.main()
    return 0


def _cmd_bench_matrix(args) -> int:
    from tpu_qe.bench import matrix
    matrix.main(args.rest or [])
    return 0


def _cmd_bench_kernels(args) -> int:
    from tpu_qe.bench import kernels
    kernels.main(args.rest or [])
    return 0


def _cmd_bench_big(args) -> int:
    import contextlib
    import json

    from tpu_qe.bench.sol import (bigsort_sol_seconds, device_kind,
                                  sort_sol_seconds)
    from tpu_qe.sort.bigsort import sort_big, sort_big_incore
    from tpu_qe.utils.profiling import trace_session

    ctx = (trace_session(args.trace_dir) if args.trace_dir
           else contextlib.nullcontext())
    with ctx:
        return _bench_big_inner(args, json, device_kind, bigsort_sol_seconds,
                                sort_big, sort_big_incore)


def _bench_big_inner(args, json, device_kind, bigsort_sol_seconds, sort_big,
                     sort_big_incore) -> int:
    assert args.payload_cols >= 1, "--payload-cols must be >= 1"
    assert args.payload_cols == 1 or not args.in_core, \
        "--payload-cols > 1 applies to the out-of-core paths"
    if args.in_core:
        res = sort_big_incore(args.n)
        kind = "in-core"
        where = "1 chip"
    elif args.distributed:
        from tpu_qe.exchange.dsort import make_mesh
        from tpu_qe.sort.dbigsort import sort_big_distributed

        mesh = make_mesh(args.devices)
        d = int(mesh.devices.size)
        res = sort_big_distributed(
            args.n, mesh, run_size=args.run_size,
            buckets_per_dev=args.buckets, verbose=args.verbose_big,
            checkpoint_dir=args.checkpoint_dir,
            force_composed=args.force_composed,
            payload_cols=args.payload_cols)
        # label which code path actually ran: at D=1 without
        # --force-composed the call delegates to single-chip sort_big
        composed = d > 1 or args.force_composed
        kind = ("distributed out-of-core" if composed
                else "out-of-core (D=1 delegated)")
        if args.payload_cols > 1:
            kind += f" ({args.payload_cols}-col rows)"
        where = f"{d} device(s)"
    else:
        res = sort_big(args.n, run_size=args.run_size,
                       n_buckets=args.buckets, verbose=args.verbose_big,
                       checkpoint_dir=args.checkpoint_dir,
                       payload_cols=args.payload_cols,
                       strategy=args.strategy)
        kind = f"out-of-core [{args.strategy}]"
        if args.payload_cols > 1:
            kind += f" ({args.payload_cols}-col rows)"
        where = "1 chip"
    out = {
        "metric": f"{kind} sort {res.n} u64 keys + u32 payload, {where}",
        "value": round(res.keys_per_s),
        "unit": "keys/s",
        "time_s": round(res.seconds, 3),
        "phase_runs_s": round(res.phase_a_s, 3),
        "phase_merge_s": round(res.phase_c_s, 3),
        "compile_s": round(res.compile_s, 3),
        "verified": res.all_ok,
        "checks": {
            "sorted": res.sorted_ok, "hash": res.hash_ok,
            "count": res.count_ok, "perm": res.perm_ok,
            "boundary": res.boundary_ok},
        # composition envelope (phase sorts at ideal balance) — the
        # 8-pass radix-HBM bound is hardware-blocked aspiration, not
        # an envelope (BASELINE.md)
        "sol_fraction": round(
            bigsort_sol_seconds(
                res.n, args.run_size,
                args.buckets or max(2, -(-res.n // (1 << 26))),
                payload_cols=getattr(args, "payload_cols", 1),
                strategy=getattr(args, "strategy", "partition"))
            / res.seconds, 4) if not args.in_core else None,
        "device": device_kind(),
    }
    print(json.dumps(out))
    return 0 if res.all_ok else 1


def _cmd_bench_bigjoin(args) -> int:
    import json

    from tpu_qe.bench.sol import bigjoin_sol_seconds, device_kind
    from tpu_qe.ops.bigjoin import join_big

    if args.outer is not None:
        from tpu_qe.ops.bigouter import join_big_outer
        res = join_big_outer(args.n_left, args.n_right, how=args.outer,
                             n_buckets=args.buckets,
                             verbose=args.verbose_big,
                             checkpoint_dir=args.checkpoint_dir)
        out = {
            "metric": f"out-of-core {args.outer.upper()} OUTER join "
                      f"{res.n_l} x {res.n_r} rows, 1 chip",
            "value": round(res.rows_per_s),
            "unit": "left rows/s",
            "time_s": round(res.seconds, 3),
            "matched": res.matched,
            "right_only": res.right_only,
            "phase_sort_s": round(res.phase_a_s, 3),
            "phase_join_s": round(res.phase_c_s, 3),
            "compile_s": round(res.compile_s, 3),
            "verified": res.all_ok,
            "checks": {"match_flags": res.match_ok, "values": res.val_ok,
                       "right_only": res.ro_ok, "counts": res.count_ok},
            "device": device_kind(),
        }
        print(json.dumps(out))
        return 0 if res.all_ok else 1
    if args.distributed:
        from tpu_qe.exchange.dsort import make_mesh
        from tpu_qe.ops.dbigjoin import join_big_distributed
        mesh = make_mesh(args.devices)
        d = int(mesh.devices.size)
        res = join_big_distributed(
            args.n_left, args.n_right, mesh,
            run_size=args.run_size, buckets_per_dev=args.buckets,
            verbose=args.verbose_big,
            checkpoint_dir=args.checkpoint_dir,
            force_composed=args.force_composed)
        where = f"{d} devices"
    else:
        res = join_big(args.n_left, args.n_right, n_buckets=args.buckets,
                       verbose=args.verbose_big,
                       checkpoint_dir=args.checkpoint_dir)
        where = "1 chip"
    out = {
        "metric": f"out-of-core FK join {res.n_l} x {res.n_r} rows, "
                  f"{where}",
        "value": round(res.rows_per_s),
        "unit": "left rows/s",
        "time_s": round(res.seconds, 3),
        "matched": res.matched,
        "phase_sort_s": round(res.phase_a_s, 3),
        "phase_join_s": round(res.phase_c_s, 3),
        "compile_s": round(res.compile_s, 3),
        "verified": res.all_ok,
        "checks": {"match_flags": res.match_ok, "values": res.val_ok,
                   "counts": res.count_ok},
        # composition envelope (2 side sorts + per-bucket scan-joins at
        # ideal balance; capacity padding counts as engine slack)
        "sol_fraction": (round(
            bigjoin_sol_seconds(res.n_l, res.n_r,
                                args.buckets or 8) / res.seconds, 4)
            if not args.distributed else None),
        "device": device_kind(),
    }
    print(json.dumps(out))
    return 0 if res.all_ok else 1


def _cmd_bench_bigagg(args) -> int:
    import json

    from tpu_qe.bench.sol import bigagg_sol_seconds, device_kind
    from tpu_qe.ops.bigagg import aggregate_big

    assert args.value_cols >= 1, "--value-cols must be >= 1"
    if args.distributed:
        from tpu_qe.exchange.dsort import make_mesh
        from tpu_qe.ops.dbigagg import aggregate_big_distributed
        assert args.value_cols == 1, \
            "--value-cols applies to the single-chip path"
        mesh = make_mesh(args.devices)
        d = int(mesh.devices.size)
        res = aggregate_big_distributed(
            args.n, mesh, n_groups=args.groups, run_size=args.run_size,
            minmax=args.minmax, verbose=args.verbose_big,
            force_composed=args.force_composed,
            checkpoint_dir=args.checkpoint_dir)
        where = f"{d} devices"
    elif args.value_cols > 1:
        from tpu_qe.ops.bigagg import aggregate_big_multi
        assert not args.minmax and args.checkpoint_dir is None, \
            "--value-cols>1 composes with neither --minmax nor " \
            "--checkpoint-dir yet"
        res = aggregate_big_multi(args.n, n_groups=args.groups,
                                  run_size=args.run_size,
                                  value_cols=args.value_cols,
                                  verbose=args.verbose_big)
        where = f"1 chip, {args.value_cols} value cols"
    else:
        res = aggregate_big(args.n, n_groups=args.groups,
                            run_size=args.run_size, minmax=args.minmax,
                            verbose=args.verbose_big,
                            checkpoint_dir=args.checkpoint_dir)
        where = "1 chip"
    out = {
        "metric": f"out-of-core GROUP BY {res.n} rows -> "
                  f"{res.n_groups} groups, {where}",
        "value": round(res.rows_per_s),
        "unit": "rows/s",
        "time_s": round(res.seconds, 3),
        "phase_partial_s": round(res.phase_a_s, 3),
        "phase_combine_s": round(res.phase_b_s, 3),
        "compile_s": round(res.compile_s, 3),
        "verified": res.all_ok,
        "checks": {"count": res.count_ok, "sum": res.sum_ok,
                   "keys": res.keys_ok, "groups": res.groups_ok,
                   "minmax": res.minmax_ok},
        # composition envelope: R per-run group_aggregate programs
        "sol_fraction": (round(
            bigagg_sol_seconds(
                res.n, args.run_size,
                n_aggs=2 + (2 if args.minmax else 0)
                + max(args.value_cols - 1, 0)) / res.seconds, 4)
            if not args.distributed else None),
        "device": device_kind(),
    }
    print(json.dumps(out))
    return 0 if res.all_ok else 1


def _cmd_bench_bigpipe(args) -> int:
    import json

    from tpu_qe.bench.sol import bigpipe_sol_seconds, device_kind

    if args.distributed:
        from tpu_qe.exchange.dsort import make_mesh
        from tpu_qe.ops.dbigpipe import join_aggregate_big_distributed
        mesh = make_mesh(args.devices)
        d = int(mesh.devices.size)
        res = join_aggregate_big_distributed(
            args.n_left, args.n_right, mesh, n_groups=args.groups,
            run_size=args.run_size,
            buckets_per_dev=args.buckets, verbose=args.verbose_big,
            force_composed=args.force_composed)
        where = f"{d} devices"
    else:
        from tpu_qe.ops.bigpipe import join_aggregate_big
        res = join_aggregate_big(args.n_left, args.n_right,
                                 n_groups=args.groups,
                                 n_buckets=args.buckets,
                                 verbose=args.verbose_big)
        where = "1 chip"
    out = {
        "metric": f"fused out-of-core join+GROUP BY {res.n_l} x "
                  f"{res.n_r} rows -> {res.n_groups} groups, {where}",
        "value": round(res.rows_per_s),
        "unit": "left rows/s",
        "time_s": round(res.seconds, 3),
        "matched": res.matched,
        "compile_s": round(res.compile_s, 3),
        "verified": res.all_ok,
        "checks": {"join": res.join_ok, "count": res.count_ok,
                   "keys": res.keys_ok},
        # composition envelope: the join composition + per-bucket
        # sorted-stream aggregation
        "sol_fraction": (round(
            bigpipe_sol_seconds(res.n_l, res.n_r, args.buckets or 8)
            / res.seconds, 4) if not args.distributed else None),
        "device": device_kind(),
    }
    print(json.dumps(out))
    return 0 if res.all_ok else 1


def _cmd_bench_bigwindow(args) -> int:
    import json

    from tpu_qe.bench.sol import bigwindow_sol_seconds, device_kind

    if args.distributed:
        from tpu_qe.exchange.dsort import make_mesh
        from tpu_qe.ops.dbigwindow import window_big_distributed
        mesh = make_mesh(args.devices)
        d = int(mesh.devices.size)
        assert args.checkpoint_dir is None, \
            "--checkpoint-dir applies to the single-chip path"
        res = window_big_distributed(
            args.n, mesh, partitions=args.partitions,
            run_size=args.run_size, buckets_per_dev=args.buckets,
            verbose=args.verbose_big,
            force_composed=args.force_composed)
        where = f"{d} devices"
    else:
        from tpu_qe.ops.bigwindow import window_big
        res = window_big(args.n, partitions=args.partitions,
                         run_size=args.run_size, n_buckets=args.buckets,
                         verbose=args.verbose_big,
                         checkpoint_dir=args.checkpoint_dir)
        where = "1 chip"
    out = {
        "metric": f"out-of-core window rn+rank+sum+lag, {res.n} rows "
                  f"x {res.partitions} partitions, {where}",
        "value": round(res.rows_per_s),
        "unit": "rows/s",
        "time_s": round(res.seconds, 3),
        "phase_runs_s": round(res.phase_a_s, 3),
        "phase_buckets_s": round(res.phase_c_s, 3),
        "compile_s": round(res.compile_s, 3),
        "verified": res.all_ok,
        "checks": {"sorted": res.sorted_ok, "hash": res.hash_ok,
                   "window": res.window_ok, "count": res.count_ok,
                   "boundary": res.boundary_ok},
        # composition envelope: R 4-key run sorts + B bucket re-sorts
        # + the segmented window sweeps
        "sol_fraction": (round(
            bigwindow_sol_seconds(
                res.n, args.run_size,
                args.buckets or max(2, -(-res.n // (1 << 26))))
            / res.seconds, 4) if not args.distributed else None),
        "device": device_kind(),
    }
    print(json.dumps(out), flush=True)
    return 0 if res.all_ok else 1


def _cmd_bench_bigquantile(args) -> int:
    import json

    from tpu_qe.bench.sol import device_kind

    qs = [float(q) for q in args.qs.split(",")]
    kind = "PERCENTILE_CONT" if args.cont else "quantiles"
    if args.distributed:
        from tpu_qe.exchange.dsort import make_mesh
        mesh = make_mesh(args.devices)
        if args.cont:
            from tpu_qe.ops.dbigquantile import \
                quantile_cont_big_distributed
            res = quantile_cont_big_distributed(
                args.n, qs, mesh, run_size=args.run_size,
                verbose=args.verbose_big)
        else:
            from tpu_qe.ops.dbigquantile import quantile_big_distributed
            res = quantile_big_distributed(args.n, qs, mesh,
                                           run_size=args.run_size,
                                           verbose=args.verbose_big)
        where = f"{int(mesh.devices.size)} devices"
    else:
        if args.cont:
            from tpu_qe.ops.bigquantile import quantile_cont_big
            res = quantile_cont_big(args.n, qs, run_size=args.run_size,
                                    verbose=args.verbose_big)
        else:
            from tpu_qe.ops.bigquantile import quantile_big
            res = quantile_big(args.n, qs, run_size=args.run_size,
                               verbose=args.verbose_big)
        where = "1 chip"
    out = {
        "metric": f"out-of-core exact {kind} ({len(qs)} q) over "
                  f"{res.n} rows, {where}",
        "value": round(res.rows_per_s),
        "unit": "rows/s",
        "time_s": round(res.seconds, 3),
        "runs": res.n_runs,
        "cert_ok": res.all_ok,
        "device": device_kind(),
    }
    if not args.cont:
        out["phase_runs_s"] = round(res.runs_s, 3)
        out["phase_select_s"] = round(res.select_s, 3)
    print(json.dumps(out))
    return 0 if res.all_ok else 1


def _cmd_bench_bigorderby(args) -> int:
    import json

    from tpu_qe.bench.sol import device_kind

    if args.distributed:
        from tpu_qe.exchange.dsort import make_mesh
        from tpu_qe.ops.dbigorderby import order_by_big_distributed
        mesh = make_mesh(args.devices)
        d = int(mesh.devices.size)
        res = order_by_big_distributed(
            args.n, mesh, a_card=args.a_card, run_size=args.run_size,
            buckets_per_dev=args.buckets, verbose=args.verbose_big,
            force_composed=args.force_composed)
        where = f"{d} devices"
    else:
        from tpu_qe.ops.bigorderby import order_by_big
        res = order_by_big(args.n, a_card=args.a_card,
                           run_size=args.run_size, n_buckets=args.buckets,
                           verbose=args.verbose_big)
        where = "1 chip"
    out = {
        "metric": f"out-of-core ORDER BY a DESC, b ASC, {res.n} rows, "
                  f"{where}",
        "value": round(res.rows_per_s),
        "unit": "rows/s",
        "time_s": round(res.seconds, 3),
        "phase_runs_s": round(res.phase_a_s, 3),
        "phase_buckets_s": round(res.phase_c_s, 3),
        "compile_s": round(res.compile_s, 3),
        "verified": res.all_ok,
        "checks": {"sorted": res.sorted_ok, "hash": res.hash_ok,
                   "boundary": res.boundary_ok, "count": res.count_ok,
                   "perm": res.perm_ok},
        "device": device_kind(),
    }
    print(json.dumps(out))
    return 0 if res.all_ok else 1


def _cmd_bench_bigdistinct(args) -> int:
    import json

    from tpu_qe.bench.sol import device_kind

    if args.distributed:
        from tpu_qe.exchange.dsort import make_mesh
        from tpu_qe.ops.dbigdistinct import count_distinct_big_distributed
        mesh = make_mesh(args.devices)
        res = count_distinct_big_distributed(
            args.n, mesh, n_groups=args.groups, n_values=args.values,
            run_size=args.run_size, verbose=args.verbose_big,
            force_composed=args.force_composed)
        where = f"{res.n_dev} devices"
    else:
        from tpu_qe.ops.bigdistinct import count_distinct_big
        res = count_distinct_big(args.n, n_groups=args.groups,
                                 n_values=args.values,
                                 run_size=args.run_size,
                                 verbose=args.verbose_big)
        where = "1 chip"
    out = {
        "metric": f"out-of-core COUNT(DISTINCT) {res.n} rows -> "
                  f"{res.num_groups} groups, {where}",
        "value": round(res.rows_per_s),
        "unit": "rows/s",
        "time_s": round(res.seconds, 3),
        "phase_dedup_s": round(res.dedup_s, 3),
        "phase_combine_s": round(res.combine_s, 3),
        "runs": res.n_runs,
        "verified": res.all_ok,
        "device": device_kind(),
    }
    print(json.dumps(out))
    return 0 if res.all_ok else 1


def _cmd_bench_bigsetops(args) -> int:
    import json

    from tpu_qe.bench.sol import device_kind

    if args.distributed:
        from tpu_qe.exchange.dsort import make_mesh
        from tpu_qe.ops.dbigsetops import set_op_big_distributed
        mesh = make_mesh(args.devices)
        res = set_op_big_distributed(
            args.op, args.n_a, args.n_b, mesh, g_a=args.g_a,
            g_b=args.g_b, offset=args.offset, run_size=args.run_size,
            verbose=args.verbose_big, force_composed=args.force_composed)
        where = f"{res.n_dev} devices"
        phases = {"phase_dedup_s": round(res.dedup_s, 3),
                  "phase_local_s": round(res.combine_s, 3),
                  "phase_route_s": round(res.route_s, 3)}
    else:
        from tpu_qe.ops.bigsetops import set_op_big
        res = set_op_big(args.op, args.n_a, args.n_b, g_a=args.g_a,
                         g_b=args.g_b, offset=args.offset,
                         run_size=args.run_size,
                         verbose=args.verbose_big)
        where = "1 chip"
        phases = {"phase_dedup_s": round(res.dedup_s, 3),
                  "phase_combine_s": round(res.combine_s, 3)}
    out = {
        "metric": f"out-of-core {res.op.upper()} "
                  f"{res.n_a}+{res.n_b} rows -> {res.num} keys, {where}",
        "value": round(res.rows_per_s),
        "unit": "rows/s",
        "time_s": round(res.seconds, 3),
        **phases,
        "verified": res.all_ok,
        "device": device_kind(),
    }
    print(json.dumps(out))
    return 0 if res.all_ok else 1


def _cmd_bench_bigtopk(args) -> int:
    import json

    from tpu_qe.bench.sol import device_kind

    if args.distributed:
        from tpu_qe.exchange.dsort import make_mesh
        from tpu_qe.ops.dbigtopk import top_k_big_distributed
        mesh = make_mesh(args.devices)
        d = int(mesh.devices.size)
        res = top_k_big_distributed(
            args.n, args.k, mesh, run_size=args.run_size,
            largest=args.largest, verbose=args.verbose_big,
            force_composed=args.force_composed)
        where = f"{d} devices"
    else:
        from tpu_qe.ops.bigtopk import top_k_big
        res = top_k_big(args.n, args.k, run_size=args.run_size,
                        largest=args.largest, verbose=args.verbose_big)
        where = "1 chip"
    out = {
        "metric": f"out-of-core top-{res.k} of {res.n} rows, {where}",
        "value": round(res.rows_per_s),
        "unit": "rows/s",
        "time_s": round(res.seconds, 3),
        "phase_select_s": round(res.phase_a_s, 3),
        "phase_combine_s": round(res.phase_b_s, 3),
        "compile_s": round(res.compile_s, 3),
        "verified": res.all_ok,
        "checks": {"hash": res.hash_ok, "order": res.order_ok,
                   "distinct": res.distinct_ok},
        "device": device_kind(),
    }
    print(json.dumps(out))
    return 0 if res.all_ok else 1


def _cmd_bench_bigsql_verb(args) -> int:
    """Out-of-core SQL verb battery (round-5 VERDICT item #1): one
    chip-measured line per big-SQL verb, each verified against a
    CLOSED-FORM expectation at full scale.

    Deterministic key layout (k = i & (G-1)) makes expectations exact:
    every group holds exactly n/G rows; d = (i >> log2 G) & 255 cycles
    within each group so COUNT(DISTINCT d) = min(256, n/G) exactly;
    the (k, v)-composite window prefix enumerates partition 0's rows
    v = 0, G, 2G, ... with closed-form running sums. The hashed table
    (k = fmix(i) & (G-1)) backs the verbs whose expectations do not
    need per-group counts (ORDER BY / head / DISTINCT)."""
    import json
    import time

    import jax.numpy as jnp
    import numpy as np

    from tpu_qe.bench.sol import device_kind
    from tpu_qe.hashing import murmur_fmix32, murmur_fmix32_numpy
    from tpu_qe.sql import Database

    n, G, verb = args.n, args.groups, args.verb
    assert G & (G - 1) == 0 and n % G == 0 and n % 2 == 0
    shift = G.bit_length() - 1
    L = 128
    per_g = n // G

    db = Database()
    db.register_virtual("big", n, {
        "k": lambda i: murmur_fmix32(i) & jnp.uint32(G - 1),
        "v": lambda i: i,
    })
    db.register_virtual("bigdet", n, {
        "k": lambda i: i & jnp.uint32(G - 1),
        "v": lambda i: i,
        "d": lambda i: (i >> jnp.uint32(shift)) & jnp.uint32(15),
    })
    rows = n
    mg = G

    if verb == "orderby":
        sql = f"SELECT v FROM big ORDER BY v DESC LIMIT {L}"

        def check(out):
            return np.array_equal(out["v"].astype(np.int64),
                                  np.arange(n - 1, n - 1 - L, -1))
    elif verb == "head":
        # the qualifying rows live in the LAST run -> full scan
        sql = f"SELECT k, v FROM big WHERE v >= {n - L} LIMIT {L}"

        def check(out):
            v = np.arange(n - L, n, dtype=np.uint32)
            k = murmur_fmix32_numpy(v) & np.uint32(G - 1)
            return (np.array_equal(out["v"], v)
                    and np.array_equal(out["k"], k))
    elif verb == "distinct":
        sql = "SELECT DISTINCT k FROM big"

        def check(out):
            return np.array_equal(np.sort(out["k"]),
                                  np.arange(G, dtype=np.uint32))
    elif verb == "countdistinct":
        sql = ("SELECT k, COUNT(DISTINCT d) AS cd FROM bigdet "
               "GROUP BY k")
        # the pair-dedup tier compacts (group, d) pairs per run: every
        # run sees all G groups x 16 d values -> cap = G * 16 exactly
        # (16, not 256: the pair table IS the per-run readback, and
        # G * 256 pairs x 16 runs = 2.1 GB over a 25-30 MB/s tunnel
        # drowned the measurement — round-5 battery postmortem)
        mg = G * 16

        def check(out):
            return (len(out["k"]) == G
                    and np.array_equal(np.sort(out["k"]),
                                       np.arange(G, dtype=np.uint32))
                    and bool((out["cd"] == min(16, per_g)).all()))
    elif verb == "join":
        dk = np.arange(G, dtype=np.uint32)
        db.register("dim", {"dk": dk,
                            "w": (2 * dk + 1).astype(np.uint32),
                            "grp": (dk & 15).astype(np.uint32)})
        sql = ("SELECT grp, COUNT(*) AS c, SUM(w) AS s FROM bigdet "
               "JOIN dim ON k = dk GROUP BY grp ORDER BY grp")

        def check(out):
            w = (2 * dk.astype(np.int64) + 1)
            exp_s = np.array([per_g * int(w[(dk & 15) == t].sum())
                              for t in range(16)], np.int64)
            return (np.array_equal(out["grp"],
                                   np.arange(16, dtype=np.uint32))
                    and bool((out["c"].astype(np.int64)
                              == n // 16).all())
                    and np.array_equal(out["s"].astype(np.int64),
                                       exp_s))
    elif verb == "window":
        sql = (f"SELECT k, v, "
               "SUM(v) OVER (PARTITION BY k ORDER BY v) AS rs, "
               "ROW_NUMBER() OVER (PARTITION BY k ORDER BY v) AS rn, "
               "COUNT(v) OVER (PARTITION BY k) AS pc "
               f"FROM bigdet LIMIT {L}")
        rows = 2 * n        # prefix selection + whole-partition pass

        def check(out):
            j = np.arange(L, dtype=np.int64)
            return (bool((out["k"] == 0).all())
                    and np.array_equal(out["v"].astype(np.int64),
                                       j * G)
                    and np.array_equal(out["rs"].astype(np.int64),
                                       G * j * (j + 1) // 2)
                    and np.array_equal(out["rn"].astype(np.int64),
                                       j + 1)
                    and bool((out["pc"].astype(np.int64)
                              == per_g).all()))
    elif verb == "range":
        # tie-aware RANGE over heavy order ties: d cycles 0..15 within
        # each partition, so every (k, d) run holds per_g/16 rows and
        # the first L output rows (partition 0, run d=0, j = 16*jj)
        # share one closed-form run total 8*G*m*(m-1)
        sql = (f"SELECT k, v, "
               "SUM(v) OVER (PARTITION BY k ORDER BY d RANGE BETWEEN "
               "UNBOUNDED PRECEDING AND CURRENT ROW) AS rs, "
               "ROW_NUMBER() OVER (PARTITION BY k ORDER BY d) AS rn, "
               "COUNT(*) OVER (PARTITION BY k ORDER BY d ROWS "
               f"BETWEEN 2 PRECEDING AND CURRENT ROW) AS fc "
               f"FROM bigdet LIMIT {L}")
        rows = 2 * n        # prefix selection + per-run side channel
        mg = 16 * G         # distinct (partition, order) runs
        m_run = per_g // 16
        assert m_run >= L and per_g % 16 == 0, (per_g, L)

        def check(out):
            jj = np.arange(L, dtype=np.int64)
            exp_rs = 8 * G * m_run * (m_run - 1)
            return (bool((out["k"] == 0).all())
                    and np.array_equal(out["v"].astype(np.int64),
                                       16 * G * jj)
                    and bool((out["rs"].astype(np.int64)
                              == exp_rs).all())
                    and np.array_equal(out["rn"].astype(np.int64),
                                       jj + 1)
                    and np.array_equal(out["fc"].astype(np.int64),
                                       np.minimum(jj + 1, 3)))
    elif verb == "vvjoin":
        # virtual x virtual fused join->GROUP BY: both sides
        # device-generated (neither crosses the tunnel). fk = i mod ND
        # matches every unique dim key exactly nf/ND times, so with
        # grp = dk & 15 the per-group closed forms are exact:
        # c_g = nf/16, s_g = (nf/ND) * sum_{t} (2*(g+16t)+1).
        nf = min(n, 1 << 29)            # per-side residency bound
        nd = min(nf >> 2, 1 << 27)
        assert nd % 16 == 0 and nf % nd == 0, (nf, nd)
        db.register_virtual("bigfact", nf, {
            "fk": lambda i: i & jnp.uint32(nd - 1),
            "v": lambda i: i,
        })
        db.register_virtual("bigdim", nd, {
            "dk": lambda i: i,
            "w": lambda i: 2 * i + jnp.uint32(1),
            "grp": lambda i: i & jnp.uint32(15),
        })
        sql = ("SELECT grp, COUNT(*) AS c, SUM(w) AS s FROM bigfact "
               "JOIN bigdim ON fk = dk GROUP BY grp ORDER BY grp")
        rows = nf + nd
        n = rows
        mg = 16
        t_dim = nd // 16

        def check(out):
            g = np.arange(16, dtype=np.int64)
            exp_c = nf // 16
            # sum over t in 0..t_dim-1 of (2*(g+16t)+1), times nf/nd
            exp_s = [(nf // nd) * (t_dim * (2 * int(gg) + 1)
                                   + 16 * t_dim * (t_dim - 1))
                     for gg in g]
            return (np.array_equal(out["grp"].astype(np.int64), g)
                    and bool((out["c"].astype(np.int64) == exp_c).all())
                    and [int(x) for x in out["s"]] == exp_s)
    elif verb == "setops":
        h = n // 2
        db.register_virtual("seta", h,
                            {"k": lambda i: i & jnp.uint32(G - 1)})
        db.register_virtual("setb", h, {
            "k": lambda i: (i & jnp.uint32(G // 2 - 1))
            + jnp.uint32(G // 2)})
        sql = "SELECT k FROM seta INTERSECT SELECT k FROM setb"

        def check(out):
            return np.array_equal(np.sort(out["k"]),
                                  np.arange(G // 2, G, dtype=np.uint32))
    else:
        raise SystemExit(f"unknown --verb {verb!r}")

    stats: dict = {}
    np.asarray(jnp.zeros(8, jnp.uint32)[:1])  # tunnel/first-transfer
    t0 = time.perf_counter()                  # warmup (house rule:
    out = db.sql(sql, run_size=args.run_size,  # never time the first
                 max_groups=mg, stats=stats)   # transfer — BASELINE.md)
    wall = time.perf_counter() - t0 - stats.get("compile_s", 0.0)
    ok = bool(check(out))
    print(json.dumps({
        "metric": f"out-of-core SQL {verb} {n} rows, 1 chip",
        "value": round(rows / wall),
        "unit": "rows/s",
        "time_s": round(wall, 3),
        "compile_s": round(stats.get("compile_s", 0.0), 3),
        "sql": sql,
        "verified": ok,
        "device": device_kind(),
    }))
    return 0 if ok else 1


def _cmd_bench_bigsql(args) -> int:
    """Out-of-core SQL GROUP BY over a virtual table, with closed-form
    verification: k = hash(i) & (groups-1), v = i — so after GROUP BY k
    the counts sum to n, the exact u64 SUM(v) total is n(n-1)/2, the
    global MIN is 0 and the global MAX is n-1 (min/max checked without
    --where; the WHERE variant checks count totals against a host
    recount of the mask on hash-regenerated indices)."""
    if args.verb != "groupby":
        return _cmd_bench_bigsql_verb(args)
    import json
    import time

    import jax.numpy as jnp
    import numpy as np

    from tpu_qe.bench.sol import device_kind
    from tpu_qe.hashing import murmur_fmix32, murmur_fmix32_numpy
    from tpu_qe.sql import Database

    n, groups = args.n, args.groups
    assert groups & (groups - 1) == 0

    db = Database()
    db.register_virtual("big", n, {
        "k": lambda i: murmur_fmix32(i) & jnp.uint32(groups - 1),
        "v": lambda i: i,
    })
    sel = "k, COUNT(*) AS c, SUM(v) AS s, MIN(v) AS mn, MAX(v) AS mx"
    if args.median:
        sel += ", MEDIAN(v) AS md"
    where = " WHERE v % 4 <> 3" if args.where else ""
    sql = f"SELECT {sel} FROM big{where} GROUP BY k"

    stats: dict = {}
    np.asarray(jnp.zeros(8, jnp.uint32)[:1])  # first-transfer warmup
    t0 = time.perf_counter()
    out = db.sql(sql, run_size=args.run_size, max_groups=groups,
                 stats=stats)
    wall = time.perf_counter() - t0 - stats.get("compile_s", 0.0)

    c_total = int(out["c"].astype(np.int64).sum())
    s_total = int(out["s"].astype(np.uint64).sum())
    if args.where:
        # closed-form expectations for the WHERE i % 4 != 3 mask over
        # index space (exact python ints)
        m = len(range(3, n, 4))
        dropped_sum = m * 3 + 4 * (m * (m - 1) // 2)
        exp_c = n - m
        exp_s = (n * (n - 1)) // 2 - dropped_sum
        ok = (c_total == exp_c and s_total == (exp_s % (1 << 64)))
    else:
        ok = (c_total == n and s_total == ((n * (n - 1)) // 2)
              and int(out["mn"].min()) == 0
              and int(out["mx"].max()) == n - 1
              and len(out["k"]) == groups)
        if args.median:
            ok = ok and len(out["md"]) == groups
    out_j = {
        "metric": f"out-of-core SQL GROUP BY {n} rows -> "
                  f"{len(out['k'])} groups, 1 chip"
                  + (" (+MEDIAN)" if args.median else "")
                  + (" (+WHERE)" if args.where else ""),
        "value": round(n / wall),
        "unit": "rows/s",
        "time_s": round(wall, 3),
        "phase_runs_s": round(stats.get("runs_s", 0.0), 3),
        "phase_combine_s": round(stats.get("combine_s", 0.0), 3),
        "phase_pct_s": round(stats.get("pct_s", 0.0), 3),
        "compile_s": round(stats.get("compile_s", 0.0), 3),
        "verified": bool(ok),
        "device": device_kind(),
    }
    print(json.dumps(out_j))
    return 0 if ok else 1


def _cmd_info(args) -> int:
    import jax

    from tpu_qe.bench.sol import device_kind, hbm_peak_bytes_per_s
    from tpu_qe.config import EngineConfig

    cfg = EngineConfig.from_env()
    print(f"devices: {jax.devices()}")
    print(f"device_kind: {device_kind()}")
    print(f"hbm_peak: {hbm_peak_bytes_per_s() / 1e9:.0f} GB/s")
    print(f"config: {cfg}")
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="tpu_qe")
    parser.add_argument("-v", "--verbose", action="store_true")
    sub = parser.add_subparsers(dest="cmd", required=True)

    pv = sub.add_parser("verify", help="headless verify run (TPU vs oracle)")
    pv.add_argument("--vertices", type=int, default=1000)
    pv.add_argument("--triangles", type=int, default=3000)
    pv.add_argument("--seed", type=int, default=7)
    pv.add_argument("--backend", type=str, default="xla_tiebreak",
                    help="sort backend; the pipeline payload is the unique "
                         "triangle index, so xla_tiebreak is bit-identical "
                         "to xla and faster")
    pv.add_argument("--bits-per-pass", type=int, default=8)
    pv.add_argument("--num-passes", type=int, default=8,
                    help="e.g. --bits-per-pass 6 --num-passes 11 for the "
                         "reference's 6-bit test variant")
    pv.add_argument("--trace-dir", type=str, default=None)
    pv.set_defaults(fn=_cmd_verify)

    pd = sub.add_parser("dump", help="golden-file dump (morton codes, indices)")
    pd.add_argument("--vertices", type=int, default=1000)
    pd.add_argument("--triangles", type=int, default=3000)
    pd.add_argument("--seed", type=int, default=7)
    pd.add_argument("--quirk-lut", action="store_true",
                    help="consume the LUTs exactly like the SHIPPED "
                         "reference kernel (morton_code.wgsl:72-74 i*3 "
                         "byte shift) instead of the resolved i*8 layout")
    pd.add_argument("--codes-path", type=str, default="morton_codes.txt")
    pd.add_argument("--indices-path", type=str, default="indices.txt")
    pd.set_defaults(fn=_cmd_dump)

    pb = sub.add_parser("bench", help="headline benchmark")
    pb.add_argument("rest", nargs=argparse.REMAINDER)
    pb.set_defaults(fn=_cmd_bench)

    pm = sub.add_parser("bench-matrix", help="operator benchmark matrix")
    pm.add_argument("rest", nargs=argparse.REMAINDER)
    pm.set_defaults(fn=_cmd_bench_matrix)

    pk = sub.add_parser("bench-kernels", help="per-kernel benchmarks vs SOL")
    pk.add_argument("rest", nargs=argparse.REMAINDER)
    pk.set_defaults(fn=_cmd_bench_kernels)

    pg = sub.add_parser("bench-big",
                        help="out-of-core big sort (north-star config)")
    pg.add_argument("--n", type=int, default=1 << 30)
    pg.add_argument("--run-size", type=int, default=1 << 26)
    pg.add_argument("--buckets", type=int, default=None)
    pg.add_argument("--verbose-big", action="store_true")
    pg.add_argument("--in-core", action="store_true",
                    help="single resident sort+verify program (fits up to "
                         "~512M rows on a 16 GB chip)")
    pg.add_argument("--distributed", action="store_true",
                    help="distributed out-of-core sort over the device "
                         "mesh (sort/dbigsort.py); --buckets is then "
                         "buckets PER DEVICE")
    pg.add_argument("--devices", type=int, default=None,
                    help="mesh size for --distributed (default: all)")
    pg.add_argument("--checkpoint-dir", type=str, default=None,
                    help="persist the plan + per-bucket completion here; "
                         "a killed run resumes with identical output")
    pg.add_argument("--strategy", default="partition",
                    choices=["partition", "merge"],
                    help="partition-first (one full sort per key; "
                         "round 5) vs sort-runs-then-merge (round 3)")
    pg.add_argument("--force-composed", action="store_true",
                    help="keep the composed exchange machinery even at "
                         "D=1 (default delegates to the single-chip "
                         "driver — nothing to exchange)")
    pg.add_argument("--trace-dir", type=str, default=None,
                    help="write an XProf trace of the whole run here")
    pg.add_argument("--payload-cols", type=int, default=1,
                    help="u32 payload columns per row (>= 1): index + "
                         "carried value columns (table-shaped rows; "
                         "single-chip path)")
    pg.set_defaults(fn=_cmd_bench_big)

    pj = sub.add_parser("bench-bigjoin",
                        help="out-of-core FK join (lifts the 2^30 "
                             "combined-row cap by key-space bucketing)")
    pj.add_argument("--n-left", type=int, default=1 << 29)
    pj.add_argument("--n-right", type=int, default=1 << 29)
    pj.add_argument("--buckets", type=int, default=None,
                    help="bucket count; with --distributed, buckets PER "
                         "DEVICE")
    pj.add_argument("--run-size", type=int, default=1 << 26,
                    help="per-device run size for --distributed")
    pj.add_argument("--distributed", action="store_true",
                    help="distributed out-of-core join over the device "
                         "mesh (ops/dbigjoin.py)")
    pj.add_argument("--devices", type=int, default=None,
                    help="mesh size for --distributed (default: all)")
    pj.add_argument("--checkpoint-dir", type=str, default=None,
                    help="persist the bucket plan + completion here; a "
                         "killed run resumes with identical output")
    pj.add_argument("--force-composed", action="store_true",
                    help="keep the exchange machinery even at D=1")
    pj.add_argument("--outer", nargs="?", const="full",
                    choices=("left", "full"), default=None,
                    help="run the out-of-core OUTER join instead "
                         "(ops/bigouter.py; default FULL)")
    pj.add_argument("--verbose-big", action="store_true")
    pj.set_defaults(fn=_cmd_bench_bigjoin)

    pa = sub.add_parser("bench-bigagg",
                        help="out-of-core GROUP BY (partial-aggregate "
                             "runs + one in-core combine)")
    pa.add_argument("--n", type=int, default=1 << 30)
    pa.add_argument("--groups", type=int, default=1 << 20)
    pa.add_argument("--run-size", type=int, default=1 << 26)
    pa.add_argument("--minmax", action="store_true",
                    help="also aggregate per-group min+max")
    pa.add_argument("--value-cols", type=int, default=1,
                    help="SQL-shaped multi-column sums sharing one key "
                         "sort per run (single-chip path)")
    pa.add_argument("--distributed", action="store_true",
                    help="distributed out-of-core aggregate over the "
                         "device mesh (ops/dbigagg.py)")
    pa.add_argument("--devices", type=int, default=None,
                    help="mesh size for --distributed (default: all)")
    pa.add_argument("--checkpoint-dir", type=str, default=None,
                    help="persist per-run partial tables here (single-"
                         "chip path); a killed run resumes from them")
    pa.add_argument("--force-composed", action="store_true",
                    help="keep the combine-tree machinery even at D=1")
    pa.add_argument("--verbose-big", action="store_true")
    pa.set_defaults(fn=_cmd_bench_bigagg)

    pp = sub.add_parser("bench-bigpipe",
                        help="fused out-of-core join -> GROUP BY "
                             "(join output never materialized)")
    pp.add_argument("--n-left", type=int, default=1 << 29)
    pp.add_argument("--n-right", type=int, default=1 << 29)
    pp.add_argument("--groups", type=int, default=1 << 16)
    pp.add_argument("--buckets", type=int, default=None)
    pp.add_argument("--verbose-big", action="store_true")
    pp.add_argument("--run-size", type=int, default=1 << 26,
                    help="per-device run size for --distributed")
    pp.add_argument("--distributed", action="store_true",
                    help="fused distributed out-of-core pipeline "
                         "(ops/dbigpipe.py)")
    pp.add_argument("--devices", type=int, default=None,
                    help="mesh size for --distributed (default: all)")
    pp.add_argument("--force-composed", action="store_true",
                    help="keep the composed machinery even at D=1")
    pp.set_defaults(fn=_cmd_bench_bigpipe)

    pt = sub.add_parser("bench-bigtopk",
                        help="out-of-core top-k (per-run selection + "
                             "one candidate combine)")
    pt.add_argument("--n", type=int, default=1 << 30)
    pt.add_argument("--k", type=int, default=1 << 10)
    pt.add_argument("--run-size", type=int, default=1 << 26)
    pt.add_argument("--largest", action="store_true")
    pt.add_argument("--distributed", action="store_true",
                    help="distributed out-of-core top-k over the device "
                         "mesh (ops/dbigtopk.py)")
    pt.add_argument("--devices", type=int, default=None,
                    help="mesh size for --distributed (default: all)")
    pt.add_argument("--force-composed", action="store_true",
                    help="keep the candidate-tree machinery even at D=1")
    pt.add_argument("--verbose-big", action="store_true")
    pt.set_defaults(fn=_cmd_bench_bigtopk)

    po = sub.add_parser("bench-bigorderby",
                        help="out-of-core multi-column ORDER BY "
                             "(transformed-plane external sample sort)")
    po.add_argument("--n", type=int, default=1 << 30)
    po.add_argument("--a-card", type=int, default=None,
                    help="distinct values of the DESC u64 column")
    po.add_argument("--run-size", type=int, default=1 << 26)
    po.add_argument("--buckets", type=int, default=None)
    po.add_argument("--distributed", action="store_true",
                    help="distributed out-of-core ORDER BY over the "
                         "device mesh (ops/dbigorderby.py)")
    po.add_argument("--devices", type=int, default=None,
                    help="mesh size for --distributed (default: all)")
    po.add_argument("--force-composed", action="store_true",
                    help="keep the composed machinery even at D=1")
    po.add_argument("--verbose-big", action="store_true")
    po.set_defaults(fn=_cmd_bench_bigorderby)

    pd = sub.add_parser("bench-bigdistinct",
                        help="out-of-core COUNT(DISTINCT) GROUP BY "
                             "(per-run pair dedup + one combine)")
    pd.add_argument("--n", type=int, default=1 << 30)
    pd.add_argument("--groups", type=int, default=1 << 16)
    pd.add_argument("--values", type=int, default=1 << 8,
                    help="distinct values per group (G*V pairs bound "
                         "the per-run dedup output)")
    pd.add_argument("--run-size", type=int, default=1 << 26)
    pd.add_argument("--distributed", action="store_true",
                    help="distributed out-of-core COUNT DISTINCT over "
                         "the device mesh (ops/dbigdistinct.py)")
    pd.add_argument("--devices", type=int, default=None,
                    help="mesh size for --distributed (default: all)")
    pd.add_argument("--force-composed", action="store_true",
                    help="keep the composed machinery even at D=1")
    pd.add_argument("--verbose-big", action="store_true")
    pd.set_defaults(fn=_cmd_bench_bigdistinct)

    ps = sub.add_parser("bench-bigsetops",
                        help="out-of-core UNION/INTERSECT/EXCEPT "
                             "(per-run key dedup + one combine)")
    ps.add_argument("--op", choices=["union", "intersect", "except"],
                    default="intersect")
    ps.add_argument("--n-a", type=int, default=1 << 29)
    ps.add_argument("--n-b", type=int, default=1 << 29)
    ps.add_argument("--g-a", type=int, default=1 << 20)
    ps.add_argument("--g-b", type=int, default=1 << 20)
    ps.add_argument("--offset", type=int, default=1 << 19,
                    help="B key-range offset (dials the overlap)")
    ps.add_argument("--run-size", type=int, default=1 << 26)
    ps.add_argument("--distributed", action="store_true",
                    help="distributed out-of-core set op over the "
                         "device mesh (ops/dbigsetops.py)")
    ps.add_argument("--devices", type=int, default=None,
                    help="mesh size for --distributed (default: all)")
    ps.add_argument("--force-composed", action="store_true",
                    help="keep the composed machinery even at D=1")
    ps.add_argument("--verbose-big", action="store_true")
    ps.set_defaults(fn=_cmd_bench_bigsetops)

    pq = sub.add_parser("bench-bigquantile",
                        help="out-of-core exact quantiles (sorted runs "
                             "+ bitwise selection; no merge phase)")
    pq.add_argument("--n", type=int, default=1 << 30)
    pq.add_argument("--qs", type=str, default="0.01,0.25,0.5,0.9,0.99",
                    help="comma-separated quantiles in [0,1]")
    pq.add_argument("--cont", action="store_true",
                    help="PERCENTILE_CONT (floor/ceil rank pairs + "
                         "exact fractional numerators)")
    pq.add_argument("--run-size", type=int, default=1 << 26)
    pq.add_argument("--distributed", action="store_true",
                    help="distributed out-of-core quantiles over the "
                         "device mesh (ops/dbigquantile.py)")
    pq.add_argument("--devices", type=int, default=None,
                    help="mesh size for --distributed (default: all)")
    pq.add_argument("--verbose-big", action="store_true")
    pq.set_defaults(fn=_cmd_bench_bigquantile)

    pw = sub.add_parser("bench-bigwindow",
                        help="out-of-core window functions (bucketed "
                             "sort + sequential carry chain)")
    pw.add_argument("--n", type=int, default=1 << 29)
    pw.add_argument("--partitions", type=int, default=None)
    pw.add_argument("--run-size", type=int, default=1 << 26)
    pw.add_argument("--buckets", type=int, default=None)
    pw.add_argument("--checkpoint-dir", type=str, default=None,
                    help="persist the plan + done-prefix carries here")
    pw.add_argument("--distributed", action="store_true",
                    help="distributed out-of-core window over the device "
                         "mesh (ops/dbigwindow.py)")
    pw.add_argument("--devices", type=int, default=None,
                    help="mesh size for --distributed (default: all)")
    pw.add_argument("--force-composed", action="store_true",
                    help="keep the composed machinery even at D=1")
    pw.add_argument("--verbose-big", action="store_true")
    pw.set_defaults(fn=_cmd_bench_bigwindow)

    pz = sub.add_parser("bench-bigsql",
                        help="out-of-core SQL: GROUP BY aggregates over "
                             "a device-generated virtual table "
                             "(sql/bigexec.py)")
    pz.add_argument("--n", type=int, default=1 << 30)
    pz.add_argument("--run-size", type=int, default=1 << 26)
    pz.add_argument("--groups", type=int, default=1 << 16)
    pz.add_argument("--median", action="store_true",
                    help="add MEDIAN(v) (the per-group bisection phase)")
    pz.add_argument("--where", action="store_true",
                    help="add a WHERE filter (fused validity mask)")
    pz.add_argument("--verb", default="groupby",
                    choices=["groupby", "orderby", "head", "distinct",
                             "countdistinct", "join", "window",
                             "setops", "range", "vvjoin"],
                    help="which big-SQL verb to measure (each verified "
                         "against a closed form at full scale)")
    pz.set_defaults(fn=_cmd_bench_bigsql)

    pi = sub.add_parser("info", help="device + config report")
    pi.set_defaults(fn=_cmd_info)

    # argparse mishandles REMAINDER after a bare "--" separator (the
    # documented `python -m tpu_qe bench-matrix -- --scale 0.01` form):
    # split manually and append to the subcommand's rest args.
    argv = list(sys.argv[1:] if argv is None else argv)
    tail = None
    if "--" in argv:
        i = argv.index("--")
        argv, tail = argv[:i], argv[i + 1:]
    args = parser.parse_args(argv)
    if tail is not None:
        if not hasattr(args, "rest"):
            parser.error(
                f"subcommand {args.cmd!r} takes its options directly "
                f"(no '--' separator); got trailing args {tail}")
        args.rest = [a for a in (args.rest or []) if a != "--"] + tail
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(levelname)s %(name)s: %(message)s")
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
