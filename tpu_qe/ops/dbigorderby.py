"""Distributed x out-of-core multi-column ORDER BY.

ops/bigorderby.py runs the external sample sort over TRANSFORMED key
planes (DESC = inverted bits) on one chip; this composes it with the
mesh exactly like sort/dbigsort.py — but on the composite
(t1, t2, t3, index) order, so mixed-direction multi-column ordering
scales past one device's HBM:

  phase A   every device forms R locally-sorted runs of its shard
            (transformed planes + index + payload, one lexicographic
            sort each);
  phase B   composite 4-plane splitters at the (D*B)-quantiles from
            all_gathered per-run samples; exact per-run boundaries
            (multi-plane searchsorted) — capacities are demand-sized
            with zero sampling error;
  phase X   the column-generic per-run segment all_to_all of dbigsort
            (two-tier: diagonal shares never touch the interconnect)
            moves each run's contiguous per-destination slices;
  phase C   per bucket round (fully parallel across devices — ORDER BY
            has no cross-bucket recurrence): one sort of the received
            segments + on-device verification.

On-device certificates per bucket: full lexicographic sortedness incl.
the index tie-break (stability), every row's planes + payload
re-derived from its carried index (each output row is a genuine input
row), exact counts, a per-bucket exact u64 index sum (host-summed to
the n(n-1)/2 permutation certificate), and first/last composite tuples
(host-chained cross-bucket boundary order in global bucket order).

Data model and verification semantics are bigorderby's (ORDER BY
a DESC, b ASC, stable); tests assert bit-identity against the
single-chip driver's collected rows and the numpy oracle.

Reference contrast: one device, one queue submit
(/root/reference/src/main.rs:727); SURVEY §2c mandates the scaled
composition — applied here to the ORDER BY surface.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_qe.exchange.shuffle import AXIS
from tpu_qe.ops.bigorderby import (BigOrderByResult, N_COLS, _cols_of,
                                   order_by_big)
from tpu_qe.ops.bigwindow import _searchsorted_multi
from tpu_qe.ops.segscan import cumsum_u64_pair
from tpu_qe.sort.dbigsort import _exchange_fn, _quantize

_ONES = jnp.uint32(0xFFFFFFFF)
# scalar outputs per bucket round: s_ok, h_ok, cnt, isum_lo, isum_hi,
# first (t1,t2,t3), last (t1,t2,t3) — N_CHECK + 1 == 11 total
N_CHECK = 10


# ----------------------------------------------------------------- phase A

def _runner_fn(mesh: Mesh, n_local: int, run_size: int, a_card: int,
               seed: int):
    def body(r):
        d = jax.lax.axis_index(AXIS).astype(jnp.uint32)
        base = d * jnp.uint32(n_local) + r * jnp.uint32(run_size)
        idx = base + jnp.arange(run_size, dtype=jnp.uint32)
        t1, t2, t3, pay = _cols_of(idx, a_card, seed)
        out = jax.lax.sort([t1, t2, t3, idx, pay], num_keys=4,
                           is_stable=False)
        return tuple(out)

    fn = shard_map(body, mesh=mesh, in_specs=(P(),),
                   out_specs=tuple([P(AXIS)] * N_COLS), check_vma=False)
    return jax.jit(fn)


# ----------------------------------------------------------------- phase B

def _planner_fn(mesh: Mesh, n_runs: int, n_buckets_total: int,
                per_run: int, run_size: int):
    def body(*run_cols):
        stride = max(run_size // per_run, 1)
        sel = (jnp.arange(per_run) * stride) % run_size
        smp = [[] for _ in range(4)]
        for r in range(n_runs):
            for j in range(4):
                smp[j].append(jnp.take(run_cols[N_COLS * r + j], sel))
        g = [jax.lax.all_gather(jnp.concatenate(s), AXIS).reshape(-1)
             for s in smp]
        g = jax.lax.sort(g, num_keys=4, is_stable=False)
        total = g[0].shape[0]
        q = (jnp.arange(1, n_buckets_total) * total) // n_buckets_total
        sp = [p[q] for p in g]
        bounds = jnp.stack([
            _searchsorted_multi(
                tuple(run_cols[N_COLS * r: N_COLS * r + 4]), sp)
            for r in range(n_runs)])
        return bounds

    specs = tuple([P(AXIS)] * (N_COLS * n_runs))
    fn = shard_map(body, mesh=mesh, in_specs=specs,
                   out_specs=P(AXIS, None), check_vma=False)
    return jax.jit(fn)


# ----------------------------------------------------------------- phase C

def _merger_fn(mesh: Mesh, n_runs: int, n_dev: int, cap_blk: int,
               cap_seg: int, a_card: int, seed: int, collect: bool):
    def body(starts, deltas, sizes, *block_cols):
        ar = jnp.arange(cap_seg, dtype=jnp.uint32)
        segs = [[] for _ in range(N_COLS)]
        for r in range(n_runs):
            cols = block_cols[N_COLS * r: N_COLS * (r + 1)]
            for sdev in range(n_dev):
                st = starts[r, sdev]
                d = deltas[r, sdev].astype(jnp.uint32)
                sz = sizes[r, sdev].astype(jnp.uint32)
                in_seg = (ar >= d) & (ar < d + sz)
                si = jnp.int32(sdev)
                for c in range(N_COLS):
                    sl = jax.lax.dynamic_slice(cols[c], (si, st),
                                               (1, cap_seg))[0]
                    fill = jnp.uint32(0) if c == N_COLS - 1 else _ONES
                    segs[c].append(jnp.where(in_seg, sl, fill))
        t1, t2, t3, ridx, pay = [jnp.concatenate(s) for s in segs]
        n_valid = jnp.sum(sizes).astype(jnp.uint32)
        st1, st2, st3, sidx, spay = jax.lax.sort(
            [t1, t2, t3, ridx, pay], num_keys=4, is_stable=False)
        m = st1.shape[0]
        pos = jnp.arange(m, dtype=jnp.uint32)
        valid = pos < n_valid

        def prev(x):
            return jnp.concatenate([jnp.zeros((1,), x.dtype), x[:-1]])

        lt = jnp.zeros(m, bool)
        for pv, cv in ((prev(sidx), sidx), (prev(st3), st3),
                       (prev(st2), st2), (prev(st1), st1)):
            lt = (pv < cv) | ((pv == cv) & lt)
        s_ok = jnp.all(jnp.where(valid & (pos > 0), lt, True))
        w1, w2, w3, wpay = _cols_of(sidx, a_card, seed)
        h_ok = jnp.all(jnp.where(
            valid, (st1 == w1) & (st2 == w2) & (st3 == w3)
            & (spay == wpay), True))
        clo, chi = cumsum_u64_pair(jnp.where(valid, sidx, 0))
        li = jnp.maximum(n_valid, 1) - 1
        outs = (s_ok, h_ok, n_valid, clo[-1], chi[-1],
                st1[0], st2[0], st3[0],
                st1[li], st2[li], st3[li])
        outs = tuple(x.reshape(1) for x in outs)
        if collect:
            outs = outs + (st1, st2, st3, sidx, spay)
        return outs

    plan = P(AXIS, None)
    out_specs = [P(AXIS)] * (N_CHECK + 1) \
        + ([P(AXIS)] * N_COLS if collect else [])
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(plan, plan, plan) + tuple([plan] * (N_COLS * n_runs)),
        out_specs=tuple(out_specs), check_vma=False)
    return jax.jit(fn)


def order_by_big_distributed(n: int, mesh: Mesh,
                             a_card: int | None = None,
                             run_size: int = 1 << 26,
                             buckets_per_dev: int | None = None,
                             seed: int = 7, samples_per_run: int = 4096,
                             verbose: bool = False, collect: bool = False,
                             force_composed: bool = False):
    """Distributed + out-of-core ORDER BY a DESC, b ASC over `mesh`.

    n divisible by D * run_size, < 2^31. D == 1 delegates to the
    single-chip order_by_big (force_composed keeps the composed
    machinery). Returns BigOrderByResult (+ collected rows in global
    order when collect=True — small-n oracle tests only)."""
    n_dev = int(mesh.shape[AXIS])
    if a_card is None:
        a_card = max(n // 256, 1)
    if n_dev == 1 and not force_composed:
        return order_by_big(n, a_card=a_card, run_size=run_size,
                            n_buckets=buckets_per_dev, seed=seed,
                            samples_per_run=samples_per_run,
                            verbose=verbose, collect=collect)
    assert n % (n_dev * run_size) == 0, \
        (f"n must be a multiple of devices*run_size "
         f"(n={n}, devices={n_dev}, run_size={run_size})")
    assert n < (1 << 31), n
    n_local = n // n_dev
    n_runs = n_local // run_size
    if buckets_per_dev is None:
        buckets_per_dev = max(1, int(np.ceil(n_local / (1 << 26))))
    n_b = buckets_per_dev
    S = n_dev * n_b
    per_run = min(samples_per_run, run_size)
    quantum = 1 << 20 if run_size >= (1 << 22) else 256

    rep = NamedSharding(mesh, P())
    plan_sh = NamedSharding(mesh, P(AXIS, None))

    def _rep(x):
        return jax.device_put(x, rep)

    def _plan_put(x):
        return jax.device_put(jnp.asarray(x, jnp.int32), plan_sh)

    tc0 = time.perf_counter()
    np.asarray(jnp.zeros(8, jnp.uint32)[:1])
    runner = _runner_fn(mesh, n_local, run_size, a_card, seed)
    run_exec = runner.lower(_rep(jnp.uint32(0))).compile()
    compile_s = time.perf_counter() - tc0

    t0 = time.perf_counter()
    runs = [run_exec(_rep(jnp.uint32(r))) for r in range(n_runs)]
    for run in runs:
        np.asarray(jax.device_get(run[0][-1:]))
    t_a = time.perf_counter() - t0

    tcp = time.perf_counter()
    planner = _planner_fn(mesh, n_runs, S, per_run, run_size)
    flat_runs_in = tuple(a for run in runs for a in run)
    plan_exec = planner.lower(*flat_runs_in).compile()
    compile_s += time.perf_counter() - tcp
    t_b0 = time.perf_counter()
    bounds = np.asarray(plan_exec(*flat_runs_in)).reshape(
        n_dev, n_runs, S - 1)
    t_b = time.perf_counter() - t_b0

    zeros = np.zeros((n_dev, n_runs, 1), dtype=np.int64)
    full = np.full((n_dev, n_runs, 1), run_size, dtype=np.int64)
    pos = np.concatenate([zeros, bounds.astype(np.int64), full], axis=2)
    blk_edge = pos[:, :, 0:S + 1:n_b]
    blk_start = blk_edge[:, :, :-1]                      # (D, R, D)
    blk_size = blk_edge[:, :, 1:] - blk_start
    cap_blk = _quantize(int(blk_size.max()), quantum, run_size)
    eye = np.eye(n_dev, dtype=bool)[:, None, :]
    off_max = int(np.where(eye, 0, blk_size).max()) if n_dev > 1 else 0
    cap_off = _quantize(off_max, quantum, cap_blk) if n_dev > 1 else 16
    seg_size = pos[:, :, 1:] - pos[:, :, :-1]            # (D, R, S)
    cap_seg = _quantize(int(seg_size.max()), quantum, cap_blk)
    if verbose:
        print(f"dbigorderby: D={n_dev} R={n_runs} B={n_b} run={run_size} "
              f"cap_blk={cap_blk} cap_off={cap_off} cap_seg={cap_seg}")

    tcx = time.perf_counter()
    fills = (_ONES, _ONES, _ONES, _ONES, jnp.uint32(0))
    exchanger = _exchange_fn(mesh, n_dev, cap_blk, cap_off, fills=fills)
    iplan = _plan_put(np.zeros((n_dev, n_dev), np.int32))
    ex_exec = exchanger.lower(iplan, iplan, iplan, iplan, iplan,
                              *runs[0]).compile()
    compile_s += time.perf_counter() - tcx
    t_x0 = time.perf_counter()
    blocks = []
    off_ceiling = max(run_size - cap_off, 0)
    diag_ceiling = max(run_size - cap_blk, 0)
    for r in range(n_runs):
        raw = blk_start[:, r, :]
        clamped = np.minimum(raw, off_ceiling)
        clamped_d = np.minimum(raw, diag_ceiling)
        blocks.append(ex_exec(
            _plan_put(clamped), _plan_put(raw - clamped),
            _plan_put(blk_size[:, r, :]),
            _plan_put(clamped_d), _plan_put(raw - clamped_d), *runs[r]))
        runs[r] = None
    del runs
    for blk in blocks:
        np.asarray(jax.device_get(blk[0][-1:, -1:]))
    t_x = time.perf_counter() - t_x0

    ceil_mat = np.where(eye, diag_ceiling, off_ceiling)
    blk_clamped = np.minimum(blk_start, ceil_mat)
    blk_delta = blk_start - blk_clamped

    tcm = time.perf_counter()
    merger = _merger_fn(mesh, n_runs, n_dev, cap_blk, cap_seg,
                        a_card, seed, collect)
    mplan = _plan_put(np.zeros((n_dev * n_runs, n_dev), np.int32))
    flat_blocks = [a for blk in blocks for a in blk]
    merge_exec = merger.lower(mplan, mplan, mplan,
                              *flat_blocks).compile()
    compile_s += time.perf_counter() - tcm

    t_c0 = time.perf_counter()
    seg_ceiling = max(cap_blk - cap_seg, 0)
    pending = {}
    for b in range(n_b):
        g = np.arange(n_dev) * n_b + b
        ws = (blk_delta.transpose(2, 0, 1)
              + pos[:, :, :-1].transpose(0, 2, 1)[
                  np.arange(n_dev)[None, :], g[:, None], :]
              - blk_start.transpose(2, 0, 1))
        zs = seg_size.transpose(0, 2, 1)[
            np.arange(n_dev)[None, :], g[:, None], :]
        ws_c = np.minimum(ws, seg_ceiling)

        def _plan(x):
            return _plan_put(
                x.transpose(0, 2, 1).reshape(n_dev * n_runs, n_dev))

        pending[b] = merge_exec(_plan(ws_c), _plan(ws - ws_c), _plan(zs),
                                *flat_blocks)

    total = 0
    all_sorted = all_hash = boundary_ok = True
    isum = 0
    firsts, lasts = {}, {}
    counts = np.zeros((n_dev, n_b), np.int64)
    collected = {}
    for b, out in pending.items():
        vals = [np.asarray(x) for x in out[:N_CHECK + 1]]
        (s_ok, h_ok, cnt, slo_, shi_, f1, f2, f3, l1, l2, l3) = vals
        all_sorted &= bool(s_ok.all())
        all_hash &= bool(h_ok.all())
        total += int(cnt.sum())
        counts[:, b] = cnt
        isum += sum(int(lo) | (int(hi) << 32)
                    for lo, hi in zip(slo_, shi_))
        for t in range(n_dev):
            gidx = t * n_b + b
            firsts[gidx] = (int(f1[t]), int(f2[t]), int(f3[t]))
            lasts[gidx] = (int(l1[t]), int(l2[t]), int(l3[t]))
        if collect:
            ba = [np.asarray(a).reshape(n_dev, -1)
                  for a in out[N_CHECK + 1:]]
            for t in range(n_dev):
                c = int(cnt[t])
                collected[t * n_b + b] = tuple(a[t, :c] for a in ba)
    prev_last = None
    for gidx in range(S):
        t, b = divmod(gidx, n_b)
        if counts[t, b] == 0:
            continue
        if prev_last is not None:
            boundary_ok &= bool(prev_last <= firsts[gidx])
        prev_last = lasts[gidx]
    t_c = time.perf_counter() - t_c0

    dt = t_a + t_b + t_x + t_c
    res = BigOrderByResult(
        n=n, a_card=a_card, seconds=dt, rows_per_s=n / dt,
        sorted_ok=all_sorted, hash_ok=all_hash, boundary_ok=boundary_ok,
        count_ok=(total == n), perm_ok=(isum == n * (n - 1) // 2),
        phase_a_s=t_a, phase_c_s=t_c, compile_s=compile_s)
    if verbose:
        print(f"dbigorderby phases: A={t_a:.2f}s B={t_b:.2f}s "
              f"X={t_x:.2f}s C={t_c:.2f}s total={dt:.2f}s")
    if collect:
        cat = [np.concatenate([collected[g][j] for g in range(S)
                               if g in collected])
               for j in range(N_COLS)]
        t1, t2, t3, ridx, pay = cat
        a = ((~t2).astype(np.uint64)
             | ((~t1).astype(np.uint64) << np.uint64(32)))
        bcol = (t3 ^ np.uint32(0x80000000)).view(np.int32)
        return res, {"a": a, "b": bcol, "idx": ridx, "pay": pay}
    return res
