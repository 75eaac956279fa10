#!/usr/bin/env python
"""Calibrate the operator-envelope constants in tpu_qe/bench/sol.py.

Measures, with chained differential timing (the only trustworthy
methodology on this transport — CLAUDE.md):
  - _SORT_C:        flat variadic lax.sort cost per element*log2(n)^2*operand
  - _SORT_UNSTABLE: unstable/stable sort time ratio
  - _SCAN_C:        one cummax / associative_scan sweep per element*operand

Run on the target chip and paste the printed constants into sol.py.
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    import sys as _sys

    import jax
    import jax.numpy as jnp

    from tpu_qe.utils.timing import measure_chained

    section = _sys.argv[1] if len(_sys.argv) > 1 else "all"
    n = 1 << 26
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32))
    c = jnp.arange(n, dtype=jnp.uint32)

    if section in ("all", "sort_ops"):
        # marginal cost of PAYLOAD operands in a variadic sort: num_keys
        # fixed at 2, payload count p varied. The SOL model prices key
        # operands (comparisons + movement) and payload operands
        # (movement only) differently; this measures the ratio.
        def chain_sort_p(p):
            pays = [jnp.asarray(rng.integers(0, 1 << 32, n,
                                             dtype=np.uint32))
                    for _ in range(p)]

            def make(k):
                @jax.jit
                def run(a, b, *pays):
                    def body(i, carry):
                        x, y = carry[0], carry[1]
                        x = x ^ i.astype(jnp.uint32)
                        r = jax.lax.sort([x, y] + list(carry[2:]),
                                         num_keys=2, is_stable=True)
                        return tuple(r)
                    return jax.lax.fori_loop(0, k, body, (a, b) + tuple(pays))
                import functools
                return functools.partial(run, a, b, *pays)
            return make

        times = {}
        for p in (0, 1, 2, 3):
            times[p] = measure_chained(chain_sort_p(p), 1, 5, reps=2)
            print(f"stable 2-key sort + {p} payload ops: {times[p]:.4f} s",
                  flush=True)
        # linear fit of payload marginal vs the 0-payload baseline
        marg = np.polyfit(list(times), [times[p] for p in times], 1)[0]
        per_key_op = times[0] / 2
        print(f"payload marginal: {marg:.4f} s/op = "
              f"{marg / per_key_op:.3f} of a key operand")
        if section == "sort_ops":
            return

    if section in ("all", "sort_keys"):
        # KEY-count scaling: every operand a comparison key. The model's
        # linear-in-keys assumption is what this checks (a 4-key sort's
        # comparator may amortize against movement).
        def chain_sort_k(nk):
            cols = [jnp.asarray(rng.integers(0, 1 << 32, n,
                                             dtype=np.uint32))
                    for _ in range(nk)]

            def make(k):
                @jax.jit
                def run(*cols):
                    def body(i, carry):
                        x = carry[0] ^ i.astype(jnp.uint32)
                        r = jax.lax.sort([x] + list(carry[1:]),
                                         num_keys=nk, is_stable=False)
                        return tuple(r)
                    return jax.lax.fori_loop(0, k, body, tuple(cols))
                import functools
                return functools.partial(run, *cols)
            return make

        for nk in (1, 2, 3, 4):
            t = measure_chained(chain_sort_k(nk), 1, 5, reps=2)
            print(f"unstable {nk}-key sort ({nk} ops): {t:.4f} s "
                  f"({t / nk:.4f} s/op)", flush=True)
        if section == "sort_keys":
            return

    if section in ("all", "sort_scale"):
        # n-scaling of one fixed shape (2-key + 1 payload): does cost
        # track n*log2(n)^2 from 64M to 256M?
        for nn in (1 << 26, 1 << 28):
            aa = jnp.asarray(rng.integers(0, 1 << 32, nn, dtype=np.uint32))
            bb = jnp.asarray(rng.integers(0, 1 << 32, nn, dtype=np.uint32))
            cc = jnp.arange(nn, dtype=jnp.uint32)

            def make(k, aa=aa, bb=bb, cc=cc):
                @jax.jit
                def run(a, b, c):
                    def body(i, carry):
                        x, y, z = carry
                        x = x ^ i.astype(jnp.uint32)
                        r = jax.lax.sort([x, y, z], num_keys=2,
                                         is_stable=False)
                        return tuple(r)
                    return jax.lax.fori_loop(0, k, body, (a, b, c))
                import functools
                return functools.partial(run, aa, bb, cc)
            t = measure_chained(make, 1, 3, reps=2)
            print(f"unstable 2-key+1 sort, n={nn}: {t:.4f} s "
                  f"({t / nn * 1e9:.3f} ns/elem)", flush=True)
        if section == "sort_scale":
            return

    def chain_sort(stable):
        def make(k):
            @jax.jit
            def run(a, b, c):
                def body(i, carry):
                    x, y, z = carry
                    x = x ^ i.astype(jnp.uint32)
                    r = jax.lax.sort([x, y, z], num_keys=2,
                                     is_stable=stable)
                    return tuple(r)
                return jax.lax.fori_loop(0, k, body, (a, b, c))
            import functools
            return functools.partial(run, a, b, c)
        return make

    def chain_scan(kind):
        def make(k):
            @jax.jit
            def run(a, b, c):
                def body(i, carry):
                    x, y, z = carry
                    x = x ^ i.astype(jnp.uint32)
                    if kind == "cummax":
                        y = jax.lax.cummax(x)
                        z = z
                    else:
                        # 3-operand segmented last-valid scan — the
                        # SHIPPED blocked formulation (ops/segscan.py),
                        # same monoid as the join forward-fill
                        from tpu_qe.ops.segscan import scan_assoc

                        s = (x & 1).astype(bool)
                        f = (x & 2).astype(bool)

                        def comb(aa_, bb_):
                            sa, fa, va = aa_
                            sb, fb, vb = bb_
                            return (sa | sb, fb | (fa & ~sb),
                                    jnp.where(fb, vb, va))

                        _, _, y = scan_assoc(
                            comb, (False, False, 0), (s, f, z))
                    # keep all live without fusing across iterations
                    x = jax.lax.optimization_barrier(x ^ y)
                    return (x, y, z)
                return jax.lax.fori_loop(0, k, body, (a, b, c))
            import functools
            return functools.partial(run, a, b, c)
        return make

    k = 6
    if section in ("all", "scans"):
        t_cummax = measure_chained(chain_scan("cummax"), 1, k, reps=2)
        t_seg = measure_chained(chain_scan("seg"), 1, k, reps=2)
        print(f"n = {n}")
        print(f"cummax sweep:       {t_cummax:.4f} s")
        print(f"seg 3-op blocked scan: {t_seg:.4f} s")
        print(f"_SCAN_C(cummax, 1 op) = {t_cummax / n:.3e}")
        print(f"_SCAN_C(seg, 3 op -> per-op) = {t_seg / n / 3:.3e}")
        if section == "scans":
            return

    t_stable = measure_chained(chain_sort(True), 1, k, reps=2)
    t_unstable = measure_chained(chain_sort(False), 1, k, reps=2)

    log2n2 = np.log2(n) ** 2
    sort_c = t_stable / (n * log2n2 * 3)
    print(f"n = {n}")
    print(f"stable 3-op sort:   {t_stable:.4f} s")
    print(f"unstable 3-op sort: {t_unstable:.4f} s")
    print()
    print(f"_SORT_C = {sort_c:.3e}")
    print(f"_SORT_UNSTABLE = {t_unstable / t_stable:.3f}")


if __name__ == "__main__":
    main()
