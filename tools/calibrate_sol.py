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
    import jax
    import jax.numpy as jnp

    from tpu_qe.utils.timing import measure_chained

    n = 1 << 26
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32))
    c = jnp.arange(n, dtype=jnp.uint32)

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
                        # 3-operand segmented last-valid scan, strided-
                        # loop formulation as shipped in ops/join.py
                        # (tuple-carrier associative_scan stalls the
                        # remote TPU compiler — CLAUDE.md)
                        s = (x & 1).astype(bool)
                        f = (x & 2).astype(bool)
                        v = z
                        stride = 1
                        while stride < n:
                            sa = jnp.concatenate(
                                [jnp.zeros(stride, bool), s[:-stride]])
                            fa = jnp.concatenate(
                                [jnp.zeros(stride, bool), f[:-stride]])
                            va = jnp.concatenate(
                                [jnp.zeros(stride, v.dtype), v[:-stride]])
                            sb, fb = s, f
                            s = sa | sb
                            f = fb | (fa & ~sb)
                            v = jnp.where(fb, v, va)
                            stride *= 2
                        y = v
                    # keep all live without fusing across iterations
                    x = jax.lax.optimization_barrier(x ^ y)
                    return (x, y, z)
                return jax.lax.fori_loop(0, k, body, (a, b, c))
            import functools
            return functools.partial(run, a, b, c)
        return make

    k = 6
    t_stable = measure_chained(chain_sort(True), 1, k, reps=2)
    t_unstable = measure_chained(chain_sort(False), 1, k, reps=2)
    t_cummax = measure_chained(chain_scan("cummax"), 1, k, reps=2)
    t_seg = measure_chained(chain_scan("seg"), 1, k, reps=2)

    log2n2 = np.log2(n) ** 2
    sort_c = t_stable / (n * log2n2 * 3)
    print(f"n = {n}")
    print(f"stable 3-op sort:   {t_stable:.4f} s")
    print(f"unstable 3-op sort: {t_unstable:.4f} s")
    print(f"cummax sweep:       {t_cummax:.4f} s")
    print(f"seg 3-op scan:      {t_seg:.4f} s")
    print()
    print(f"_SORT_C = {sort_c:.3e}")
    print(f"_SORT_UNSTABLE = {t_unstable / t_stable:.3f}")
    print(f"_SCAN_C(cummax, 1 op) = {t_cummax / n:.3e}")
    print(f"_SCAN_C(seg, 3 op -> per-op) = {t_seg / n / 3:.3e}")


if __name__ == "__main__":
    main()
