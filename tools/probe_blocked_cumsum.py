#!/usr/bin/env python
"""One-off probe: blocked scan_assoc vs XLA cumsum/cummax at 64M.

Feeds the sol.py scan model (1-op point) and decides whether the hot
paths' jnp.cumsum / lax.cummax calls should move to the blocked scan.
"""
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from tpu_qe.ops.segscan import scan_assoc
    from tpu_qe.utils.timing import measure_chained

    n = 1 << 26
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32))

    def chain(kind):
        def make(k):
            @jax.jit
            def run(a, b):
                def body(i, carry):
                    x, y = carry
                    x = x ^ i.astype(jnp.uint32)
                    if kind == "blocked_cummax":
                        (y,) = scan_assoc(
                            lambda p, q: (jnp.maximum(p[0], q[0]),),
                            (0,), (x,))
                    elif kind == "blocked_cumsum":
                        (y,) = scan_assoc(
                            lambda p, q: (p[0] + q[0],), (0,), (x,))
                    elif kind == "blocked_cumsum_u64":
                        def comb(p, q):
                            lo = p[0] + q[0]
                            return (lo, p[1] + q[1]
                                    + (lo < q[0]).astype(jnp.uint32))
                        y, _ = scan_assoc(comb, (0, 0), (x, x & 0))
                    elif kind == "xla_cumsum":
                        y = jnp.cumsum(x, dtype=jnp.uint32)
                    elif kind == "xla_cumsum_u64":
                        lo = jnp.cumsum(x, dtype=jnp.uint32)
                        prev = jnp.concatenate(
                            [jnp.zeros(1, jnp.uint32), lo[:-1]])
                        y = jnp.cumsum((lo < prev).astype(jnp.uint32),
                                       dtype=jnp.uint32) ^ lo
                    else:
                        y = jax.lax.cummax(x)
                    x = jax.lax.optimization_barrier(x ^ y)
                    return (x, y)
                return jax.lax.fori_loop(0, k, body, (a, b))
            import functools
            return functools.partial(run, a, b)
        return make

    for kind in ("blocked_cummax", "blocked_cumsum", "blocked_cumsum_u64",
                 "xla_cumsum", "xla_cumsum_u64", "xla_cummax"):
        t = measure_chained(chain(kind), 1, 6, reps=2)
        print(f"{kind:20s}: {t * 1e3:8.2f} ms  ({t / n * 1e9:.3f} ns/elem)",
              flush=True)


if __name__ == "__main__":
    main()
