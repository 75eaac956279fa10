#!/usr/bin/env python
"""Scale-dependent lax.sort calibration (VERDICT r4 weak #2).

Chained differential timing of representative sort mixes at
64M / 128M / 256M; prints per-point implied _SORT_C values
(t / (n * log2(n)^2 * eff * f)) so sol.py can carry an n-dependent
constant instead of the single 64M point that underprices 200M+
sorts by 20-35% (round4_measured.jsonl)."""
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from tpu_qe.utils.timing import measure_chained

    PAY, UNST = 0.59, 0.75
    out = []
    for lg in (26, 27, 28):
        n = 1 << lg
        rng = np.random.default_rng(0)
        a0 = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32))
        b0 = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32))
        c0 = jnp.arange(n, dtype=jnp.uint32)

        def mk_chain(nops, nkeys, stable):
            def chain(k):
                @jax.jit
                def f(a, b, c):
                    ops = [a, b, c, c][:nops]
                    for i in range(k):
                        srt = jax.lax.sort(ops, num_keys=nkeys,
                                           is_stable=stable)
                        # perturb so successive sorts are real work,
                        # not CSE'able re-sorts of sorted data
                        ops = [srt[0] ^ jnp.uint32(i + 1)] \
                            + list(srt[1:])
                    return ops[0][:4]
                ex = f.lower(a0, b0, c0).compile()
                return lambda: ex(a0, b0, c0)
            return chain

        mixes = {
            "s2k1p": (mk_chain(3, 2, True), 2 + PAY, 1.0),
            "u3k1p": (mk_chain(4, 3, False), 3 + PAY, UNST),
            "u1k1p": (mk_chain(2, 1, False), 1 + PAY, UNST),
        }
        for nm, (chain, eff, f) in mixes.items():
            t = measure_chained(chain, 1, 3, reps=2)
            cc = t / (n * np.log2(n) ** 2 * eff * f)
            out.append((lg, nm, t, cc))
            print(f"n=2^{lg} {nm}: {t*1e3:.1f} ms  implied C = "
                  f"{cc:.3e}", flush=True)
        del a0, b0, c0
    for lg in (26, 27, 28):
        cs = [cc for (l, _, _, cc) in out if l == lg]
        print(f"n=2^{lg}: mean implied C = {np.mean(cs):.3e} "
              f"(spread {min(cs):.3e}..{max(cs):.3e})", flush=True)


if __name__ == "__main__":
    main()
