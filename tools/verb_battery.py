"""Round-5 out-of-core SQL verb battery at 1B rows, ONE process.

One process = one tunnel warmup (the first tiny-op readback costs
150-600 s on this transport — measured 2026-08-19; per-verb fresh
processes drowned the first battery's numbers in it). Each verb's
bench warms up and AOT-compiles before its timed region."""
import sys

from tpu_qe.__main__ import main

VERBS = ["orderby", "head", "distinct", "setops", "countdistinct",
         "join", "window", "range", "vvjoin"]

if __name__ == "__main__":
    n = str(1 << 30)
    rc = 0
    for v in VERBS:
        print(f"=== {v}", file=sys.stderr, flush=True)
        rc |= main(["bench-bigsql", "--verb", v, "--n", n])
    sys.exit(rc)
