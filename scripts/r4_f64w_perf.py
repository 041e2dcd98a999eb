"""On-chip cost of the exact-f64 weighted tier (precision='f64').

The tier is an accuracy product, not a speed one — it runs G·D eager
passes of the exact integer digit engine (G = nonempty exponent groups,
D = digits per group) plus host digit prep, with a host→device transfer
per pass. Under the axon remote backend those transfers ride an HTTP
tunnel measured at ~9 MB/s (a first version of this probe at n=2**26
measured ONLY the tunnel: plain split took 58.6 s to move 512 MB), so
the meaningful chip-side statement is the PASS MODEL:

    device cost(f64) ≈ (G·D) × cost(one int32-digit weighted pass)

with the per-pass rates already measured in doc/perf_model.md's intN
table (10-16 GB/s kernel at the flagship config). This probe therefore
(a) prints the measured pass counts for the two weight shapes, and
(b) runs a SMALL e2e A/B (n=2**22, transfer-bound here, PCIe-bound on a
real TPU host) against a single-pass int32-weighted call on the same
data so the orchestration multiplier is an honest measured ratio rather
than a claim.

Cases:
  counts-like — f64 weights holding small integers (1 group × 2 digits:
      the common "weights are counts stored as float" shape);
  uniform     — np.random.rand f64 (~6 groups × 8 digits: the generic
      full-entropy worst case).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_f64w_perf.py
"""

import sys
import time

import numpy as np


def measure(fn, reps=2):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out)  # force host transfer: block_until_ready is
        # unreliable under the axon remote backend (CLAUDE.md)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    from xhistogram_tpu.core import _f64_weight_groups, histogram
    from xhistogram_tpu.ops.intweights import digits_for_bounds

    n = 1 << 22
    rng = np.random.RandomState(0)
    data = rng.rand(n).astype("f4")
    edges = np.linspace(0.0, 1.0, 129)
    cases = {
        "counts-like": rng.randint(0, 200, n).astype("f8"),
        "uniform": rng.rand(n),
    }
    w_int = rng.randint(0, 200, n).astype("i4")  # 2-digit single pass

    # single-pass reference: one int32-digit fused pass on the same data
    histogram(data, bins=edges, weights=w_int)  # warm
    t1p = measure(lambda: histogram(data, bins=edges, weights=w_int)[0])
    print(f"[ref] one int32-digit pass: {t1p*1e3:.0f} ms "
          f"(n={n}, transfer-bound in this harness)")

    for name, w in cases.items():
        groups = list(_f64_weight_groups(w))
        n_digits = [digits_for_bounds(K.min(), K.max()) for _, K in groups]
        passes = sum(n_digits)
        print(
            f"[{name}] groups={len(groups)} digits/group={n_digits} "
            f"-> {passes} engine passes",
            file=sys.stderr,
        )

        for prec in ("f64", "highest", None):
            histogram(data, bins=edges, weights=(
                w if prec == "f64" else w.astype("f4")
            ), precision=prec)  # warm every pipeline shape

        t64 = measure(lambda: histogram(
            data, bins=edges, weights=w, precision="f64")[0])
        thi = measure(lambda: histogram(
            data, bins=edges, weights=w.astype("f4"),
            precision="highest")[0])
        tsp = measure(lambda: histogram(
            data, bins=edges, weights=w.astype("f4"))[0])
        print(
            f"[{name}] passes={passes} | f64 {t64*1e3:.0f} ms "
            f"({t64/t1p:.1f}x one pass, {t64/tsp:.1f}x split, "
            f"{t64/thi:.1f}x highest) | highest {thi*1e3:.0f} ms | "
            f"split {tsp*1e3:.0f} ms"
        )

        # exactness is pinned by tests/test_f64_weights.py's rational
        # oracle; this probe is perf-only


if __name__ == "__main__":
    main()
