"""On-chip A/B of the r5 single-pass multi-digit engine (digN kernels)
vs the r4 one-pass-per-digit engine, on the exact wide-int and f64 tiers.

r4's engine (core._wide_int_digit_sums then) re-digitized the data once
per signed base-256 digit: 8-9 passes for full-range int64 weights,
G × D for precision='f64'. r5 packs the digits into signed base-2**32
WORDS (intweights.host_words) and runs ONE pass per word with the
per-digit-output "digN" kernels — one shared digitize + one int8 MXU
section per digit, outputs kept separate for the exact 64-bit host
combine. This probe measures both engines end-to-end on the same data
(the OLD engine is reconstructed inline: one public int32-weight
histogram call per host digit — exactly r4's loop), plus the f64 tier
e2e vs split/highest.

Under the axon tunnel the e2e numbers are transfer-inflated (~9 MB/s
host→device per pass operand); the transfer ALSO drops with the pass
count (each old pass shipped a 4 B/elem digit array; each new pass ships
one 4 B/elem word), so the measured ratio remains meaningful — and the
kernel-side pass model (digitize count) is printed alongside.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_digN_perf.py
"""

import sys
import time

import numpy as np


def measure(fn, reps=2):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out)  # force host transfer (CLAUDE.md: block_until_
        # ready is unreliable under the axon remote backend)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def old_engine(data, edges, w64):
    """r4's per-digit loop, byte-for-byte through the public API."""
    from xhistogram_tpu.core import histogram
    from xhistogram_tpu.ops import intweights as iw

    n_digits = iw.digits_for_bounds(w64.min(), w64.max())
    total = np.zeros(len(edges) - 1, np.uint64)
    for j, d in enumerate(iw.host_digits(w64, n_digits)):
        part, _ = histogram(data, bins=edges, weights=d)
        total = total + (
            np.asarray(part).astype(np.int64).astype(np.uint64)
            * np.uint64((256**j) % (1 << 64))
        )
    return total.view(np.int64)


def main():
    from xhistogram_tpu.core import _f64_weight_groups, histogram
    from xhistogram_tpu.ops import intweights as iw

    n = 1 << 22
    rng = np.random.RandomState(0)
    data = rng.rand(n).astype("f4")
    edges = np.linspace(0.0, 1.0, 129)

    # ---- wide int64 tier -------------------------------------------------
    w64 = rng.randint(-(2**62), 2**62, n).astype(np.int64)
    n_old = iw.digits_for_bounds(w64.min(), w64.max())
    words = iw.host_words(w64)
    n_digs = [
        iw.digits_for_bounds(w.min(), w.max(),
                             max_digits=iw.WORD_MAX_DIGITS)
        for w in words
    ]
    print(f"[int64] old: {n_old} digit passes | new: {len(words)} word "
          f"passes (digits {n_digs})", file=sys.stderr)

    h_new, _ = histogram(data, bins=edges, weights=w64)  # warm new
    h_old = old_engine(data, edges, w64)  # warm old
    assert np.array_equal(np.asarray(h_new).astype(np.int64), h_old), (
        "old/new engines disagree"
    )
    t_new = measure(lambda: histogram(data, bins=edges, weights=w64)[0])
    t_old = measure(lambda: old_engine(data, edges, w64))
    print(f"[int64] old {t_old*1e3:.0f} ms ({n_old} passes) | "
          f"new {t_new*1e3:.0f} ms ({len(words)} passes) | "
          f"speedup {t_old/t_new:.2f}x")

    # ---- f64 tier --------------------------------------------------------
    cases = {
        "counts-like": rng.randint(0, 200, n).astype("f8"),
        "uniform": rng.rand(n),
    }
    for name, w in cases.items():
        groups = list(_f64_weight_groups(w))
        old_passes = sum(
            iw.digits_for_bounds(K.min(), K.max()) for _, K in groups
        )
        new_passes = sum(len(iw.host_words(K)) for _, K in groups)
        print(f"[{name}] f64 passes: old {old_passes} -> new {new_passes}",
              file=sys.stderr)
        for prec in ("f64", "highest", None):
            histogram(data, bins=edges, weights=(
                w if prec == "f64" else w.astype("f4")
            ), precision=prec)  # warm
        t64 = measure(lambda: histogram(
            data, bins=edges, weights=w, precision="f64")[0])
        thi = measure(lambda: histogram(
            data, bins=edges, weights=w.astype("f4"),
            precision="highest")[0])
        tsp = measure(lambda: histogram(
            data, bins=edges, weights=w.astype("f4"))[0])
        print(f"[{name}] f64 {t64*1e3:.0f} ms ({new_passes} passes; "
              f"{t64/tsp:.1f}x split, {t64/thi:.1f}x highest) | "
              f"highest {thi*1e3:.0f} ms | split {tsp*1e3:.0f} ms")


if __name__ == "__main__":
    main()
