"""True old-vs-new A/B of the exact-f64 tier on chip + stage timing.

The r5_digN_perf.py run left one number unexplained: counts-like f64
(one dig2 pass, same bytes as split) measured 7.3 s vs split's 1.4 s.
This probe (a) reconstructs r4's per-digit f64 engine inline and times
it against the new one on the same data, and (b) times the tier's
stages separately (host decomposition, word packing, the device pass)
to attribute the gap.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_f64_ab.py
"""

import time

import numpy as np


def t(fn, reps=2):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        if out is not None:
            np.asarray(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def old_f64(data, edges, w64):
    """r4's engine: per-group, per-DIGIT int32-weight public calls."""
    from xhistogram_tpu.core import _dd_add, _f64_weight_groups, histogram
    from xhistogram_tpu.ops import intweights as iw

    wf = np.where(np.isfinite(w64), w64, 0.0)
    hi = np.zeros(len(edges) - 1, np.float64)
    lo = np.zeros_like(hi)
    for s, K in _f64_weight_groups(wf):
        nd = iw.digits_for_bounds(K.min(), K.max())
        for j, d in enumerate(iw.host_digits(K, nd)):
            part, _ = histogram(data, bins=edges, weights=d)
            hi, lo = _dd_add(
                hi, lo,
                np.ldexp(np.asarray(part).astype(np.float64), s + 8 * j),
            )
    return hi + lo


def main():
    from xhistogram_tpu.core import (
        _f64_weight_groups,
        _histogram_digits,
        histogram,
    )
    from xhistogram_tpu.ops import intweights as iw

    n = 1 << 22
    rng = np.random.RandomState(0)
    data = rng.rand(n).astype("f4")
    edges = np.linspace(0.0, 1.0, 129)

    for name, w in {
        "counts-like": rng.randint(0, 200, n).astype("f8"),
        "uniform": rng.rand(n),
    }.items():
        # stage timing (host side)
        tg = t(lambda: list(_f64_weight_groups(w)) and None, reps=1)
        groups = list(_f64_weight_groups(w))
        tw = t(lambda: [iw.host_words(K) for _, K in groups] and None,
               reps=1)
        # one raw digN device pass on the first group's first word
        K0 = groups[0][1]
        w0 = iw.host_words(K0)[0]
        nd0 = iw.digits_for_bounds(
            w0.min(), w0.max(), max_digits=iw.WORD_MAX_DIGITS
        )
        _histogram_digits([data.reshape(1, n)], [edges], w0.reshape(1, n),
                          nd0, block_size="auto", method="auto")  # warm
        tpass = t(lambda: _histogram_digits(
            [data.reshape(1, n)], [edges], w0.reshape(1, n), nd0,
            block_size="auto", method="auto"))
        # engines e2e
        histogram(data, bins=edges, weights=w, precision="f64")  # warm
        old_f64(data, edges, w)  # warm
        tnew = t(lambda: histogram(
            data, bins=edges, weights=w, precision="f64")[0])
        told = t(lambda: old_f64(data, edges, w))
        n_old = sum(
            iw.digits_for_bounds(K.min(), K.max()) for _, K in groups
        )
        n_new = sum(len(iw.host_words(K)) for _, K in groups)
        print(f"[{name}] stages: groups {tg*1e3:.0f} ms, words "
              f"{tw*1e3:.0f} ms, one digN pass {tpass*1e3:.0f} ms")
        print(f"[{name}] old {told*1e3:.0f} ms ({n_old} passes) | "
              f"new {tnew*1e3:.0f} ms ({n_new} passes) | "
              f"speedup {told/tnew:.2f}x")


if __name__ == "__main__":
    main()
