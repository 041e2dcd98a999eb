"""Per-precision-mode weighted fused-vs-scatter crossovers.

The weighted full-reduction slot cap (ops/pallas_hist.plan(), 2^18) was
measured with the DEFAULT split mode (2 bf16 MXU sections/element·slot).
The other modes pay different per-slot MXU costs — int1 0.25x split,
int2/i8 0.5x, i8x3 0.75x, highest 1.5x — so their true crossovers against
the ~flat scatter fallback sit at different slot counts. This probe
measures fused (forced factored kernel) vs scatter at 0.26M-4.2M slots for
each mode, full pipeline vs full pipeline at c=1e7 (same protocol as
scripts/fused_midslot_probe.py, which set the split cap).

PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_wmode_caps.py
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from xhistogram_tpu import bins as bins_mod
from xhistogram_tpu.core import _histogram_impl


def timeit(fn, n=2):
    fn()
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    np.asarray(r)
    return (time.perf_counter() - t0) / n


def edges_dev(n, lo=-4.0, hi=4.0):
    return jnp.asarray(
        bins_mod.edges_for_compare(
            np.linspace(lo, hi, n).astype(np.float64), np.float32
        )
    )


# weight generators per mode: intN draws integer weights whose range needs
# exactly N digits (core would derive the same mode); float modes draw
# uniform f32 and pass the mode as the per-call precision
_INT_RANGES = {"int1": 100, "int2": 9000, "int3": 2**22, "int4": 2**31 - 1}


def case(mode, nb, method, elems=10_000_000):
    ed = (edges_dev(nb[0] + 1), edges_dev(nb[1] + 1))
    m, c = 1, elems
    int_mode = mode in _INT_RANGES
    wmode = mode if (method == "pallas" and mode != "split") else (
        mode if int_mode else None
    )

    @jax.jit
    def f():
        k = jax.random.PRNGKey(0)
        a = jax.random.normal(k, (m, c), jnp.float32)
        b = jax.random.normal(jax.random.fold_in(k, 1), (m, c), jnp.float32)
        if int_mode:
            w = jax.random.randint(
                jax.random.fold_in(k, 2), (m, c), 0, _INT_RANGES[mode],
                jnp.int32,
            )
        else:
            w = jax.random.uniform(
                jax.random.fold_in(k, 2), (m, c), jnp.float32
            )
        h = _histogram_impl(
            (a, b), w, ed, axis=None, nbins=nb, density=False,
            method=method, block_size="auto", has_weights=True,
            weighted_mode=wmode,
        )
        return jnp.sum(h.astype(jnp.float32))

    nbytes = elems * 4 * 3
    try:
        dt = timeit(f)
        print(
            f"slots={nb[0]*nb[1]:>9} {mode:7s} {method:7s} "
            f"{dt*1e3:9.1f} ms {nbytes/dt/1e9:8.4f} GB/s",
            flush=True,
        )
    except Exception as e:  # noqa: BLE001 - probe records failures
        print(
            f"slots={nb[0]*nb[1]:>9} {mode:7s} {method:7s} FAILED "
            f"{type(e).__name__}: {str(e)[:100]}",
            flush=True,
        )


def main():
    print("backend:", jax.default_backend(), flush=True)
    # spec: mode,n[,method[,elems]]; slots = n*n (+ trash)
    specs = sys.argv[1:] or [
        # scatter reference lines (dtype-dependent, mode-independent)
        "int1,1024,scatter", "int1,2048,scatter",
        "split,1024,scatter", "split,2048,scatter",
        # int1: predicted 4x split => crossover ~2^20
        "int1,724", "int1,1024", "int1,1449", "int1,2048",
        # int2 / i8: predicted 2x split => crossover ~2^19
        "int2,724", "int2,1024",
        "i8,724", "i8,1024",
        # i8x3: predicted 4/3 x split
        "i8x3,724", "i8x3,1024",
        # highest: predicted 2/3 x split => borderline already at 2^18
        "highest,512", "highest,724",
        # split sanity rows (r3 measured 0.405 @ 524k, 0.17 @ 1.05M)
        "split,724", "split,1024",
    ]
    for spec in specs:
        parts = spec.split(",")
        mode, n = parts[0], int(parts[1])
        method = parts[2] if len(parts) > 2 else "pallas"
        elems = int(parts[3]) if len(parts) > 3 else 10_000_000
        if method == "pallas":
            os.environ["XHIST_FORCE_KERNEL"] = "factored"
        else:
            os.environ.pop("XHIST_FORCE_KERNEL", None)
        case(mode, (n, n), method, elems=elems)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
