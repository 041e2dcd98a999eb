"""Fused (factored) kernel rates at 1M-8M slots, unweighted + weighted —
the band where the scatter fallback's ~flat rate may cross the fused
kernel's O(n_slots) per-element wall (scripts/hugeslot_fallback_probe.py
measures scatter/sort; r3_caps.py measured fused at/above the caps).

PYTHONPATH=/root/repo:/root/.axon_site python scripts/fused_midslot_probe.py
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


def case(nb, weighted, method, elems=10_000_000):
    ed = (edges_dev(nb[0] + 1), edges_dev(nb[1] + 1))
    m, c = 1, elems

    @jax.jit
    def f():
        k = jax.random.PRNGKey(0)
        a = jax.random.normal(k, (m, c), jnp.float32)
        b = jax.random.normal(jax.random.fold_in(k, 1), (m, c), jnp.float32)
        w = (
            jax.random.uniform(jax.random.fold_in(k, 2), (m, c), jnp.float32)
            if weighted
            else None
        )
        h = _histogram_impl(
            (a, b), w, ed, axis=None, nbins=nb, density=False,
            method=method, block_size="auto", has_weights=weighted,
        )
        return jnp.sum(h.astype(jnp.float32))

    nbytes = elems * 4 * (3 if weighted else 2)
    try:
        dt = timeit(f)
        print(
            f"slots={nb[0]*nb[1]:>10} {'w' if weighted else 'u'} "
            f"{method:7s} {dt*1e3:9.1f} ms {nbytes/dt/1e9:8.4f} GB/s",
            flush=True,
        )
    except Exception as e:  # noqa: BLE001 - probe records failures
        print(
            f"slots={nb[0]*nb[1]:>10} {'w' if weighted else 'u'} "
            f"{method:7s} FAILED {type(e).__name__}: {str(e)[:100]}",
            flush=True,
        )


def main():
    print("backend:", jax.default_backend(), flush=True)
    specs = sys.argv[1:] or ["1024,u", "1449,u", "2048,u",
                             "1024,w", "1449,w", "2048,w"]
    for spec in specs:
        parts = spec.split(",")
        n = int(parts[0])
        weighted = parts[1] == "w"
        method = parts[2] if len(parts) > 2 else "pallas"
        if method == "pallas":
            os.environ["XHIST_FORCE_KERNEL"] = "factored"
        else:
            os.environ.pop("XHIST_FORCE_KERNEL", None)
        case((n, n), weighted, method)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
