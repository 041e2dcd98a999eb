"""Measure the fused-vs-sort crossover at/above the slot caps for BOTH
modes (VERDICT r2 #8): unweighted around 2^24-2^25, and the never-measured
weighted crossover around/above 2^22 — so the plan() caps can sit at
measured crossovers instead of inherited constants.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/r3_caps.py
"""

import os
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


def case(nb, weighted, method, elems=20_000_000):
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
    except Exception as e:
        print(
            f"slots={nb[0]*nb[1]:>10} {'w' if weighted else 'u'} "
            f"{method:7s} FAILED {type(e).__name__}: {str(e)[:100]}",
            flush=True,
        )


print("backend:", jax.default_backend(), flush=True)
os.environ["XHIST_FORCE_KERNEL"] = "factored"
# weighted crossover hunt: 2^22 (current cap), 2^23, 2^24
for nb in [(2048, 2047), (2896, 2896), (4096, 4095), (5792, 5792)]:
    case(nb, True, "pallas", elems=10_000_000)
del os.environ["XHIST_FORCE_KERNEL"]
for nb in [(2048, 2047), (2896, 2896), (4096, 4095), (5792, 5792)]:
    case(nb, True, "sort", elems=10_000_000)

# unweighted: at the cap and past it (crossover claimed ~32M)
os.environ["XHIST_FORCE_KERNEL"] = "factored"
for nb in [(4096, 4095), (5792, 5792), (8192, 8191)]:
    case(nb, False, "pallas", elems=10_000_000)
del os.environ["XHIST_FORCE_KERNEL"]
for nb in [(5792, 5792), (8192, 8191)]:
    case(nb, False, "sort", elems=10_000_000)
print("DONE", flush=True)
