"""Measure the r2 cliff-removal kernels on the real chip vs the XLA sort
fallback (VERDICT r1 #2): packed factored (kept rows, narrow c), fori
digitize (> 8192 edges), huge-slot factored (> 2^23 slots).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/cliff_perf.py
Timing notes (CLAUDE.md): data is generated inside the jitted program, and
the returned value is a device-side CHECKSUM — transferring the raw
(m, slots) result would bottleneck on the axon HTTP tunnel (~50 MB/s), not
the kernel.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from xhistogram_tpu.core import _histogram_impl
from xhistogram_tpu import bins as bins_mod


def timeit(fn, n=3):
    fn()  # compile
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    np.asarray(r)  # scalar transfer; forces completion on the axon backend
    return (time.perf_counter() - t0) / n


def edges_dev(e, dt=np.float32):
    return jnp.asarray(bins_mod.edges_for_compare(np.asarray(e), dt))


def report(name, method, dt, nbytes):
    print(f"{name:44s} {method:7s} {dt*1e3:9.1f} ms "
          f"{nbytes/dt/1e9:8.3f} GB/s", flush=True)


def case_packed(m, c, nb, methods=("pallas", "sort")):
    eA = np.linspace(-4, 4, nb[0] + 1)
    eB = np.linspace(-4, 4, nb[1] + 1)
    ed = (edges_dev(eA), edges_dev(eB))

    for method in methods:
        @jax.jit
        def f():
            k = jax.random.PRNGKey(0)
            a = jax.random.normal(k, (m, c), jnp.float32)
            b = jax.random.normal(jax.random.fold_in(k, 1), (m, c),
                                  jnp.float32)
            h = _histogram_impl(
                (a, b), None, ed, axis=(1,), nbins=nb, density=False,
                method=method, block_size="auto", has_weights=False,
            )
            return jnp.sum(h.astype(jnp.float32))

        try:
            dt = timeit(f)
            report(f"kept m={m} c={c} slots={nb[0]*nb[1]}", method,
                   dt, 2 * 4 * m * c)
        except Exception as e:
            print(f"kept m={m} c={c}: {method} FAILED "
                  f"{type(e).__name__}: {str(e)[:100]}", flush=True)


def case_edges(n_edges, pallas_elems, sort_elems):
    e = np.linspace(-4, 4, n_edges)
    ed = (edges_dev(e),)

    for method, elems in (("pallas", pallas_elems), ("sort", sort_elems)):
        @jax.jit
        def f():
            a = jax.random.normal(jax.random.PRNGKey(0), (8, elems // 8),
                                  jnp.float32)
            h = _histogram_impl(
                (a,), None, ed, axis=None, nbins=(n_edges - 1,),
                density=False, method=method, block_size="auto",
                has_weights=False,
            )
            return jnp.sum(h.astype(jnp.float32))

        try:
            dt = timeit(f)
            report(f"edges={n_edges} n={elems:.0e}", method, dt, 4 * elems)
        except Exception as ex:
            print(f"edges={n_edges}: {method} FAILED {type(ex).__name__}: "
                  f"{str(ex)[:100]}", flush=True)


def case_huge_slots(nb, pallas_elems, sort_elems):
    eA = np.linspace(-4, 4, nb[0] + 1)
    eB = np.linspace(-4, 4, nb[1] + 1)
    ed = (edges_dev(eA), edges_dev(eB))

    for method, elems in (("pallas", pallas_elems), ("sort", sort_elems)):
        @jax.jit
        def f():
            k = jax.random.PRNGKey(0)
            a = jax.random.normal(k, (8, elems // 8), jnp.float32)
            b = jax.random.normal(jax.random.fold_in(k, 1),
                                  (8, elems // 8), jnp.float32)
            h = _histogram_impl(
                (a, b), None, ed, axis=None, nbins=nb, density=False,
                method=method, block_size="auto", has_weights=False,
            )
            return jnp.sum(h.astype(jnp.float32))

        try:
            dt = timeit(f)
            report(f"slots={nb[0]*nb[1]} n={elems:.0e}", method,
                   dt, 8 * elems)
        except Exception as ex:
            print(f"slots={nb[0]*nb[1]}: {method} FAILED "
                  f"{type(ex).__name__}: {str(ex)[:100]}", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    # (a) narrow-c kept rows past the direct cap — packed factored vs sort
    case_packed(4096, 64, (120, 90))
    case_packed(16384, 64, (120, 90))
    case_packed(4096, 192, (300, 100))
    # (b) many edges — fori digitize vs sort
    case_edges(4097, pallas_elems=200_000_000, sort_elems=10_000_000)
    case_edges(16385, pallas_elems=50_000_000, sort_elems=10_000_000)
    case_edges(32769, pallas_elems=25_000_000, sort_elems=10_000_000)
    # (c) huge joint grids — n1-chunked factored past 2^23 vs sort
    # (factored pays O(slots) MACs/element: time/elem ≈ slots·2/197e12, so
    # element counts are sized for ~0.5 s runs)
    case_huge_slots((2048, 2048), pallas_elems=10_000_000,
                    sort_elems=2_000_000)
    case_huge_slots((4096, 4096), pallas_elems=2_000_000,
                    sort_elems=2_000_000)
