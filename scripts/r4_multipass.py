"""Chip probe: range-partitioned multi-pass fused counting for the >2M-slot
band (VERDICT r4 item 6) vs the XLA scatter fallback.

Scheme: P passes over the data; pass p digitizes only the contiguous
edge sub-grid [p*nb/P, (p+1)*nb/P] (elements outside mask to the trash slot
at O(1)/element — the fused kernels already do this for out-of-range data),
so each pass is an ordinary fused factored histogram with nb/P bins whose
results concatenate.

Physics expectation (recorded either way): the factored kernel is MXU-bound
at these sizes — its one-hot matmul performs n1*n2 ≈ slots int8 MACs per
element, and the r3 cap measurements put it at ~96% of the int8 MXU roof
(98.5e12 MAC/s / 1e6 MACs/elem = 98.5e6 elem/s ≈ 0.39 GB/s at 1M slots,
measured 0.38). Multi-pass leaves the TOTAL MAC count unchanged
(P passes x slots/P each) while multiplying HBM reads by P — so it cannot
beat single-pass, let alone close the >=10x gap to scatter at 16M+ slots.
This probe measures it anyway at 4M slots to pin the negative result.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_multipass.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from xhistogram_tpu import bins as bins_mod
from xhistogram_tpu.core import _histogram_impl

M, C = 1024, 1 << 13  # 2**23 elements (the band is slot-, not data-, bound)
NB_TOTAL = 1 << 22  # 4M bins
EDGES = np.linspace(-4.0, 4.0, NB_TOTAL + 1).astype(np.float64)
NBYTES = M * C * 4


def timeit(fn, n=3):
    np.asarray(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    np.asarray(r)
    return (time.perf_counter() - t0) / n


@jax.jit
def rng_only():
    return jax.random.normal(
        jax.random.PRNGKey(0), (M, C), jnp.float32
    ).sum()


rng_dt = timeit(rng_only)
print(f"rng-only: {rng_dt*1e3:.1f} ms", flush=True)


def run_passes(p):
    nb_pass = NB_TOTAL // p
    sub_edges = [
        EDGES[i * nb_pass : (i + 1) * nb_pass + 1] for i in range(p)
    ]
    eds = [
        jnp.asarray(bins_mod.edges_for_compare(e, np.float32))
        for e in sub_edges
    ]
    uniforms = [
        bins_mod.uniform_form(np.asarray(ed), np.asarray(e))
        for ed, e in zip([np.asarray(x) for x in eds], sub_edges)
    ]

    @jax.jit
    def f():
        a = jax.random.normal(jax.random.PRNGKey(0), (M, C), jnp.float32)
        tot = jnp.float32(0)
        for i in range(p):
            h = _histogram_impl(
                (a,), None, (eds[i],), axis=None, nbins=(nb_pass,),
                density=False, method="pallas", block_size="auto",
                has_weights=False,
                uniform=(uniforms[i],) if uniforms[i] is not None else None,
            )
            tot += jnp.sum(h.astype(jnp.float32))
        return tot

    try:
        dt = timeit(f)
    except Exception as e:
        print(f"P={p}: FAILED {type(e).__name__}: {e}", flush=True)
        return
    kern = max(dt - rng_dt, 1e-9)
    print(f"P={p} (x{nb_pass} bins/pass): kern {NBYTES/kern/1e9:.3f} GB/s "
          f"({dt*1e3:.0f} ms)", flush=True)


def run_scatter():
    eds = jnp.asarray(bins_mod.edges_for_compare(EDGES, np.float32))
    uniform = bins_mod.uniform_form(np.asarray(eds), EDGES)

    @jax.jit
    def f():
        a = jax.random.normal(jax.random.PRNGKey(0), (M, C), jnp.float32)
        h = _histogram_impl(
            (a,), None, (eds,), axis=None, nbins=(NB_TOTAL,),
            density=False, method="scatter", block_size="auto",
            has_weights=False,
            uniform=(uniform,) if uniform is not None else None,
        )
        return jnp.sum(h.astype(jnp.float32))

    dt = timeit(f)
    kern = max(dt - rng_dt, 1e-9)
    print(f"scatter 4M slots: kern {NBYTES/kern/1e9:.3f} GB/s "
          f"({dt*1e3:.0f} ms)", flush=True)


run_scatter()
for p in (2, 4, 8):
    run_passes(p)
