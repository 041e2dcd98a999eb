"""Weighted uniform-routing crossover: plan() reuses the unweighted
thresholds (arith >64 bins, DS >120) for WEIGHTED 1-input shapes, but the
weighted kernels have different per-bin costs (membership one-hot + bf16
split matmul vs factored digitize + weighted dot), so the crossover may
sit elsewhere.  Measures weighted one_input (uniform off) vs weighted
factored+uniform at the boundary bin counts, both tiers.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/ds_weighted_probe.py
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from xhistogram_tpu.core import histogram


def timeit(fn, n=5):
    np.asarray(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    np.asarray(r)
    return (time.perf_counter() - t0) / n


def run(edges, tag, elems=1 << 28):
    jax.clear_caches()
    m, c = 1024, elems // 1024

    def f():
        k = jax.random.PRNGKey(0)
        a = 1.5 * jax.random.normal(k, (m, c), jnp.float32)
        w = jax.random.uniform(jax.random.fold_in(k, 1), (m, c),
                               jnp.float32)
        h, _ = histogram(a, bins=edges, weights=w, method="pallas")
        return jnp.sum(jnp.asarray(h, jnp.float32))

    dt = timeit(jax.jit(f))
    print(f"| {len(edges)-1:5d} bins {tag:28s} | {dt*1e3:8.1f} ms | "
          f"{elems*4/dt/1e9:6.1f} GB/s |", flush=True)


print("backend:", jax.default_backend(), flush=True)

if os.environ.get("XHIST_PROBE_FINE") == "1":
    # Coarse pass (logged in /tmp/ds_w.log, 2026-08-17): weighted arith
    # beats one_input already at 64 bins (24.2 vs 21.3 GB/s) and DS
    # crosses between 64 (19.7 vs 21.3) and 128 (18.2 vs 16.1). Pin the
    # crossovers: arith at 24/32/48 bins (widths chosen so the spacing is
    # a power of two and certifies arith), DS at 80/96.
    for nb, e_ar in ((24, np.linspace(-3.0, 3.0, 25)),
                     (32, np.linspace(-4.0, 4.0, 33)),
                     (48, np.linspace(-3.0, 3.0, 49))):
        os.environ["XHIST_UNIFORM_DIGITIZE"] = "0"
        run(e_ar, "w one_input (compare)")
        del os.environ["XHIST_UNIFORM_DIGITIZE"]
        os.environ["XHIST_FORCE_KERNEL"] = "factored"
        run(e_ar, "w factored+arith")
        del os.environ["XHIST_FORCE_KERNEL"]
    for nb in (80, 96):
        e_ds = np.linspace(-4.2, 4.2, nb + 1)
        os.environ["XHIST_UNIFORM_DIGITIZE"] = "0"
        run(e_ds, "w one_input (compare)")
        del os.environ["XHIST_UNIFORM_DIGITIZE"]
        os.environ["XHIST_FORCE_KERNEL"] = "factored"
        run(e_ds, "w factored+DS")
        del os.environ["XHIST_FORCE_KERNEL"]
else:
    for nb in (64, 128, 256, 512, 1024):
        e_ar = np.linspace(-4.0, 4.0, nb + 1)   # arith tier
        e_ds = np.linspace(-4.2, 4.2, nb + 1)   # DS tier
        os.environ["XHIST_UNIFORM_DIGITIZE"] = "0"
        run(e_ar, "w one_input (compare)")
        del os.environ["XHIST_UNIFORM_DIGITIZE"]
        os.environ["XHIST_FORCE_KERNEL"] = "factored"
        run(e_ar, "w factored+arith")
        run(e_ds, "w factored+DS")
        del os.environ["XHIST_FORCE_KERNEL"]

print("DONE", flush=True)
