"""Calibrate plan()'s DS-uniform routing threshold (uni0_min_bins for the
double-single tier): at which bin count does factored + DS digitize
(~190 VPU ops/element, bin-count-independent) overtake one_input's 2/bin
compare chain on GENERIC linspace grids?  Also measures the DS tax vs the
exact arithmetic form at matched bin counts (pow2-width grids certify
arith; generic-width certify DS).

PYTHONPATH=/root/repo:/root/.axon_site python scripts/ds_perf_probe.py
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from xhistogram_tpu import bins as bins_mod
from xhistogram_tpu.core import histogram


def timeit(fn, n=5):
    np.asarray(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    np.asarray(r)
    return (time.perf_counter() - t0) / n


def run(edges, tag, elems=1 << 30):
    jax.clear_caches()
    m, c = 1024, elems // 1024

    def f():
        a = 1.5 * jax.random.normal(
            jax.random.PRNGKey(0), (m, c), jnp.float32
        )
        h, _ = histogram(a, bins=edges, method="pallas")
        return jnp.sum(jnp.asarray(h, jnp.float32))

    dt = timeit(jax.jit(f))
    print(f"| {len(edges)-1:5d} bins {tag:26s} | {dt*1e3:8.1f} ms | "
          f"{elems*4/dt/1e9:6.1f} GB/s |", flush=True)


def form_kind(edges):
    T = np.asarray(bins_mod.compare_form(edges, np.float32).edges)
    f = bins_mod.uniform_form(T, edges)
    return None if f is None else ("ds" if isinstance(f[0], str) else "ar")


print("backend:", jax.default_backend(), flush=True)

# generic-width grids (DS tier) at increasing bin counts:
# one_input (forced off uniform) vs the uniform-routed default
for nb in (64, 128, 192, 256, 512, 1024):
    e = np.linspace(-4.2, 4.2, nb + 1)  # width 8.4: generic -> DS
    assert form_kind(e) == "ds", (nb, form_kind(e))
    os.environ["XHIST_UNIFORM_DIGITIZE"] = "0"
    run(e, "one_input (compare)")
    del os.environ["XHIST_UNIFORM_DIGITIZE"]
    os.environ["XHIST_FORCE_KERNEL"] = "factored"
    run(e, "factored+DS")
    del os.environ["XHIST_FORCE_KERNEL"]

# DS tax vs arith at matched bin counts (pow2-width grid -> arith)
for nb in (512, 1024, 4096):
    e_ar = np.linspace(-4.0, 4.0, nb + 1)
    e_ds = np.linspace(-4.2, 4.2, nb + 1)
    assert form_kind(e_ar) == "ar" and form_kind(e_ds) == "ds"
    run(e_ar, "arith (default route)")
    run(e_ds, "DS (default route)")

print("DONE", flush=True)
