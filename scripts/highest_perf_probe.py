"""Measure the 'highest' weighted mode before/after the three-limb bf16
rewrite on the weighted T-S config (joint2 280x340, reduce-all).

The r3-end implementation lowered an f32 HIGHEST matmul (~6 bf16 MXU
passes, measured ~5x split's 2-section cost ≈ 1 GB/s e2e). The three-limb
split has the same error model (exact products, f32 per-tile accumulation,
Kahan cross-tile) at 3 sections, so it should land near 2/3 of split's
4.7 GB/s ≈ 3.1 GB/s.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/highest_perf_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from xhistogram_tpu.core import _histogram_impl
from xhistogram_tpu import bins as bins_mod


def timeit(fn, n=3):
    np.asarray(fn())  # synced warmup
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    np.asarray(r)
    return (time.perf_counter() - t0) / n


def run(wmode, m=1024, c=1 << 18, nbins=(280, 340)):
    eds_np = [
        bins_mod.edges_for_compare(np.linspace(-4, 4, nb + 1), np.float32)
        for nb in nbins
    ]
    eds = tuple(jnp.asarray(e_) for e_ in eds_np)
    uniform = tuple(bins_mod.uniform_arith_form(e_) for e_ in eds_np)
    elems = m * c
    nbytes = elems * 4 * 3  # two inputs + weights

    @jax.jit
    def f():
        k = jax.random.PRNGKey(0)
        arrs = tuple(
            jax.random.normal(jax.random.fold_in(k, i), (m, c), jnp.float32)
            for i in range(2)
        )
        w = jax.random.uniform(jax.random.fold_in(k, 9), (m, c), jnp.float32)
        h = _histogram_impl(
            arrs, w, eds, axis=None, nbins=nbins, density=False,
            method="pallas", block_size="auto", has_weights=True,
            uniform=uniform, weighted_mode=wmode,
        )
        return jnp.sum(h.astype(jnp.float32))

    dt = timeit(f)
    print(f"{wmode:8s}: {nbytes/dt/1e9:6.2f} GB/s e2e ({dt*1e3:7.1f} ms)",
          flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    import sys

    modes = sys.argv[1:] or ("split", "highest", "i8x3")
    for mode in modes:
        run(mode)
