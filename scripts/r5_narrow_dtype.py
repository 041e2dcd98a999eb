"""Narrow-dtype DATA inputs on chip (VERDICT r4 stretch #9).

bf16/f16/int16/int8 data halves/quarters HBM bytes per element; the edge
transform (bins.compare_form) already makes the comparisons bit-exact in
the data's own dtype (tests/test_dtypes.py::test_bf16_and_f16_data). The
open question is PERF: does Mosaic lower the narrow compares at f32 rate
(elem/s holds → f32-equivalent GB/s doubles for the ocean-model
f32→bf16 preprocessing case) or promote/stall?

Protocol mirrors scripts/roofline.py: tile-aligned layouts, data
generated (and cast) inside the jitted program, synced warmup, and the
generation+cast cost measured separately and subtracted, so "kern" is
kernel-only elem/s. Rows: one_input 64 bins and joint2 280x340 (the two
bench-critical families), uniform=None so every dtype pays the same
compare-based digitize.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r5_narrow_dtype.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from xhistogram_tpu import bins as bins_mod
from xhistogram_tpu.core import _histogram_impl


def timeit(fn, n=3):
    np.asarray(fn())  # synced warmup
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    np.asarray(r)
    return (time.perf_counter() - t0) / n


_gen_cache = {}


def gen_time(m, c, n_arrays, dt):
    key = (m, c, n_arrays, str(dt))
    if key not in _gen_cache:
        @jax.jit
        def g():
            k = jax.random.PRNGKey(0)
            tot = jnp.float32(0)
            for i in range(n_arrays):
                a = _gen_one(k, i, m, c, dt)
                tot += a.astype(jnp.float32).sum()
            return tot

        timeit(g)  # compile
        _gen_cache[key] = timeit(g)
    return _gen_cache[key]


def _gen_one(k, i, m, c, dt):
    kk = jax.random.fold_in(k, i)
    if jnp.issubdtype(dt, jnp.integer):
        info = jnp.iinfo(dt)
        span = int(min(-int(info.min), int(info.max)) * 0.9)
        return jax.random.randint(kk, (m, c), -span, span + 1, jnp.int32
                                  ).astype(dt)
    return (jax.random.normal(kk, (m, c), jnp.float32) * 30.0).astype(dt)


def run(name, nbins, m, c, n_inputs, dt):
    np_dt = np.dtype(dt)  # ml_dtypes registers bfloat16 with numpy
    if jnp.issubdtype(dt, jnp.integer):
        info = jnp.iinfo(dt)
        lo, hi = int(info.min) * 0.8, int(info.max) * 0.8
    else:
        lo, hi = -100.0, 100.0
    forms = [
        bins_mod.compare_form(np.linspace(lo, hi, nb + 1), np_dt)
        for nb in nbins
    ]
    eds = tuple(jnp.asarray(f.edges) for f in forms)
    n_hi_clip = tuple(f.n_hi_clip for f in forms)
    elems = m * c
    ebytes = jnp.dtype(dt).itemsize

    @jax.jit
    def f():
        k = jax.random.PRNGKey(0)
        arrs = tuple(_gen_one(k, i, m, c, dt) for i in range(n_inputs))
        h = _histogram_impl(
            arrs, None, eds, axis=(1,), nbins=nbins, density=False,
            method="pallas", block_size="auto", has_weights=False,
            n_hi_clip=n_hi_clip, uniform=None,
        )
        return jnp.sum(h.astype(jnp.float32))

    try:
        dt_tot = timeit(f)
    except Exception as e:
        print(f"| {name} | FAILED {type(e).__name__}: {str(e)[:70]} |",
              flush=True)
        return
    dt_kern = max(dt_tot - gen_time(m, c, n_inputs, dt), 1e-9)
    if dt_kern < 0.2 * dt_tot:
        dt_kern = dt_tot
    rate = elems / dt_kern
    real_gbps = elems * ebytes * n_inputs / dt_kern / 1e9
    f32eq_gbps = elems * 4 * n_inputs / dt_kern / 1e9
    print(
        f"| {name} | kern {rate/1e9:.2f} Ge/s | {real_gbps:.1f} GB/s real "
        f"| {f32eq_gbps:.1f} GB/s f32-equiv |",
        flush=True,
    )


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    print("| config | kernel-only rate | real bytes | f32-equivalent |",
          flush=True)
    for dt, tag in [
        (jnp.float32, "f32"),
        (jnp.bfloat16, "bf16"),
        (jnp.float16, "f16"),
        (jnp.int16, "i16"),
        (jnp.int8, "i8"),
    ]:
        run(f"one_input 64b {tag}", (64,), 1024, 1 << 20, 1, dt)
    for dt, tag in [
        (jnp.float32, "f32"),
        (jnp.bfloat16, "bf16"),
        (jnp.float16, "f16"),
    ]:
        run(f"joint2 280x340 {tag}", (280, 340), 1024, 1 << 18, 2, dt)
