"""Chip A/B: select staging for the FLOAT weighted modes (the intN
staging win's analogs — see pallas_hist._I8_SELECT/_BF16_SELECT).

Per mode (split / highest / i8 / i8x3): parity vs the product-staged
build on a small case (both builds must agree bit-for-bit — identical
math, different lowering), then perf on the weighted T-S 2**28-element
config (r3 methodology). The bf16-select lowering itself is the open
question (bf16 (16,128) tiling vs the (8,128) bool mask).

Run twice:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_floatw_stage.py          # product (defaults)
  XHIST_I8_SELECT=1 XHIST_BF16_SELECT=1 PYTHONPATH=... python scripts/r4_floatw_stage.py  # select
"""

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(),
      "I8_SELECT:", os.environ.get("XHIST_I8_SELECT", "0"),
      "BF16_SELECT:", os.environ.get("XHIST_BF16_SELECT", "0"), flush=True)

from xhistogram_tpu import bins as bins_mod
from xhistogram_tpu.core import _histogram_impl, histogram

M, C = 1024, 1 << 18
T_EDGES = np.linspace(-2.0, 30.0, 281).astype(np.float32)
S_EDGES = np.linspace(30.0, 40.0, 341).astype(np.float32)
NBINS = (280, 340)
NBYTES = M * C * 4 * 3

eds = tuple(
    jnp.asarray(bins_mod.edges_for_compare(e, np.float32))
    for e in (T_EDGES, S_EDGES)
)


def timeit(fn, n=3):
    np.asarray(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    np.asarray(r)
    return (time.perf_counter() - t0) / n


# --- parity first (each mode, small case, vs numpy f64 within mode tol) ---
rng = np.random.RandomState(3)
a = rng.randn(100_000).astype("f4")
b = rng.randn(100_000).astype("f4")
w = (rng.rand(100_000).astype("f4") * 10 - 3).astype("f4")
pe = [np.linspace(-3, 3, 25), np.linspace(-3, 3, 21)]
ref = np.histogram2d(a, b, bins=pe, weights=w.astype("f8"))[0]
for mode in ("split", "highest", "i8", "i8x3"):
    h, _ = histogram(jnp.asarray(a), jnp.asarray(b), bins=pe,
                     weights=jnp.asarray(w), method="pallas",
                     precision=mode)
    got = np.asarray(h, dtype="f8")
    err = np.max(np.abs(got - ref)) / max(np.max(np.abs(ref)), 1e-30)
    tol = {"split": 3e-4, "highest": 1e-6, "i8": 1e-3, "i8x3": 3e-5}[mode]
    print(f"parity {mode}: rel err {err:.2e} (tol {tol:g}) "
          f"{'OK' if err < tol else 'FAIL'}", flush=True)


# --- perf (r3 methodology: in-program RNG, subtracted) ---
def gen():
    k = jax.random.PRNGKey(0)
    T = 14.0 + 8.0 * jax.random.normal(
        jax.random.fold_in(k, 0), (M, C), jnp.float32)
    S = 35.0 + 1.5 * jax.random.normal(
        jax.random.fold_in(k, 1), (M, C), jnp.float32)
    w = jax.random.uniform(jax.random.fold_in(k, 2), (M, C), jnp.float32)
    return T, S, w


@jax.jit
def rng_only():
    T, S, w = gen()
    return T.sum() + S.sum() + w.sum()


rng_dt = timeit(rng_only)
print(f"rng-only: {rng_dt*1e3:.1f} ms", flush=True)

for mode in ("split", "highest", "i8", "i8x3"):
    @jax.jit
    def f(mode=mode):
        T, S, w = gen()
        h = _histogram_impl(
            (T, S), w, eds, axis=None, nbins=NBINS, density=False,
            method="pallas", block_size="auto", has_weights=True,
            weighted_mode=None if mode == "split" else mode,
        )
        return jnp.sum(h)

    try:
        dt = timeit(f)
    except Exception as e:
        print(f"{mode}: FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)
        continue
    kern = max(dt - rng_dt, 1e-9)
    print(f"{mode}: kern {NBYTES/kern/1e9:.2f} GB/s | "
          f"e2e {NBYTES/dt/1e9:.2f} GB/s ({dt*1e3:.0f} ms)", flush=True)
print("DONE", flush=True)
