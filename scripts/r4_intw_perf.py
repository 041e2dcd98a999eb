"""Chip perf: fused integer-digit weighted kernels vs the XLA scatter
fallback on the weighted-int T-S config (VERDICT r4 item 3: >= 5x scatter).

Weighted joint 280x340 T-S histogram, int32 weights at three digit counts
(1 digit = counts-like weights, 2 digits = |w| <= ~32k, 4 digits = full
int32 range). Data + weights generated in-program (RNG cost measured
separately and subtracted for the kernel-only number, r3 methodology).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_intw_perf.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from xhistogram_tpu import bins as bins_mod
from xhistogram_tpu.core import _histogram_impl

M, C = 1024, 1 << 18  # 2**28 elements
T_EDGES = np.linspace(-2.0, 30.0, 281).astype(np.float32)
S_EDGES = np.linspace(30.0, 40.0, 341).astype(np.float32)
NBINS = (280, 340)
NBYTES = M * C * 4 * 3  # two data arrays + int32 weights


def timeit(fn, n=3):
    np.asarray(fn())  # synced warmup
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    np.asarray(r)
    return (time.perf_counter() - t0) / n


eds_np = [
    bins_mod.edges_for_compare(T_EDGES, np.float32),
    bins_mod.edges_for_compare(S_EDGES, np.float32),
]
eds = tuple(jnp.asarray(e) for e in eds_np)


def gen(wmax):
    k = jax.random.PRNGKey(0)
    T = 14.0 + 8.0 * jax.random.normal(
        jax.random.fold_in(k, 0), (M, C), jnp.float32
    )
    S = 35.0 + 1.5 * jax.random.normal(
        jax.random.fold_in(k, 1), (M, C), jnp.float32
    )
    w = jax.random.randint(
        jax.random.fold_in(k, 2), (M, C), -wmax, wmax + 1, jnp.int32
    )
    return T, S, w


@jax.jit
def rng_only():
    T, S, w = gen(100)
    return T.sum() + S.sum() + w.sum()


rng_dt = timeit(rng_only)
print(f"rng-only: {rng_dt*1e3:.1f} ms", flush=True)


def run(label, method, wmode, wmax):
    @jax.jit
    def f():
        T, S, w = gen(wmax)
        h = _histogram_impl(
            (T, S), w, eds, axis=None, nbins=NBINS, density=False,
            method=method, block_size="auto", has_weights=True,
            weighted_mode=wmode,
        )
        return jnp.sum(h.astype(jnp.float32))

    try:
        dt = timeit(f)
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)
        return None
    kern = max(dt - rng_dt, 1e-9)
    gbps_k = NBYTES / kern / 1e9
    gbps_e = NBYTES / dt / 1e9
    print(f"{label}: kern {gbps_k:.2f} GB/s | e2e {gbps_e:.2f} GB/s "
          f"({dt*1e3:.0f} ms)", flush=True)
    return gbps_k


results = {}
for digits, wmax in ((1, 100), (2, 9000), (4, 1 << 30)):
    results[f"int{digits}"] = run(
        f"fused joint2 int{digits} (|w|<={wmax})", "pallas",
        f"int{digits}", wmax
    )
results["scatter"] = run("XLA scatter int32 weights", "scatter", None,
                         1 << 30)
# float-split reference point (the previous fastest weighted mode)
results["split"] = run("fused joint2 float split (f32 w)", "pallas",
                       None, 1 << 30)

if results.get("scatter"):
    for k in ("int1", "int2", "int4"):
        if results.get(k):
            print(f"{k} vs scatter: {results[k]/results['scatter']:.1f}x",
                  flush=True)
