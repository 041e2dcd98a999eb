"""First on-device check + strategy micro-benchmark on the real TPU."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from xhistogram_tpu.core import histogram

print("devices:", jax.devices())

rng = np.random.RandomState(0)
data = rng.randn(8, 4096).astype("f4")
bins = np.linspace(-4, 4, 10)
expected = np.stack([np.histogram(r, bins=bins)[0] for r in data])

for method in ("pallas", "scatter", "onehot", "sort"):
    t0 = time.time()
    h, _ = histogram(data, bins=bins, axis=1, method=method)
    h = np.asarray(h)
    ok = np.array_equal(h, expected)
    print(f"{method:8s} correct={ok}  (first call {time.time()-t0:.1f}s)")

# --- micro-benchmark: 1e8-element 1-D reduce-all, 64 bins -------------------
N = 100_000_000
x = jax.random.normal(jax.random.PRNGKey(0), (1000, N // 1000), jnp.float32)
edges = np.linspace(-4, 4, 65)

for method in ("pallas", "onehot", "scatter", "sort"):
    try:
        f = lambda d: histogram(d, bins=edges, method=method)[0]
        h = f(x)
        h.block_until_ready()
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            h = f(x)
        h.block_until_ready()
        dt = (time.time() - t0) / reps
        gbps = N * 4 / dt / 1e9
        print(f"bench {method:8s} {dt*1e3:8.2f} ms   {gbps:7.1f} GB/s")
    except Exception as e:
        print(f"bench {method:8s} FAILED: {type(e).__name__}: {str(e)[:200]}")
