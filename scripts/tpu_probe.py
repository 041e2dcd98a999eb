"""On-device correctness + perf probe for all three Pallas kernels.

Sizes stay ≤ ~2 GB live so the run fits HBM alongside the runtime's operand
staging. Timing forces host transfers (block_until_ready does not reliably
wait under the axon remote backend).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from xhistogram_tpu.core import histogram

print("devices:", jax.devices(), flush=True)
rng = np.random.RandomState(0)

# --- correctness matrix ------------------------------------------------------
bins = np.linspace(-4, 4, 10)
data = rng.randn(8, 4096).astype("f4")
exp = np.stack([np.histogram(r, bins=bins)[0] for r in data])
h, _ = histogram(data, bins=bins, axis=1, method="pallas")
print("one_input kept-rows  correct:", np.array_equal(np.asarray(h), exp), flush=True)

flat = rng.randn(100_000).astype("f4")
h, _ = histogram(flat, bins=bins, method="pallas")
print("one_input reduce-all correct:",
      np.array_equal(np.asarray(h), np.histogram(flat, bins=bins)[0]), flush=True)

a = rng.randn(200_000).astype("f4"); b = rng.randn(200_000).astype("f4")
ba = np.linspace(-4, 4, 281); bb = np.linspace(-4, 4, 341)
h, _ = histogram(a, b, bins=[ba, bb], method="pallas")
e2 = np.histogram2d(a, b, bins=[ba, bb])[0]
print("joint2 280x340       correct:", np.array_equal(np.asarray(h), e2), flush=True)

w = rng.rand(*a.shape).astype("f4")
h, _ = histogram(a, b, bins=[ba, bb], weights=w, method="pallas")
e2w = np.histogram2d(a, b, bins=[ba, bb], weights=w)[0]
print("joint2 weighted      close  :",
      np.allclose(np.asarray(h), e2w, rtol=1e-4, atol=1e-3), flush=True)

c3 = [rng.randn(2, 5000).astype("f4") for _ in range(3)]
b3 = [np.linspace(-4, 4, n) for n in (9, 10, 11)]
h, _ = histogram(*c3, bins=b3, method="pallas")
e3 = np.histogramdd([d.ravel() for d in c3], bins=b3)[0]
print("direct 3-input       correct:", np.array_equal(np.asarray(h), e3), flush=True)


# --- perf --------------------------------------------------------------------
def bench(tag, make_f, nbytes, reps=4):
    f = make_f()
    np.asarray(f())  # compile + settle
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f())
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    print(f"bench {tag:28s} {dt*1e3:9.2f} ms  {nbytes/dt/1e9:8.1f} GB/s"
          f"   reps={[round(t*1e3,1) for t in times]}", flush=True)


N = 1 << 28  # 268M elements, 1.07 GB
x = jax.random.normal(jax.random.PRNGKey(0), (N,), jnp.float32)
e64 = np.linspace(-4, 4, 65)
e512 = np.linspace(-4, 4, 513)
bench("1d 64bins reduce-all",
      lambda: (lambda: histogram(x, bins=e64, method="pallas")[0]), N * 4)
bench("1d 512bins reduce-all",
      lambda: (lambda: histogram(x, bins=e512, method="pallas")[0]), N * 4)

xr_ = x.reshape(1024, N // 1024)
bench("1d 64bins keep1024rows",
      lambda: (lambda: histogram(xr_, bins=e64, axis=1, method="pallas")[0]),
      N * 4)
bench("1d 64bins 2d-reduce-all",
      lambda: (lambda: histogram(xr_, bins=e64, method="pallas")[0]), N * 4)

y = jax.random.normal(jax.random.PRNGKey(1), (1024, N // 1024), jnp.float32)
te = np.linspace(-4, 4, 281); se = np.linspace(-4, 4, 341)
bench("joint2 TS 280x340",
      lambda: (lambda: histogram(xr_, y, bins=[te, se], method="pallas")[0]),
      N * 8)
e100 = np.linspace(-4, 4, 101)
bench("joint2 100x100",
      lambda: (lambda: histogram(xr_, y, bins=[e100, e100], method="pallas")[0]),
      N * 8)
e16 = np.linspace(-4, 4, 17)
bench("joint2 16x16",
      lambda: (lambda: histogram(xr_, y, bins=[e16, e16], method="pallas")[0]),
      N * 8)
w2 = jax.random.uniform(jax.random.PRNGKey(2), (1024, N // 1024), jnp.float32)
bench("joint2 TS weighted",
      lambda: (lambda: histogram(xr_, y, bins=[te, se], weights=w2,
                                 method="pallas")[0]),
      N * 12)
bench("direct 3in 9x10x11",
      lambda: (lambda: histogram(xr_, y, w2, bins=b3, method="pallas")[0]),
      N * 12)
