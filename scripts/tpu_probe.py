"""On-device correctness + perf probe for all three Pallas kernels."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from xhistogram_tpu.core import histogram

print("devices:", jax.devices())
rng = np.random.RandomState(0)

# --- correctness matrix ------------------------------------------------------
bins = np.linspace(-4, 4, 10)
data = rng.randn(8, 4096).astype("f4")
exp = np.stack([np.histogram(r, bins=bins)[0] for r in data])
h, _ = histogram(data, bins=bins, axis=1, method="pallas")
print("one_input kept-rows  correct:", np.array_equal(np.asarray(h), exp))

flat = rng.randn(100_000).astype("f4")
h, _ = histogram(flat, bins=bins, method="pallas")
print("one_input reduce-all correct:",
      np.array_equal(np.asarray(h), np.histogram(flat, bins=bins)[0]))

a = rng.randn(200_000).astype("f4"); b = rng.randn(200_000).astype("f4")
ba = np.linspace(-4, 4, 281); bb = np.linspace(-4, 4, 341)
h, _ = histogram(a, b, bins=[ba, bb], method="pallas")
e2 = np.histogram2d(a, b, bins=[ba, bb])[0]
print("joint2 280x340       correct:", np.array_equal(np.asarray(h), e2))

w = rng.rand(*a.shape).astype("f4")
h, _ = histogram(a, b, bins=[ba, bb], weights=w, method="pallas")
e2w = np.histogram2d(a, b, bins=[ba, bb], weights=w)[0]
print("joint2 weighted      close  :", np.allclose(np.asarray(h), e2w, rtol=1e-4, atol=1e-3))

c3 = [rng.randn(2, 5000).astype("f4") for _ in range(3)]
b3 = [np.linspace(-4, 4, n) for n in (9, 10, 11)]
h, _ = histogram(*c3, bins=b3, method="pallas")
e3 = np.histogramdd([d.ravel() for d in c3], bins=b3)[0]
print("direct 3-input       correct:", np.array_equal(np.asarray(h), e3))

# --- perf --------------------------------------------------------------------
def bench(tag, f, *args, nbytes, reps=4):
    # block_until_ready does not reliably wait under the axon remote backend;
    # a host transfer of the (small) result does.
    np.asarray(f(*args))  # compile + settle
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(*args))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    print(f"bench {tag:28s} {dt*1e3:9.2f} ms  {nbytes/dt/1e9:8.1f} GB/s"
          f"   reps={[round(t*1e3,1) for t in times]}")

N = 400_000_000  # 1.6 GB f32
x = jax.random.normal(jax.random.PRNGKey(0), (N,), jnp.float32)
e64 = np.linspace(-4, 4, 65)
bench("1d 64bins reduce-all", lambda v: histogram(v, bins=e64, method="pallas")[0],
      x, nbytes=N * 4)

xr = x.reshape(1000, N // 1000)
bench("1d 64bins keep1000rows", lambda v: histogram(v, bins=e64, axis=1, method="pallas")[0],
      xr, nbytes=N * 4)

e512 = np.linspace(-4, 4, 513)
bench("1d 512bins reduce-all", lambda v: histogram(v, bins=e512, method="pallas")[0],
      x, nbytes=N * 4)

M = 200_000_000
T = 14.0 + 8.0 * jax.random.normal(jax.random.PRNGKey(1), (M,), jnp.float32)
S = 35.0 + 1.5 * jax.random.normal(jax.random.PRNGKey(2), (M,), jnp.float32)
te = np.linspace(-2, 30, 281).astype("f4"); se = np.linspace(30, 40, 341).astype("f4")
bench("joint2 TS 280x340", lambda t, s: histogram(t, s, bins=[te, se], method="pallas")[0],
      T, S, nbytes=M * 8)

e100 = np.linspace(-4, 4, 101)
bench("joint2 100x100", lambda t, s: histogram(t, s, bins=[e100, e100], method="pallas")[0],
      x[:M], x[M:2*M] if 2*M <= N else x[:M], nbytes=M * 8)
