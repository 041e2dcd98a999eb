"""Does factored + arithmetic digitize (+ small n2) beat one_input for
UNIFORM small-bin reduce-all configs? (With the compare digitize it lost
30.1 vs 43.5 GB/s — the digitize was the cost; now it's ~25 ops.)

PYTHONPATH=/root/repo:/root/.axon_site python scripts/r3_uniform_oneinput.py
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from xhistogram_tpu.core import histogram


def timeit(fn, n=3):
    np.asarray(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    np.asarray(r)
    return (time.perf_counter() - t0) / n


def run(nb, tag, elems=1 << 30):
    jax.clear_caches()  # the inner _histogram_impl jit cache ignores env
    m, c = 1024, elems // 1024
    edges = np.linspace(-4.0, 4.0, nb + 1)  # d = 8/nb: pow2 nb → certified

    def f():
        a = 1.5 * jax.random.normal(jax.random.PRNGKey(0), (m, c), jnp.float32)
        h, _ = histogram(a, bins=edges, method="pallas")
        return jnp.sum(jnp.asarray(h, jnp.float32))

    dt = timeit(jax.jit(f))
    print(f"| {nb:5d} bins {tag:28s} | {dt*1e3:8.1f} ms | "
          f"{elems*4/dt/1e9:6.1f} GB/s |", flush=True)


print("backend:", jax.default_backend(), flush=True)
# parity spot-check with forced factored + small n2
rng = np.random.RandomState(0)
data = rng.randn(4, 20000).astype("f4") * 1.5
edges = np.linspace(-4, 4, 65)
os.environ["XHIST_FORCE_KERNEL"] = "factored"
for k in ("3", "4"):
    os.environ["XHIST_FORCE_LOG2N2"] = k
    h, _ = histogram(data, bins=edges, method="pallas")
    ok = np.array_equal(
        np.asarray(h), np.histogram(data.ravel().astype("f8"), bins=edges)[0]
    )
    print(f"  parity[factored n2=2^{k} uniform]: {ok}", flush=True)
del os.environ["XHIST_FORCE_KERNEL"], os.environ["XHIST_FORCE_LOG2N2"]

for nb in (64, 128, 256, 1024):
    run(nb, "one_input (default)")
os.environ["XHIST_FORCE_KERNEL"] = "factored"
for k, nbs in (("3", (64,)), ("4", (64, 128, 256)), ("5", (128, 256, 1024)),
               ("7", (1024,))):
    os.environ["XHIST_FORCE_LOG2N2"] = k
    for nb in nbs:
        run(nb, f"factored+arith n2=2^{k}")
del os.environ["XHIST_FORCE_KERNEL"], os.environ["XHIST_FORCE_LOG2N2"]
print("DONE", flush=True)
