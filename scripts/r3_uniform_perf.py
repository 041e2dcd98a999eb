"""Uniform arithmetic digitize: on-chip A/B on many-edge configs
(XHIST_UNIFORM_DIGITIZE=0/1) + parity.
PYTHONPATH=/root/repo:/root/.axon_site python scripts/r3_uniform_perf.py
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


def run(nb, elems, axis, m, tag):
    edges = np.linspace(0.0, 1.0, nb + 1)  # d = 2^-k when nb power of two
    c = elems // m

    def f():
        k = jax.random.PRNGKey(0)
        a = jax.random.uniform(k, (m, c), jnp.float32)
        h, _ = histogram(a, bins=edges, axis=axis, method="pallas")
        return jnp.sum(jnp.asarray(h, jnp.float32))

    fj = jax.jit(f)
    dt = timeit(fj)
    print(
        f"| {nb} bins {tag} | {dt*1e3:9.1f} ms | "
        f"{elems*4/dt/1e9:7.2f} GB/s |", flush=True,
    )


print("backend:", jax.default_backend(), flush=True)

# parity first (both settings)
rng = np.random.RandomState(0)
data = rng.uniform(0, 1, (4, 30000)).astype("f4")
edges = np.linspace(0, 1, 4097)
exp = np.stack([np.histogram(np.asarray(r, "f8"), bins=edges)[0]
                for r in data])
for flag in ("1", "0"):
    os.environ["XHIST_UNIFORM_DIGITIZE"] = flag
    h, _ = histogram(data, bins=edges, axis=1, method="pallas")
    ok = np.array_equal(np.asarray(h), exp)
    print(f"  parity[uniform={flag}]: {ok}", flush=True)

for flag in ("0", "1"):
    os.environ["XHIST_UNIFORM_DIGITIZE"] = flag
    tag = f"uni={flag}"
    run(4096, 200_000_000, None, 1024, f"reduce-all {tag}")
    run(16384, 50_000_000, None, 1024, f"reduce-all {tag}")
    run(4096, 50_000_000, (1,), 64, f"kept-rows {tag}")
print("DONE", flush=True)
