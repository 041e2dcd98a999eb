"""Round-3 probe 3: packed-kernel grid-step batching A/B (XHIST_PACKED_BATCH)
+ parity. PYTHONPATH=/root/repo:/root/.axon_site python scripts/r3_probe3.py
"""

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from xhistogram_tpu import bins as bins_mod
from xhistogram_tpu.ops import pallas_hist as ph


def edges_dev(nb, lo=-4.0, hi=4.0):
    return jnp.asarray(
        bins_mod.edges_for_compare(
            np.linspace(lo, hi, nb + 1).astype(np.float64), np.float32
        )
    )


def timeit(fn, n=10):
    np.asarray(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    np.asarray(r)
    return (time.perf_counter() - t0) / n


def run_packed(nbins, m, c, tag, n=10):
    eds = [edges_dev(nb) for nb in nbins]
    elems = m * c

    @jax.jit
    def f():
        ks = jax.random.split(jax.random.PRNGKey(0), len(nbins))
        arrs = [jax.random.normal(k, (m, c), jnp.float32) * 1.5 for k in ks]
        h = ph.pallas_histogram2d(arrs, eds, None, tuple(nbins))
        return h[:, :-1].sum()

    dt = timeit(f, n=n)
    print(
        f"| packed {nbins} m={m} c={c} {tag} | {dt*1e3:8.1f} ms | "
        f"{elems*4*len(nbins)/dt/1e9:6.2f} GB/s |",
        flush=True,
    )


print("backend:", jax.default_backend(), flush=True)

# parity on chip first (bpt=8 default)
rng = np.random.RandomState(0)
a = rng.randn(70, 50).astype("f4")
b = rng.randn(70, 50).astype("f4")
ea = [edges_dev(120), edges_dev(90)]
h = jax.jit(
    lambda x, y: ph.pallas_histogram2d([x, y], ea, None, (120, 90))
)(jnp.asarray(a), jnp.asarray(b))[:, :-1]
exp = np.stack(
    [
        np.histogram2d(
            a[r].astype("f8"), b[r].astype("f8"),
            bins=[np.linspace(-4, 4, 121), np.linspace(-4, 4, 91)],
        )[0].ravel()
        for r in range(70)
    ]
)
print(f"  parity[packed bpt=8 chip]: "
      f"{np.array_equal(np.asarray(h), exp)}", flush=True)

for bpt in (1, 4, 8, 16):
    os.environ["XHIST_PACKED_BATCH"] = str(bpt)
    run_packed((120, 90), 16384, 64, f"bpt={bpt}")
os.environ["XHIST_PACKED_BATCH"] = "8"
run_packed((120, 90), 4096, 64, "bpt=8 m=4096")
run_packed((280, 340), 4096, 64, "bpt=8 30k slots")
print("DONE", flush=True)
