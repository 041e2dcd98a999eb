"""Small-grid factored+arith headroom sweep.

The auto-routed 128-uniform-bin reduce-all config measures 15.8 Ge/s vs a
~31 Ge/s VPU-op-model roof (doc/perf_model.md) — the largest relative gap
in the kernel table. One knob at a time on the SAME config to find where
the factor-of-2 lives: factorization shape (log2 n2), tile geometry
(XHIST_TILE_*, if honored), E-axis sub-chunking, and bins=256 for scale.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/smallgrid_sweep.py
"""
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from xhistogram_tpu.core import histogram


def timeit(fn, n=5):
    np.asarray(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    np.asarray(r)
    return (time.perf_counter() - t0) / n


def run(nb, tag, elems=1 << 28, **env):
    jax.clear_caches()
    old = {}
    for k, v in env.items():
        old[k] = os.environ.get(k)
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = str(v)
    try:
        edges = np.linspace(-4.0, 4.0, nb + 1)  # arith tier (pow2 widths)
        m, c = 1024, elems // 1024

        def f():
            k = jax.random.PRNGKey(0)
            a = 1.5 * jax.random.normal(k, (m, c), jnp.float32)
            h, _ = histogram(a, bins=edges, method="pallas")
            return jnp.sum(jnp.asarray(h, jnp.int64).astype(jnp.float32))

        dt = timeit(jax.jit(f))
        ge = elems / dt / 1e9
        print(f"| {nb:5d} bins {tag:30s} | {dt*1e3:7.1f} ms | "
              f"{ge:6.2f} Ge/s | {ge*4:6.1f} GB/s |", flush=True)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


print("backend:", jax.default_backend(), flush=True)

if os.environ.get("XHIST_SWEEP_ONE"):
    # single-config mode for import-time knobs (XHIST_MAX_TC /
    # XHIST_VMEM_BUDGET are module constants): env must be set before
    # the xhistogram_tpu import, i.e. by the caller
    nb = int(os.environ["XHIST_SWEEP_ONE"])
    run(nb, f"MAX_TC={os.environ.get('XHIST_MAX_TC', 'dflt')}")
else:
    for nb in (128, 256):
        run(nb, "auto (scored factorization)")
        for k in (3, 4, 5, 6, 7):
            run(nb, f"FORCE_LOG2N2={k}", XHIST_FORCE_LOG2N2=k)

print("DONE", flush=True)
