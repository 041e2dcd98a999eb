"""Sweep VMEM budget / max tile width for the pallas kernels on-chip."""
import os, subprocess, sys

CASES = [("6291456", "2048"), ("6291456", "4096"),
         ("12582912", "4096"), ("12582912", "8192"), ("25165824", "8192")]
code = r'''
import time, numpy as np, jax, jax.numpy as jnp
from xhistogram_tpu.core import histogram
N = 1 << 28
x = jax.random.normal(jax.random.PRNGKey(0), (1024, N // 1024), jnp.float32)
y = jax.random.normal(jax.random.PRNGKey(1), (1024, N // 1024), jnp.float32)
def bench(tag, f, nbytes):
    try:
        np.asarray(f())
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); np.asarray(f()); ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"  {tag:24s} {dt*1e3:8.1f} ms {nbytes/dt/1e9:7.1f} GB/s", flush=True)
    except Exception as e:
        print(f"  {tag:24s} FAIL {type(e).__name__} {str(e)[:60]}", flush=True)
e64 = np.linspace(-4, 4, 65); e16 = np.linspace(-4, 4, 17)
te = np.linspace(-4, 4, 281); se = np.linspace(-4, 4, 341)
bench("1d64", lambda: histogram(x, bins=e64, method="pallas")[0], N*4)
bench("joint 16x16", lambda: histogram(x, y, bins=[e16,e16], method="pallas")[0], N*8)
bench("joint TS", lambda: histogram(x, y, bins=[te,se], method="pallas")[0], N*8)
'''
for budget, maxtc in CASES:
    print(f"== budget={int(budget)>>20}MB max_tc={maxtc}", flush=True)
    env = dict(os.environ, XHIST_VMEM_BUDGET=budget, XHIST_MAX_TC=maxtc)
    subprocess.run([sys.executable, "-c", code], env=env)
