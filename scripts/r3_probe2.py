"""Round-3 probe 2: calibration + the new weighted i8x3 mode + joint2
NaN-mask + packed re-measurement with enough reps to wash out the tunnel
RTT.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/r3_probe2.py
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


def timeit(fn, n=3):
    np.asarray(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    np.asarray(r)
    return (time.perf_counter() - t0) / n


def report(tag, elems, nbytes, dt, extra=""):
    print(
        f"| {tag} | {dt*1e3:8.1f} ms | {elems/dt/1e9:6.2f} Ge/s | "
        f"{nbytes/dt/1e9:6.1f} GB/s | {extra}",
        flush=True,
    )


print("backend:", jax.default_backend(), flush=True)

# --- calibration: per-call floor + RNG-only cost -------------------------
trivial = jax.jit(lambda x: x + 1.0)
x0 = jnp.zeros((8, 128), jnp.float32)
dt = timeit(lambda: trivial(x0), n=10)
print(f"calibration: trivial jit call {dt*1e3:.2f} ms/rep (n=10)", flush=True)


@jax.jit
def rng_only():
    a = jax.random.normal(jax.random.PRNGKey(0), (1024, 1 << 20), jnp.float32)
    return a.sum()


dt = timeit(rng_only, n=5)
print(f"calibration: RNG 2^30 f32 only {dt*1e3:.1f} ms", flush=True)


@jax.jit
def rng2_only():
    kt, ks = jax.random.split(jax.random.PRNGKey(0))
    a = jax.random.normal(kt, (1024, 1 << 20), jnp.float32)
    b = jax.random.normal(ks, (1024, 1 << 20), jnp.float32)
    return a.sum() + b.sum()


dt = timeit(rng2_only, n=5)
print(f"calibration: RNG 2x2^30 f32 {dt*1e3:.1f} ms", flush=True)


def run_joint2(tag, wmode=None, weighted=False, elems=1 << 30, n=3):
    m, c = 1024, elems // 1024
    et = edges_dev(280, -2.0, 30.0)
    es = edges_dev(340, 30.0, 40.0)

    @jax.jit
    def f():
        kt, ks, kw = jax.random.split(jax.random.PRNGKey(0), 3)
        T = 14.0 + 8.0 * jax.random.normal(kt, (m, c), jnp.float32)
        S = 35.0 + 1.5 * jax.random.normal(ks, (m, c), jnp.float32)
        w = (
            1.0 + jax.random.uniform(kw, (m, c), jnp.float32)
            if weighted
            else None
        )
        h = ph.pallas_histogram2d(
            [T, S], [et, es], w, (280, 340), reduce_all=True,
            weighted_mode=wmode,
        )
        return h[:, :-1].sum()

    nbytes = elems * 4 * (3 if weighted else 2)
    dt = timeit(f, n=n)
    report(f"joint2{'w' if weighted else ''} {tag}", elems, nbytes, dt)


# --- joint2 unweighted: NaN-mask A/B -------------------------------------
os.environ["XHIST_JOINT2_NANMASK"] = "0"
run_joint2("nanmask=0 (r2 form)")
os.environ["XHIST_JOINT2_NANMASK"] = "1"
run_joint2("nanmask=1 (default)")

# --- joint2 weighted: split vs i8x3 vs i8 --------------------------------
run_joint2("split", wmode="split", weighted=True, elems=1 << 29)
run_joint2("i8x3", wmode="i8x3", weighted=True, elems=1 << 29)
run_joint2("i8", wmode="i8", weighted=True, elems=1 << 29)

# parity spot-check for i8x3 on chip
rng = np.random.RandomState(0)
t_np = rng.uniform(-2, 30, (8, 20000)).astype("f4")
s_np = rng.uniform(30, 40, (8, 20000)).astype("f4")
w_np = (1.0 + rng.rand(8, 20000)).astype("f4")
et = edges_dev(280, -2.0, 30.0)
es = edges_dev(340, 30.0, 40.0)
h = jax.jit(
    lambda a, b, w: ph.pallas_histogram2d(
        [a, b], [et, es], w, (280, 340), reduce_all=True,
        weighted_mode="i8x3",
    )[:, :-1]
)(jnp.asarray(t_np), jnp.asarray(s_np), jnp.asarray(w_np))
exp, _, _ = np.histogram2d(
    t_np.ravel().astype("f8"), s_np.ravel().astype("f8"),
    bins=[np.linspace(-2, 30, 281), np.linspace(30, 40, 341)],
    weights=w_np.ravel().astype("f8"),
)
okp = np.allclose(
    np.asarray(h).reshape(280, 340), exp, rtol=1e-4, atol=2.4e-7 * 2 * 8
)
print(f"  parity[i8x3 joint2]: {okp}", flush=True)


# --- packed: clean per-step numbers (n=10) -------------------------------
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
    steps = m // 8
    report(
        f"packed {nbins} m={m} c={c} {tag}", elems,
        elems * 4 * len(nbins), dt, f"{dt/steps*1e6:6.1f} us/step",
    )


run_packed((120, 90), 16384, 64, "n=10")
run_packed((2, 2), 16384, 64, "tiny n=10")
run_packed((120, 90), 4096, 64, "m=4096 n=10")
print("DONE", flush=True)
