"""Round-3 perf probes (run on the real chip, one process, variants via
module-global monkeypatching + call-time env knobs):

  A. one_input 64/128-bin reduce-all: current vs ones-lhs (no R build) vs
     forced factored with small n2 (digitize + equality-pair matmul).
  B. joint2 unweighted: VMEM tile budget sweep + E-split depth.
  C. joint2 weighted split: two-dots vs concat, budget sweep, E-split.
  D. packed kernel: per-grid-step fixed overhead (tiny-slot config) vs the
     120x90 baseline.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/r3_probe1.py [section]
"""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from xhistogram_tpu import bins as bins_mod
from xhistogram_tpu.ops import pallas_hist as ph

SECTIONS = sys.argv[1:] or ["A", "B", "C", "D"]


def edges_dev(nb, lo=-4.0, hi=4.0):
    return jnp.asarray(
        bins_mod.edges_for_compare(
            np.linspace(lo, hi, nb + 1).astype(np.float64), np.float32
        )
    )


def timeit(fn, n=3):
    np.asarray(fn())  # compile + settle
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


def parity_one_input(nb, tag):
    """Small-slice numpy parity for the current one_input/factored config."""
    rng = np.random.RandomState(0)
    data = rng.randn(8, 125_000).astype(np.float32) * 1.5
    e = np.linspace(-4, 4, nb + 1)
    ed = edges_dev(nb)

    def f(a):
        h = ph.pallas_histogram2d([a], [ed], None, (nb,), reduce_all=True)
        return h[:, :-1]

    got = np.asarray(jax.jit(f)(jnp.asarray(data)))[0]
    exp = np.histogram(data, bins=e)[0]
    ok = np.array_equal(got, exp)
    print(f"  parity[{tag}]: {ok}", flush=True)
    return ok


def run_one_input(nb, tag, elems=1 << 30):
    m, c = 1024, elems // 1024
    ed = edges_dev(nb)

    @jax.jit
    def f():
        a = 0.0 + 1.5 * jax.random.normal(
            jax.random.PRNGKey(0), (m, c), jnp.float32
        )
        h = ph.pallas_histogram2d([a], [ed], None, (nb,), reduce_all=True)
        return h[:, :-1].sum()

    dt = timeit(f)
    report(f"one_input {nb}b {tag}", elems, elems * 4, dt)


def run_joint2(tag, weighted=False, elems=1 << 30):
    m, c = 1024, elems // 1024
    et = edges_dev(280, -2.0, 30.0)
    es = edges_dev(340, 30.0, 40.0)

    @jax.jit
    def f():
        kt, ks, kw = jax.random.split(jax.random.PRNGKey(0), 3)
        T = 14.0 + 8.0 * jax.random.normal(kt, (m, c), jnp.float32)
        S = 35.0 + 1.5 * jax.random.normal(ks, (m, c), jnp.float32)
        w = (
            jax.random.uniform(kw, (m, c), jnp.float32)
            if weighted
            else None
        )
        h = ph.pallas_histogram2d(
            [T, S], [et, es], w, (280, 340), reduce_all=True
        )
        return h[:, :-1].sum()

    nbytes = elems * 4 * (3 if weighted else 2)
    dt = timeit(f)
    report(f"joint2{'w' if weighted else ''} {tag}", elems, nbytes, dt)


def run_packed(nbins, m, c, tag):
    eds = [edges_dev(nb) for nb in nbins]
    elems = m * c

    @jax.jit
    def f():
        ks = jax.random.split(jax.random.PRNGKey(0), len(nbins))
        arrs = [
            jax.random.normal(k, (m, c), jnp.float32) * 1.5 for k in ks
        ]
        h = ph.pallas_histogram2d(arrs, eds, None, tuple(nbins))
        return h[:, :-1].sum()

    dt = timeit(f)
    steps = m // 8
    report(
        f"packed {nbins} m={m} c={c} {tag}", elems, elems * 4 * len(nbins),
        dt, f"{dt/steps*1e6:6.1f} us/step",
    )


print("backend:", jax.default_backend(), flush=True)

if "A" in SECTIONS:
    print("== A: one_input ==", flush=True)
    run_one_input(64, "v0 current")
    run_one_input(128, "v0 current")
    os.environ["XHIST_ONEINPUT_ONES"] = "1"
    parity_one_input(64, "ones 64")
    run_one_input(64, "v1 ones-lhs")
    run_one_input(128, "v1 ones-lhs")
    del os.environ["XHIST_ONEINPUT_ONES"]
    os.environ["XHIST_FORCE_KERNEL"] = "factored"
    for k in (3, 4, 5, 7):
        os.environ["XHIST_FORCE_LOG2N2"] = str(k)
        ok = parity_one_input(64, f"factored n2=2^{k}")
        if ok:
            run_one_input(64, f"v2 factored n2=2^{k}")
    os.environ["XHIST_FORCE_LOG2N2"] = "4"
    parity_one_input(128, "factored n2=2^4")
    run_one_input(128, "v2 factored n2=2^4")
    del os.environ["XHIST_FORCE_KERNEL"]
    del os.environ["XHIST_FORCE_LOG2N2"]

if "B" in SECTIONS:
    print("== B: joint2 unweighted ==", flush=True)
    run_joint2("budget=24M (default)")
    ph._VMEM_BUDGET = 40 << 20
    run_joint2("budget=40M")
    ph._VMEM_BUDGET = 48 << 20
    run_joint2("budget=48M")
    ph._JOINT2_ESPLIT = 32
    run_joint2("budget=48M esplit=32")
    ph._JOINT2_ESPLIT = 8
    run_joint2("budget=48M esplit=8")
    ph._JOINT2_ESPLIT = 16
    ph._VMEM_BUDGET = 24 << 20

if "C" in SECTIONS:
    print("== C: joint2 weighted split ==", flush=True)
    run_joint2("concat budget=24M (default)", weighted=True)
    ph._SPLIT_TWO_DOTS = True
    run_joint2("two-dots budget=24M", weighted=True)
    ph._VMEM_BUDGET = 48 << 20
    run_joint2("two-dots budget=48M", weighted=True)
    os.environ["XHIST_WEIGHTED_ESPLIT"] = "4"
    run_joint2("two-dots budget=48M esplit=4", weighted=True)
    os.environ["XHIST_WEIGHTED_ESPLIT"] = "8"
    run_joint2("two-dots budget=48M esplit=8", weighted=True)
    del os.environ["XHIST_WEIGHTED_ESPLIT"]
    ph._SPLIT_TWO_DOTS = False
    ph._VMEM_BUDGET = 48 << 20
    run_joint2("concat budget=48M", weighted=True)
    ph._VMEM_BUDGET = 24 << 20

if "D" in SECTIONS:
    print("== D: packed per-step overhead ==", flush=True)
    run_packed((120, 90), 16384, 64, "baseline")
    run_packed((2, 2), 16384, 64, "tiny slots (fixed-overhead bound)")
    run_packed((120, 90), 4096, 64, "baseline m=4096")

print("DONE", flush=True)
