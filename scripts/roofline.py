"""Measured roofline table per kernel x config (doc/perf_model.md source).

For each kernel on its canonical config: achieved element rate / GB/s, the
theoretical MAC and VPU-op counts per element, the implied MXU/VPU roof,
and the fraction of the binding roof achieved. v5e constants: MXU 197
TFLOP/s bf16 (2 flops/MAC), VPU ~3.9 Tops/s f32, HBM ~800 GB/s.

r3 methodology fixes (the r2 table understated the kernels):
  - data layouts are tile-aligned (1024, elems/1024): the r2 (8, 125e6)
    layout hid a FULL-ARRAY pad copy (jnp.pad to a tc multiple) in every
    number — ragged input blocks now remove that cost for misaligned
    shapes too, but aligned layouts are the clean kernel measurement;
  - the on-device RNG cost (measured separately) is subtracted, so "kern"
    columns are kernel-only; "e2e" includes generation like bench.py.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/roofline.py
(device-side checksum timing; see scripts/cliff_perf.py notes)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from xhistogram_tpu.core import _histogram_impl
from xhistogram_tpu import bins as bins_mod

MXU = 197e12 / 2  # MAC/s
VPU = 3.9e12
HBM = 800e9


def timeit(fn, n=3):
    np.asarray(fn())  # synced warmup (async leftovers poison the window)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    np.asarray(r)
    return (time.perf_counter() - t0) / n


def edges_dev(e, dt=np.float32):
    return jnp.asarray(bins_mod.edges_for_compare(np.asarray(e), dt))


_rng_cache = {}


def rng_time(m, c, n_arrays):
    key = (m, c, n_arrays)
    if key not in _rng_cache:
        @jax.jit
        def g():
            k = jax.random.PRNGKey(0)
            tot = jnp.float32(0)
            for i in range(n_arrays):
                tot += jax.random.normal(
                    jax.random.fold_in(k, i), (m, c), jnp.float32
                ).sum()
            return tot

        _rng_cache[key] = timeit(g)
    return _rng_cache[key]


def run(name, nbins, m, c, n_inputs, weighted, macs_per_elem, vpu_per_elem,
        method="pallas", axis=(1,), mxu_rate=1.0, wmode=None):
    # mxu_rate=2.0 for unweighted int8-one-hot matmul rows (v5e int8 MACs
    # run at 2x the bf16 rate)
    eds_np = [
        bins_mod.edges_for_compare(np.linspace(-4, 4, nb + 1), np.float32)
        for nb in nbins
    ]
    eds = tuple(jnp.asarray(e) for e in eds_np)
    uniform = tuple(bins_mod.uniform_arith_form(e) for e in eds_np)
    elems = m * c
    n_arrays = n_inputs + (1 if weighted else 0)
    nbytes = elems * 4 * n_arrays

    @jax.jit
    def f():
        k = jax.random.PRNGKey(0)
        arrs = tuple(
            jax.random.normal(jax.random.fold_in(k, i), (m, c), jnp.float32)
            for i in range(n_inputs)
        )
        if not weighted:
            w = None
        elif wmode and wmode.startswith("int"):
            # integer-digit modes take int32 weights; span sets the digit
            # count (must match the mode so the row measures what it says)
            span = {"int1": 100, "int2": 9000, "int4": 1 << 30}[wmode]
            w = jax.random.randint(jax.random.fold_in(k, 9), (m, c),
                                   -span, span + 1, jnp.int32)
        else:
            w = jax.random.uniform(jax.random.fold_in(k, 9), (m, c),
                                   jnp.float32)
        h = _histogram_impl(
            arrs, w, eds, axis=axis, nbins=nbins, density=False,
            method=method, block_size="auto", has_weights=weighted,
            uniform=uniform, weighted_mode=wmode,
        )
        return jnp.sum(h.astype(jnp.float32))

    try:
        dt = timeit(f)
    except Exception as e:
        print(f"| {name} | FAILED {type(e).__name__} |", flush=True)
        return
    dt_kern = max(dt - rng_time(m, c, n_arrays), 1e-9)
    if dt_kern < 0.2 * dt:
        # workload too small to separate from generation/dispatch noise
        dt_kern = dt
    rate = elems / dt_kern
    roof_mxu = MXU * mxu_rate / max(macs_per_elem, 1e-9)
    roof_vpu = VPU / max(vpu_per_elem, 1e-9)
    roof_hbm = HBM / (nbytes / elems)
    roof = min(roof_mxu, roof_vpu, roof_hbm)
    binding = ["MXU", "VPU", "HBM"][
        [roof_mxu, roof_vpu, roof_hbm].index(roof)
    ]
    print(
        f"| {name} | {elems:.0e} | kern {rate/1e9:.2f} Ge/s "
        f"({nbytes/dt_kern/1e9:.1f} GB/s) | e2e {nbytes/dt/1e9:.1f} GB/s | "
        f"{macs_per_elem:.0f} | {vpu_per_elem:.0f} | "
        f"{roof/1e9:.2f} Ge/s ({binding}) | {100*rate/roof:.0f}% |",
        flush=True,
    )


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    print("| kernel/config | elems | kernel-only | e2e(+RNG) | MACs/e |"
          " VPUops/e | binding roof | % |", flush=True)
    print("|---|---|---|---|---|---|---|---|", flush=True)
    # one_input: 64 bins; cum rows 72 pad → MACs 8·72, VPU ≈ 2·72 + ~20
    run("one_input 64b full-reduce", (64,), 1024, 1 << 20, 1, False,
        8 * 72, 2 * 72 + 20, axis=None)
    # 128b UNIFORM bins route to factored+arith-digitize (r3): scored
    # factorization picks (16, 16); VPU ≈ 25 (digitize) + 2.5·32 (equality)
    run("one_input->factored 128b uniform full-reduce", (128,), 1024,
        1 << 20, 1, False, 16 * 16, 25 + 2.5 * 32 + 20, axis=None,
        mxu_rate=2.0)
    # joint2 bench config: MACs (288·344), VPU ≈ 2·(288+344)
    run("joint2 280x340 full-reduce", (280, 340), 1024, 1 << 19, 2, False,
        288 * 344, 2 * (288 + 344) + 20, axis=None, mxu_rate=2.0)
    # joint2 weighted split: 2 bf16 sections → 2x MACs
    run("joint2 280x340 weighted(split)", (280, 340), 1024, 1 << 18, 2,
        True, 2 * 288 * 344, 3 * (288 + 344) + 40, axis=None)
    # weighted highest (three-limb exact): 3 bf16 sections → 3x MACs,
    # +1 Kahan accumulate per tile on the VPU side
    run("joint2 280x340 weighted(highest)", (280, 340), 1024, 1 << 18, 2,
        True, 3 * 288 * 344, 4 * (288 + 344) + 40, axis=None,
        wmode="highest")
    # integer-digit weighted (r4, exact mod 2**32): N int8 sections at the
    # 2x int8 MXU rate; VPU adds ~7 extraction+staging ops per digit
    run("joint2 280x340 weighted(int1)", (280, 340), 1024, 1 << 18, 2,
        True, 1 * 288 * 344, 2 * (288 + 344) + 7 + 40, axis=None,
        wmode="int1", mxu_rate=2.0)
    run("joint2 280x340 weighted(int2)", (280, 340), 1024, 1 << 18, 2,
        True, 2 * 288 * 344, 2 * (288 + 344) + 14 + 40, axis=None,
        wmode="int2", mxu_rate=2.0)
    run("joint2 280x340 weighted(int4)", (280, 340), 1024, 1 << 18, 2,
        True, 4 * 288 * 344, 2 * (288 + 344) + 28 + 40, axis=None,
        wmode="int4", mxu_rate=2.0)
    # factored 1M slots: n1≈976·n2=1024; VPU = Σedges + n1c+n2 per chunk
    run("factored 1000x1000 full-reduce", (1000, 1000), 1024, 49152, 2,
        False, 1_000_000, 2 * 2002 + 2 * 3000, axis=None, mxu_rate=2.0)
    # per-row factored 150x90 (13.5k slots): padded ≈ 13824
    run("factored_per_row m=1000 c=1e5 150x90", (150, 90), 1000, 100_000,
        1 + 1, False, 14_000, 2 * 242 + 2 * 500, axis=(1,))
    # packed m=16384 c=64 120x90: S = 8·10801 ≈ padded 87k; tiles hold
    # 8·64 real of 8·128 → 2x fill penalty on MACs
    run("factored_packed m=16384 c=64 120x90", (120, 90), 16384, 64,
        2, False, 172, 2 * 213 + 2 * 1000, axis=(1,))
    # direct m=1000 c=64 40x40 (1601 slots → 1664 pad): MACs 8·1664,
    # VPU ≈ 3·1664 (G build) + digitize 82
    run("direct m=1000 c=64 40x40", (40, 40), 1000, 64, 2, False,
        8 * 1664, 3 * 1664 + 164, axis=(1,))
    # 16384 UNIFORM bins: arithmetic digitize; scored pick (128, 128)
    run("factored 16384b uniform (arith digitize)", (16384,), 1024,
        49152, 1, False, 16384, 25 + 2.5 * 256 + 20, axis=None,
        mxu_rate=2.0)
