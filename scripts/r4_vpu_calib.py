"""Chip calibration of the VPU op-rate model behind doc/perf_model.md's
roofline table (VERDICT r4 item 7: the factored+arith row sat at 51% of a
roof built from an ASSUMED ~3.9 Tops/s uniform retire rate — measure the
actual per-op-class rates and restate the roofs).

Method: Pallas microkernels over resident VMEM tiles, each executing a
dependency-chained loop of one op class (chained through the accumulator so
Mosaic cannot CSE/DCE the work). Each class is timed at TWO work levels
(iters and 3*iters) and the rate is computed from the SLOPE — subtracting
everything that does not scale with the op count (the ~3-9 ms HTTP-tunnel
dispatch floor of this environment, grid-step overhead, tile DMA). The
first version of this script timed single levels and measured the floor,
not the VPU: every row came out 0.12-0.33 "Tops/s" with identical ~9-10 ms
times regardless of op count.

Classes: f32 compare+cast-to-int32 (the compare-chain digitize's unit),
int32 add, f32 mul-add chain, select, the full arithmetic-digitize
sequence (~25 nominal ops), and the compare-sum digitize chunk exactly as
production runs it (an (8,1) VMEM edge ref sliced per chunk — the iota-
built variant fails Mosaic verification with a replicated-layout error).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_vpu_calib.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), flush=True)

TM, TC = 8, 2048
STEPS = 1024


def timeit(fn, n=3):
    np.asarray(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    np.asarray(r)
    return (time.perf_counter() - t0) / n


def build(body, iters):
    def kernel(a_ref, e_ref, o_ref):
        j = pl.program_id(0)
        x = a_ref[...]
        acc = jnp.zeros((TM, TC), jnp.int32)
        for i in range(iters):
            x, acc = body(x, acc, i, e_ref)

        @pl.when(j == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        o_ref[...] += acc

    @jax.jit
    def f():
        a = jax.random.normal(jax.random.PRNGKey(0), (TM, TC), jnp.float32)
        e = jnp.linspace(-2.0, 2.0, 8, dtype=jnp.float32).reshape(8, 1)
        out = pl.pallas_call(
            kernel,
            grid=(STEPS,),
            in_specs=[
                pl.BlockSpec((TM, TC), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 1), lambda j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, TC), lambda j: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TM, TC), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 << 20
            ),
        )(a, e)
        return out.sum()

    return f


def bench(name, body, iters, ops_per_iter):
    """Slope rate between iters and 3*iters (fixed costs cancel)."""
    try:
        t1 = timeit(build(body, iters))
        t3 = timeit(build(body, 3 * iters))
    except Exception as e:
        print(f"| {name} | FAILED {type(e).__name__}: {e} |", flush=True)
        return
    dt = max(t3 - t1, 1e-9)
    extra_ops = STEPS * 2 * iters * ops_per_iter * TM * TC
    print(f"| {name} | {ops_per_iter} ops/iter | "
          f"{extra_ops/dt/1e12:.2f} Tops/s | t1 {t1*1e3:.1f} ms, "
          f"t3 {t3*1e3:.1f} ms |", flush=True)


# --- op classes -------------------------------------------------------------


def cmp_cast(x, acc, i, e_ref):
    # the compare-chain digitize unit: f32 >= const, cast to i32, add
    t = jnp.float32(0.1) * (i % 7)
    acc = acc + (x >= t).astype(jnp.int32)
    return x, acc  # acc chain carries the dependency


def cmp_cast_dep(x, acc, i, e_ref):
    # x also evolves so iterations cannot reorder/fuse across the chain
    t = jnp.float32(0.1) * (i % 7)
    c = (x >= t).astype(jnp.int32)
    acc = acc + c
    x = x + c.astype(jnp.float32) * jnp.float32(1e-30)
    return x, acc


def int_add(x, acc, i, e_ref):
    acc = acc + acc + jnp.int32(i)  # 2 int adds
    return x, acc


def f32_mul_add(x, acc, i, e_ref):
    x = x * jnp.float32(1.0000001) + jnp.float32(1e-9)
    return x, acc + (i == 0) * 0


def select(x, acc, i, e_ref):
    acc = jnp.where(x >= jnp.float32(0.1 * (i % 5)), acc + 1, acc)
    return x, acc


def arith_digitize(x, acc, i, e_ref):
    # the _digitize_tile_uniform sequence, nominal op count ~25
    nu = 126
    t0 = jnp.float32(-4.0)
    d = jnp.float32(8.0 / 128)
    inv = jnp.float32(128 / 8.0)
    y = jnp.clip((x - t0) * inv, jnp.float32(0.0), jnp.float32(nu))
    kc = jnp.clip(jnp.floor(y).astype(jnp.int32), 2, nu - 3)
    idx = kc - 2
    for j in range(5):
        kj = kc - 2 + j
        tj = t0 + kj.astype(jnp.float32) * d
        idx = idx + (x >= tj).astype(jnp.int32)
    idx = idx + (x >= jnp.float32(3.9)).astype(jnp.int32)
    idx = jnp.where(x == x, idx, 0)
    acc = acc + idx
    x = x + idx.astype(jnp.float32) * jnp.float32(1e-30)
    return x, acc


def digitize_chunk8(x, acc, i, e_ref):
    # one compare-sum chunk of _digitize_tile, production form: the edge
    # chunk comes from a VMEM ref (pallas_hist.py:886-888)
    chunk = e_ref[...] + jnp.float32(0.01) * (i % 3)  # (8, 1)
    cmp = x[None, :, :] >= chunk[:, :, None]  # (8, TM, TC)
    acc = acc + jnp.sum(cmp.astype(jnp.int32), axis=0)
    x = x + acc[0:1, 0:1].astype(jnp.float32).sum() * jnp.float32(0)
    return x, acc


print("| microbench | nominal ops | slope rate | levels |", flush=True)
print("|---|---|---|---|", flush=True)
bench("f32 cmp + i32 cast + add (indep)", cmp_cast, 256, 3)
bench("f32 cmp + i32 cast + add (chained)", cmp_cast_dep, 256, 5)
bench("int32 add", int_add, 256, 2)
bench("f32 fma chain", f32_mul_add, 256, 2)
bench("select (where)", select, 256, 3)
bench("arith-digitize sequence (~25 ops)", arith_digitize, 64, 25)
bench("compare-sum digitize chunk (8 edges ~ 17 ops)", digitize_chunk8,
      64, 17)
