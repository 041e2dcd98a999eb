"""Chip calibration of the VPU op-rate model behind doc/perf_model.md's
roofline table (VERDICT r4 item 7: the factored+arith row sat at 51% of a
roof built from an ASSUMED ~3.9 Tops/s uniform retire rate — measure the
actual per-op-class rates and restate the roofs).

Method: Pallas microkernels over resident VMEM tiles, each executing a
dependency-chained loop of one op class (chained through the accumulator so
Mosaic cannot CSE/DCE the work); per-element op counts are exact by
construction, so rate = ops / time. Classes: f32 compare+cast-to-int32 (the
compare-chain digitize's unit), int32 add, f32 mul-add chain, select, the
full arithmetic-digitize sequence (~25 nominal ops), and the equality
one-hot build + int8 cast (the factored kernels' per-row unit).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_vpu_calib.py
"""

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), flush=True)

TM, TC = 8, 2048
STEPS = 512  # grid steps; work per step = iters * ops_per_iter * TM*TC


def timeit(fn, n=3):
    np.asarray(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    np.asarray(r)
    return (time.perf_counter() - t0) / n


def bench(name, body, iters, ops_per_iter):
    """body(x_f32, acc_i32, i) -> (x', acc') executes one chained iteration."""

    def kernel(a_ref, o_ref):
        j = pl.program_id(0)
        x = a_ref[...]
        acc = jnp.zeros((TM, TC), jnp.int32)
        for i in range(iters):
            x, acc = body(x, acc, i)

        @pl.when(j == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        o_ref[...] += acc

    @jax.jit
    def f():
        a = jax.random.normal(jax.random.PRNGKey(0), (TM, TC), jnp.float32)
        out = pl.pallas_call(
            kernel,
            grid=(STEPS,),
            in_specs=[pl.BlockSpec((TM, TC), lambda j: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TM, TC), lambda j: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TM, TC), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 << 20
            ),
        )(a)
        return out.sum()

    try:
        dt = timeit(f)
    except Exception as e:
        print(f"| {name} | FAILED {type(e).__name__} |", flush=True)
        return
    total_ops = STEPS * iters * ops_per_iter * TM * TC
    print(f"| {name} | {ops_per_iter} ops/iter | "
          f"{total_ops/dt/1e12:.2f} Tops/s | {dt*1e3:.1f} ms |", flush=True)


# --- op classes -------------------------------------------------------------


def cmp_cast(x, acc, i):
    # the compare-chain digitize unit: f32 >= const, cast to i32, add
    t = jnp.float32(0.1) * (i % 7)
    acc = acc + (x >= t).astype(jnp.int32)
    return x, acc  # x unchanged; acc chain carries the dependency


def cmp_cast_dep(x, acc, i):
    # dependency-chained variant: x evolves so iterations cannot fuse
    t = jnp.float32(0.1) * (i % 7)
    c = (x >= t).astype(jnp.int32)
    acc = acc + c
    x = x + c.astype(jnp.float32) * jnp.float32(1e-30)
    return x, acc


def int_add(x, acc, i):
    acc = acc + acc + jnp.int32(i)  # 2 int adds
    return x, acc


def f32_mul_add(x, acc, i):
    x = x * jnp.float32(1.0000001) + jnp.float32(1e-9)
    return x, acc + (i == 0) * 0


def select(x, acc, i):
    acc = jnp.where(x >= jnp.float32(0.1 * (i % 5)), acc + 1, acc)
    return x, acc


def arith_digitize(x, acc, i):
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


def digitize_chunk8(x, acc, i):
    # one unrolled compare-sum chunk of the _digitize_tile loop:
    # (8,1) edge block vs (TM,TC) tile -> rank-3 compare + leading-axis sum
    chunk = (
        jnp.float32(0.01) * (i % 3)
        + jax.lax.broadcasted_iota(jnp.float32, (8, 1), 0)
    )
    cmp = x[None, :, :] >= chunk[:, :, None]
    acc = acc + jnp.sum(cmp.astype(jnp.int32), axis=0)
    x = x + acc[0:1, 0:1].astype(jnp.float32).sum() * jnp.float32(0)
    return x, acc


print("| microbench | nominal ops | measured rate | time |", flush=True)
print("|---|---|---|---|", flush=True)
bench("f32 cmp + i32 cast + add (indep)", cmp_cast, 64, 3)
bench("f32 cmp + i32 cast + add (chained)", cmp_cast_dep, 64, 5)
bench("int32 add", int_add, 64, 2)
bench("f32 fma chain", f32_mul_add, 64, 2)
bench("select (where)", select, 64, 3)
bench("arith-digitize sequence (~25 ops)", arith_digitize, 16, 25)
bench("compare-sum digitize chunk (8 edges ~ 17 ops)", digitize_chunk8,
      16, 17)
