"""Does the in-kernel f32 expression t0 + f32(k)*d reproduce a host-side
numpy model BIT-EXACTLY (no FMA contraction), on this backend? Decides the
verification model for the uniform-spacing arithmetic digitize.

Model A (two roundings): f32(f32(k)*d) then f32(+t0)
Model B (FMA, one rounding): f32(f64(k)*f64(d) + f64(t0))

PYTHONPATH=... python scripts/uniform_arith_probe.py
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(t0_ref, d_ref, o_ref):
    n = o_ref.shape[1]
    k = jax.lax.broadcasted_iota(jnp.int32, (8, n), 1).astype(jnp.float32)
    o_ref[...] = t0_ref[0, 0] + k * d_ref[0, 0]


def run(t0, d, n=1024):
    interp = (
        False if jax.default_backend() == "tpu" else pltpu.InterpretParams()
    )
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        interpret=interp,
    )(jnp.full((1, 1), t0, jnp.float32), jnp.full((1, 1), d, jnp.float32))
    got = np.asarray(out)[0]
    k = np.arange(n)
    a_model = (np.float32(t0) + (k.astype(np.float32) * np.float32(d))
               .astype(np.float32)).astype(np.float32)
    b_model = (np.float64(t0) + k.astype(np.float64) * np.float64(d)).astype(
        np.float32
    )
    ma = np.array_equal(got.view(np.int32), a_model.view(np.int32))
    mb = np.array_equal(got.view(np.int32), b_model.view(np.int32))
    return ma, mb


print("backend:", jax.default_backend(), flush=True)
rng = np.random.RandomState(0)
alla = allb = True
for i in range(50):
    t0 = np.float32(rng.uniform(-100, 100))
    d = np.float32(10.0 ** rng.uniform(-6, 2))
    ma, mb = run(float(t0), float(d))
    alla &= ma
    allb &= mb
print(f"model A (two roundings) always matches: {alla}", flush=True)
print(f"model B (fma)           always matches: {allb}", flush=True)
