"""Probe: do Pallas TPU BlockSpecs tolerate array dims NOT divisible by the
block shape (boundary blocks padded, reads masked by our in-kernel bounds
masks)? If yes, the wrappers can drop their _pad2d full-array copies.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/ragged_probe.py
"""
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(a_ref, o_ref, *, c_real, tc):
    i = pl.program_id(0)
    j = pl.program_id(1)
    a = a_ref[...]  # (8, tc)
    tm = a.shape[0]
    e = tm * tc
    a_row = a.reshape(1, e)
    ids = jax.lax.broadcasted_iota(jnp.int32, (1, e), 1)
    col = j * tc + (ids - (ids // tc) * tc)
    ok = col < c_real
    masked = jnp.where(ok, a_row, jnp.float32(jnp.nan))
    cnt = jnp.sum((masked >= jnp.float32(0.0)).astype(jnp.int32))

    @pl.when((i == 0) & (j == 0))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    o_ref[...] += cnt.astype(jnp.float32)


def run(m, c, tc):
    rng = np.random.RandomState(0)
    a = rng.randn(m, c).astype("f4")
    grid = (m // 8, -(-c // tc))
    interp = (
        False if jax.default_backend() == "tpu" else pltpu.InterpretParams()
    )
    out = pl.pallas_call(
        functools.partial(kernel, c_real=c, tc=tc),
        grid=grid,
        in_specs=[pl.BlockSpec((8, tc), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 8), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 8), jnp.float32),
        interpret=interp,
    )(jnp.asarray(a))
    got = float(np.asarray(out)[0, 0])
    exp = float((a >= 0).sum())
    print(f"m={m} c={c} tc={tc}: got {got} exp {exp} "
          f"{'OK' if got == exp else 'MISMATCH'}", flush=True)
    return got == exp


print("backend:", jax.default_backend(), flush=True)
ok = True
ok &= run(8, 300, 128)      # ragged c: 3 blocks, last 84 cols real
ok &= run(16, 1000, 256)    # ragged c
ok &= run(8, 384, 128)      # divisible control
print("RAGGED", "PASS" if ok else "FAIL", flush=True)
