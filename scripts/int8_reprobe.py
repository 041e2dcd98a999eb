"""Re-probe Mosaic int8 matmul support (VERDICT r1 #4: 'int8 one-hots would
2x the MXU-bound rows if Mosaic gains int8 matmul support' — r1 probe
FAILED; re-check on the current toolchain)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(a_ref, b_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        a_ref[...], b_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def main():
    print("backend:", jax.default_backend(), flush=True)
    a = jnp.ones((128, 256), jnp.int8)
    b = jnp.ones((128, 256), jnp.int8)
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
        )(a, b)
        print("int8 matmul OK:", np.asarray(out)[0, 0], flush=True)
    except Exception as e:
        print("int8 matmul FAILS:", type(e).__name__, str(e)[:300], flush=True)

    # int4 / s4 while at it
    try:
        a4 = jnp.ones((128, 256), jnp.int4)
        b4 = jnp.ones((128, 256), jnp.int4)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
        )(a4, b4)
        print("int4 matmul OK:", np.asarray(out)[0, 0], flush=True)
    except Exception as e:
        print("int4 matmul FAILS:", type(e).__name__, str(e)[:200], flush=True)


if __name__ == "__main__":
    main()
