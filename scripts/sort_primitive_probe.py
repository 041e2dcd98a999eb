"""Probe Mosaic support for the primitives a sort-based histogram kernel
would need: lane/sublane rolls (fixed-distance compare-exchange), per-lane
dynamic gather (binary-search digitize / boundary extraction), and
cross-lane iota-keyed selects.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/sort_primitive_probe.py
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, out_shape, *args):
    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            interpret=jax.default_backend() != "tpu",
        )
        r = jax.jit(fn)(*args)
        np.asarray(r)
        print(f"{name}: OK", flush=True)
        return np.asarray(r)
    except Exception as e:  # noqa
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL ({type(e).__name__}: {msg})", flush=True)
        return None


def main():
    print("backend:", jax.default_backend(), flush=True)
    x = jnp.arange(8 * 256, dtype=jnp.int32).reshape(8, 256)
    xf = jnp.arange(8 * 256, dtype=jnp.float32).reshape(8, 256)

    # 1. lane roll via pltpu.roll
    def k_roll_lane(x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], 5, 1)

    r = run("pltpu.roll along lanes", k_roll_lane,
            jax.ShapeDtypeStruct((8, 256), jnp.int32), x)
    if r is not None:
        assert np.array_equal(r, np.roll(np.asarray(x), 5, 1)), "roll wrong"
        print("  values correct", flush=True)

    # 2. sublane roll
    def k_roll_sub(x_ref, o_ref):
        o_ref[...] = pltpu.roll(x_ref[...], 3, 0)

    r = run("pltpu.roll along sublanes", k_roll_sub,
            jax.ShapeDtypeStruct((8, 256), jnp.int32), x)
    if r is not None:
        assert np.array_equal(r, np.roll(np.asarray(x), 3, 0))
        print("  values correct", flush=True)

    # 3. compare-exchange stage: roll + iota-parity select (bitonic step)
    def k_cmpex(x_ref, o_ref):
        v = x_ref[...]
        s = 8
        partner = pltpu.roll(v, -s, 1)
        partner2 = pltpu.roll(v, s, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        upper = (lane & s) != 0
        p = jnp.where(upper, partner2, partner)
        lo = jnp.minimum(v, p)
        hi = jnp.maximum(v, p)
        o_ref[...] = jnp.where(upper, hi, lo)

    run("bitonic compare-exchange stage (roll+select)", k_cmpex,
        jax.ShapeDtypeStruct((8, 256), jnp.int32), x)

    # 4. per-lane dynamic gather: jnp.take_along_axis within a row
    def k_gather(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

    idx = jnp.flip(jnp.arange(256, dtype=jnp.int32))[None, :] * jnp.ones(
        (8, 1), jnp.int32
    )
    r = run("per-lane dynamic gather (take_along_axis axis=1)", k_gather,
            jax.ShapeDtypeStruct((8, 256), jnp.int32), x, idx)
    if r is not None:
        assert np.array_equal(
            r, np.take_along_axis(np.asarray(x), np.asarray(idx), 1)
        )
        print("  values correct", flush=True)

    # 5. gather along sublanes
    def k_gather0(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=0)

    idx0 = (7 - jnp.arange(8, dtype=jnp.int32))[:, None] * jnp.ones(
        (1, 256), jnp.int32
    )
    run("per-sublane dynamic gather (axis=0)", k_gather0,
        jax.ShapeDtypeStruct((8, 256), jnp.int32), x, idx0)

    # 6. in-kernel jnp.sort along lanes
    def k_sort(x_ref, o_ref):
        o_ref[...] = jnp.sort(x_ref[...], axis=1)

    run("jnp.sort along lanes in-kernel", k_sort,
        jax.ShapeDtypeStruct((8, 256), jnp.float32), xf)

    # 7. jax.lax.sort_key_val in-kernel
    def k_sortkv(x_ref, w_ref, o_ref, o2_ref):
        k2, v2 = jax.lax.sort_key_val(x_ref[...], w_ref[...], dimension=1)
        o_ref[...] = k2
        o2_ref[...] = v2

    try:
        fn = pl.pallas_call(
            k_sortkv,
            out_shape=[jax.ShapeDtypeStruct((8, 256), jnp.float32)] * 2,
            interpret=jax.default_backend() != "tpu",
        )
        np.asarray(jax.jit(fn)(xf, xf)[0])
        print("lax.sort_key_val in-kernel: OK", flush=True)
    except Exception as e:  # noqa
        print(f"lax.sort_key_val in-kernel: FAIL ({str(e).splitlines()[0][:120]})",
              flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
