"""Deeper probes for the sort-kernel plan: dynamic-gather table heights,
f32 gather, full bitonic sort of a (8, L) tile via rolls+selects
(correctness + throughput), and a roll-throughput microbench.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/sort_probe2.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, kernel, out_shape, *args, check=None):
    try:
        fn = pl.pallas_call(
            kernel, out_shape=out_shape,
            interpret=jax.default_backend() != "tpu",
        )
        r = np.asarray(jax.jit(fn)(*args))
        if check is not None:
            ok = check(r)
            print(f"{name}: OK values={'OK' if ok else 'WRONG'}", flush=True)
        else:
            print(f"{name}: OK", flush=True)
        return r
    except Exception as e:  # noqa
        print(f"{name}: FAIL ({type(e).__name__}: "
              f"{str(e).splitlines()[0][:140]})", flush=True)
        return None


def main():
    print("backend:", jax.default_backend(), flush=True)

    # --- gather table heights ---------------------------------------------
    for rows in (8, 16, 32):
        x = jnp.arange(rows * 128, dtype=jnp.int32).reshape(rows, 128)
        idx = jnp.asarray(
            np.random.RandomState(0).randint(0, rows, (rows, 128)), jnp.int32
        )

        def k(x_ref, i_ref, o_ref):
            o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=0)

        run(
            f"sublane gather rows={rows}", k,
            jax.ShapeDtypeStruct((rows, 128), jnp.int32), x, idx,
            check=lambda r, x=x, idx=idx: np.array_equal(
                r, np.take_along_axis(np.asarray(x), np.asarray(idx), 0)
            ),
        )

    # f32 values
    xf = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    idxf = jnp.asarray(
        np.random.RandomState(1).randint(0, 8, (8, 128)), jnp.int32
    )

    def kf(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=0)

    run("sublane gather f32", kf,
        jax.ShapeDtypeStruct((8, 128), jnp.float32), xf, idxf,
        check=lambda r: np.array_equal(
            r, np.take_along_axis(np.asarray(xf), np.asarray(idxf), 0)))

    # --- full bitonic sort along lanes of a (8, L) tile ---------------------
    L = 2048

    def bitonic_rows(v):
        """Sort each row of (rows, L) ascending via roll+select stages
        (pltpu.roll takes non-negative shifts; use L - s for the other
        direction)."""
        lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
        k = 2
        while k <= L:
            jj = k // 2
            while jj >= 1:
                partner_up = pltpu.roll(v, L - jj, 1)   # lane l+jj -> l
                partner_dn = pltpu.roll(v, jj, 1)       # lane l-jj -> l
                upper = (lane & jj) != 0
                p = jnp.where(upper, partner_dn, partner_up)
                descending = (lane & k) != 0
                keep_min = upper == descending
                lo = jnp.minimum(v, p)
                hi = jnp.maximum(v, p)
                v = jnp.where(keep_min, lo, hi)
                jj //= 2
            k *= 2
        return v

    def k_sort(x_ref, o_ref):
        o_ref[...] = bitonic_rows(x_ref[...])

    rng = np.random.RandomState(2)
    data = jnp.asarray(rng.randint(0, 10000, (8, L)), jnp.int32)
    r = run(f"bitonic row sort (8,{L})", k_sort,
            jax.ShapeDtypeStruct((8, L), jnp.int32), data,
            check=lambda r: np.array_equal(r, np.sort(np.asarray(data), 1)))

    # --- throughput: sort vs equality-one-hot matmul on same tile ----------
    if jax.default_backend() == "tpu" and r is not None:
        reps_grid = 64

        def k_sort_many(x_ref, o_ref):
            # grid over many tiles to amortize; one sort per grid step
            o_ref[...] = bitonic_rows(x_ref[...])

        big = jnp.asarray(rng.randint(0, 10000, (8 * reps_grid, L)), jnp.int32)
        fn = pl.pallas_call(
            k_sort_many,
            grid=(reps_grid,),
            in_specs=[pl.BlockSpec((8, L), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, L), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8 * reps_grid, L), jnp.int32),
        )
        jf = jax.jit(fn)
        np.asarray(jf(big))
        best = 1e9
        for _ in range(5):
            t0 = time.time()
            np.asarray(jf(big))
            best = min(best, time.time() - t0)
        n = 8 * reps_grid * L
        print(f"bitonic sort throughput: {n/best/1e9:.2f} Gelem/s "
              f"({best*1e6:.0f} us for {n} elems)", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
