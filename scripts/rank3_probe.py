"""Prototype: rank-3 VPU histogram microkernel for small bin counts.

counts[nb, tm] = Σ_tc (aT >= lo) & (aT < hi) — no matmul, no 128-row lane
padding, no bf16 casts. Tests Mosaic support + speed vs the matmul kernel.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xhistogram_tpu.bins import edges_for_compare
from xhistogram_tpu.core import histogram


def _rank3_kernel(a_ref, lo_ref, hi_ref, o_ref, *, c_real):
    i = pl.program_id(0)
    j = pl.program_id(1)
    tm, tc = a_ref.shape
    nb_pad = lo_ref.shape[0]

    a_t = a_ref[...].T  # (tc, tm)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tc, tm), 0)
    ok = (j * tc + col_ids) < c_real
    lo = lo_ref[...].reshape(nb_pad, 1, 1)
    hi = hi_ref[...].reshape(nb_pad, 1, 1)
    cmp = (a_t[None] >= lo) & (a_t[None] < hi) & ok[None]
    counts = jnp.sum(cmp.astype(jnp.int32), axis=1)  # (nb_pad, tm)

    @pl.when((i == 0) & (j == 0))
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    o_ref[...] += counts


def rank3_hist(a2d, edges_t, nb):
    m, c = a2d.shape
    nb_pad = ((nb + 7) // 8) * 8
    lo = jnp.pad(edges_t[:-1], (0, nb_pad - nb),
                 constant_values=jnp.inf).reshape(nb_pad, 1)
    hi = jnp.pad(edges_t[1:], (0, nb_pad - nb),
                 constant_values=jnp.inf).reshape(nb_pad, 1)
    tm, tc = 8, 512
    grid = (m // tm, -(-c // tc))
    c_pad = grid[1] * tc
    if c_pad != c:
        a2d = jnp.pad(a2d, ((0, 0), (0, c_pad - c)))
    fixed = lambda i, j: (0, 0)
    out = pl.pallas_call(
        partial(_rank3_kernel, c_real=c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tc), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb_pad, 1), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((nb_pad, 1), fixed, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb_pad, tm), fixed, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb_pad, tm), jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )(a2d, lo, hi)
    return out[:nb].sum(axis=1)


if __name__ == "__main__":
    N = 1 << 28
    x = jax.random.normal(jax.random.PRNGKey(0), (1024, N // 1024), jnp.float32)
    for nbins in (10, 50, 64):
        edges = np.linspace(-4, 4, nbins + 1)
        et = jnp.asarray(edges_for_compare(edges, np.float32))
        f = jax.jit(lambda a, e=et, nb=nbins: rank3_hist(a, e, nb))
        try:
            got = np.asarray(f(x))
            exp = np.asarray(histogram(x, bins=edges, method="pallas")[0])
            ok = np.array_equal(got, exp)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter(); np.asarray(f(x)); ts.append(time.perf_counter() - t0)
            dt = min(ts)
            print(f"rank3 nb={nbins:3d} correct={ok} {dt*1e3:7.1f} ms "
                  f"{N*4/dt/1e9:6.1f} GB/s", flush=True)
        except Exception as e:
            print(f"rank3 nb={nbins}: FAIL {type(e).__name__} {str(e)[:100]}",
                  flush=True)
