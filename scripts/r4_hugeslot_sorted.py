"""Chip probe: can sortedness flags rescue the >2M-slot band?

The above-cap regime (perf_model.md headroom item 4) is scatter-serial
bound: XLA lowers scatter-add as a ~10-cycle/element serial loop, flat
~0.2-0.5 GB/s.  Multi-pass fused counting is a measured negative
(scripts/r4_multipass.py).  One formulation is still unprobed: sort the
codes with XLA's lax.sort (NOT the in-kernel Mosaic sort, which is
unimplemented — this is a whole-array XLA op), then accumulate with
``indices_are_sorted=True``:

  a) scatter        — baseline: zeros.at[codes].add(1)
  b) sorted scatter — jnp.sort(codes) then .at[gs].add(1,
                      indices_are_sorted=True)
  c) segment_sum    — jax.ops.segment_sum(ones, gs,
                      indices_are_sorted=True)
  d) sort only      — isolates the lax.sort cost (the floor for b/c)
  e) weighted b)    — sort_key_val(codes, w) then sorted scatter

If TPU XLA exploits the sortedness hint, b/c beat a by the serial-loop
factor and the band rejoins measurable rates; if it ignores the hint,
b = a + sort cost and this is another recorded negative.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_hugeslot_sorted.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)


def timeit(fn, n=3):
    np.asarray(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    np.asarray(r)
    return (time.perf_counter() - t0) / n


def probe(log_n, log_slots):
    n = 1 << log_n
    n_slots = 1 << log_slots
    nbytes = n * 4

    def codes():
        # uniform int32 codes in [0, n_slots) — stands in for digitize output
        bits = jax.random.bits(jax.random.PRNGKey(0), (n,), jnp.uint32)
        return (bits % jnp.uint32(n_slots)).astype(jnp.int32)

    @jax.jit
    def rng_only():
        return codes().sum()

    rng_dt = timeit(rng_only)

    @jax.jit
    def scatter():
        g = codes()
        return (
            jnp.zeros((n_slots,), jnp.int32)
            .at[g]
            .add(1, mode="promise_in_bounds")
            .sum()
        )

    @jax.jit
    def sort_only():
        return jnp.sort(codes())[-1]

    @jax.jit
    def sorted_scatter():
        gs = jnp.sort(codes())
        return (
            jnp.zeros((n_slots,), jnp.int32)
            .at[gs]
            .add(
                1,
                mode="promise_in_bounds",
                indices_are_sorted=True,
                unique_indices=False,
            )
            .sum()
        )

    @jax.jit
    def segsum():
        gs = jnp.sort(codes())
        return jax.ops.segment_sum(
            jnp.ones((n,), jnp.int32),
            gs,
            num_segments=n_slots,
            indices_are_sorted=True,
        ).sum()

    @jax.jit
    def sorted_scatter_w():
        g = codes()
        w = jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32)
        gs, ws = jax.lax.sort_key_val(g, w)
        return (
            jnp.zeros((n_slots,), jnp.float32)
            .at[gs]
            .add(
                ws,
                mode="promise_in_bounds",
                indices_are_sorted=True,
                unique_indices=False,
            )
            .sum()
        )

    print(
        f"n=2^{log_n} slots=2^{log_slots}  (rng {rng_dt*1e3:.1f} ms)",
        flush=True,
    )
    for name, fn in (
        ("scatter", scatter),
        ("sort_only", sort_only),
        ("sorted_scatter", sorted_scatter),
        ("segment_sum", segsum),
        ("sorted_scatter_w", sorted_scatter_w),
    ):
        try:
            dt = timeit(fn)
        except Exception as e:  # noqa: BLE001 — probe records failures
            print(f"  {name}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        kern = max(dt - rng_dt, 1e-9)
        print(
            f"  {name}: {nbytes/kern/1e9:.3f} GB/s kern ({dt*1e3:.0f} ms)",
            flush=True,
        )


for log_n, log_slots in (
    (23, 22),  # the r4_multipass config: 8M elems, 4M slots
    (23, 24),  # 16M slots
    (26, 22),  # more data per slot
    (26, 24),
):
    probe(log_n, log_slots)
