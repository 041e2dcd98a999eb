"""On-chip perf: per-row factored vs direct (kept rows), joint2 vs factored
(reduce-all headline shape). Forces each kernel via the private runners.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/perrow_perf.py
"""

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def bench(fn, *args, reps=3):
    r = fn(*args)
    np.asarray(r)  # compile + settle (block_until_ready unreliable on axon)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        np.asarray(fn(*args))
        best = min(best, time.time() - t0)
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    from xhistogram_tpu import bins as bins_mod
    from xhistogram_tpu.ops import pallas_hist as ph

    def edges_dev(nb):
        e = np.linspace(-4, 4, nb + 1)
        return jnp.asarray(bins_mod.edges_for_compare(e, np.dtype("f4")))

    def make_runner(runner, m, c, nb1, nb2, weighted):
        e1, e2 = edges_dev(nb1), edges_dev(nb2)

        @jax.jit
        def go(key):
            ka, kb, kw = jax.random.split(key, 3)
            a = jax.random.uniform(ka, (m, c), jnp.float32, -4, 4)
            b = jax.random.uniform(kb, (m, c), jnp.float32, -4, 4)
            w = jax.random.uniform(kw, (m, c), jnp.float32) if weighted else None
            if runner == "direct":
                out = ph._run_direct([a, b], [e1, e2], w, (nb1, nb2))
            elif runner == "factored_rows":
                out = ph._run_factored([a, b], [e1, e2], w, (nb1, nb2),
                                       per_row=True)
            elif runner == "joint2":
                out = ph._run_joint2(a, b, w, e1, e2, (nb1, nb2))
            elif runner == "factored":
                out = ph._run_factored([a, b], [e1, e2], w, (nb1, nb2))
            return out.sum(axis=-1)

        return go

    key = jax.random.PRNGKey(0)

    print("== kept rows: direct vs per-row factored ==", flush=True)
    m, c = 16, 1 << 21
    for nb1, nb2 in [(16, 16), (32, 32), (40, 50), (80, 90), (150, 90),
                     (280, 340)]:
        row = f"grid {nb1}x{nb2} ({nb1*nb2} slots):"
        for runner in ("direct", "factored_rows"):
            if runner == "direct" and nb1 * nb2 > 60000:
                row += "  direct=skip"
                continue
            try:
                dt = bench(make_runner(runner, m, c, nb1, nb2, False), key)
                gbs = m * c * 2 * 4 / dt / 1e9
                row += f"  {runner}={dt*1e3:.0f}ms {gbs:.1f}GB/s"
            except Exception as e:  # noqa
                row += f"  {runner}=FAIL({type(e).__name__})"
        print(row, flush=True)

    print("== reduce-all headline 280x340: joint2 vs factored ==", flush=True)
    m, c = 16, 1 << 23  # 1.3e8 element pairs
    for runner in ("joint2", "factored"):
        dt = bench(make_runner(runner, m, c, 280, 340, False), key)
        gbs = m * c * 2 * 4 / dt / 1e9
        print(f"  {runner}: {dt*1e3:.0f} ms {gbs:.2f} GB/s", flush=True)

    print("== weighted faithful overhead (280x340, joint2/factored) ==",
          flush=True)
    for runner in ("joint2", "factored"):
        dt = bench(make_runner(runner, m, c, 280, 340, True), key)
        gbs = m * c * 2 * 4 / dt / 1e9
        print(f"  {runner} weighted: {dt*1e3:.0f} ms {gbs:.2f} GB/s",
              flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
