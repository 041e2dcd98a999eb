"""On-chip perf/correctness for (a) sublane-tight bin rows in
one_input/joint2, (b) the conditional nonfinite-channel matmul (clean tiles
skip it; poisoned tiles pay it once).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tight_perf.py
"""

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def bench(fn, *args, reps=3, **kw):
    r = fn(*args, **kw)
    np.asarray(r)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        np.asarray(fn(*args, **kw))
        best = min(best, time.time() - t0)
    return best


def main():
    print("backend:", jax.default_backend(), flush=True)
    from xhistogram_tpu.core import histogram

    key = jax.random.PRNGKey(0)

    # --- correctness spot-check on chip: weighted faithful all kernels ----
    rng = np.random.RandomState(0)
    data = rng.uniform(-3.5, 3.5, (8, 2048)).astype("f4")
    w = rng.rand(8, 2048).astype("f4")
    data[2, 5], w[2, 5] = 0.1, np.nan
    data[4, 7], w[4, 7] = -2.0, np.inf
    edges = np.linspace(-4, 4, 10)
    h, _ = histogram(data, bins=edges, weights=w, axis=1, method="pallas")
    h = np.asarray(h)
    assert np.isnan(h[2]).sum() == 1 and np.isposinf(h[4]).sum() == 1
    assert np.isfinite(h[[0, 1, 3, 5, 6, 7]]).all()
    print("one_input faithful conditional: OK", flush=True)

    a = rng.uniform(-3.5, 3.5, (8, 2048)).astype("f4")
    b = rng.uniform(-3.5, 3.5, (8, 2048)).astype("f4")
    w2 = rng.rand(8, 2048).astype("f4")
    a[0, 0], b[0, 0], w2[0, 0] = 0.1, 0.2, np.nan
    for nb1, nb2, name in [(100, 80, "joint2"), (280, 340, "factored")]:
        e1, e2 = np.linspace(-4, 4, nb1 + 1), np.linspace(-4, 4, nb2 + 1)
        h2, _ = histogram(a, b, bins=[e1, e2], weights=w2, method="pallas")
        h2 = np.asarray(h2)
        assert np.isnan(h2).sum() == 1, (name, np.isnan(h2).sum())
        print(f"{name} faithful conditional: OK", flush=True)
    # kept rows -> per-row factored weighted
    h3, _ = histogram(a, b, bins=[np.linspace(-4, 4, 121),
                                  np.linspace(-4, 4, 81)],
                      weights=w2, axis=1, method="pallas")
    h3 = np.asarray(h3)
    assert np.isnan(h3[0]).sum() == 1 and np.isfinite(h3[1:]).all()
    print("per-row factored faithful conditional: OK", flush=True)

    # --- perf sweep ------------------------------------------------------
    @partial(jax.jit, static_argnames=("m", "c", "nbins", "weighted",
                                       "poison", "joint"))
    def go(key, m, c, nbins, weighted=False, poison=False, joint=None):
        ka, kb, kw = jax.random.split(key, 3)
        aa = jax.random.uniform(ka, (m, c), jnp.float32, -4, 4)
        args = [aa]
        bins = np.linspace(-4, 4, nbins + 1)
        if joint:
            bb = jax.random.uniform(kb, (m, c), jnp.float32, -4, 4)
            args.append(bb)
            bins = [np.linspace(-4, 4, joint[0] + 1),
                    np.linspace(-4, 4, joint[1] + 1)]
        ww = None
        if weighted:
            ww = jax.random.uniform(kw, (m, c), jnp.float32)
            if poison:
                ww = ww.at[0, 0].set(jnp.nan)
        h, _ = histogram(*args, bins=bins, weights=ww, method="pallas")
        return jnp.nansum(h, axis=(-1,) if not joint else (-2, -1))

    m, c = 16, 1 << 23
    nbytes = m * c * 4

    for nbins in (64, 512):
        dt = bench(go, key, m, c, nbins)
        print(f"1-D {nbins} bins reduce-all: {dt*1e3:.0f} ms "
              f"{nbytes/dt/1e9:.1f} GB/s", flush=True)

    for joint in ((16, 16), (100, 100), (280, 340)):
        dt = bench(go, key, m, c, 0, joint=joint)
        print(f"joint {joint[0]}x{joint[1]}: {dt*1e3:.0f} ms "
              f"{2*nbytes/dt/1e9:.1f} GB/s", flush=True)

    for joint, label in (((280, 340), "T-S"),):
        for poison in (False, True):
            dt = bench(go, key, m, c, 0, weighted=True, poison=poison,
                       joint=joint)
            tag = "poisoned" if poison else "clean"
            print(f"joint {label} weighted faithful ({tag}): {dt*1e3:.0f} ms "
                  f"{2*nbytes/dt/1e9:.2f} GB/s", flush=True)

    dt = bench(go, key, m, c, 64, weighted=True)
    print(f"1-D 64 bins weighted faithful (clean): {dt*1e3:.0f} ms "
          f"{nbytes/dt/1e9:.1f} GB/s", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
