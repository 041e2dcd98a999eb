"""On-chip validation of the faithful nonfinite-weight kernels and the
per-row factored kernel (Mosaic compatibility + correctness + quick perf).

Run with the ambient axon env:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/nonfinite_probe.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    from xhistogram_tpu.core import histogram

    rng = np.random.RandomState(0)

    # --- 1. one_input weighted faithful (kept rows) -----------------------
    data = rng.uniform(-3.5, 3.5, (8, 4096)).astype("f4")
    w = rng.rand(8, 4096).astype("f4")
    data[2, 5], w[2, 5] = 0.1, np.nan
    data[4, 7], w[4, 7] = -2.0, np.inf
    edges = np.linspace(-4, 4, 10)
    t0 = time.time()
    h, _ = histogram(data, bins=edges, weights=w, axis=1, method="pallas")
    h = np.asarray(h)
    print(f"one_input weighted faithful: {time.time()-t0:.1f}s", flush=True)
    assert np.isnan(h[2]).sum() == 1, h[2]
    assert np.isposinf(h[4]).sum() == 1
    assert np.isfinite(h[[0, 1, 3, 5, 6, 7]]).all()
    wc = w.copy(); wc[2, 5] = 0; wc[4, 7] = 0
    exp = np.stack([np.histogram(d, bins=edges, weights=ww)[0]
                    for d, ww in zip(data, wc)])
    fin = np.isfinite(h)
    np.testing.assert_allclose(h[fin], exp[fin], rtol=1e-4, atol=1e-3)
    print("  correctness OK", flush=True)

    # --- 2. joint2 weighted faithful (full reduction) ---------------------
    a = rng.uniform(-3.5, 3.5, (8, 4096)).astype("f4")
    b = rng.uniform(-3.5, 3.5, (8, 4096)).astype("f4")
    w2 = rng.rand(8, 4096).astype("f4")
    a[0, 0], b[0, 0], w2[0, 0] = 0.1, 0.2, np.nan
    ea, eb = np.linspace(-4, 4, 101), np.linspace(-4, 4, 81)
    t0 = time.time()
    h2, _ = histogram(a, b, bins=[ea, eb], weights=w2, method="pallas")
    h2 = np.asarray(h2)
    print(f"joint2 weighted faithful: {time.time()-t0:.1f}s", flush=True)
    assert np.isnan(h2).sum() == 1
    w2c = w2.copy(); w2c[0, 0] = 0
    exp2, _, _ = np.histogram2d(a.ravel(), b.ravel(), bins=[ea, eb],
                                weights=w2c.ravel().astype("f8"))
    fin = np.isfinite(h2)
    np.testing.assert_allclose(h2[fin], exp2[fin], rtol=1e-4, atol=1e-3)
    print("  correctness OK", flush=True)

    # --- 3. factored weighted faithful (full reduction, big grid) ---------
    ea3, eb3 = np.linspace(-4, 4, 281), np.linspace(-4, 4, 341)
    t0 = time.time()
    h3, _ = histogram(a, b, bins=[ea3, eb3], weights=w2, method="pallas")
    h3 = np.asarray(h3)
    print(f"factored weighted faithful: {time.time()-t0:.1f}s", flush=True)
    assert np.isnan(h3).sum() == 1
    exp3, _, _ = np.histogram2d(a.ravel(), b.ravel(), bins=[ea3, eb3],
                                weights=w2c.ravel().astype("f8"))
    fin = np.isfinite(h3)
    np.testing.assert_allclose(h3[fin], exp3[fin], rtol=1e-4, atol=1e-3)
    print("  correctness OK", flush=True)

    # --- 4. per-row factored, unweighted bit-exact + weighted -------------
    ar = rng.uniform(-3.5, 3.5, (5, 2048)).astype("f4")
    br = rng.uniform(-3.5, 3.5, (5, 2048)).astype("f4")
    wr = rng.rand(5, 2048).astype("f4")
    ea4, eb4 = np.linspace(-4, 4, 151), np.linspace(-4, 4, 91)
    t0 = time.time()
    h4, _ = histogram(ar, br, bins=[ea4, eb4], axis=1, method="pallas")
    h4 = np.asarray(h4)
    print(f"per-row factored unweighted: {time.time()-t0:.1f}s", flush=True)
    for r in range(5):
        exp4, _, _ = np.histogram2d(ar[r], br[r], bins=[ea4, eb4])
        np.testing.assert_array_equal(h4[r], exp4)
    print("  bit-exact OK", flush=True)
    t0 = time.time()
    h5, _ = histogram(ar, br, bins=[ea4, eb4], weights=wr, axis=1,
                      method="pallas")
    h5 = np.asarray(h5)
    print(f"per-row factored weighted: {time.time()-t0:.1f}s", flush=True)
    for r in range(5):
        exp5, _, _ = np.histogram2d(ar[r], br[r], bins=[ea4, eb4],
                                    weights=wr[r].astype("f8"))
        np.testing.assert_allclose(h5[r], exp5, rtol=1e-4, atol=1e-3)
    print("  correctness OK", flush=True)

    # --- 5. quick perf: per-row factored vs direct crossover --------------
    # (generate inputs on device inside jit — big external operands OOM the
    #  16 GB chip at pallas custom-call staging; see CLAUDE.md)
    from functools import partial

    @partial(jax.jit, static_argnames=("m", "c", "nb1", "nb2", "method"))
    def bench_once(key, m, c, nb1, nb2, method):
        ka, kb = jax.random.split(key)
        aa = jax.random.uniform(ka, (m, c), jnp.float32, -4, 4)
        bb = jax.random.uniform(kb, (m, c), jnp.float32, -4, 4)
        e1 = np.linspace(-4, 4, nb1 + 1)  # host edges (static per trace)
        e2 = np.linspace(-4, 4, nb2 + 1)
        h, _ = histogram(aa, bb, bins=[e1, e2], axis=1, method=method)
        return h.sum(axis=(1, 2))  # tiny transfer

    key = jax.random.PRNGKey(0)
    for m, c, nb1, nb2 in [
        (16, 1 << 22, 40, 50),     # 2000 slots: direct vs per-row factored
        (16, 1 << 22, 80, 90),     # 7200 slots
        (16, 1 << 22, 150, 90),    # 13500 slots (only factored now)
        (256, 1 << 18, 80, 90),
    ]:
        for method in ("pallas",):
            r = bench_once(key, m, c, nb1, nb2, method)
            np.asarray(r)  # warm compile
            t0 = time.time()
            r = bench_once(key, m, c, nb1, nb2, method)
            np.asarray(r)
            dt = time.time() - t0
            gbs = m * c * 2 * 4 / dt / 1e9
            print(f"m={m} c={c} grid={nb1}x{nb2}: {dt*1e3:.0f} ms "
                  f"{gbs:.2f} GB/s", flush=True)

    print("ALL PROBES PASSED", flush=True)


if __name__ == "__main__":
    main()
