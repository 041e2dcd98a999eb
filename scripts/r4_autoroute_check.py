"""End-to-end check of the r4 per-mode weighted caps through the PUBLIC
API on the real chip: an eager auto call with counts-like int32 weights on
a 589k-slot joint grid (above the old 2^18 weighted cap, inside int1's new
2^20 cap) must route to the fused kernel and match the scatter strategy
bit-for-bit.

PYTHONPATH=/root/repo:/root/.axon_site python scripts/r4_autoroute_check.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from xhistogram_tpu import bins as bins_mod
from xhistogram_tpu.core import histogram
from xhistogram_tpu.ops import pallas_hist as ph


def main():
    nb = (768, 767)  # 589k slots: > 2^18 (old weighted cap), < 2^20
    edges = [
        np.linspace(-4, 4, n + 1).astype(np.float64) for n in nb
    ]
    # confirm the routing table itself (uniform certs present on linspace
    # grids; presence alone doesn't change the full-reduce factored choice)
    uni = tuple(
        bins_mod.uniform_form(
            np.asarray(bins_mod.compare_form(e, np.float32).edges), e
        )
        for e in edges
    )
    kern = ph.planned_kernel(
        2, nb, 1, weighted=True, weights_dtype=jnp.int32, wmode="int1",
        uniform=uni,
    )
    print("planned kernel:", kern, flush=True)
    assert kern is not None, "auto would fall to scatter — cap regression"

    rng = np.random.RandomState(0)
    n = 4 << 20
    a = rng.randn(n).astype("f4") * 1.5
    b = rng.randn(n).astype("f4") * 1.5
    w = rng.randint(0, 100, n).astype("i4")
    t0 = time.perf_counter()
    h_auto, _ = histogram(jnp.asarray(a), jnp.asarray(b), bins=edges,
                          weights=jnp.asarray(w), method="auto")
    h_auto = np.asarray(h_auto)
    t_auto = time.perf_counter() - t0
    t0 = time.perf_counter()
    h_scat, _ = histogram(jnp.asarray(a), jnp.asarray(b), bins=edges,
                          weights=jnp.asarray(w), method="scatter")
    h_scat = np.asarray(h_scat)
    t_scat = time.perf_counter() - t0
    equal = bool(np.array_equal(h_auto, h_scat))
    ref = np.histogram2d(a, b, bins=edges, weights=w.astype("f8"))[0]
    exact = bool(np.array_equal(h_auto.astype("f8"), ref))
    print(
        f"auto((incl compile) {t_auto:.1f}s) == scatter({t_scat:.1f}s): "
        f"{equal}; == numpy oracle: {exact}",
        flush=True,
    )
    assert equal and exact
    print("AUTOROUTE OK", flush=True)


if __name__ == "__main__":
    main()
