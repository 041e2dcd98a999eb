"""JAX-transform composability: vmap, grad, repeated jit.

These are TPU-native capabilities with no reference analog (numpy code can't
be transformed) — the payoff of rebuilding the pipeline as pure, statically
shaped JAX (SURVEY.md §7 step 3 "vmap-compatible").
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xhistogram_tpu.core import histogram

bins_arr = np.linspace(-4, 4, 10)


def test_vmap_over_leading_axis():
    """vmap(histogram) over a batch axis == axis-preserving histogram."""
    rng = np.random.RandomState(0)
    data = rng.randn(6, 50).astype("f4")

    f = jax.vmap(lambda row: histogram(row, bins=bins_arr)[0])
    h_vmap = np.asarray(f(jnp.asarray(data)))

    h_axis, _ = histogram(data, bins=bins_arr, axis=(1,))
    np.testing.assert_array_equal(h_vmap, np.asarray(h_axis))

    expected = np.stack([np.histogram(r, bins=bins_arr)[0] for r in data])
    np.testing.assert_array_equal(h_vmap, expected)


def test_vmap_joint():
    rng = np.random.RandomState(1)
    a = rng.randn(4, 64).astype("f4")
    b = rng.randn(4, 64).astype("f4")
    bb = np.linspace(-4, 4, 8)

    f = jax.vmap(lambda x, y: histogram(x, y, bins=[bins_arr, bb])[0])
    h = np.asarray(f(jnp.asarray(a), jnp.asarray(b)))
    for i in range(4):
        expected, _, _ = np.histogram2d(a[i], b[i], bins=[bins_arr, bb])
        np.testing.assert_array_equal(h[i], expected)


def test_grad_wrt_weights():
    """The weighted histogram is linear in the weights: its vjp against a
    cotangent g is g gathered at each element's bin — differentiability the
    reference fundamentally can't offer."""
    rng = np.random.RandomState(2)
    data = jnp.asarray(rng.randn(40).astype("f4"))
    w0 = jnp.asarray(rng.rand(40).astype("f4"))

    def loss(w):
        h, _ = histogram(data, bins=bins_arr, weights=w, method="scatter")
        return jnp.sum(h * jnp.arange(h.shape[0], dtype=h.dtype))

    g = jax.grad(loss)(w0)

    # oracle: d loss / d w_i = coefficient of w_i = bin_index(data_i), or 0
    # when the element is out of range
    idx = np.searchsorted(bins_arr, np.asarray(data), side="right")
    idx[np.asarray(data) == bins_arr[-1]] -= 1
    expected = np.where(
        (idx >= 1) & (idx <= len(bins_arr) - 1), (idx - 1).astype("f4"), 0.0
    )
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-6)


def test_jit_cache_stability():
    """Repeated calls with the same static config must not retrace (static
    argnums are hashable); different axis sets compile separately."""
    data = np.random.randn(4, 32).astype("f4")
    f = lambda: histogram(data, bins=bins_arr, axis=(1,))[0]
    h1 = np.asarray(f())
    h2 = np.asarray(f())
    np.testing.assert_array_equal(h1, h2)


@pytest.mark.parametrize("method", ["scatter", "onehot", "sort", "pallas"])
def test_methods_under_outer_jit(method):
    data = np.random.randn(128).astype("f4")

    @jax.jit
    def f(x):
        return histogram(x, bins=bins_arr, method=method)[0]

    np.testing.assert_array_equal(
        np.asarray(f(data)), np.histogram(data, bins=bins_arr)[0]
    )


def test_grad_through_pallas_matches_scatter():
    """The Pallas weighted path defines a custom VJP (gather of the cotangent
    at each element's joint slot) — gradients must match the XLA path."""
    rng = np.random.RandomState(7)
    data = jnp.asarray(rng.randn(64).astype("f4"))
    d2 = jnp.asarray(rng.randn(64).astype("f4"))
    w0 = jnp.asarray(rng.rand(64).astype("f4"))
    coef = jnp.arange(9.0)

    def loss(w, method):
        h, _ = histogram(data, bins=bins_arr, weights=w, method=method)
        return jnp.sum(h * coef)

    g_pallas = jax.grad(lambda w: loss(w, "pallas"))(w0)
    g_scatter = jax.grad(lambda w: loss(w, "scatter"))(w0)
    np.testing.assert_allclose(
        np.asarray(g_pallas), np.asarray(g_scatter), rtol=1e-5
    )

    b2 = np.linspace(-3, 3, 7)

    def loss2(w, method):
        h, _ = histogram(data, d2, bins=[bins_arr, b2], weights=w, method=method)
        return jnp.sum(h**2)

    g2p = jax.grad(lambda w: loss2(w, "pallas"))(w0)
    g2s = jax.grad(lambda w: loss2(w, "scatter"))(w0)
    np.testing.assert_allclose(np.asarray(g2p), np.asarray(g2s), rtol=1e-4)


def test_grad_with_precision_modes():
    """The custom VJP (gather of the cotangent at each slot) is
    mode-independent; grads must flow through every per-call precision."""
    rng = np.random.RandomState(13)
    data = jnp.asarray(rng.randn(64).astype("f4"))
    w0 = jnp.asarray(rng.rand(64).astype("f4"))
    coef = jnp.arange(9.0)

    def loss(w, precision):
        h, _ = histogram(data, bins=bins_arr, weights=w, method="pallas",
                         precision=precision)
        return jnp.sum(h * coef)

    g_ref = jax.grad(lambda w: loss(w, None))(w0)
    for mode in ("split", "highest", "i8x3"):
        g = jax.grad(lambda w: loss(w, mode))(w0)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(g_ref), rtol=1e-5, atol=1e-6
        )


def test_measure_helper():
    from xhistogram_tpu.utils.profiling import measure

    dt, times = measure(
        lambda x: histogram(x, bins=bins_arr)[0],
        jnp.asarray(np.random.randn(256).astype("f4")),
        reps=2,
        warmup=1,
    )
    assert dt > 0 and len(times) == 2
