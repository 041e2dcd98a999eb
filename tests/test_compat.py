"""numpy-signature compat wrappers vs the numpy originals."""

import numpy as np
import pytest

from xhistogram_tpu import compat


def test_histogram_compat():
    rng = np.random.RandomState(0)
    a = rng.randn(1000).astype("f4")
    for kw in [dict(bins=10), dict(bins=10, range=(-2, 2)),
               dict(bins=np.linspace(-3, 3, 8)),
               dict(bins=12, weights=rng.rand(1000).astype("f4")),
               dict(bins=10, density=True)]:
        h, e = compat.histogram(a, **kw)
        he, ee = np.histogram(a.astype("f8"), **{
            k: (v.astype("f8") if hasattr(v, "dtype") else v)
            for k, v in kw.items()
        })
        np.testing.assert_allclose(e, ee, rtol=1e-5)
        if "weights" in kw or kw.get("density"):
            np.testing.assert_allclose(np.asarray(h), he, rtol=1e-4,
                                       atol=1e-6)
        else:
            np.testing.assert_array_equal(np.asarray(h), he)


def test_histogram2d_compat():
    rng = np.random.RandomState(1)
    x = rng.randn(2000).astype("f4")
    y = rng.randn(2000).astype("f4")
    for bins in [7, [5, 9], [np.linspace(-3, 3, 6), np.linspace(-3, 3, 11)]]:
        h, ex, ey = compat.histogram2d(x, y, bins=bins)
        he, exe, eye = np.histogram2d(x.astype("f8"), y.astype("f8"),
                                      bins=bins)
        np.testing.assert_allclose(ex, exe, rtol=1e-5)
        np.testing.assert_allclose(ey, eye, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(h), he)
    # numpy semantics: a length-3 flat sequence is a shared edge array
    h, ex, ey = compat.histogram2d(x, y, bins=[-1.0, 0.0, 1.0])
    he, _, _ = np.histogram2d(x.astype("f8"), y.astype("f8"),
                              bins=[-1.0, 0.0, 1.0])
    np.testing.assert_array_equal(np.asarray(h), he)
    with pytest.raises(ValueError):
        compat.histogram2d(x, y, bins=np.zeros((3, 3)))


def test_histogramdd_compat():
    rng = np.random.RandomState(2)
    sample = rng.randn(1500, 3).astype("f4")
    for bins in [4, [3, 4, 5]]:
        h, edges = compat.histogramdd(sample, bins=bins)
        he, ee = np.histogramdd(sample.astype("f8"), bins=bins)
        for e1, e2 in zip(edges, ee):
            np.testing.assert_allclose(e1, e2, rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(h), he)
    # sequence-of-arrays form
    cols = [sample[:, d] for d in range(3)]
    h, edges = compat.histogramdd(cols, bins=3)
    he, _ = np.histogramdd(sample.astype("f8"), bins=3)
    np.testing.assert_array_equal(np.asarray(h), he)
    with pytest.raises(ValueError):
        compat.histogramdd(sample, bins=[3, 4])
    # weighted + density
    w = rng.rand(1500).astype("f4")
    h, _ = compat.histogramdd(sample, bins=4, weights=w, density=True)
    he, _ = np.histogramdd(sample.astype("f8"), bins=4,
                           weights=w.astype("f8"), density=True)
    np.testing.assert_allclose(np.asarray(h), he, rtol=1e-4, atol=1e-7)


def test_histogram2d_ndarray_bins_conventions():
    """numpy's exact bins conventions: length-2 sequence (incl. ndarray) =
    per-dim specs; longer 1-D array = shared edges."""
    rng = np.random.RandomState(3)
    x = rng.randn(500).astype("f4")
    y = rng.randn(500).astype("f4")
    h, ex, ey = compat.histogram2d(x, y, bins=np.array([5, 9]))
    assert np.asarray(h).shape == (5, 9)
    he, _, _ = np.histogram2d(x.astype("f8"), y.astype("f8"),
                              bins=np.array([5, 9]))
    np.testing.assert_array_equal(np.asarray(h), he)
    shared = np.linspace(-3, 3, 7)
    h, ex, ey = compat.histogram2d(x, y, bins=shared)
    he, _, _ = np.histogram2d(x.astype("f8"), y.astype("f8"), bins=shared)
    np.testing.assert_array_equal(np.asarray(h), he)
    np.testing.assert_allclose(ex, shared)
    np.testing.assert_allclose(ey, shared)


def test_histogramdd_ndarray_bins_and_1d_sample():
    rng = np.random.RandomState(4)
    sample = rng.randn(800, 3).astype("f4")
    h, _ = compat.histogramdd(sample, bins=np.array([3, 4, 5]))
    he, _ = np.histogramdd(sample.astype("f8"), bins=np.array([3, 4, 5]))
    assert np.asarray(h).shape == (3, 4, 5)
    np.testing.assert_array_equal(np.asarray(h), he)
    # numpy treats (N,) as (N, 1)
    flat = rng.randn(600).astype("f4")
    h, edges = compat.histogramdd(flat, bins=5)
    he, ee = np.histogramdd(flat.astype("f8"), bins=5)
    np.testing.assert_array_equal(np.asarray(h), he)
    np.testing.assert_allclose(edges[0], ee[0], rtol=1e-5)


def test_histogram_flat_list_edges():
    """np.histogram's most common bins form — a plain list of edges."""
    a = np.array([0.1, 0.6, 0.7], "f4")
    h, e = compat.histogram(a, bins=[0.0, 0.5, 1.0])
    np.testing.assert_array_equal(np.asarray(h), [1, 2])
    np.testing.assert_allclose(e, [0.0, 0.5, 1.0])
