"""Unit tests for bin/range spec normalization.

Mirrors the reference's helper truth tables
(test_core.py:316-362 in /root/reference/xhistogram/test/).
"""

import numpy as np
import pytest

from xhistogram_tpu.bins import (
    bin_areas,
    bin_centers,
    normalize_bins,
    normalize_range,
    resolve_bin_edges,
)

bins_int = 10
bins_str = "auto"
bins_arr = np.linspace(-4, 4, 10)
range_ = (0, 1)


@pytest.mark.parametrize(
    "bins_in,n,expected",
    [
        (bins_int, 1, [bins_int]),
        (bins_str, 1, [bins_str]),
        (bins_arr, 1, [bins_arr]),
        ([bins_int], 1, [bins_int]),
        (bins_int, 2, 2 * [bins_int]),
        (bins_str, 2, 2 * [bins_str]),
        (bins_arr, 2, 2 * [bins_arr]),
        ([bins_int, bins_str, bins_arr], 3, [bins_int, bins_str, bins_arr]),
    ],
)
def test_normalize_bins(bins_in, n, expected):
    out = normalize_bins(bins_in, n)
    assert len(out) == len(expected)
    for a, b in zip(out, expected):
        if isinstance(a, np.ndarray):
            np.testing.assert_array_equal(a, b)
        else:
            assert a == b


@pytest.mark.parametrize(
    "bins_in,n",
    [([bins_arr], 2), (None, 1), ([bins_arr, bins_arr], 1)],
)
def test_normalize_bins_errors(bins_in, n):
    with pytest.raises((ValueError, TypeError)):
        normalize_bins(bins_in, n)


@pytest.mark.parametrize(
    "range_in,n,expected",
    [
        (range_, 1, [range_]),
        (range_, 2, [range_, range_]),
        ([range_, range_], 2, [range_, range_]),
        (None, 3, [None, None, None]),
    ],
)
def test_normalize_range(range_in, n, expected):
    assert normalize_range(range_in, n) == expected


@pytest.mark.parametrize(
    "range_in,n",
    [([(range_[0],)], 1), ([range_], 2), ([range_, range_], 1)],
)
def test_normalize_range_errors(range_in, n):
    with pytest.raises(ValueError):
        normalize_range(range_in, n)


@pytest.mark.parametrize("bins", [10, "auto", np.linspace(-3, 3, 11)])
@pytest.mark.parametrize("range_in", [None, (-2.0, 2.0)])
def test_resolve_matches_numpy(bins, range_in):
    rng = np.random.RandomState(0)
    data = rng.randn(200)
    (edges,) = resolve_bin_edges([data], bins, range_in)
    expected = np.histogram_bin_edges(data, bins=bins, range=range_in)
    np.testing.assert_array_equal(edges, expected)


def test_resolve_traced_requires_arrays():
    import jax

    def f(x):
        return resolve_bin_edges([x], 10)

    with pytest.raises(TypeError, match="bins must be provided as numpy array"):
        jax.eval_shape(f, np.zeros(4, np.float32))


def test_bin_geometry_helpers():
    e = np.array([0.0, 1.0, 3.0])
    np.testing.assert_allclose(bin_centers(e), [0.5, 2.0])
    a = bin_areas([e, np.array([0.0, 2.0])])
    np.testing.assert_allclose(a, [[2.0], [4.0]])


def test_str_bins_with_weights_raises_like_numpy():
    """bins='auto' + weights is a TypeError (numpy's histogram_bin_edges
    contract — reference test_core.py:276-313 cond_2)."""
    data = np.random.RandomState(0).randn(50)
    w = np.ones(50)
    with pytest.raises(TypeError):
        resolve_bin_edges([data], "auto", None, weights=w)
