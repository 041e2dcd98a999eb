"""The labeled API's duck surface, exercised by an independently implemented
DataArray-like type (tests/xarray_double.py — built from xarray's documented
semantics) and, when xarray is installed, by the real ``xarray.DataArray``.
Covers alignment failure, coord carrying, attrs propagation, keep_coords,
and weights as a labeled type (reference xarray.py:109-199 contract)."""

import numpy as np
import pytest

from xhistogram_tpu.labeled import histogram

from xarray_double import DuckDataArray

_IMPLS = [("double", DuckDataArray)]
try:
    import xarray as xr

    _IMPLS.append(("xarray", xr.DataArray))
except ImportError:
    pass


@pytest.fixture(params=_IMPLS, ids=[n for n, _ in _IMPLS])
def DataArray(request):
    return request.param[1]


def test_basic_parity_and_labels(DataArray):
    da = DataArray(
        np.random.RandomState(0).randn(4, 6).astype("f4"),
        dims=("time", "x"),
        coords={"x": np.arange(6.0)},
        name="v",
        attrs={"units": "m"},
    )
    bins = np.linspace(-4, 4, 9)
    h = histogram(da, bins=[bins], dim=["time"])
    assert h.dims == ("x", "v_bin")
    assert h.name == "histogram_v"
    assert h.coords["v_bin"].attrs == {"units": "m"}
    np.testing.assert_allclose(
        h.coords["v_bin"].values, 0.5 * (bins[:-1] + bins[1:])
    )
    np.testing.assert_array_equal(h.coords["x"].values, np.arange(6.0))
    expected = np.stack(
        [np.histogram(np.asarray(da.data)[:, i], bins=bins)[0]
         for i in range(6)]
    )
    np.testing.assert_array_equal(h.values, expected)


def test_align_exact_failure(DataArray):
    a = DataArray(np.zeros((3, 4), "f4"), dims=("t", "x"), name="a")
    b = DataArray(np.zeros((3, 5), "f4"), dims=("t", "x"), name="b")
    with pytest.raises(ValueError):
        histogram(a, b, bins=[np.linspace(0, 1, 3)] * 2)


def test_unnamed_rejected(DataArray):
    a = DataArray(np.zeros(4, "f4"), dims=("x",))
    with pytest.raises(ValueError):
        histogram(a, bins=np.linspace(0, 1, 3))


def test_weights_labeled_broadcast(DataArray):
    rng = np.random.RandomState(1)
    da = DataArray(rng.randn(5, 8).astype("f4"), dims=("t", "x"), name="v")
    w = DataArray(rng.rand(8).astype("f4"), dims=("x",))  # broadcasts over t
    bins = np.linspace(-3, 3, 7)
    h = histogram(da, bins=bins, weights=w)
    wb = np.broadcast_to(np.asarray(w.data), (5, 8))
    expected = np.histogram(
        np.asarray(da.data, "f8").ravel(), bins=bins, weights=wb.ravel()
    )[0]
    np.testing.assert_allclose(h.values, expected, rtol=1e-5)


def test_keep_coords_carries_compatible(DataArray):
    rng = np.random.RandomState(2)
    lat = rng.rand(6)
    da = DataArray(
        rng.randn(4, 6).astype("f4"),
        dims=("time", "x"),
        coords={"x": np.arange(6.0), "lat": (("x",), lat, {"axis": "Y"})},
        name="v",
    )
    bins = np.linspace(-4, 4, 5)
    h = histogram(da, bins=bins, dim=["time"], keep_coords=True)
    assert "lat" in h.coords
    np.testing.assert_array_equal(h.coords["lat"].values, lat)
    assert h.coords["lat"].attrs == {"axis": "Y"}
    # without keep_coords the non-dim coord is dropped
    h2 = histogram(da, bins=bins, dim=["time"])
    assert "lat" not in h2.coords


def test_keep_coords_drops_incompatible(DataArray):
    rng = np.random.RandomState(3)
    da = DataArray(
        rng.randn(4, 6).astype("f4"),
        dims=("time", "x"),
        coords={"cell2d": (("time", "x"), rng.rand(4, 6))},
        name="v",
    )
    bins = np.linspace(-4, 4, 5)
    # 'time' is reduced away, so a (time, x) coord cannot survive
    h = histogram(da, bins=bins, dim=["time"], keep_coords=True)
    assert "cell2d" not in h.coords


def test_joint_two_doubles(DataArray):
    rng = np.random.RandomState(4)
    a = DataArray(rng.randn(200).astype("f4"), dims=("p",), name="T")
    b = DataArray(rng.randn(200).astype("f4"), dims=("p",), name="S")
    ea, eb = np.linspace(-3, 3, 7), np.linspace(-3, 3, 5)
    h = histogram(a, b, bins=[ea, eb])
    assert h.name == "histogram_T_S"
    assert h.dims == ("T_bin", "S_bin")
    expected, _, _ = np.histogram2d(
        np.asarray(a.data, "f8"), np.asarray(b.data, "f8"), bins=[ea, eb]
    )
    np.testing.assert_array_equal(h.values, expected)
