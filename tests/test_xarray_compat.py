"""Duck-typed xarray.DataArray support for the labeled API (runs only when
xarray is installed; the labeled wrapper only touches the shared
dims/coords/attrs/name surface)."""

import numpy as np
import pytest

xr = pytest.importorskip("xarray")

from xhistogram_tpu.labeled import histogram  # noqa: E402


def test_xarray_dataarray_input():
    da = xr.DataArray(
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
    expected = np.stack(
        [np.histogram(da.values[:, i], bins=bins)[0] for i in range(6)]
    )
    np.testing.assert_array_equal(h.values, expected)
