"""Wide-dtype exactness: the device pipeline must reproduce numpy bit-exactly
for inputs the device dtype cannot hold (int64/uint64/float64 under 32-bit
jax) and for bin edges at/beyond the data dtype's range.

numpy's own semantics for integer data vs float edges is a float64 *cast* of
the data (lossy above 2**53) followed by float64 comparisons (reference
core.py:163-174 via searchsorted); `bins.int_thresholds` reproduces the cast
rounding cutovers exactly, and `core._exact_rank_codes` digitizes wide numpy
inputs host-side in exact arithmetic. Regressions for ADVICE r1 (high: float
edges truncated by an integer cast; low: a == iinfo.max dropped from a
saturated closed last bin).
"""

import numpy as np
import pytest

from xhistogram_tpu import bins as bins_mod
from xhistogram_tpu.core import histogram


def _assert_np_parity(data, edges, **kw):
    h, _ = histogram(data, bins=edges, **kw)
    expected = np.histogram(data, bins=edges)[0]
    np.testing.assert_array_equal(np.asarray(h), expected)


def test_int64_fractional_edges():
    # ADVICE r1 high: integer cast used to truncate 0.5/1.5/2.5 to 0/1/2
    _assert_np_parity(
        np.array([0, 1, 2, 3], dtype=np.int64), np.array([0.5, 1.5, 2.5])
    )


def test_int64_auto_bins_fractional():
    # bins=<int> resolves to float edges; int64 data must not truncate them
    d = np.array(["2000-01-01", "2000-01-05", "2000-01-06", "2000-01-07"],
                 dtype="datetime64[D]")
    h, _ = histogram(d, bins=3)
    expected = np.histogram(d.view("i8"), bins=3)[0]
    np.testing.assert_array_equal(np.asarray(h), expected)


@pytest.mark.parametrize("dtype", [np.int32, np.int64])
def test_saturated_closed_last_bin(dtype):
    # ADVICE r1 low: a == iinfo.max belongs in a last bin closed at the max
    info = np.iinfo(dtype)
    data = np.array([info.max - 7, info.max], dtype=dtype)
    edges = np.array([int(info.max) - 47, int(info.max)], dtype=np.int64)
    _assert_np_parity(data, edges)


@pytest.mark.parametrize("dtype", [np.int32, np.int64])
def test_edges_beyond_dtype_range(dtype):
    # edges outside the data dtype's range: clamping must not pull
    # v == iinfo.max into bins whose true lower bound is above it
    info = np.iinfo(dtype)
    data = np.array([info.min, -5, 0, 5, info.max], dtype=dtype)
    edges = np.array(
        [float(info.min) * 4, -1.5, float(info.max) * 2, float(info.max) * 4]
    )
    _assert_np_parity(data, edges)


def test_int64_cast_cutover_fuzz():
    # above 2**53 numpy compares float64-cast data; match its rounding
    rng = np.random.RandomState(3)
    base = np.int64(2**56)
    data = base + rng.randint(-5000, 5000, size=5000).astype(np.int64)
    edges = np.sort(
        (base + rng.randint(-4000, 4000, size=9)).astype(np.float64)
        + rng.randn(9)
    )
    _assert_np_parity(data, edges)


def test_uint64_fuzz_float_edges():
    rng = np.random.RandomState(4)
    data = rng.randint(0, 2**62, size=3000).astype(np.uint64) * 4
    edges = np.sort(rng.uniform(0, 2.0**64, size=7))
    _assert_np_parity(data, edges)


def test_int64_int_edges_fuzz():
    rng = np.random.RandomState(5)
    data = rng.randint(-(2**62), 2**62, size=3000).astype(np.int64)
    edges = np.sort(rng.randint(-(2**62), 2**62, size=9)).astype(np.int64)
    _assert_np_parity(data, edges)


def test_float64_non_representable_exact():
    # f64 numpy data that does not round-trip float32 digitizes exactly
    # (host rank codes), including values straddling the f32 rounding of
    # an edge — previously these were silently cast to f32
    edge = np.float64(1.0000000123)
    data = np.array([np.nextafter(edge, -np.inf), edge,
                     np.nextafter(edge, np.inf)])
    edges = np.array([0.0, edge, 2.0])
    _assert_np_parity(data, edges)
    rng = np.random.RandomState(6)
    data = rng.randn(2000) * (1 + 1e-12)
    edges = np.linspace(-3, 3, 11) + 1e-13
    _assert_np_parity(data, edges)


def test_float64_nan_inf_through_rank_codes():
    data = np.array([np.nan, np.inf, -np.inf, 0.3 + 1e-13, np.nan])
    edges = np.array([0.0, 0.5 + 1e-13, 1.0])
    _assert_np_parity(data, edges)


def test_posinf_closed_last_edge():
    data = np.array([0.5, 3.0, np.inf, np.nan, -np.inf], dtype=np.float32)
    edges = np.array([0.0, 1.0, np.inf])
    _assert_np_parity(data, edges)


def test_weights_more_dims_than_data():
    # ADVICE r1 medium: the reference broadcasts args AND weights before
    # resolving estimator bin specs (reference core.py:366-388)
    rng = np.random.RandomState(7)
    a = rng.randn(10).astype(np.float32)
    w = rng.rand(5, 10).astype(np.float32)
    h, edges = histogram(a, bins=4, weights=w)
    ab = np.broadcast_to(a, (5, 10))
    exp_edges = np.histogram_bin_edges(ab, bins=4)
    np.testing.assert_array_equal(edges[0], exp_edges)
    expected = np.histogram(ab.ravel(), bins=exp_edges,
                            weights=w.ravel())[0]
    np.testing.assert_allclose(np.asarray(h), expected, rtol=1e-5)


def test_integer_weights_keep_dtype_and_exactness():
    # ADVICE r1 low: integer weights stay exact in their own dtype through
    # every method (the auto path must not round them through bf16/f32)
    rng = np.random.RandomState(8)
    data = rng.randn(500).astype(np.float32)
    w = rng.randint(1, 2**20, size=500).astype(np.int32)
    edges = np.linspace(-3, 3, 9)
    expected = np.histogram(data.astype("f8"), bins=edges, weights=w)[0]
    for method in ("auto", "scatter", "onehot", "sort"):
        h, _ = histogram(data, bins=edges, weights=w, method=method)
        assert np.asarray(h).dtype == np.int32, method
        np.testing.assert_array_equal(np.asarray(h), expected.astype(np.int64))


def test_int_thresholds_matches_cast_semantics():
    # property: t_j is the minimal integer whose float64 cast is >= e_j
    rng = np.random.RandomState(9)
    for _ in range(50):
        scale = 2.0 ** rng.randint(1, 62)
        e = np.sort(rng.uniform(-scale, scale, size=4))
        ts = bins_mod.int_thresholds(e)
        for t, ej in zip(ts[:-1], e[:-1]):
            t = int(t)
            assert float(t) >= ej and float(t - 1) < ej
        u = int(ts[-1])
        assert float(u) > e[-1] and float(u - 1) <= e[-1]


def test_mixed_signedness_promotes_through_float64():
    # numpy promotes uint64-data/int64-edge comparisons to float64 (lossy
    # above 2**53); hypothesis-found counterexample, r2: both the value and
    # the edge round to the same f64, so numpy counts the value IN the
    # closed last bin while exact integer comparison would exclude it
    data = np.array([787672764765027777, 0, 18446744073709551615],
                    dtype=np.uint64)
    edges = np.array([0, 787672764765027776], dtype=np.int64)
    _assert_np_parity(data, edges)
    # and the mirrored case: int64 data vs uint64 edges
    data2 = np.array([-5, 0, 787672764765027777], dtype=np.int64)
    edges2 = np.array([0, 787672764765027776], dtype=np.uint64)
    _assert_np_parity(data2, edges2)


def test_float_data_huge_int_edges_promote_through_float64():
    # f32 data vs int64 edges beyond 2**53: numpy compares against the
    # f64-rounded edge, not the exact integer (2**63 - 512 rounds UP to
    # 2**63, pulling f32(2**63) into the closed last bin)
    data = np.array([0.0, 9.2233720368547758e18], dtype=np.float32)  # 2**63
    edges = np.array([0, 2**63 - 512], dtype=np.int64)
    _assert_np_parity(data, edges)
