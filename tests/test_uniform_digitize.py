"""Arithmetic digitize for host-verified uniform thresholds
(bins.uniform_arith_form + ops.pallas_hist._digitize_tile_uniform): must be
BIT-IDENTICAL to the compare-chain digitize, including values exactly at
thresholds, one-ulp neighbors, NaN/inf, int data, and the wide-dtype
rank-code path. XHIST_UNIFORM_DIGITIZE=0 disables it (A/B used here)."""

import numpy as np
import pytest

from xhistogram_tpu import bins as bins_mod
from xhistogram_tpu.core import histogram


def _np_oracle(data, edges, axis=None, weights=None):
    if axis is None:
        return np.histogram(
            np.asarray(data, "f8").ravel(), bins=edges,
            weights=None if weights is None
            else np.asarray(weights, "f8").ravel(),
        )[0]
    return np.stack([
        np.histogram(np.asarray(r, "f8"), bins=edges,
                     weights=None if weights is None
                     else np.asarray(wr, "f8"))[0]
        for r, wr in zip(
            data, weights if weights is not None else data
        )
    ])


UNIFORM_EDGE_SETS = [
    np.linspace(-4, 4, 65),            # d = 0.125 (power of two)
    np.linspace(0, 1, 1025),           # d = 2^-10
    np.arange(-50.0, 51.0),            # d = 1
    np.linspace(-3, 3, 5),             # d = 1.5 = 3*2^-1
]


def test_uniform_form_accepts_and_rejects():
    accept = [np.asarray(bins_mod.compare_form(e, np.float32).edges)
              for e in UNIFORM_EDGE_SETS]
    for T in accept:
        assert bins_mod.uniform_arith_form(T) is not None
    rej = np.asarray(
        bins_mod.compare_form(np.linspace(-4, 4, 91), np.float32).edges
    )
    assert bins_mod.uniform_arith_form(rej) is None  # d = 8/90 rounds


@pytest.mark.parametrize("edges", UNIFORM_EDGE_SETS,
                         ids=["d1/8", "d2^-10", "d1", "d1.5"])
def test_uniform_boundary_values_bit_exact(edges):
    """Every threshold value, its one-ulp neighbors, and random data must
    bin identically to numpy — through the pallas factored kernel (which
    uses the arithmetic digitize when the certificate is present)."""
    e32 = edges.astype("f4").astype("f8")
    vals = np.concatenate([
        e32, np.nextafter(e32.astype("f4"), np.inf).astype("f8"),
        np.nextafter(e32.astype("f4"), -np.inf).astype("f8"),
        np.random.RandomState(0).uniform(edges[0] - 1, edges[-1] + 1, 500),
        [np.nan, np.inf, -np.inf],
    ]).astype("f4")
    n = vals.size
    # route to the factored kernel (reduce-all, > 1024 bins would force it;
    # use 2 inputs so plan() picks factored/joint path with digitize)
    data = np.broadcast_to(vals, (1, n)).copy()
    h, _ = histogram(data, data, bins=[edges, edges], method="pallas")
    exp, _, _ = np.histogram2d(
        data.ravel().astype("f8"), data.ravel().astype("f8"),
        bins=[edges, edges],
    )
    np.testing.assert_array_equal(np.asarray(h), exp)


@pytest.mark.parametrize("edges", UNIFORM_EDGE_SETS[:2],
                         ids=["d1/8", "d2^-10"])
def test_uniform_vs_fallback_identical(edges, monkeypatch):
    rng = np.random.RandomState(1)
    data = rng.uniform(edges[0] - 0.5, edges[-1] + 0.5, (4, 700)).astype("f4")
    h1, _ = histogram(data, data, bins=[edges, edges], axis=1,
                      method="pallas")
    monkeypatch.setenv("XHIST_UNIFORM_DIGITIZE", "0")
    h0, _ = histogram(data, data, bins=[edges, edges], axis=1,
                      method="pallas")
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h0))


def test_uniform_int_data_and_rank_codes():
    rng = np.random.RandomState(2)
    ints = rng.randint(-60, 60, (3, 400)).astype("i4")
    edges = np.arange(-50.0, 51.0)
    h, _ = histogram(ints, ints, bins=[edges, edges], method="pallas")
    exp, _, _ = np.histogram2d(ints.ravel().astype("f8"),
                               ints.ravel().astype("f8"),
                               bins=[edges, edges])
    np.testing.assert_array_equal(np.asarray(h), exp)
    # wide int64 data -> host rank codes (uniform int thresholds) on device
    wide = (rng.randint(-5, 5, (2, 300)).astype("i8") * 10**12)
    e2 = np.linspace(-6e12, 6e12, 13)
    h2, _ = histogram(wide, bins=e2, method="pallas")
    np.testing.assert_array_equal(
        np.asarray(h2), np.histogram(wide.ravel(), bins=e2)[0]
    )


def test_uniform_many_edges_per_row():
    """The many-edge regime (the arithmetic digitize's main win)."""
    rng = np.random.RandomState(3)
    data = rng.uniform(0, 1, (5, 3000)).astype("f4")
    edges = np.linspace(0, 1, 4097)  # d = 2^-12
    h, _ = histogram(data, bins=edges, axis=1, method="pallas")
    exp = np.stack([np.histogram(np.asarray(r, "f8"), bins=edges)[0]
                    for r in data])
    np.testing.assert_array_equal(np.asarray(h), exp)


def test_uniform_weighted_and_grad():
    rng = np.random.RandomState(4)
    data = rng.uniform(-4, 4, (1, 2000)).astype("f4")
    w = rng.rand(1, 2000).astype("f4")
    edges = np.linspace(-4, 4, 2049)  # factored weighted, d = 2^-8
    h, _ = histogram(data, bins=edges, weights=w, method="pallas")
    exp = np.histogram(data.ravel().astype("f8"), bins=edges,
                       weights=w.ravel().astype("f8"))[0]
    np.testing.assert_allclose(np.asarray(h), exp, rtol=1e-4, atol=1e-5)


def test_negative_subnormal_data_vs_zero_edge():
    """FTZ regression (found r3, real-chip-probed): the device flushes
    subnormal compare operands to ±0, so a negative-subnormal value
    crossed a 0.0 edge. The bitwise rewrite must restore numpy parity on
    every method."""
    vals = np.array(
        [np.nextafter(np.float32(0), -1), np.nextafter(np.float32(0), 1),
         -1e-38, 1e-38, -0.0, 0.0, -0.5, 0.5], dtype="f4",
    )
    data = np.broadcast_to(vals, (4, 8)).copy()
    edges = np.array([-1.0, 0.0, 1.0])
    expected = np.stack(
        [np.histogram(np.asarray(r, "f8"), bins=edges)[0] for r in data]
    )
    for method in ("pallas", "scatter", "onehot", "sort"):
        h, _ = histogram(data, bins=edges, axis=1, method=method)
        np.testing.assert_array_equal(
            np.asarray(h), expected, err_msg=f"method={method}"
        )


def test_uniform_lifts_edge_cap():
    """Uniform-certified inputs don't count against the fused path's edge
    cap (the O(edges) digitize cost they'd bound is gone): a 65k-bin
    uniform histogram stays on pallas and is exact."""
    from xhistogram_tpu.ops import pallas_hist as ph

    uni = ((0.0, 1.0, 65537.0),)
    assert ph.plan(1, (2 * ph._MAX_EDGES,), 1, uniform=uni) == "factored"
    assert ph.plan(1, (2 * ph._MAX_EDGES,), 1) is None  # uncertified: cap

    rng = np.random.RandomState(5)
    data = rng.uniform(0, 1, (1, 20000)).astype("f4")
    edges = np.linspace(0, 1, 65537)  # d = 2^-16: certified
    h, _ = histogram(data, bins=edges, method="pallas")
    exp = np.histogram(data.ravel().astype("f8"), bins=edges)[0]
    np.testing.assert_array_equal(np.asarray(h), exp)
