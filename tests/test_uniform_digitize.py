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


DS_EDGE_SETS = [
    np.linspace(0, 1, 1001),       # d = 1e-3: not f32-exact -> DS tier
    np.linspace(0, 7, 401),        # 13 certified exceptions
    np.linspace(-4, 4, 601),       # 1 exception, zero-crossing grid
    np.linspace(-33, 91, 1001),    # 4 exceptions, asymmetric range
    np.arange(0, 800) * 0.1,       # accumulated-rounding "uniform" grid
    np.linspace(-4.2, 4.2, 4097),  # 39 exceptions: scaled nu//32 cap
]
DS_IDS = ["d1e-3", "exc13", "exc1-zero", "exc4-wide", "arange0.1",
          "exc39-4k"]


def test_ds_form_accepts_generic_linspace():
    """Generic (non-power-of-two-spacing) uniform grids certify via the
    double-single tier that the exact arithmetic form rejects."""
    for e in DS_EDGE_SETS:
        T = np.asarray(bins_mod.compare_form(e, np.float32).edges)
        assert bins_mod.uniform_arith_form(T) is None
        f = bins_mod.uniform_form(T, e)
        assert f is not None and f[0] == "ds", e[:3]
    # below the size floor the compare chain is cheaper: no certificate
    small = np.linspace(0, 1, 11)
    Ts = np.asarray(bins_mod.compare_form(small, np.float32).edges)
    assert bins_mod.uniform_form(Ts, small) is None


@pytest.mark.parametrize("edges", DS_EDGE_SETS, ids=DS_IDS)
def test_ds_boundary_values_bit_exact(edges):
    """Every threshold, its one-ulp f32 neighbors, random data, and
    NaN/inf must bin identically to numpy through the pallas factored
    kernel running the double-single digitize (>256 bins reduce-all
    routes there; includes grids with certified exception lists)."""
    e32 = edges.astype("f4").astype("f8")
    vals = np.concatenate([
        e32, np.nextafter(e32.astype("f4"), np.inf).astype("f8"),
        np.nextafter(e32.astype("f4"), -np.inf).astype("f8"),
        np.random.RandomState(0).uniform(edges[0] - 1, edges[-1] + 1, 500),
        [np.nan, np.inf, -np.inf],
    ]).astype("f4")
    data = vals.reshape(1, -1)
    from xhistogram_tpu.ops import pallas_hist as ph
    T = np.asarray(bins_mod.compare_form(edges, np.float32).edges)
    form = bins_mod.uniform_form(T, edges)
    assert ph.plan(1, (edges.size - 1,), 1, uniform=(form,)) == "factored"
    h, _ = histogram(data, bins=edges, method="pallas")
    exp = np.histogram(data.ravel().astype("f8"), bins=edges)[0]
    np.testing.assert_array_equal(np.asarray(h), exp)


def test_ds_vs_fallback_identical(monkeypatch):
    rng = np.random.RandomState(7)
    edges = np.linspace(0, 7, 401)
    data = rng.uniform(-0.5, 7.5, (3, 900)).astype("f4")
    h1, _ = histogram(data, bins=edges, axis=1, method="pallas")
    monkeypatch.setenv("XHIST_UNIFORM_DIGITIZE", "0")
    h0, _ = histogram(data, bins=edges, axis=1, method="pallas")
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h0))


def test_ds_weighted_kept_rows():
    """DS digitize through the per-row factored weighted kernel."""
    rng = np.random.RandomState(8)
    edges = np.linspace(-4, 4, 601)
    data = rng.uniform(-4.5, 4.5, (4, 2048)).astype("f4")
    w = rng.rand(4, 2048).astype("f4")
    h, _ = histogram(data, bins=edges, axis=1, weights=w, method="pallas")
    exp = np.stack([
        np.histogram(np.asarray(r, "f8"), bins=edges,
                     weights=np.asarray(wr, "f8"))[0]
        for r, wr in zip(data, w)
    ])
    np.testing.assert_allclose(np.asarray(h), exp, rtol=1e-4, atol=1e-5)


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


def test_uniform_routing_thresholds():
    """plan()'s uniform-routing bin thresholds are the measured one_input
    crossovers, per tier AND per weightedness (unweighted: arith tie at 64
    bins, DS crossover ~118 — scripts/ds_perf_probe.py; weighted: arith
    tie at 24, DS tie at 80 — scripts/ds_weighted_probe.py). At or below
    the threshold one_input wins; above it the factored kernel with the
    O(1) digitize does."""
    from xhistogram_tpu.ops import pallas_hist as ph

    arith = (0.0, 1.0, 2.0)      # positional arith form (t0, d, t_last)
    ds = ("ds",)                 # DS forms are tagged with a leading str
    for form, unweighted_thr, weighted_thr in (
        (arith, 64, 24),
        (ds, 120, 80),
    ):
        for weighted, thr in ((False, unweighted_thr), (True, weighted_thr)):
            at = ph.plan(1, (thr,), 1, weighted=weighted, uniform=(form,))
            above = ph.plan(
                1, (thr + 1,), 1, weighted=weighted, uniform=(form,)
            )
            assert at == "one_input", (form[0], weighted, thr, at)
            assert above == "factored", (form[0], weighted, thr, above)


def test_unconsumed_certificates_share_one_jit_trace():
    """Uniform certificates are static jit args, but calls whose routed
    kernel never reads the VALUES (one_input routes, XLA strategies) must
    not fork the compiled-pipeline cache per grid: N same-shaped calls
    over different linspace grids == ONE trace (core._uniform_static_key
    tier placeholders). Grids that DO consume the values (factored+DS
    routes) still trace per grid — the values are compile-time constants
    there."""
    import jax

    from xhistogram_tpu import core as core_mod

    rng = np.random.RandomState(21)
    data = rng.randn(4, 512).astype("f4")

    # 32 bins < the 64-bin unweighted arith threshold -> one_input: the
    # certificate tier matters to plan(), its values never reach a kernel
    before = core_mod._histogram_impl._cache_size()
    for hw in (4.0, 8.0, 16.0):
        edges = np.linspace(-hw, hw, 33)  # pow-2 spacings: arith certified
        h, _ = histogram(data, bins=edges, method="pallas")
        exp = np.histogram(data.ravel().astype("f8"), bins=edges)[0]
        np.testing.assert_array_equal(np.asarray(h), exp)
    assert core_mod._histogram_impl._cache_size() - before == 1

    # 200 DS bins -> factored consumes the certificate values: per-grid
    # traces are the documented cost of the O(1) digitize
    before = core_mod._histogram_impl._cache_size()
    for hw in (4.2, 4.3):
        edges = np.linspace(-hw, hw, 201)
        h, _ = histogram(data, bins=edges, method="pallas")
        exp = np.histogram(data.ravel().astype("f8"), bins=edges)[0]
        np.testing.assert_array_equal(np.asarray(h), exp)
    assert core_mod._histogram_impl._cache_size() - before == 2


@pytest.mark.slow
def test_huge_certified_grid_skips_edge_column():
    """Certified inputs are exempt from the edge cap AND must not stage
    the real edge column as a dead VMEM operand (a >2^22-edge certified
    grid's column alone would exceed the VMEM limit on hardware): a
    2^20-bin integer-spaced grid runs the factored kernel with a dummy
    column and stays bit-exact."""
    from xhistogram_tpu.ops import pallas_hist as ph

    nb = 1 << 20
    edges = np.arange(nb + 1, dtype=np.float64) - (nb // 2)
    rng = np.random.RandomState(22)
    data = rng.randint(-(nb // 2) - 50, nb // 2 + 50, (1, 4096)).astype(
        np.int32
    )
    from xhistogram_tpu import bins as bins_mod

    T = np.asarray(bins_mod.compare_form(edges, np.int32).edges)
    form = bins_mod.uniform_form(T, edges)
    assert form is not None
    assert ph.plan(1, (nb,), 1, uniform=(form,)) == "factored"
    h, _ = histogram(data, bins=edges, method="pallas")
    exp = np.histogram(data.ravel().astype("f8"), bins=edges)[0]
    np.testing.assert_array_equal(np.asarray(h), exp)


class TestXlaUniformDigitize:
    """Above the compare-sum edge limit, the XLA pipeline consumes uniform
    certificates with the kernels' pure-jnp O(1) digitize (searchsorted's
    gather search costs ~180 ns/element on TPU). The CPU suite forces the
    route via the module knob; parity must be bit-exact."""

    @staticmethod
    def _force(monkeypatch):
        from xhistogram_tpu.ops import digitize as dg

        monkeypatch.setattr(dg, "_XLA_UNI_MODE", "1")

    @pytest.mark.parametrize(
        "edges",
        [
            np.linspace(-8.0, 8.0, 257),  # pow-2 spacing: arith tier
            np.linspace(-4.0, 4.0, 202),  # generic linspace: DS tier
            np.arange(-300.0, 301.0),  # integer-width: arith tier
        ],
    )
    def test_scatter_route_bit_exact(self, monkeypatch, edges):
        self._force(monkeypatch)
        rng = np.random.RandomState(40)
        lo, hi = edges[0], edges[-1]
        data = rng.uniform(lo - 1, hi + 1, (3, 4000)).astype("f4")
        data.ravel()[:4] = [np.nan, np.inf, -np.inf, lo]
        data.ravel()[4:104] = rng.choice(edges, 100).astype("f4")
        h, _ = histogram(data, bins=edges, axis=1, method="scatter")
        exp = np.stack(
            [np.histogram(r.astype("f8"), bins=edges)[0] for r in data]
        )
        np.testing.assert_array_equal(np.asarray(h), exp)

    def test_int_data_integer_grid(self, monkeypatch):
        self._force(monkeypatch)
        rng = np.random.RandomState(41)
        edges = np.arange(-500, 501, 2, dtype=np.float64)
        data = rng.randint(-520, 520, (2, 3000)).astype(np.int32)
        h, _ = histogram(data, bins=edges, method="scatter")
        exp = np.histogram(data.ravel().astype("f8"), bins=edges)[0]
        np.testing.assert_array_equal(np.asarray(h), exp)

    def test_static_key_keeps_consumed_values(self, monkeypatch):
        """With the XLA route consuming certificates, _uniform_static_key
        must keep the values (a placeholder would make the trace raise or
        mis-bin) — calls over different grids fork the cache, same grid
        reuses it."""
        self._force(monkeypatch)
        from xhistogram_tpu import core as core_mod

        rng = np.random.RandomState(42)
        data = rng.randn(2, 1000).astype("f4")
        before = core_mod._histogram_impl._cache_size()
        for hw in (4.1, 4.2, 4.2):
            edges = np.linspace(-hw, hw, 202)
            h, _ = histogram(data, bins=edges, method="scatter")
            exp = np.histogram(data.ravel().astype("f8"), bins=edges)[0]
            np.testing.assert_array_equal(np.asarray(h), exp)
        assert core_mod._histogram_impl._cache_size() - before == 2

    def test_weighted_joint_mixed_certificates(self, monkeypatch):
        """Joint call where one input is certified and the other is not:
        per-input consumption, weighted sums allclose + count placement
        exact."""
        self._force(monkeypatch)
        rng = np.random.RandomState(43)
        ea = np.linspace(-4.0, 4.0, 91)  # DS-certified
        eb = np.sort(rng.uniform(-4, 4, 41))  # irregular: compare path
        a = rng.randn(1, 5000).astype("f4")
        b = rng.randn(1, 5000).astype("f4")
        w = rng.rand(1, 5000).astype("f4")
        h, _ = histogram(a, b, bins=[ea, eb], weights=w, method="scatter")
        exp = np.histogram2d(
            a.ravel().astype("f8"), b.ravel().astype("f8"),
            bins=[ea, eb], weights=w.ravel().astype("f8"),
        )[0]
        np.testing.assert_allclose(np.asarray(h), exp, rtol=1e-4)
        hu, _ = histogram(a, b, bins=[ea, eb], method="scatter")
        expu = np.histogram2d(
            a.ravel().astype("f8"), b.ravel().astype("f8"), bins=[ea, eb]
        )[0]
        np.testing.assert_array_equal(np.asarray(hu), expu)
