"""Kernel-selection single source of truth: supports() and _dispatch both
consume ops.pallas_hist.plan(), so the 'auto' gate can never admit a shape
the dispatcher would route differently (VERDICT r1 #6).
"""

import math

import pytest

from xhistogram_tpu.ops import pallas_hist as ph


def _shape_grid():
    cases = []
    for nbins in [(64,), (1024,), (2000,), (280, 340), (2048, 2048),
                  (4096, 4096), (16, 16, 16), (8000,), (9000,)]:
        for m in (1, 4, 64, 4096):
            for c in (64, 256, 100_000):
                for weighted in (False, True):
                    cases.append((nbins, m, c, weighted))
    return cases


@pytest.mark.parametrize("nbins,m,c,weighted", _shape_grid())
def test_supports_is_plan(nbins, m, c, weighted):
    n_inputs = len(nbins)
    assert ph.supports(n_inputs, nbins, m, weighted=weighted, c=c) == (
        ph.plan(n_inputs, nbins, m, c=c, weighted=weighted) is not None
    )


def test_plan_known_boundaries():
    # full-reduce single input, small bins → the membership-row kernel
    assert ph.plan(1, (300,), 1) == "one_input"
    # classic T-S joint grid, full reduce → joint2
    assert ph.plan(2, (280, 340), 1) == "joint2"
    # big joint grid, full reduce → factored up to the measured
    # fused-vs-scatter pipeline crossovers (r3 scripts/fused_midslot_probe:
    # unweighted ~tie 1-4M slots → cap 2^21; weighted fused 0.66 GB/s at
    # 2^18 vs scatter ~0.5, 0.03 vs 0.26 at 4.2M → cap 2^18); above, the
    # XLA scatter fallback (~flat in n_slots) is faster
    assert ph.plan(2, (1024, 1024), 1) == "factored"  # 1.05M < 2^21
    assert ph.plan(2, (1448, 1448), 1) == "factored"  # 2.1M  < 2^21
    assert ph.plan(2, (2048, 2048), 1) is None  # 4.2M > 2^21 → scatter
    assert (
        ph.plan(3, (64, 64, 63), 1, weighted=True) == "factored"
    )  # 258k < 2^18
    assert ph.plan(3, (64, 64, 64), 1, weighted=True) is None  # > 2^18
    # joint2 is O(nb_a + nb_b)/element — the factored full-reduction cap
    # does not apply to it (its own rounded-sum gate bounds it)
    assert ph.plan(2, (768, 760), 1, weighted=True) == "joint2"  # 583k slots
    # kept rows, wide reduce axis, large grid → per-row factored
    assert ph.plan(2, (280, 340), 64, c=100_000) == "factored_per_row"
    # kept rows, narrow reduce axis, small grid → direct
    assert ph.plan(2, (40, 40), 64, c=64) == "direct"
    # kept rows, narrow reduce axis, big grid → packed factored (r2: was an
    # XLA-sort cliff)
    assert ph.plan(2, (280, 340), 64, c=64) == "factored_packed"
    # packed slot cap: 8 rows per tile × slots ≤ slot cap
    assert ph.plan(2, (1024, 1024), 64, c=64) == "factored_packed"
    assert ph.plan(2, (2048, 1024), 64, c=64) == "factored_packed"
    assert ph.plan(2, (2048, 2048), 64, c=64) is None  # 8 x slots > 2^25
    # edge-count cap (total edges incl. the +1 per input; r2: fori digitize
    # lifted it from 8192 to _MAX_EDGES)
    assert ph.plan(1, (ph._MAX_EDGES - 2,), 1) == "factored"
    assert ph.plan(1, (ph._MAX_EDGES,), 1) is None


def test_plan_matches_dispatch_choice():
    """The dispatcher must actually run the kernel plan() names — smoke a
    few shapes through the real dispatch on the interpret backend and check
    parity (the choice itself is structural: _dispatch reads plan())."""
    import numpy as np

    from xhistogram_tpu.core import histogram

    rng = np.random.RandomState(0)
    for nbins, m, c in [((16,), 4, 64), ((8, 8), 4, 512), ((8, 6), 1, 300)]:
        edges = [np.linspace(-3, 3, nb + 1) for nb in nbins]
        data = [rng.randn(m, c).astype("f4") for _ in nbins]
        h, _ = histogram(*data, bins=edges, axis=1, method="pallas")
        flat = [d.reshape(m, c) for d in data]
        expected = np.stack(
            [
                np.histogramdd([f[i] for f in flat], bins=edges)[0]
                for i in range(m)
            ]
        )
        np.testing.assert_array_equal(np.asarray(h), expected)


def test_weighted_gate_actual_channel_count():
    """supports() with the weights dtype known sizes the kept-row VMEM gate
    with the REAL per-slot output count (4 = counts + 3 faithful channels in
    split mode) instead of the conservative worst case (5) — shapes that fit
    the actual channel count stay on the fused path (VERDICT r2 weak #7)."""
    import numpy as np

    # m * padded_slots * n_outs vs 2^28: (1023,1023) @ m=64 padds to exactly
    # 2^20 slots -> 4 outputs hit 2^28 (admitted), 5 would exceed (rejected)
    assert not ph.supports(2, (1023, 1023), 64, weighted=True, c=100_000)
    assert ph.supports(
        2, (1023, 1023), 64, weighted=True, c=100_000,
        weights_dtype=np.float32,
    )
    assert (
        ph.plan(2, (1023, 1023), 64, c=100_000, weighted=True, n_outs=4)
        == "factored_per_row"
    )


def test_weighted_full_caps_per_mode():
    """The weighted full-reduction slot cap is per-precision-mode: the
    integer digit modes run 2-4x split's MXU rate, so their fused-vs-scatter
    crossovers sit higher (measured, scripts/r4_wmode_caps.py @ c=1e7:
    int1 0.77 GB/s vs scatter ~0.45 at 524k slots and still ahead near 1M;
    int2 0.59 at 524k but 0.29 vs 0.39 at 1.05M; i8 0.51 at 524k;
    i8x3 0.46 = tie at 524k; highest 0.56 vs ~0.46 at 2^18 but 0.32 at
    524k). split keeps the r3 cap."""
    kw = dict(weighted=True)
    # split (default): cap 2^18 (r3 fused_midslot_probe)
    assert ph.plan(3, (64, 64, 63), 1, **kw) == "factored"
    assert ph.plan(3, (64, 64, 64), 1, **kw) is None
    assert ph.plan(3, (64, 64, 64), 1, wmode="split", **kw) is None
    # int1: cap 2^20 — (1024, 1023)+1 slots fits, (1024, 1024)+1 exceeds
    assert ph.plan(2, (1024, 1023), 1, wmode="int1", **kw) == "factored"
    assert ph.plan(2, (1024, 1024), 1, wmode="int1", **kw) is None
    # int2 / i8 / i8x3: cap 2^19 (3 inputs — 2-input shapes ride joint2)
    for mode in ("int2", "i8", "i8x3"):
        assert ph.plan(3, (64, 64, 127), 1, wmode=mode, **kw) == "factored"
        assert ph.plan(3, (64, 64, 128), 1, wmode=mode, **kw) is None
    # int3/int4/highest: split-cost class, keep the 2^18 cap
    for mode in ("int3", "int4", "highest"):
        assert ph.plan(3, (64, 64, 63), 1, wmode=mode, **kw) == "factored"
        assert ph.plan(3, (64, 64, 64), 1, wmode=mode, **kw) is None
    # supports() sees the same per-mode boundary (single source of truth)
    import jax.numpy as jnp

    assert ph.supports(
        2, (1024, 1023), 1, weighted=True, weights_dtype=jnp.int32,
        wmode="int1",
    )
    assert not ph.supports(
        2, (1024, 1024), 1, weighted=True, weights_dtype=jnp.int32,
        wmode="int1",
    )
    # unweighted cap unaffected
    assert ph.plan(2, (1024, 1024), 1) == "factored"


def test_wmode_kahan_channel_tightens_weighted_gate():
    """highest mode carries one extra per-slot output (the Kahan
    compensation block), so its kept-row output bound (2^28 elements,
    plan()'s m*padded_slots*n_outs) is tighter than split's. supports()
    must reflect the per-call mode it is asked about."""
    import jax.numpy as jnp

    from xhistogram_tpu.ops import pallas_hist as ph

    nbins = (1024, 64)
    n_slots = 1024 * 64 + 1
    n1, log2_n2 = ph._pick_factorization(n_slots)
    padded = max(n1 << log2_n2, ph._round_up(n_slots, 1024))
    # n_outs: split = 1 counts + 3 faithful channels = 4; highest adds the
    # Kahan block = 5. Pick m inside the (2^28/5, 2^28/4] window.
    m = (1 << 28) // (padded * 5) + 1
    assert m * padded * 4 <= (1 << 28) < m * padded * 5
    kw = dict(weighted=True, c=1024, weights_dtype=jnp.float32)
    assert ph.supports(2, nbins, m, wmode="split", **kw)
    assert not ph.supports(2, nbins, m, wmode="highest", **kw)
    # and the default (env split) matches wmode=None
    assert ph.supports(2, nbins, m, wmode=None, **kw)
