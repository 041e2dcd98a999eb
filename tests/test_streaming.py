"""StreamingHistogram: chunked accumulation must equal the one-shot result
(the out-of-core contract the reference gets from dask blockwise + tree-sum,
reference core.py:403-439; chunking suites test_chunking*.py)."""

import numpy as np
import pytest

from xhistogram_tpu import StreamingHistogram
from xhistogram_tpu.core import histogram

bins9 = np.linspace(-4, 4, 10)


def chunks(a, n, axis):
    return np.array_split(a, n, axis=axis)


@pytest.mark.parametrize("n_chunks", [1, 3, 7])
def test_streaming_1d_reduce_all(n_chunks):
    rng = np.random.RandomState(0)
    data = rng.randn(1000).astype("f4")
    acc = StreamingHistogram(bins=bins9)
    for ch in chunks(data, n_chunks, 0):
        acc.update(ch)
    h, edges = acc.result()
    h_ref, _ = histogram(data, bins=bins9)
    np.testing.assert_array_equal(np.asarray(h), np.asarray(h_ref))
    np.testing.assert_array_equal(np.asarray(h), np.histogram(data, bins9)[0])


@pytest.mark.parametrize("n_chunks", [2, 5])
def test_streaming_kept_axis_weighted_density(n_chunks):
    rng = np.random.RandomState(1)
    data = rng.randn(4, 300).astype("f4")
    w = rng.rand(4, 300).astype("f4")
    acc = StreamingHistogram(bins=bins9, axis=1)
    for dc, wc in zip(chunks(data, n_chunks, 1), chunks(w, n_chunks, 1)):
        acc.update(dc, weights=wc)
    h, _ = acc.result(density=True)
    h_ref, _ = histogram(data, bins=bins9, axis=1, weights=w, density=True)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                               rtol=1e-4, atol=1e-6)


def test_streaming_joint_2input():
    rng = np.random.RandomState(2)
    a = rng.randn(6, 200).astype("f4")
    b = rng.randn(6, 200).astype("f4")
    ba = np.linspace(-4, 4, 9)
    bb = np.linspace(-4, 4, 12)
    acc = StreamingHistogram(bins=[ba, bb], axis=1)
    for ac, bc in zip(chunks(a, 4, 1), chunks(b, 4, 1)):
        acc.update(ac, bc)
    h, _ = acc.result()
    h_ref, _ = histogram(a, b, bins=[ba, bb], axis=1)
    np.testing.assert_array_equal(np.asarray(h), np.asarray(h_ref))


def test_streaming_error_contracts():
    with pytest.raises(TypeError):
        StreamingHistogram(bins=10)  # int spec needs global data
    with pytest.raises(TypeError):
        StreamingHistogram(bins="auto")
    with pytest.raises(TypeError):
        StreamingHistogram(bins=bins9, range=(0, 1))
    acc = StreamingHistogram(bins=[bins9, bins9])
    with pytest.raises(ValueError):
        acc.update(np.zeros(4, "f4"))  # one array, two bins entries
    acc2 = StreamingHistogram(bins=bins9)
    with pytest.raises(ValueError):
        acc2.result()
    acc3 = StreamingHistogram(bins=bins9, axis=1)
    acc3.update(np.zeros((3, 8), "f4"))
    with pytest.raises(ValueError):
        acc3.update(np.zeros((4, 8), "f4"))  # kept axis changed


def test_streaming_counts_property_and_chaining():
    acc = StreamingHistogram(bins=bins9)
    assert acc.counts is None
    out = acc.update(np.array([0.5, 0.6], "f4")).update(
        np.array([0.7], "f4")
    )
    assert out is acc
    assert int(np.asarray(acc.counts).sum()) == 3


def test_streaming_int64_accumulation():
    """Streaming counts accumulate in host int64 — the reference's dtype
    contract (core.py:363), with no int32 cap across chunks."""
    acc = StreamingHistogram(bins=np.array([0.0, 1.0]))
    acc.update(np.full(100, 0.5, "f4"))
    assert acc.counts.dtype == np.int64
    acc._blocks[()][0] = 2**31  # simulate a huge accumulated total
    acc.update(np.full(3, 0.5, "f4"))
    h, _ = acc.result()
    assert int(h[0]) == 2**31 + 3  # would wrap in int32


def test_core_int32_overflow_guard():
    """core.histogram refuses unweighted reductions whose per-row element
    count could overflow int32 counts, pointing at StreamingHistogram."""
    import jax

    big = jax.ShapeDtypeStruct((2**31,), np.float32)
    with pytest.raises(ValueError, match="StreamingHistogram"):
        jax.eval_shape(
            lambda x: histogram(x, bins=np.array([0.0, 1.0]))[0], big
        )


def test_streaming_list_edges_accepted():
    acc = StreamingHistogram(bins=[0.0, 0.5, 1.0])
    acc.update(np.array([0.25, 0.75, 0.75], "f4"))
    np.testing.assert_array_equal(acc.counts, [1, 2])
    acc2 = StreamingHistogram(bins=[[0.0, 0.5, 1.0], [0.0, 1.0]])
    acc2.update(np.array([0.25], "f4"), np.array([0.5], "f4"))
    assert acc2.counts.shape == (2, 1)


def test_streaming_weighted_unweighted_mix_rejected():
    acc = StreamingHistogram(bins=np.array([0.0, 1.0]))
    acc.update(np.array([0.5], "f4"), weights=np.array([2.0], "f4"))
    with pytest.raises(ValueError, match="mix weighted"):
        acc.update(np.array([0.5], "f4"))


def test_streaming_ambiguous_int_list_rejected():
    with pytest.raises(TypeError, match="ambiguous"):
        StreamingHistogram(bins=[10, 20])


def test_streaming_failed_first_update_does_not_pin_mode():
    acc = StreamingHistogram(bins=np.array([0.0, 1.0]))
    with pytest.raises(Exception):
        acc.update(np.zeros(4, "f4"),
                   weights=np.zeros((3, 7), "f4"))  # broadcast error
    # a valid unweighted chunk must still be accepted
    acc.update(np.array([0.5], "f4"))
    assert int(acc.counts[0]) == 1


# --------------------------------------------------------------------------
# chunked KEPT dims (r3): the reference's blockwise path tiles bystander
# axes natively (kept axes become singleton blocks that concatenate,
# reference core.py:418,429-437) — kept_offset closes that generality gap.


def test_streaming_kept_offset_blocks_1d():
    rng = np.random.RandomState(7)
    data = rng.randn(6, 8).astype("f4")
    edges = np.linspace(-2.5, 2.5, 6)
    acc = StreamingHistogram(bins=edges, axis=1)
    # tile BOTH the kept axis (rows, blocks of 3) and the reduced axis
    for r0 in (0, 3):
        for c0 in (0, 4):
            acc.update(data[r0 : r0 + 3, c0 : c0 + 4], kept_offset=(r0,))
    h, _ = acc.result()
    expected = np.stack([np.histogram(r, bins=edges)[0] for r in data])
    np.testing.assert_array_equal(np.asarray(h), expected)


def test_streaming_kept_offset_uneven_blocks():
    rng = np.random.RandomState(8)
    data = rng.randn(7, 30).astype("f4")
    acc = StreamingHistogram(bins=bins9, axis=1)
    # uneven kept blocks: rows [0:2), [2:7)
    for r0, r1 in ((0, 2), (2, 7)):
        for ch in chunks(data[r0:r1], 3, 1):
            acc.update(ch, kept_offset=(r0,))
    h, _ = acc.result()
    h_ref, _ = histogram(data, bins=bins9, axis=1)
    np.testing.assert_array_equal(np.asarray(h), np.asarray(h_ref))


def test_streaming_kept_offset_2d_weighted_density():
    rng = np.random.RandomState(9)
    data = rng.randn(4, 6, 50).astype("f4")
    w = rng.rand(4, 6, 50).astype("f4")
    acc = StreamingHistogram(bins=bins9, axis=2)
    for r0 in (0, 2):
        for s0 in (0, 3):
            for k in range(2):
                sl = (slice(r0, r0 + 2), slice(s0, s0 + 3),
                      slice(k * 25, (k + 1) * 25))
                acc.update(data[sl], weights=w[sl], kept_offset=(r0, s0))
    h, _ = acc.result(density=True)
    h_ref, _ = histogram(data, bins=bins9, axis=2, weights=w, density=True)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), rtol=1e-6)


def test_streaming_kept_offset_gap_rejected():
    rng = np.random.RandomState(10)
    acc = StreamingHistogram(bins=bins9, axis=1)
    acc.update(rng.randn(2, 10).astype("f4"), kept_offset=(0,))
    acc.update(rng.randn(2, 10).astype("f4"), kept_offset=(3,))  # gap at 2
    with pytest.raises(ValueError, match="tile"):
        acc.result()


def test_streaming_kept_offset_bad_length_rejected():
    rng = np.random.RandomState(11)
    acc = StreamingHistogram(bins=bins9, axis=1)
    with pytest.raises(ValueError, match="kept_offset"):
        acc.update(rng.randn(2, 10).astype("f4"), kept_offset=(0, 0))


def test_streaming_single_nonzero_offset_rejected():
    """One block at a nonzero kept_offset does NOT tile the output — the
    single-block stitch shortcut must not silently return it as the full
    result (it would drop the gap rows and misplace the block at 0)."""
    rng = np.random.RandomState(12)
    acc = StreamingHistogram(bins=bins9, axis=1)
    acc.update(rng.randn(3, 10).astype("f4"), kept_offset=(5,))
    with pytest.raises(ValueError, match="tile"):
        acc.result()
    with pytest.raises(ValueError, match="tile"):
        acc.counts


def test_streaming_blocks_property_mid_stream():
    """`blocks` exposes per-offset accumulated state even while the
    streamed blocks do not yet tile (counts raises there) — the
    monitoring/checkpoint surface for out-of-order kept streaming."""
    rng = np.random.RandomState(13)
    acc = StreamingHistogram(bins=bins9, axis=1)
    assert acc.blocks is None
    x0 = rng.randn(2, 10).astype("f4")
    acc.update(x0, kept_offset=(3,))  # out-of-order arrival
    with pytest.raises(ValueError, match="tile"):
        acc.counts
    blocks = acc.blocks
    assert set(blocks) == {(3,)}
    exp0 = np.stack([
        np.histogram(r.astype("f8"), bins=bins9)[0] for r in x0
    ])
    np.testing.assert_array_equal(blocks[(3,)], exp0)
    # views are read-only: the live accumulators back them
    with pytest.raises(ValueError):
        blocks[(3,)][0, 0] = 99
    # completing the tiling makes counts/result available again
    acc.update(rng.randn(3, 10).astype("f4"), kept_offset=(0,))
    assert acc.counts.shape == (5, len(bins9) - 1)
