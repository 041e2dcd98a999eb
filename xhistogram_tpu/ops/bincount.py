"""Row-vectorized bincount strategies (pure-XLA implementations).

The innermost reduction of the whole library: given a canonical 2-D layout of
flat joint-bin indices ``g`` with shape ``(M rows, C cols)`` and optional
weights, produce per-row counts ``(M, n_slots)``. This is the TPU equivalent
of the reference's offset-bincount trick (reference core.py:73-83) — but TPUs
have no fast general scatter-add, so several reformulations are provided and
auto-selected:

  - ``scatter``: XLA scatter-add (``.at[].add``). General; performance is
    backend-dependent. Exactly the reference algorithm's semantics.
  - ``onehot``: one-hot compare + contraction, streamed over column blocks so
    the ``(M, block, n_slots)`` one-hot stays small (the analog of the
    reference's ``block_size`` memory bound, core.py:86-134). MXU-friendly;
    best for small-to-medium ``n_slots``.
  - ``sort``: per-row sort + bucket boundaries via searchsorted (weighted:
    cumulative-sum differences). O(C log C) but fully vectorized and
    deterministic; best for very large ``n_slots``.

All strategies return bit-identical integer counts (unweighted) and are
oracle-tested against ``np.bincount``/``np.histogramdd``. The Pallas TPU
kernel (ops/pallas_hist.py) is a fourth, fused strategy selected upstream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import nonfinite as _nonfinite

__all__ = [
    "bincount2d",
    "bincount2d_scatter",
    "bincount2d_onehot",
    "bincount2d_sort",
    "METHODS",
]

# Soft cap on the (M, block, n_slots) one-hot temp, in elements. Plays the
# role of the reference's _MAX_CHUNK_SIZE heuristic (core.py:114) but bounds
# VMEM-resident intermediates instead of a host temp array.
_ONEHOT_BUDGET = 4_000_000

# Cap on the sort strategy's transient (rows, n_slots + 1) bucket-boundary
# array, in elements (2^24 int32 = 64 MB): huge-slot reductions scan over
# chunk-row blocks instead of batching every chunk row at once.
_SORT_POS_BUDGET = 1 << 24

# Above this m × n_slots, the scatter strategy's fused row-offset index
# would overflow int32; it switches to 2-D (row, slot) scatter indices.
_SCATTER_FLAT_LIMIT = 2**31


def _counts_dtype(weights):
    return jnp.int32 if weights is None else weights.dtype


def bincount2d_scatter(g, weights, n_slots):
    """Scatter-add strategy: zeros(M*n_slots).at[offset-index].add(w).

    Semantically the reference's ``_bincount_2d`` (core.py:73-83) with the row
    offset fused; indices are in-bounds by construction.
    """
    m, c = g.shape
    if m * n_slots < _SCATTER_FLAT_LIMIT:
        offset = g + (n_slots * jnp.arange(m, dtype=g.dtype))[:, None]
        flat = offset.reshape(-1)
        if weights is None:
            out = jnp.zeros((m * n_slots,), jnp.int32).at[flat].add(
                1, mode="promise_in_bounds"
            )
        else:
            out = jnp.zeros((m * n_slots,), weights.dtype).at[flat].add(
                weights.reshape(-1), mode="promise_in_bounds"
            )
        return out.reshape(m, n_slots)
    # m * n_slots would overflow the int32 flat offset — scatter per row
    # instead (2-D indices, each component < 2**31 by construction)
    rows = jnp.broadcast_to(jnp.arange(m, dtype=g.dtype)[:, None], (m, c))
    if weights is None:
        return jnp.zeros((m, n_slots), jnp.int32).at[rows, g].add(
            1, mode="promise_in_bounds"
        )
    return jnp.zeros((m, n_slots), weights.dtype).at[rows, g].add(
        weights, mode="promise_in_bounds"
    )


def _auto_block(m, c, n_slots, block_size):
    if isinstance(block_size, int):
        return max(1, min(block_size, c))
    # 'auto' / None → bound the one-hot temp
    return max(1, min(c, _ONEHOT_BUDGET // max(1, m * n_slots)))


def bincount2d_onehot(g, weights, n_slots, block_size="auto"):
    """One-hot contraction strategy, streamed over column blocks.

    For each block of columns: ``onehot[m, b, n] = (g[m, b] == n)`` and
    ``counts[m, n] += sum_b w[m, b] * onehot[m, b, n]`` — a contraction XLA
    maps onto the MXU/VPU. Unweighted counts accumulate in int32 (exact).
    """
    m, c = g.shape
    block = _auto_block(m, c, n_slots, block_size)
    pad = (-c) % block
    if pad:
        # Padding elements are routed to a temporary extra slot and dropped.
        g = jnp.pad(g, ((0, 0), (0, pad)), constant_values=n_slots)
        if weights is not None:
            weights = jnp.pad(weights, ((0, 0), (0, pad)))
        n_internal = n_slots + 1
    else:
        n_internal = n_slots
    n_blocks = (c + pad) // block
    dtype = _counts_dtype(weights)
    faithful = _nonfinite.faithful_mode(weights)

    slots = jnp.arange(n_internal, dtype=g.dtype)

    def step(acc, args):
        if weights is None:
            (gb,) = args
            oh = (gb[:, :, None] == slots).astype(jnp.int32)
            return acc + oh.sum(axis=1), None
        gb, wb = args
        oh = gb[:, :, None] == slots
        ohw = oh.astype(wb.dtype)
        if not faithful:
            fin = acc + jnp.einsum(
                "mb,mbn->mn", wb, ohw, preferred_element_type=wb.dtype
            )
            return fin, None
        # sanitize + per-slot nonfinite indicator counts (ops/nonfinite.py)
        flags = _nonfinite.weight_flags(wb)
        wbf = _nonfinite.sanitize(wb, flags)
        fin = acc[0] + jnp.einsum(
            "mb,mbn->mn", wbf, ohw, preferred_element_type=wb.dtype
        )
        oh_i = oh.astype(jnp.int32)
        chans = tuple(
            a + jnp.einsum("mb,mbn->mn", fl.astype(jnp.int32), oh_i)
            for a, fl in zip(acc[1:], flags)
        )
        return (fin,) + chans, None

    g_blocks = g.reshape(m, n_blocks, block).transpose(1, 0, 2)
    xs = (g_blocks,)
    if weights is not None:
        xs = (g_blocks, weights.reshape(m, n_blocks, block).transpose(1, 0, 2))
    acc0 = jnp.zeros((m, n_internal), dtype)
    if faithful:
        acc0 = (acc0,) + tuple(
            jnp.zeros((m, n_internal), jnp.int32) for _ in range(3)
        )
    acc, _ = jax.lax.scan(step, acc0, xs)
    if faithful:
        counts = _nonfinite.resolve(acc[0], acc[1:])
        return counts[:, :n_slots]
    return acc[:, :n_slots]


def bincount2d_sort(g, weights, n_slots):
    """Sort-based strategy: per-row sort, then bucket boundary differences.

    ``counts[m, n] = pos(n+1) - pos(n)`` where ``pos(k)`` is the insertion
    point of ``k`` in the sorted row (weighted: differences of the inclusive
    weight prefix sum). Deterministic and O(C log C); the scalable choice for
    huge ``n_slots`` where one-hot work (O(C·n_slots)) explodes.

    Histograms are additive, so a single huge row is first split into chunk
    rows that sort independently (XLA parallelizes across rows, not within
    one), and the chunk partials are summed.
    """
    m, c = g.shape
    _CHUNK = 1 << 20
    if m == 1 and c > 2 * _CHUNK:
        k = -(-c // _CHUNK)
        # Bound the transient memory: the bucket-boundary positions are
        # (rows, n_slots + 1) int32 per sorted row batch — batching ALL k
        # chunk rows at huge n_slots allocates rows × slots (the r3 cap
        # measurements saw the weighted variant kill the TPU worker at
        # 2^24 slots × 256 chunk rows ≈ 17 GB). Scan over row blocks whose
        # positions stay ≤ _SORT_POS_BUDGET elements instead.
        rows_per_step = min(k, max(1, _SORT_POS_BUDGET // (n_slots + 1)))
        steps = -(-k // rows_per_step)
        k_pad = steps * rows_per_step
        pad = k_pad * _CHUNK - c
        # pad with the trash slot (n_slots - 1); subtract the padding from it
        gp = jnp.pad(g.reshape(-1), (0, pad), constant_values=n_slots - 1)
        wp = (
            jnp.pad(weights.reshape(-1), (0, pad))
            if weights is not None
            else None
        )
        if steps == 1:
            parts = bincount2d_sort(
                gp.reshape(k_pad, _CHUNK),
                wp.reshape(k_pad, _CHUNK) if wp is not None else None,
                n_slots,
            )
            total = parts.sum(axis=0, keepdims=True)
        else:
            xs = (gp.reshape(steps, rows_per_step, _CHUNK),)
            if wp is not None:
                xs += (wp.reshape(steps, rows_per_step, _CHUNK),)

            def step(acc, args):
                gb = args[0]
                wb = args[1] if wp is not None else None
                part = bincount2d_sort(gb, wb, n_slots)
                return acc + part.sum(axis=0, keepdims=True), None

            acc0 = jnp.zeros((1, n_slots), _counts_dtype(weights))
            total, _ = jax.lax.scan(step, acc0, xs)
        if weights is None and pad:
            total = total.at[0, n_slots - 1].add(-pad)
        return total
    slots = jnp.arange(n_slots + 1, dtype=g.dtype)
    if weights is None:
        gs = jnp.sort(g, axis=1)
        pos = jax.vmap(lambda row: jnp.searchsorted(row, slots, side="left"))(gs)
        return jnp.diff(pos, axis=1).astype(jnp.int32)
    gs, ws = jax.lax.sort_key_val(g, weights, dimension=1)
    faithful = _nonfinite.faithful_mode(weights)
    if faithful:
        # a nonfinite weight would poison the whole prefix-sum suffix
        # (inf - inf / NaN propagation); sanitize + indicator prefix sums
        flags = _nonfinite.weight_flags(ws)
        ws = _nonfinite.sanitize(ws, flags)
    cw = jnp.concatenate(
        [jnp.zeros((m, 1), weights.dtype), jnp.cumsum(ws, axis=1)], axis=1
    )
    pos = jax.vmap(lambda row: jnp.searchsorted(row, slots, side="left"))(gs)
    bounds = jnp.take_along_axis(cw, pos, axis=1)
    counts = jnp.diff(bounds, axis=1)
    if faithful:
        zero = jnp.zeros((m, 1), jnp.int32)
        chans = tuple(
            jnp.diff(
                jnp.take_along_axis(
                    jnp.concatenate(
                        [zero, jnp.cumsum(fl.astype(jnp.int32), axis=1)],
                        axis=1,
                    ),
                    pos,
                    axis=1,
                ),
                axis=1,
            )
            for fl in flags
        )
        counts = _nonfinite.resolve(counts, chans)
    return counts


METHODS = ("scatter", "onehot", "sort")


def bincount2d(g, weights, n_slots, method="auto", block_size="auto"):
    """Dispatch over bincount strategies (cf. reference ``_dispatch_bincount``,
    core.py:126-134 — but dispatching on algorithm, not just blocking).

    ``method='auto'`` picks by problem shape: one-hot work scales with
    ``n_slots`` per element, sort with ``log C``; scatter is the safe default
    on CPU where XLA scatter is fast.
    """
    if method == "auto":
        backend = jax.default_backend()
        if backend == "cpu":
            method = "scatter"
        else:
            # On TPU: scatter is ~flat 0.3-0.5 GB/s in n_slots (serial
            # updates, O(1)/element) and beat onehot 13x at 4096 slots and
            # sort 20-100x above 1M (scripts/fused_midslot_probe.py /
            # hugeslot_fallback_probe.py, r3 — the old sort rule also
            # crashed the worker at 2^24 slots). onehot's O(n_slots)/elem
            # contraction only wins at tiny slot counts (extrapolated
            # crossover ~300 slots from 0.039 GB/s at 4096).
            method = "onehot" if n_slots <= 256 else "scatter"
    if method == "scatter":
        return bincount2d_scatter(g, weights, n_slots)
    if method == "onehot":
        return bincount2d_onehot(g, weights, n_slots, block_size=block_size)
    if method == "sort":
        return bincount2d_sort(g, weights, n_slots)
    raise ValueError(f"unknown bincount method {method!r}; valid: {METHODS}")
