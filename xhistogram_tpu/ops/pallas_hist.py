"""Pallas TPU histogram kernel: fused digitize → joint index → MXU counting.

This is the framework's native layer — the TPU equivalent of the numpy C
kernels the reference reaches through ``searchsorted`` / ``ravel_multi_index``
/ ``bincount`` (reference core.py:10-17, hot loop core.py:73-83,163-186). One
kernel fuses the whole inner pipeline over VMEM-resident tiles so each input
element is read from HBM exactly once:

  1. **digitize** — branchless compare-sum against edge chunks broadcast on a
     leading axis: ``idx = Σ_e (a >= edge_e)`` reproduces
     ``searchsorted(side="right")``; the last bin's right edge is closed via
     an explicit ``a == last_edge`` fixup, and NaNs fail every compare →
     idx 0 → invalid (same final result as numpy's NaN→overflow→trimmed
     routing).
  2. **joint index** — per-input trimmed bins are fused into one flat slot id
     with a trailing *trash* slot for out-of-range/NaN/padding elements
     (replaces ``ravel_multi_index`` + the ``[1:-1]`` trim).
  3. **count** — TPUs have no fast scatter, so counting is a matmul on the
     MXU: ``counts(tm, chunk) += R(tm, E) ·ᵉ G(chunk, E)`` (contraction over
     the tile's E elements on the minor dim of both operands), where ``R`` is
     the row/weight one-hot and ``G`` the slot one-hot. One-hots are built
     with rank-2 ``(N,1) == (1,E)`` broadcasts — no unsupported shape casts
     (op support verified empirically per chip; see scripts/mosaic_probe.py).
     Unweighted counts use bf16 one-hots with f32 MXU accumulation (exact:
     per-tile partials ≤ E < 2²⁴) and accumulate in int32; weighted counts
     keep an f32 weight one-hot and accumulate in f32.

The grid walks (row tiles, slot chunks, column tiles); the output block for a
(row, slot-chunk) pair is revisited across column steps and accumulated
in-place — the sequential TPU grid makes this deterministic (SURVEY.md §5
race-detection note).

Slot-chunking bounds VMEM (the one-hot ``G`` is (slot_chunk, E)); the chunk
size is the Pallas analog of the reference's ``block_size`` memory bound
(core.py:86-134).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_histogram2d", "supports"]

_LANE = 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def supports(n_slots, n_inputs, dtype) -> bool:
    """Whether the direct one-hot kernel is the right tool for this shape."""
    del n_inputs, dtype
    return n_slots <= 8192


def _pick_tiles(n_slots_pad):
    """Tile geometry under a VMEM budget for the one-hot G (slot_chunk, E)."""
    tm = 8
    tc = 512
    slot_chunk = min(n_slots_pad, 1024)
    budget_elems = 1 << 20  # 4 MiB of f32
    while tm * tc * slot_chunk > budget_elems and tc > _LANE:
        tc //= 2
    while tm * tc * slot_chunk > budget_elems and slot_chunk > _LANE:
        slot_chunk //= 2
    return tm, tc, slot_chunk


def _hist_kernel(
    *refs,
    n_inputs,
    nbins,
    n_edges,
    m_true,
    c_true,
    slot_chunk,
    weighted,
):
    """Kernel body. refs = [in_0..in_{k-1}, (weights?), edge_0..edge_{k-1}, out]."""
    data_refs = refs[:n_inputs]
    pos = n_inputs
    w_ref = None
    if weighted:
        w_ref = refs[pos]
        pos += 1
    edge_refs = refs[pos : pos + n_inputs]
    out_ref = refs[pos + n_inputs]

    i = pl.program_id(0)  # row tile
    n = pl.program_id(1)  # slot chunk
    j = pl.program_id(2)  # column tile

    tm, tc = data_refs[0].shape
    e_elems = tm * tc

    # --- masks for padded rows/cols ---------------------------------------
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tm, tc), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tm, tc), 1)
    in_bounds = (i * tm + row_ids < m_true) & (j * tc + col_ids < c_true)

    # --- fused digitize + joint trimmed index ------------------------------
    g = None
    valid = in_bounds
    for k in range(n_inputs):
        a = data_refs[k][...]
        edges = edge_refs[k]  # (n_edges_pad, 1) column, padded with +max
        ne = n_edges[k]
        ne_pad = edges.shape[0]
        # branchless searchsorted(side='right'): count edges <= a, with the
        # edge chunk broadcast on a leading axis (rank-3, leading-axis sum).
        idx = jnp.zeros((tm, tc), jnp.int32)
        for e0 in range(0, ne_pad, _LANE):
            chunk = edges[e0 : e0 + _LANE, :]  # (LANE, 1)
            cmp = a[None, :, :] >= chunk[:, :, None]  # (LANE, tm, tc)
            idx = idx + jnp.sum(cmp.astype(jnp.int32), axis=0)
        last_edge = edges[ne - 1, 0]
        idx = jnp.where(a == last_edge, idx - 1, idx)  # closed last bin
        t = idx - 1
        ok = (t >= 0) & (t <= nbins[k] - 1)
        valid = valid & ok
        t = jnp.clip(t, 0, nbins[k] - 1)
        g = t if g is None else g * nbins[k] + t
    n_real = math.prod(nbins)
    g = jnp.where(valid, g, n_real)  # trash slot

    # --- one-hot matmul counting -------------------------------------------
    oh_dtype = jnp.float32 if weighted else jnp.bfloat16

    g_row = g.reshape(1, e_elems)  # (tm,tc)->(1,E): supported shape cast
    slot_base = n * slot_chunk
    slot_col = slot_base + jax.lax.broadcasted_iota(
        jnp.int32, (slot_chunk, 1), 0
    )
    G = (slot_col == g_row).astype(oh_dtype)  # (slot_chunk, E)

    row_flat = row_ids.reshape(1, e_elems)
    m_col = jax.lax.broadcasted_iota(jnp.int32, (tm, 1), 0)
    R = (m_col == row_flat).astype(oh_dtype)  # (tm, E)
    if weighted:
        R = R * w_ref[...].reshape(1, e_elems)

    counts = jax.lax.dot_general(
        R,
        G,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (tm, slot_chunk)

    @pl.when(j == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += counts.astype(out_ref.dtype)


def pallas_histogram2d(arrays_2d, edges, weights_2d, nbins, interpret=None):
    """Fused Pallas histogram over the canonical 2-D layout.

    Parameters
    ----------
    arrays_2d : list of (M, C) arrays (one per histogram input, equal shapes)
    edges : list of 1-D edge arrays (dtype matching each input)
    weights_2d : (M, C) array or None
    nbins : static tuple, real bin count per input (len(edges_i) - 1)

    Returns
    -------
    counts : (M, prod(nbins) + 1) — trailing slot is the trash slot, to be
        dropped by the caller (same contract as ops.bincount strategies after
        ``joint_bin_index``).
    """
    n_inputs = len(arrays_2d)
    m, c = arrays_2d[0].shape
    n_real = math.prod(int(b) for b in nbins)
    n_slots = n_real + 1
    n_slots_pad = _round_up(n_slots, _LANE)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    tm, tc, slot_chunk = _pick_tiles(n_slots_pad)
    m_pad = _round_up(max(m, 1), tm)
    c_pad = _round_up(max(c, 1), tc)
    n_chunks = -(-n_slots_pad // slot_chunk)
    n_slots_pad = n_chunks * slot_chunk  # keep chunks uniform

    weighted = weights_2d is not None
    out_dtype = jnp.int32 if not weighted else jnp.float32
    if weighted:
        weights_2d = weights_2d.astype(jnp.float32)

    padded_inputs = []
    for a in arrays_2d:
        padded_inputs.append(jnp.pad(a, ((0, m_pad - m), (0, c_pad - c))))
    if weighted:
        w = jnp.pad(weights_2d, ((0, m_pad - m), (0, c_pad - c)))

    edge_ops = []
    n_edges = []
    for e in edges:
        e = jnp.asarray(e)
        ne = e.shape[0]
        n_edges.append(ne)
        ne_pad = _round_up(ne, _LANE)
        if jnp.issubdtype(e.dtype, jnp.floating):
            fill = jnp.array(jnp.inf, e.dtype)
        else:
            fill = jnp.array(jnp.iinfo(e.dtype).max, e.dtype)
        e = jnp.pad(e, (0, ne_pad - ne), constant_values=fill)
        edge_ops.append(e.reshape(ne_pad, 1))

    grid = (m_pad // tm, n_chunks, c_pad // tc)

    in_specs = [
        pl.BlockSpec((tm, tc), lambda i, n, j: (i, j), memory_space=pltpu.VMEM)
        for _ in range(n_inputs)
    ]
    operands = list(padded_inputs)
    if weighted:
        in_specs.append(
            pl.BlockSpec((tm, tc), lambda i, n, j: (i, j), memory_space=pltpu.VMEM)
        )
        operands.append(w)
    for e in edge_ops:
        in_specs.append(
            pl.BlockSpec(e.shape, lambda i, n, j: (0, 0), memory_space=pltpu.VMEM)
        )
        operands.append(e)

    kernel = partial(
        _hist_kernel,
        n_inputs=n_inputs,
        nbins=tuple(int(b) for b in nbins),
        n_edges=tuple(n_edges),
        m_true=m,
        c_true=c,
        slot_chunk=slot_chunk,
        weighted=weighted,
    )

    counts = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tm, slot_chunk), lambda i, n, j: (i, n), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_slots_pad), out_dtype),
        interpret=interpret,
    )(*operands)

    if not weighted:
        counts = counts.astype(jnp.int32)
    return counts[:m, :n_slots]
