"""Digitize + joint-bin indexing (jnp reference implementations).

Semantics contract (identical to reference core.py:157-192, verified by the
oracle tests against numpy):

  ``digitize_edges(a, edges)`` returns, per element, an index in
  ``[0, len(edges)]`` with numpy-``searchsorted(side="right")`` semantics plus
  the histogram right-edge fixup:

    - 0              → a <  edges[0]            (below range)
    - i              → edges[i-1] <= a < edges[i]
    - len(edges)-1   → edges[-2]  <= a <= edges[-1]  (last bin closed)
    - len(edges)     → a >  edges[-1] or NaN    (above range; trimmed later)

  NaN routing is explicit: numpy's sort order places NaN last, so
  ``np.searchsorted`` sends NaN to the overflow slot; a naive branchless
  compare-sum would send it to 0 instead (SURVEY.md §7 "hard parts"), so we
  ``where(isnan, overflow, ...)``.

  ``joint_bin_index`` fuses the reference's out-of-range trim
  (core.py:189-192) into the index computation: instead of counting into
  ``prod(len(edges_i)+1)`` slots and slicing ``[1:-1]`` per axis afterwards, a
  single trailing *trash slot* receives every element that is out of range (or
  NaN) on any input, and the trash column is dropped after counting. The
  surviving slot space is exactly the trimmed histogram, bit-identical to the
  reference's trim.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp

from .ftz import fix_neg_subnormals

__all__ = ["digitize_edges", "joint_bin_index"]

# On TPU, jnp.searchsorted lowers to a per-element gather binary search —
# measured ~180 ns/element on v5e regardless of edge count (it dominated
# the whole XLA-strategy pipeline: a 2-input digitize cost ~1.8 s per 1e7
# elements while the scatter bincount itself took 0.08-0.12 s,
# scripts/fused_midslot_probe.py). The branchless compare-sum
# ``idx = sum(a >= edges)`` computes the identical count (side='right'
# insertion = number of edges <= a) as a VPU-vectorized reduce instead.
# It is O(n_edges)/element, so beyond ~2^13 edges the log-cost gather
# search wins back; below, compare-sum is orders faster.
_CMP_EDGE_LIMIT = 8192
# elements x edges budget for one compare block (bounds the broadcast
# intermediate if XLA declines to fuse the compare into the reduce)
_CMP_BLOCK_ELEMS = 1 << 24
# override: "auto" (TPU only), "1" (always), "0" (never) — "1" lets the
# CPU-backend test suite pin compare-sum/searchsorted parity
_CMP_MODE = os.environ.get("XHIST_DIGITIZE_CMP", "auto")
if _CMP_MODE not in ("auto", "0", "1"):
    raise ValueError(
        f"XHIST_DIGITIZE_CMP must be 'auto', '0' or '1', got {_CMP_MODE!r}"
    )

# Beyond the compare-sum edge limit the XLA path can still avoid the
# searchsorted gather search when the input carries a uniform-spacing
# certificate: the kernels' O(1) arithmetic/DS digitize is pure jnp and
# runs under plain XLA with the same bit-exactness guarantees (the DS op
# sequence is FMA/contraction-independent by construction and the whole
# kernel suite already executes it under XLA:CPU in interpret mode).
# Consuming the certificate bakes its values into the jit cache key (one
# trace per grid) — worth it only where the alternative is the ~180
# ns/element searchsorted, hence the same edge threshold. Same override
# semantics as XHIST_DIGITIZE_CMP ("1" lets CPU tests pin parity).
_XLA_UNI_MODE = os.environ.get("XHIST_XLA_UNIFORM", "auto")
if _XLA_UNI_MODE not in ("auto", "0", "1"):
    raise ValueError(
        "XHIST_XLA_UNIFORM must be 'auto', '0' or '1', got "
        f"{_XLA_UNI_MODE!r}"
    )


def uniform_wanted_xla(form, n_edges, n_hi_clip):
    """Whether the XLA digitize should consume this input's uniform
    certificate (mirrored by core._uniform_static_key so the jit cache key
    keeps exactly the certificate values the trace reads)."""
    if form is None or len(form) < 2:
        return False  # absent, or a static-key tier placeholder
    if n_hi_clip:
        return False  # top-value clip correction not modeled by the O(1) form
    if _XLA_UNI_MODE == "0":
        return False
    if _XLA_UNI_MODE == "1":
        return True
    return jax.default_backend() == "tpu" and n_edges > _CMP_EDGE_LIMIT


def _compare_sum_right(a, edges, dtype):
    """``searchsorted(edges, a, side='right')`` as a blocked broadcast
    compare-sum — bit-identical by construction (same comparisons under the
    same dtype promotion; only the counting differs)."""
    n_edges = edges.shape[0]
    flat = a.reshape(-1)
    n = flat.shape[0]
    block = max(1, _CMP_BLOCK_ELEMS // n_edges)
    if n <= block:
        return (
            (flat[:, None] >= edges[None, :])
            .sum(axis=1, dtype=dtype)
            .reshape(a.shape)
        )
    def one_block(ab):
        return (ab[:, None] >= edges[None, :]).sum(axis=1, dtype=dtype)

    # Full blocks via lax.map; the ragged tail is its own (smaller) block —
    # padding the input instead would materialize a full-array copy on the
    # hot path (the hidden-pad-copy class the r3 kernels eliminated).
    steps = n // block
    tail = n - steps * block
    main = jax.lax.map(one_block, flat[: steps * block].reshape(steps, block))
    parts = [main.reshape(-1)]
    if tail:
        parts.append(one_block(flat[steps * block :]))
    idx = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    return idx.reshape(a.shape)


def digitize_edges(a, edges, dtype=jnp.int32, n_hi_clip=0):
    """Vectorized searchsorted-right against *half-open comparison edges*.

    ``edges`` must be sorted ascending and already in the half-open
    comparison form produced by ``bins.compare_form`` (the closed last
    bin is encoded as an open upper bound, so no equality fixup is needed —
    same final semantics as reference core.py:163-174). Works elementwise on
    any-shaped ``a``; returns ``dtype`` indices in ``[0, len(edges)]``.

    ``n_hi_clip`` (static, from ``bins.compare_form``): number of thresholds
    whose true value lies *above* the dtype's top value (int max / +inf) and
    were clamped to it. Such a threshold is never really ≤ any value, but the
    clamped edge compares ≤ the top value itself — so elements equal to the
    top value subtract the count. This keeps e.g. ``a == iinfo.max`` in the
    closed last bin when the last edge is at or beyond the dtype max (exact
    numpy parity at the dtype boundary).
    """
    edges = jnp.asarray(edges)
    n_edges = edges.shape[0]
    # FTZ exactness fix, shared with the pallas kernels (ops/ftz.py):
    # XLA:TPU comparisons flush subnormal operands to ±0, which would move
    # a negative-subnormal value across a t == 0.0 threshold.
    a = fix_neg_subnormals(a)
    use_cmp = _CMP_MODE == "1" or (
        _CMP_MODE == "auto"
        and jax.default_backend() == "tpu"
        and n_edges <= _CMP_EDGE_LIMIT
    )
    if use_cmp:
        idx = _compare_sum_right(a, edges, dtype)
    else:
        idx = jnp.searchsorted(edges, a, side="right").astype(dtype)
    if n_hi_clip:
        if jnp.issubdtype(a.dtype, jnp.floating):
            top = jnp.asarray(jnp.inf, a.dtype)
        else:
            top = jnp.asarray(jnp.iinfo(a.dtype).max, a.dtype)
        idx = idx - jnp.asarray(n_hi_clip, dtype) * (a == top).astype(dtype)
    if jnp.issubdtype(a.dtype, jnp.floating):
        # numpy sorts NaN after +inf → overflow slot (reference behavior:
        # NaNs digitize to the top slot then get trimmed, SURVEY.md §2.1).
        idx = jnp.where(jnp.isnan(a), jnp.asarray(n_edges, dtype), idx)
    return idx


def joint_bin_index(indices, nbins):
    """Combine per-input digitize indices into a flat *trimmed* joint index.

    Parameters
    ----------
    indices : list of equally-shaped integer arrays in ``[0, len(edges_i)]``
        (raw digitize output, per input).
    nbins : list of int — number of *real* bins per input,
        ``len(edges_i) - 1``.

    Returns
    -------
    g : flat joint index in ``[0, n_slots)``, where the last slot
        (``n_slots - 1``) is the trash slot for any out-of-range/NaN element.
    n_slots : ``prod(nbins) + 1`` (static int).
    """
    assert len(indices) == len(nbins) and len(indices) >= 1
    g = None
    valid = None
    for idx, nb in zip(indices, nbins):
        t = idx - 1  # slot 1..nb maps to bin 0..nb-1
        ok = (t >= 0) & (t <= nb - 1)
        valid = ok if valid is None else (valid & ok)
        t = jnp.clip(t, 0, nb - 1)
        g = t if g is None else g * nb + t
    n_real = math.prod(int(nb) for nb in nbins)
    if n_real + 1 > jnp.iinfo(jnp.int32).max:
        raise ValueError(
            f"joint histogram has {n_real} bins, which overflows int32 indexing"
        )
    g = jnp.where(valid, g, n_real)
    return g.astype(jnp.int32), n_real + 1
