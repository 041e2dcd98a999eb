"""Bin-edge specification handling (host-side / trace-time).

Bin edges are *static* metadata for the TPU compute path: every kernel and the
jit-compiled pipeline treat ``len(edges)`` as a static shape. Resolution of
int/str bin specs (``bins=10``, ``bins="auto"``) requires concrete data, so it
happens eagerly on the host with numpy — exactly as the reference resolves
them via ``np.histogram_bin_edges`` (reference core.py:382-388). Traced (jit)
or sharded inputs must supply explicit edge arrays, the direct analog of the
reference's dask guard (reference core.py:377-381).

Semantics contracts replicated from the reference:
  - ``normalize_bins``  ~ ``_ensure_correctly_formatted_bins`` (core.py:37-48)
  - ``normalize_range`` ~ ``_ensure_correctly_formatted_range`` (core.py:51-70)
"""

from __future__ import annotations

import math
from collections.abc import Iterable
from typing import NamedTuple

import numpy as np

__all__ = [
    "normalize_bins",
    "normalize_range",
    "resolve_bin_edges",
    "is_traced",
    "bin_centers",
    "bin_widths",
    "bin_areas",
    "CompareEdges",
    "compare_form",
    "edges_for_compare",
]


def is_traced(x) -> bool:
    """True if ``x`` is an abstract JAX tracer (inside jit/vmap/etc.)."""
    import jax

    return isinstance(x, jax.core.Tracer)


def normalize_bins(bins, n_expected):
    """Normalize a bins spec to a per-input list of length ``n_expected``.

    Accepts an int, str, or 1-D array (applied to every input), or a list with
    one entry per input. Raises ``ValueError`` on missing bins or a length
    mismatch — the same contract as the reference (core.py:37-48).
    """
    if bins is None:
        raise ValueError("bins must be provided")
    if isinstance(bins, (int, str, np.ndarray)):
        bins = n_expected * [bins]
    if len(bins) == n_expected:
        return list(bins)
    raise ValueError("The number of bin definitions doesn't match the number of args")


def normalize_range(range_, n_expected):
    """Normalize a range spec to a per-input list of ``(lo, hi)`` or ``None``.

    Same contract as the reference (core.py:51-70): a single ``(lo, hi)`` pair
    is replicated per input; a list must have one pair per input.
    """

    def _iterable_nested(x):
        return all(isinstance(i, Iterable) for i in x)

    if range_ is None:
        return n_expected * [None]
    if (len(range_) == 2) and (not _iterable_nested(range_)):
        return n_expected * [range_]
    if len(range_) == n_expected:
        if all(len(x) == 2 for x in range_):
            return list(range_)
        raise ValueError(
            "range should be provided as (lower_range, upper_range). In the "
            "case of multiple args, range should be a list of such tuples"
        )
    raise ValueError("The number of ranges doesn't match the number of args")


def _view_datetime_as_int(x):
    """View datetime64/timedelta64 numpy data as int64 (order-preserving).

    JAX has no datetime dtype; binning only needs ordering, so datetime inputs
    and edges are viewed as int64 on the way in (preserves the reference's
    datetime support, test_core.py:365-382).
    """
    if isinstance(x, np.ndarray) and x.dtype.kind in "Mm":
        return x.view("i8")
    return x


def resolve_bin_edges(arrays, bins, range_=None, weights=None):
    """Resolve per-input bin specs to concrete 1-D numpy edge arrays.

    ``arrays`` are the (already broadcast-compatible) inputs. Explicit edge
    arrays pass through; int/str specs are resolved with
    ``np.histogram_bin_edges`` on host copies of the data — which requires
    concrete values, so traced inputs with non-array bins raise ``TypeError``
    (the jit analog of the reference's dask guard, core.py:377-381).

    Returns a list of numpy float/int edge arrays, one per input.
    """
    n = len(arrays)
    bins = normalize_bins(bins, n)
    ranges = normalize_range(range_, n)

    any_traced = any(is_traced(a) for a in arrays) or (
        weights is not None and is_traced(weights)
    )
    needs_data = [not isinstance(b, np.ndarray) for b in bins]
    if any_traced and any(needs_data):
        raise TypeError(
            "When inputs are traced (inside jit/vmap) or sharded, bins must be "
            "provided as numpy array(s) of edges: int/str bin specs require "
            "concrete data values to resolve"
        )

    edges = []
    arrs_np = None
    w_np = None
    for i, (b, r) in enumerate(zip(bins, ranges)):
        if isinstance(b, np.ndarray):
            edges.append(_view_datetime_as_int(np.asarray(b)))
            continue
        if arrs_np is None:
            # Host-side resolution path: estimator specs see the fully
            # broadcast data (and weights), matching the reference's
            # broadcast-before-resolve order (reference core.py:366-388) —
            # weights may have MORE dims than an individual input.
            arrs_np = [_view_datetime_as_int(np.asarray(a)) for a in arrays]
            if weights is not None:
                bc = np.broadcast_arrays(*arrs_np, np.asarray(weights))
                arrs_np, w_np = list(bc[:-1]), bc[-1]
            elif len(arrs_np) > 1:
                arrs_np = list(np.broadcast_arrays(*arrs_np))
        e = np.histogram_bin_edges(arrs_np[i], bins=b, range=r, weights=w_np)
        edges.append(e)
    return edges


def _min_int_cast_ge(e):
    """Smallest integer v with ``np.float64(v) >= e`` (e: finite float64).

    numpy histograms integer data against float edges by casting the data to
    float64 first (lossy above 2**53), so the exact integer threshold is the
    cast-rounding cutover, not ``ceil(e)``. The cutover lies within one ulp
    of the midpoint between ``e`` and its predecessor; a ≤3-step scan with
    ``float(v)`` (exact round-to-nearest-even) pins it, tie rule included.
    """
    from fractions import Fraction

    prev = float(np.nextafter(e, -np.inf))
    if math.isinf(prev):  # e is the most-negative finite float
        v = math.floor(float(e)) - 2
    else:
        m = (Fraction(prev) + Fraction(float(e))) / 2
        v = math.floor(m) - 1
    while float(v) < e:
        v += 1
    return v


def int_thresholds(edges, data_dtype=None):
    """Exact integer compare-form thresholds for integer data.

    Returns a list ``[t_0 .. t_{E-1}]`` of python ints (or ``±math.inf``)
    such that for any integer value v: bin k ⟺ ``t_k <= v < t_{k+1}``,
    below-range ⟺ ``v < t_0``, above-range ⟺ ``v >= t_{E-1}``. Float edges
    replicate numpy's semantics bit-exactly: numpy casts integer data to
    float64 before comparing (reference core.py:163-174 via searchsorted),
    so the thresholds are the cast-rounding cutovers (``_min_int_cast_ge``),
    which equal ``ceil(e)`` / ``floor(e_last)+1`` for values below 2**53 and
    follow numpy's lossy rounding above it. Fractional edges are never
    truncated against integer data (ADVICE r1).

    Integer edges follow numpy's promotion rule against ``data_dtype``:
    same-signedness pairs compare exactly in integers, but mixed
    int64/uint64 promotes to float64 in numpy, so BOTH sides go through the
    lossy cast — the thresholds must be the cast cutovers of the
    f64-rounded edges (found by hypothesis fuzzing, r2).
    """
    e = np.asarray(edges)
    n = e.shape[0]
    if np.issubdtype(e.dtype, np.integer):
        lossy = (
            data_dtype is not None
            and np.issubdtype(
                np.result_type(e.dtype, np.dtype(data_dtype)), np.floating
            )
        )
        if not lossy:
            return [int(v) for v in e[:-1]] + [int(e[-1]) + 1]
        e = e.astype(np.float64)  # numpy compares through this lossy cast
    ts = []
    for j in range(n):
        v = float(e[j])
        if math.isnan(v):
            raise ValueError("bin edges must not contain NaN")
        if j < n - 1:
            if math.isinf(v):
                ts.append(v)  # ±inf: beyond every representable integer
            else:
                ts.append(_min_int_cast_ge(v))
        else:
            # closed last bin: in-range ⟺ float64(v) <= e_last, so the
            # exclusive bound is the smallest int casting strictly above it
            if v == math.inf:
                ts.append(math.inf)
            elif v == -math.inf:
                ts.append(-math.inf)
            else:
                nxt = float(np.nextafter(v, np.inf))
                ts.append(
                    math.inf if math.isinf(nxt) else _min_int_cast_ge(nxt)
                )
    return ts


class CompareEdges(NamedTuple):
    """Device comparison form of a bin-edge array (see ``compare_form``)."""

    edges: np.ndarray  # half-open thresholds in the data dtype
    n_hi_clip: int  # thresholds clamped at the dtype's top value: a
    # digitize of ``v == top`` must subtract this count
    # (those thresholds are really above every value)


def compare_form(edges, dtype) -> CompareEdges:
    """Exact device-comparison form of a bin-edge array: half-open intervals
    in the data's dtype.

    Histogram semantics are defined by comparisons of data values against the
    (possibly wider-precision) edges: ``[e_k, e_{k+1})`` per bin, last bin
    closed (reference core.py:163-174). For data of dtype D, those
    wider-precision comparisons are *exactly* equivalent to D-native
    comparisons against transformed edges:

      - ``a >= e``  ⟺  ``a >= ceil_D(e)``  (smallest D value ≥ e)
      - ``a < e``   ⟺  ``a < ceil_D(e)``
      - ``a <= e_last`` (closed last bin)  ⟺  ``a < nextafter(floor_D(e_last))``

    so the returned array encodes every bin as half-open over dtype-D edges,
    with the closed last bin folded into an open upper bound — no equality
    fixups needed downstream, and bit-exact parity with numpy's float64 edge
    comparisons.

    Thresholds that land *above* the dtype's top value (int dtype max, or
    float +inf from a last edge exactly at +inf) cannot be represented as an
    exclusive bound; they are clamped to the top value and counted in
    ``n_hi_clip``: the digitize must subtract that count for elements equal
    to the top value (ops.digitize honors this).
    """
    e = np.asarray(edges)
    dtype = np.dtype(dtype)
    if np.issubdtype(dtype, np.integer):
        info = np.iinfo(dtype)
        ts = int_thresholds(e, data_dtype=dtype)
        clamped = [min(max(t, info.min), info.max) for t in ts]
        n_hi = sum(1 for t in ts if t > info.max)
        return CompareEdges(np.array(clamped, dtype=dtype), n_hi)

    # float data dtype: numpy promotes the comparison to float64, so
    # integer edge arrays FIRST go through the (lossy above 2**53) f64 cast
    # — exactly what numpy compares against (same promotion insight as the
    # mixed-signedness integer case in int_thresholds)
    if np.issubdtype(e.dtype, np.integer):
        e = e.astype(np.float64)
    cast = e.astype(dtype)
    wide = cast.astype(e.dtype) if e.dtype.itemsize > dtype.itemsize else cast
    # ceil-cast: bump edges that rounded down by one ulp
    bump = wide < e
    ceil_cast = np.where(
        bump, np.nextafter(cast, np.asarray(np.inf, dtype)), cast
    ).astype(dtype)
    # closed last bin → open upper bound at nextafter(floor_cast(e_last))
    last_cast = e[-1:].astype(dtype)
    last_wide = last_cast.astype(e.dtype)
    floor_cast = np.where(
        last_wide > e[-1:],
        np.nextafter(last_cast, np.asarray(-np.inf, dtype)),
        last_cast,
    ).astype(dtype)
    upper = np.nextafter(floor_cast, np.asarray(np.inf, dtype))
    # a last edge exactly at +inf means the closed last bin contains +inf
    # itself; there is no float strictly above +inf, so the exclusive bound
    # clamps at +inf and the digitize subtracts 1 for ``a == +inf``.
    n_hi = int(np.isinf(e[-1]) and e[-1] > 0)
    return CompareEdges(
        np.concatenate([ceil_cast[:-1], upper]).astype(dtype), n_hi
    )


def edges_for_compare(edges, dtype):
    """Back-compat wrapper: the edges array of ``compare_form`` (callers that
    need the top-value clip correction should use ``compare_form``)."""
    return compare_form(edges, dtype).edges


def bin_centers(edges):
    """Midpoints of a 1-D edge array (reference xarray.py:179)."""
    edges = np.asarray(edges)
    return 0.5 * (edges[:-1] + edges[1:])


def bin_widths(edges):
    return np.diff(np.asarray(edges))


def bin_areas(edges_list):
    """N-dimensional bin areas as the outer product of per-input bin widths.

    Mirrors the density normalization geometry of the reference
    (core.py:447-454): 1 input → widths; 2 → outer product; N → open-grid
    product.
    """
    widths = [bin_widths(e).astype(np.float64) for e in edges_list]
    area = widths[0]
    for w in widths[1:]:
        area = area[..., None] * w
    return area


def uniform_arith_form(thresholds):
    """``(t0, d)`` when the comparison thresholds admit an EXACT arithmetic
    reconstruction ``T[k] == f32(k*d + t0)`` with ``k*d`` exactly
    representable in float32 — the precondition for the kernels' O(1)
    arithmetic digitize (candidate index + recomputed-threshold window,
    ops/pallas_hist._digitize_tile_uniform). Returns ``None`` otherwise
    (the compare-chain digitize runs instead).

    float32 thresholds: the ``k*d``-exact requirement makes the
    reconstruction independent of FMA contraction (the product needs no
    rounding, so fused and unfused mul+add both round once) — Mosaic does
    not contract the expression but the CPU Pallas interpreter does
    (scripts/uniform_arith_probe.py); this condition is safe on both. It
    holds for integer-width and power-of-two-width uniform grids (d with
    few mantissa bits); irrational-step linspaces fall back. The threshold
    rounding must also stay well under the spacing (``ulp(max|T|) <= d/4``)
    so the kernel's ±2 candidate window is provably sufficient.

    integer thresholds (int data / host rank codes): exact uniformity in
    integer arithmetic plus ``|T| < 2^23`` (every threshold AND every
    nearby data value is exactly float32-representable, so the kernel's
    int→f32 cast cannot move a value across a threshold; far values round
    but cannot re-cross — see the design note in ops/pallas_hist).
    """
    T = np.asarray(thresholds)
    n = T.shape[0]
    # The half-open transform nudges the LAST threshold off the grid
    # (closed last bin), so the uniform model covers T[:-1] and the kernel
    # compares the final threshold explicitly as a scalar. Returns
    # (t0, d, t_last).
    if n < 3:
        return None
    U, t_last = T[:-1], float(T[-1])
    nu = n - 1
    if np.issubdtype(T.dtype, np.integer):
        U64 = U.astype(np.int64)
        diffs = np.diff(U64)
        if diffs.size == 0 or not np.all(diffs == diffs[0]) or diffs[0] <= 0:
            return None
        if max(abs(int(T64v)) for T64v in (U64[0], U64[-1], int(T[-1]))) >= 2**23:
            return None
        return float(U64[0]), float(diffs[0]), t_last
    if T.dtype != np.float32:
        return None
    if not np.all(np.isfinite(T)):
        return None
    t0 = np.float64(U[0])
    d = np.float32(np.float64(U[1]) - t0)
    if not np.isfinite(d) or d <= 0:
        return None
    k = np.arange(nu, dtype=np.float64)
    kf = k.astype(np.float32).astype(np.float64)
    if not np.array_equal(kf, k):
        return None  # k itself not f32-exact (cannot happen under edge cap)
    p = kf * np.float64(d)
    if not np.array_equal(p.astype(np.float32).astype(np.float64), p):
        return None  # k*d rounds in f32 → FMA-dependent reconstruction
    model = (p + t0).astype(np.float32)
    if not np.array_equal(model, U):
        return None
    max_abs = float(max(abs(U[0]), abs(U[-1])))
    if np.spacing(np.float32(max_abs)) > d / 4:
        return None
    return float(U[0]), float(d), t_last
