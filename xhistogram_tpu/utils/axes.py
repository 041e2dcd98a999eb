"""Axis bookkeeping: static-shape canonicalization to a 2-D layout.

The whole compute path operates on a canonical 2-D view
``(kept_rows, reduce_cols)``: reduced axes are moved to the end and flattened,
kept (bystander) axes are flattened in front. This is the same canonical
layout as the reference's ``reshape_input`` (reference core.py:211-229), but
implemented as pure static-shape jnp transforms so it traces cleanly under
jit — axis sets are static arguments, and each distinct axis combination
compiles once.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = ["normalize_axis", "canonicalize_2d", "kept_shape"]


def normalize_axis(axis, ndim):
    """Normalize ``axis`` to a sorted tuple of unique non-negative ints.

    ``None`` (reduce everything) stays ``None``. Mirrors the reference's
    normalization loop (core.py:341-352) including the bounds check.
    """
    if axis is None:
        return None
    if isinstance(axis, (int,)):
        axis = (axis,)
    out = []
    for ax in axis:
        ax = int(ax)
        ax_pos = ax if ax >= 0 else ndim + ax
        if not (0 <= ax_pos < ndim):
            raise ValueError(
                f"axis {ax} is out of bounds for array of dimension {ndim}"
            )
        out.append(ax_pos)
    if len(set(out)) != len(out):
        raise ValueError(f"repeated axis in {axis}")
    return tuple(sorted(out))


def kept_shape(shape, axis):
    """Shape of the preserved (bystander) axes, in original order."""
    if axis is None:
        return ()
    return tuple(s for i, s in enumerate(shape) if i not in axis)


def flatten_keep_minor(a):
    """2-D view of all elements that preserves the minor (last) dimension.

    Merging leading dims keeps the tiled device layout intact, so — unlike a
    flatten to ``(1, size)`` — this is copy-free even when the result feeds a
    Pallas kernel (whose operands are materialized buffers). 1-D inputs are
    viewed as (N/k, k) for the largest power-of-two k ≤ 2048 dividing N, so
    the sublane dimension carries real work (a (1, N) layout would force an
    8x row-padding copy downstream); odd sizes fall back to (1, N)."""
    if a.ndim >= 2:
        return a.reshape(-1, a.shape[-1])
    n = max(a.size, 0)
    k = 2048
    while k >= 512 and (n % k or (n // k) % 8):
        k //= 2
    if k >= 512:
        return a.reshape(n // k, k)
    # awkward sizes: (1, n) — the kernels' synthetic-row fold turns this into
    # a well-tiled (8, ceil(n/8)) layout with correct tail masking
    return a.reshape(1, n)


def canonicalize_2d(a, axis):
    """Reshape ``a`` to ``(n_kept_rows, n_reduce_cols)``.

    ``axis=None`` reduces everything → ``(1, a.size)``. Otherwise the reduced
    axes are moved (in the given order) to the trailing positions and both
    groups are flattened. Static-shape equivalent of reference
    core.py:211-229.
    """
    if axis is None or set(axis) == set(range(a.ndim)):
        return a.reshape(1, max(a.size, 0))
    new_pos = tuple(range(-len(axis), 0))
    c = jnp.moveaxis(a, axis, new_pos)
    split = c.ndim - len(axis)
    m = math.prod(c.shape[:split])
    n = math.prod(c.shape[split:])
    return c.reshape(m, n)
