"""numpy-signature convenience wrappers: drop-in ``histogram`` /
``histogram2d`` / ``histogramdd`` running on the TPU pipeline.

The reference's users often mix ``xhistogram.core.histogram`` with plain
``np.histogram*`` calls for full reductions; these wrappers let that code
move wholesale. Semantics follow numpy (density, range, weights, the
closed last bin); bin RESOLUTION of int/str specs happens host-side and
therefore needs concrete data, exactly like ``core.histogram``.

numpy signature sources: ``np.histogram(a, bins=10, range=None, ...)``,
``np.histogram2d(x, y, bins=10, ...)`` (bins may be [int, int] /
[array, array] / int / array), ``np.histogramdd(sample, bins=10, ...)``
(sample is (N, D) or a length-D sequence of length-N arrays).
"""

from __future__ import annotations

import numpy as np

from .core import histogram as _histogram

__all__ = ["histogram", "histogram2d", "histogramdd"]

# `range` is a histogram keyword below (numpy's API does the same dance)
_builtin_range = range


def histogram(a, bins=10, range=None, weights=None, density=False,
              **kwargs):
    """np.histogram-compatible: full reduction of one input."""
    h, edges = _histogram(
        a, bins=bins, range=range, weights=weights, density=density,
        **kwargs,
    )
    return h, edges[0]


def _split_2d_bins(bins):
    """np.histogram2d's bins convention → per-input list."""
    if isinstance(bins, (list, tuple)):
        if len(bins) == 2:
            return list(bins)
        raise ValueError(
            "histogram2d bins must be an int, a 1-D edge array, or a "
            "length-2 sequence thereof"
        )
    return [bins, bins]


def histogram2d(x, y, bins=10, range=None, weights=None, density=False,
                **kwargs):
    """np.histogram2d-compatible: joint histogram of two 1-D inputs."""
    h, edges = _histogram(
        np.asarray(x) if not hasattr(x, "dtype") else x,
        np.asarray(y) if not hasattr(y, "dtype") else y,
        bins=_split_2d_bins(bins),
        range=range,
        weights=weights,
        density=density,
        **kwargs,
    )
    return h, edges[0], edges[1]


def histogramdd(sample, bins=10, range=None, weights=None, density=False,
                **kwargs):
    """np.histogramdd-compatible: sample is (N, D) or a length-D sequence
    of length-N coordinate arrays."""
    if isinstance(sample, (list, tuple)):
        arrays = list(sample)
    else:
        arr = sample
        if getattr(arr, "ndim", None) != 2:
            arr = np.asarray(arr)
        if arr.ndim != 2:
            raise ValueError(
                "histogramdd sample must be (N, D) or a sequence of D "
                "1-D arrays"
            )
        arrays = [arr[:, d] for d in _builtin_range(arr.shape[1])]
    d = len(arrays)
    if isinstance(bins, (list, tuple)):
        if len(bins) != d:
            raise ValueError(
                f"bins sequence length {len(bins)} != sample dimension {d}"
            )
        bins_list = list(bins)
    else:
        bins_list = [bins] * d
    h, edges = _histogram(
        *arrays, bins=bins_list, range=range, weights=weights,
        density=density, **kwargs,
    )
    return h, edges
