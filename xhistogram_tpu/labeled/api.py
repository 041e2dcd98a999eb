"""Labeled histogram API (the reference's xarray layer, rebuilt).

``histogram`` reproduces the full labeled contract of
``xhistogram.xarray.histogram`` (reference xarray.py:13-201): reduce over
named ``dim``s, preserve the remaining dims, emit bin-center coordinates
(named ``<input name> + bin_dim_suffix``) carrying each input's attrs, carry
kept-dim coordinates (plus compatible extra coords under ``keep_coords``),
and name the output ``histogram_<name1>_<name2>...``.

It never touches binning math: labels are converted to positional axes, data
is handed to ``xhistogram_tpu.core.histogram``, and labels are rebuilt — the
same strict layering as the reference (L4 never touches bins, SURVEY.md §1).

Inputs may be ``labeled.NamedArray`` or any duck-compatible labeled type
(e.g. ``xarray.DataArray``): the function only uses ``dims / coords / attrs /
name / data / expand_dims / transpose / get_axis_num / reset_coords``.
"""

from __future__ import annotations

from collections import OrderedDict

from .. import bins as _bins_mod
from ..core import histogram as _histogram
from .array import NamedArray

__all__ = ["histogram"]


def _is_labeled(a):
    return all(
        hasattr(a, attr) for attr in ("dims", "coords", "data", "name")
    )


def histogram(
    *args,
    bins=None,
    range=None,
    dim=None,
    weights=None,
    density=False,
    block_size="auto",
    method="auto",
    keep_coords=False,
    bin_dim_suffix="_bin",
):
    """Histogram of labeled arrays over named dimensions.

    Parameters mirror the reference (xarray.py:13-23); ``dim`` is a sequence
    of dimension names to reduce (default: all). Returns a ``NamedArray``
    (counts/weighted sums/density) with bin-center coordinates.
    """
    args = list(args)
    n_args = len(args)
    n_weights = 1 if weights is not None else 0

    for a in args:
        if not _is_labeled(a):
            raise TypeError(
                "labeled histogram accepts only labeled arrays (NamedArray / "
                f"xarray.DataArray) but a {type(a).__name__} was provided"
            )
    for a in args:
        if a.name is None:
            raise ValueError("all labeled arrays must have a name")

    # Drop non-dim coords to simplify alignment unless asked to keep them
    # (reference xarray.py:120-123).
    if not keep_coords:
        args = [a.reset_coords(drop=True) for a in args]
    if n_weights:
        args = args + [weights.reset_coords(drop=True)]

    # Exact-join alignment: shared dims must agree in size
    # (reference uses xr.align(join="exact"), xarray.py:126).
    sizes = {}
    for a in args:
        for d, s in zip(a.dims, a.data.shape):
            if sizes.setdefault(d, s) != s:
                raise ValueError(
                    f"cannot align: dim {d!r} has conflicting sizes "
                    f"{sizes[d]} and {s}"
                )

    a0 = args[0]
    a_coords = a0.coords

    # Manual broadcast: union of dims in first-seen order, expand + transpose
    # (reference xarray.py:133-149).
    all_dims = [d for a in args for d in a.dims]
    all_dims_ordered = list(OrderedDict.fromkeys(all_dims))
    args_transposed = []
    for a in args:
        expand_keys = [d for d in all_dims_ordered if d not in a.dims]
        if expand_keys:
            a = a.expand_dims({k: 1 for k in expand_keys})
        if tuple(a.dims) != tuple(all_dims_ordered):
            a = a.transpose(*all_dims_ordered)
        args_transposed.append(a)
    args_data = [a.data for a in args_transposed]

    if n_weights:
        weights_data = args_data.pop()
    else:
        weights_data = None

    if dim is not None:
        dim = [dim] if isinstance(dim, str) else list(dim)
        for d in dim:
            if d not in all_dims_ordered:
                raise ValueError(f"dimension {d!r} not found in inputs")
        dims_to_keep = [d for d in all_dims_ordered if d not in dim]
        axis = tuple(args_transposed[0].get_axis_num(d) for d in dim)
    else:
        dims_to_keep = []
        axis = None

    h_data, edges = _histogram(
        *args_data,
        weights=weights_data,
        bins=bins,
        range=range,
        axis=axis,
        density=density,
        block_size=block_size,
        method=method,
    )

    # Rebuild labels (reference xarray.py:174-199).
    new_dims = [a.name + bin_dim_suffix for a in args[:n_args]]
    output_dims = dims_to_keep + new_dims

    new_coords = {
        name: ((name,), _bins_mod.bin_centers(e), dict(a.attrs))
        for name, e, a in zip(new_dims, edges, args)
    }

    old_dim_coords = {
        name: a0.coords[name] for name in dims_to_keep if name in a_coords
    }

    all_coords = {}
    all_coords.update(old_dim_coords)
    all_coords.update(new_coords)
    if keep_coords:
        for c in a_coords:
            if c not in all_coords and set(a_coords[c].dims).issubset(output_dims):
                all_coords[c] = a_coords[c]

    output_name = "_".join(["histogram"] + [str(a.name) for a in args[:n_args]])

    return NamedArray(h_data, output_dims, coords=all_coords, name=output_name)
