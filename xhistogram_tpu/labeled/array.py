"""A minimal labeled array: named dims + coordinates over a jax array.

The reference's labeled layer delegates to xarray (reference xarray.py). This
environment is xarray-free, so the labeled API here is self-contained: a
small, jit-friendly ``NamedArray`` carrying ``dims``/``coords``/``attrs``/
``name`` around a ``jax.Array``. It implements exactly the surface the
histogram wrapper and its tests need (the subset of the xr.DataArray API the
reference touches at xarray.py:109-199): ``get_axis_num``, ``expand_dims``,
``transpose``, ``reset_coords``, ``sum``, ``isel``, coords with attrs.

``labeled.api.histogram`` duck-types on this surface, so a real
``xarray.DataArray`` works too when xarray is installed.
"""

from __future__ import annotations

import numpy as np

__all__ = ["NamedArray"]


def _as_array(x):
    import jax.numpy as jnp

    if hasattr(x, "dtype") and hasattr(x, "shape"):
        return x
    return jnp.asarray(np.asarray(x))


class NamedArray:
    """N-D array with named dimensions, coordinates, attrs, and a name.

    coords maps a coordinate name to a ``NamedArray`` whose dims are a subset
    of this array's dims (dimension coordinates have ``coord.dims ==
    (coord_name,)``).
    """

    __slots__ = ("data", "dims", "coords", "name", "attrs")

    def __init__(self, data, dims, coords=None, name=None, attrs=None):
        self.data = _as_array(data)
        dims = tuple(dims)
        if len(dims) != self.data.ndim:
            raise ValueError(
                f"{len(dims)} dims given for data of rank {self.data.ndim}"
            )
        self.dims = dims
        self.name = name
        self.attrs = dict(attrs) if attrs else {}
        self.coords = {}
        if coords:
            for cname, cval in coords.items():
                self.coords[cname] = self._coerce_coord(cname, cval)

    def _coerce_coord(self, cname, cval):
        if isinstance(cval, NamedArray):
            coord = cval
        elif isinstance(cval, tuple) and len(cval) in (2, 3):
            cdims, cdata = cval[0], cval[1]
            cattrs = cval[2] if len(cval) == 3 else None
            if isinstance(cdims, str):
                cdims = (cdims,)
            coord = NamedArray(np.asarray(cdata), cdims, name=cname, attrs=cattrs)
        elif hasattr(cval, "dims") and hasattr(cval, "data"):
            # duck labeled coord (e.g. an xarray coordinate DataArray):
            # keep its own dims/attrs — may span several of this array's dims
            coord = NamedArray(
                np.asarray(cval.data),
                tuple(cval.dims),
                name=cname,
                attrs=dict(getattr(cval, "attrs", {}) or {}),
            )
        else:
            coord = NamedArray(np.asarray(cval), (cname,), name=cname)
        for d in coord.dims:
            if d not in self.dims:
                raise ValueError(
                    f"coordinate {cname!r} has dim {d!r} not present in {self.dims}"
                )
        return coord

    # -- basic introspection ------------------------------------------------
    @property
    def shape(self):
        return self.data.shape

    @property
    def ndim(self):
        return self.data.ndim

    @property
    def size(self):
        return self.data.size

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def sizes(self):
        return dict(zip(self.dims, self.data.shape))

    @property
    def values(self):
        return np.asarray(self.data)

    def get_axis_num(self, dim):
        return self.dims.index(dim)

    def __getitem__(self, key):
        if isinstance(key, str):
            return self.coords[key]
        raise TypeError("positional indexing not supported; use .isel()")

    def __repr__(self):
        coord_names = ", ".join(self.coords)
        return (
            f"<NamedArray {self.name!r} {dict(zip(self.dims, self.shape))} "
            f"coords=[{coord_names}]>"
        )

    # -- transforms (all return new NamedArrays) ----------------------------
    def _replace(self, data=None, dims=None, coords=None, name="__keep__", attrs=None):
        return NamedArray(
            self.data if data is None else data,
            self.dims if dims is None else dims,
            coords=self.coords if coords is None else coords,
            name=self.name if name == "__keep__" else name,
            attrs=self.attrs if attrs is None else attrs,
        )

    def rename(self, name):
        return self._replace(name=name)

    def reset_coords(self, drop=False):
        """Drop non-dimension coordinates (reference xarray.py:120-121 uses
        drop=True to simplify alignment)."""
        if not drop:
            raise NotImplementedError("only reset_coords(drop=True) is supported")
        keep = {k: v for k, v in self.coords.items() if k in self.dims}
        return self._replace(coords=keep)

    def expand_dims(self, sizes):
        """Prepend new length-``n`` dims, given ``{name: n}``
        (reference xarray.py:140)."""
        new_dims = tuple(sizes.keys()) + self.dims
        data = self.data.reshape(tuple(sizes.values()) + self.data.shape)
        if any(n != 1 for n in sizes.values()):
            import jax.numpy as jnp

            data = jnp.broadcast_to(
                self.data, tuple(sizes.values()) + self.data.shape
            )
        return NamedArray(
            data, new_dims, coords=self.coords, name=self.name, attrs=self.attrs
        )

    def transpose(self, *dims):
        if set(dims) != set(self.dims):
            raise ValueError(f"transpose dims {dims} != array dims {self.dims}")
        perm = [self.dims.index(d) for d in dims]
        return self._replace(data=self.data.transpose(perm), dims=dims)

    def isel(self, indexers=None, **kw):
        indexers = dict(indexers or {}, **kw)
        idx = tuple(
            indexers.get(d, slice(None)) for d in self.dims
        )
        new_dims = tuple(
            d for d in self.dims if not isinstance(indexers.get(d), int)
        )
        coords = {}
        for cname, c in self.coords.items():
            if all(not isinstance(indexers.get(d), int) for d in c.dims):
                cidx = tuple(indexers.get(d, slice(None)) for d in c.dims)
                coords[cname] = NamedArray(
                    c.data[cidx], c.dims, name=cname, attrs=c.attrs
                )
        return NamedArray(
            self.data[idx], new_dims, coords=coords, name=self.name, attrs=self.attrs
        )

    def sum(self, dim=None):
        if dim is None:
            dims = self.dims
        elif isinstance(dim, str):
            dims = (dim,)
        else:
            dims = tuple(dim)
        if not dims:
            return self
        axes = tuple(self.dims.index(d) for d in dims)
        new_dims = tuple(d for d in self.dims if d not in dims)
        coords = {
            k: v
            for k, v in self.coords.items()
            if all(cd in new_dims for cd in v.dims)
        }
        return NamedArray(
            self.data.sum(axis=axes),
            new_dims,
            coords=coords,
            name=self.name,
            attrs=self.attrs,
        )

    # -- comparison helpers (test support) -----------------------------------
    def equals(self, other):
        if self.dims != tuple(other.dims):
            return False
        if not np.array_equal(self.values, np.asarray(other.values)):
            return False
        if set(self.coords) != set(other.coords):
            return False
        return all(
            np.array_equal(self.coords[k].values, other.coords[k].values)
            and self.coords[k].dims == tuple(other.coords[k].dims)
            for k in self.coords
        )

    def identical(self, other):
        return self.equals(other) and self.name == other.name


def full_like(template: NamedArray, fill_value, name=None) -> NamedArray:
    import jax.numpy as jnp

    return NamedArray(
        jnp.full(template.shape, fill_value, dtype=template.dtype),
        template.dims,
        coords=template.coords,
        name=name if name is not None else template.name,
        attrs=template.attrs,
    )
