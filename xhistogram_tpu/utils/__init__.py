from .axes import normalize_axis, canonicalize_2d, kept_shape  # noqa: F401
