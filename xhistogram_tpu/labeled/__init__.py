from .array import NamedArray  # noqa: F401
from .api import histogram  # noqa: F401
