"""Cross-cutting utilities: profiling, buffers."""

from . import profiling  # noqa: F401
