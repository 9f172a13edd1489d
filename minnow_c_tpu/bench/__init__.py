"""Benchmark harness (reference src/bench.{h,c} policy)."""

from . import harness  # noqa: F401
from .harness import Result, run  # noqa: F401
