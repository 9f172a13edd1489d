"""Profiling and tracing helpers.

The reference's only observability is its benchmark harness
(src/bench.{h,c}); here the TPU-native equivalents are:

* ``trace(dir)``     -- context manager around the JAX profiler; the
  resulting trace opens in TensorBoard/Perfetto and shows every XLA/Pallas
  kernel on the device timeline.
* ``annotate(name)`` -- named trace span for host-side phases (entropy,
  serialization) so tunnel/host/device time is attributable.
* ``timed(name)``    -- lightweight wall-clock span logger for quick
  printf-style profiling without the profiler.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/minnow_trace"):
    """Capture a JAX profiler trace for the enclosed block."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span that shows up inside profiler traces."""
    import jax
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def timed(name: str, sink=print):
    """Wall-clock span: ``with timed("lz4"): ...`` prints the elapsed
    time.  Blocks on nothing -- callers must block_until_ready around
    device work they want attributed."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        sink(f"[minnow] {name}: {(time.perf_counter() - t0) * 1e3:.2f} ms")
