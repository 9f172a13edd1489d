"""Adaptive throughput benchmark harness.

Port of the reference's wall-clock policy (``src/bench.{h,c}``): trials
double in size until a single trial takes at least TARGET_TRIAL seconds or
the total budget MAX_TOTAL is exhausted (bench.h:6-7, bench.c:37-49), and
throughput is reported in bytes/second of processed data.  Setup cost is
excluded by timing only the measured callable (the pause/resume facility of
bench.c:15-22 becomes "time only fn").

On TPU the doubling is over *iterations* of a fixed-shape jitted function
(re-jitting per size would measure the compiler); ``block_until_ready``
bounds each trial.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable

import jax

TARGET_TRIAL_S = 0.5  # bench.h:6
MAX_TOTAL_S = 30.0  # bench.h:7


@dataclass
class Result:
    bytes_per_second: float
    iterations: int
    trial_seconds: float

    @property
    def gb_per_second(self) -> float:
        return self.bytes_per_second / 1e9


def run(fn: Callable[[object], object], bytes_per_iter: int,
        target_trial_s: float = TARGET_TRIAL_S,
        max_total_s: float = MAX_TOTAL_S) -> Result:
    """Benchmark ``fn(salt)``.

    ``fn`` takes a uint32 scalar jax array that MUST feed into its
    computation (e.g. XOR into an RNG key).  The harness chains each
    iteration's salt from the previous iteration's output, which (a) makes
    every call's inputs unique, defeating any runtime caching of repeated
    identical executions, and (b) creates a true data dependency so no
    dispatched iteration can be elided as dead code.  Without this,
    async-dispatch runtimes report fantasy numbers (observed: 2.7 TB/s for
    an op bounded at ~0.08 TB/s).
    """
    import jax.numpy as jnp

    def derive_salt(out):
        leaf = jax.tree.leaves(out)[0]
        v = leaf.ravel()[0]
        if v.dtype == jnp.uint32:
            return v
        return v.astype(jnp.float32).astype(jnp.int32).astype(jnp.uint32)

    # Warm-up: compile + first run excluded (bench.c pause/resume intent).
    salt = jnp.uint32(0)
    out = fn(salt)
    jax.block_until_ready(out)

    start_total = time.perf_counter()
    iters = 1
    best = None
    while True:
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(salt)
            salt = derive_salt(out)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        best = Result(bytes_per_second=bytes_per_iter * iters / dt,
                      iterations=iters, trial_seconds=dt)
        elapsed = time.perf_counter() - start_total
        if dt >= target_trial_s or elapsed + dt * 2 > max_total_s:
            return best
        iters *= 2
