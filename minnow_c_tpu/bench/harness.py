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


def run(fn: Callable[[], object], bytes_per_iter: int,
        target_trial_s: float = TARGET_TRIAL_S,
        max_total_s: float = MAX_TOTAL_S) -> Result:
    """Benchmark ``fn`` (which must consume/produce ``bytes_per_iter`` bytes
    per call and return a jax array or tree to block on)."""
    # Warm-up: compile + first run excluded (bench.c pause/resume intent).
    out = fn()
    jax.block_until_ready(out)

    start_total = time.perf_counter()
    iters = 1
    best = None
    while True:
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        best = Result(bytes_per_second=bytes_per_iter * iters / dt,
                      iterations=iters, trial_seconds=dt)
        elapsed = time.perf_counter() - start_total
        if dt >= target_trial_s or elapsed + dt * 2 > max_total_s:
            return best
        iters *= 2
