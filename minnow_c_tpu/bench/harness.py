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

_CANARY_HEALTHY_S = 0.05  # ~8 ms healthy compute + ~30 ms D2H readback
# latency through the tunnel; slow mode measures >500 ms -- wide separation
_CANARY_CAP_S = 180.0
_canary_fn = None  # compiled once per process


def _wait_for_fast_mode():
    """Block until the process has left the runtime's slow mode (see
    run()'s warm-up comment).  Only runs on TPU backends; CPU has no
    slow mode.  Canary: 4 chained 4096^3 bf16 matmuls with a data
    dependency and a D2H readback -- ~10 ms healthy on v5e, observed
    >100x that while the slow mode lasts."""
    # Re-checked before EVERY measurement (three fast canary runs cost
    # <0.2 s): the slow mode has been observed to RE-ARM after long
    # compile gaps within one process (a device-phase bench whose canary
    # passed minutes earlier still measured 0.12 GB/s for a 16.9 GB/s
    # pipeline).
    global _canary_fn
    import jax.numpy as jnp
    import numpy as _np
    if jax.default_backend() != "tpu":
        return
    a = jnp.ones((4096, 4096), jnp.bfloat16)
    if _canary_fn is None:
        @jax.jit
        def canary(mat, s):
            out = mat
            for i in range(4):
                out = out @ mat
                s = s + out[0, 0].astype(jnp.float32)
            return s, out
        _canary_fn = canary
    canary = _canary_fn
    r = canary(a, jnp.float32(0))
    _np.asarray(r[0])  # compile + first run (excluded from the gate)
    t_start = time.perf_counter()
    ok = 0
    while True:
        t0 = time.perf_counter()
        r = canary(a, r[0])
        _np.asarray(r[0])
        dt = time.perf_counter() - t0
        if dt <= _CANARY_HEALTHY_S:
            ok += 1
            if ok >= 3:  # three consecutive healthy runs
                break
        else:
            ok = 0
        if time.perf_counter() - t_start > _CANARY_CAP_S:
            import sys as _sys
            print(f"[minnow bench] WARNING: canary still {dt*1e3:.0f} ms "
                  f"after {_CANARY_CAP_S:.0f}s; measuring anyway "
                  "(numbers may be depressed)", file=_sys.stderr,
                  flush=True)
            break


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

    iter_count = 0

    def derive_salt(out):
        # Non-repeating salt: output bits XOR a strictly-increasing
        # counter.  Output bits alone are NOT enough -- e.g. a decoded
        # float's first element varies only in its 16-bit dither, so the
        # salt walks a <=2^16 state space and closes a cycle after ~300
        # iterations (birthday bound), after which a content-addressed
        # runtime can replay cached executions and report fantasy
        # throughput (observed: 336 GB/s for a pipeline whose honest
        # steady state is ~6 GB/s).  The counter guarantees every
        # invocation has fresh inputs while the data dependency still
        # serializes execution.
        nonlocal iter_count
        iter_count += 1
        leaf = jax.tree.leaves(out)[0]
        v = leaf.ravel()[0]
        if v.dtype == jnp.float32:
            v = jax.lax.bitcast_convert_type(v, jnp.uint32)
        elif v.dtype != jnp.uint32:
            v = v.astype(jnp.float32).astype(jnp.int32).astype(jnp.uint32)
        return v ^ jnp.uint32(iter_count)

    # Warm-up: compile + first runs excluded (bench.c pause/resume intent).
    # The runtime executes the first substantial programs of a process in
    # a pathological SLOW MODE -- round 3 observed ~20x for a few
    # seconds; round 4 caught ~1000x for 30+ s (an encode chain
    # "measuring" 0.03 GB/s as the first phase of its process and 71 GB/s
    # re-measured minutes later; whichever phase ran first always ate
    # it).  The slow mode is CONSISTENTLY slow while it lasts, so rate
    # stability cannot detect it; instead a CANARY with a known healthy
    # speed gates measurement: chained 4096^3 bf16 matmuls (~10 ms
    # healthy on v5e, >100x that in slow mode).  Once the canary runs
    # fast, the mode has ended for the whole process.
    _wait_for_fast_mode()
    salt = jnp.uint32(0)
    out = fn(salt)
    jax.block_until_ready(out)
    # Re-gate AFTER the first call: compiling fn can take minutes on
    # this runtime, and the slow mode has been observed to RE-ARM
    # during exactly that window -- a canary that passed before the
    # compile does not cover the trials (config4_100M div encode
    # "measured" 0.1 GB/s this way in round 5; healthy 25+).  Three
    # fast canary runs cost <0.2 s.
    _wait_for_fast_mode()
    t_burn = time.perf_counter()
    while time.perf_counter() - t_burn < 3.0:
        out = fn(salt)
        salt = derive_salt(out)
        jax.block_until_ready(out)

    def trial(iters):
        nonlocal salt
        window = []  # hold a few outputs live so buffers can't be dropped
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(salt)
            salt = derive_salt(out)
            window.append(out)
            if len(window) > 4:
                window.pop(0)
        # Completion barrier: fetch the data-dependent salt to the host.
        # block_until_ready alone is NOT sufficient on this runtime -- it
        # has been observed to return before execution completes (a bare
        # 8192^3 bf16 matmul "finished" in 0.5 ms, an impossible 2200
        # TFLOP/s on a ~200 TFLOP/s chip).  A 4-byte D2H read of a value
        # that depends on every chained iteration cannot lie; its ~30 ms
        # latency is amortized by the >=0.5 s trial window.
        import numpy as _np
        _np.asarray(salt)
        return time.perf_counter() - t0

    start_total = time.perf_counter()
    iters = 1
    while True:
        dt = trial(iters)
        elapsed = time.perf_counter() - start_total
        if dt >= target_trial_s or elapsed + dt * 4 > max_total_s:
            break
        iters *= 2
    # Median of three trials at the final size guards against one-off
    # timer/runtime anomalies -- but respect the wall budget (bench.c
    # enforces WALL_CLOCK_LIMIT as a hard stop): skip retrials that
    # would blow past max_total_s.
    samples = [dt]
    while len(samples) < 3 and \
            time.perf_counter() - start_total + dt <= max_total_s:
        samples.append(trial(iters))
    dt = sorted(samples)[len(samples) // 2]
    return Result(bytes_per_second=bytes_per_iter * iters / dt,
                  iterations=iters, trial_seconds=dt)
