#!/usr/bin/env python
"""Headline benchmark: decode throughput of the fast-uniform path on one
chip.

Workload mirrors the reference's "(mock) undo fast compress" bench
(test/compress_util_bench.c:264-298): unpack packed bins -> dithered
undo-bin-index -> periodic rewrap, at level 11, on a 100 MB f32 stream.
Throughput is GB/s of decoded f32 output per chip; baseline target is
5 GB/s/chip (BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}
"""

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/minnow_jax_cache")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from minnow_c_tpu.bench import harness  # noqa: E402
from minnow_c_tpu.ops import decode_pallas  # noqa: E402
from minnow_c_tpu.ops import rng as _rng  # noqa: E402

BASELINE_GBPS = 5.0
LEVEL = 11  # reference bench uses level 11 (compress_util_bench.c:247)
# 100 MB of f32 output (compress_util_bench.c:318), tile-aligned
N = (25_000_000 // decode_pallas.TILE) * decode_pallas.TILE
WIDTH_BOX = 64.0


CHAIN = 32  # decodes per dispatch: amortizes remote-dispatch latency
# (~1-100 ms per call through the tunnel, variable by session) without
# weakening the anti-replay salt chain -- each step's key derives from
# the previous step's decoded output, a true data dependency.  The chain
# is PYTHON-UNROLLED inside one jit rather than a fori_loop: the loop
# carry (100 MB decoded plane) plus per-iteration while-loop overhead
# measured 134 GB/s vs 291 GB/s unrolled for identical work
# (exp/decode_chain_variants.py).


WATCHDOG_S = 2100  # hard cap: cold remote compiles run minutes, not hours


def _emit_failure(why):
    # The driver records exactly one JSON line; a hung process records
    # nothing.  If the TPU tunnel is down (observed multi-hour outages in
    # this environment), report the failure honestly instead of hanging.
    print(json.dumps({
        "metric": "decode_fast_uniform_GBps_per_chip",
        "value": 0.0,
        "unit": "GB/s",
        "vs_baseline": 0.0,
        "error": why,
    }), flush=True)


def main():
    from minnow_c_tpu.ops import native

    rng = np.random.default_rng(0)
    bins_np = rng.integers(0, 1 << LEVEL, N, dtype=np.uint64).astype(
        np.uint32)
    # Setup (excluded from timing): pack on host via the native oracle.
    packed = jax.device_put(jnp.asarray(native.uniform_pack_host(bins_np,
                                                                 LEVEL)))
    key = _rng.field_key_arr(1234, 0, 0)

    @jax.jit
    def decode_chain(words, salt):
        s = salt
        x = None
        for i in range(CHAIN):
            x = decode_pallas.decode_pallas(
                words, key ^ s, LEVEL, N, 0.0, WIDTH_BOX, WIDTH_BOX,
                periodic=True)
            s = jax.lax.bitcast_convert_type(x[0], jnp.uint32) ^ \
                jnp.uint32(i)
        return x

    res = harness.run(lambda s: decode_chain(packed, s),
                      bytes_per_iter=N * 4 * CHAIN)
    value = res.gb_per_second
    print(json.dumps({
        "metric": "decode_fast_uniform_GBps_per_chip",
        "value": round(value, 3),
        "unit": "GB/s",
        "vs_baseline": round(value / BASELINE_GBPS, 3),
    }), flush=True)


if __name__ == "__main__":
    import signal

    def _on_alarm(signum, frame):
        _emit_failure("watchdog: no result within %ds "
                      "(TPU tunnel down or compile stuck)" % WATCHDOG_S)
        os._exit(3)

    signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(WATCHDOG_S)
    try:
        main()
        signal.alarm(0)
        # JAX teardown can itself hang on a flaky tunnel; the JSON line
        # is flushed, so exit hard rather than risk recording nothing.
        sys.stdout.flush()
        os._exit(0)
    except Exception as exc:  # noqa: BLE001 - report, don't hang the driver
        signal.alarm(0)  # exactly one JSON line: no late-alarm second emit
        _emit_failure("%s: %s" % (type(exc).__name__, exc))
        sys.stdout.flush()
        os._exit(2)
