#!/usr/bin/env python
"""Fused vs split rows recip encode at an HBM-bound scale (400 MB
working set, 3x VMEM): the VMEM-resident 100 MB bench shows them equal
(90.8 vs 90.6 GB/s -- chained re-reads never pay HBM, so the fused
kernel's halved traffic is invisible there).  This measures the regime
the fusion targets."""
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/minnow_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from minnow_c_tpu.bench import harness
from minnow_c_tpu.ops import encode_pallas as ep
from minnow_c_tpu.parallel.sharding import (_rows_encode_recip_raw,
                                            _rows_stats_raw)

W = 64.0
RB, RND = 256, 1 << 17        # 256 x 3 x 131072 = 100.7M f32 = 402 MB
ROWS_N = RB * 3 * RND
CHAIN = 4
results = {}


def salted_f32(arr, s):
    return jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(arr, jnp.uint32) ^
        (s & jnp.uint32(1)), jnp.float32)


def main():
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.uniform(0, W, (RB * 3, RND)).astype(np.float32)))
    u32_red = lambda a: jnp.max(a).astype(jnp.uint32)  # noqa: E731

    @jax.jit
    def g_fused(salt, xx):
        s = salt
        w = None
        for i in range(CHAIN):
            xs = salted_f32(xx, s)
            xb = xs.reshape(RB, 3, RND)
            w, mn, mx = ep.encode_recip_fused_blocks(
                xb, jnp.float32(W), xb[:, :, 0], 14, True)
            s = u32_red(w[0]) ^ jnp.uint32(i)
        return s, w

    r = harness.run(lambda s: g_fused(s, x), bytes_per_iter=ROWS_N * 4 * CHAIN)
    results["fused_400MB"] = round(r.gb_per_second, 2)
    print(f"fused  {r.gb_per_second:8.2f} GB/s", flush=True)

    @jax.jit
    def g_split(salt, xx):
        s = salt
        w = None
        for i in range(CHAIN):
            xs = salted_f32(xx, s)
            mn, mx = _rows_stats_raw(xs, W, True, False)
            rng_r = jnp.repeat(jnp.max(
                (mx - mn).reshape(RB, 3), axis=1), 3)
            w = _rows_encode_recip_raw(xs, mn, rng_r, 14, W, True, False)
            s = u32_red(w[0]) ^ jnp.uint32(i)
        return s, w

    r = harness.run(lambda s: g_split(s, x), bytes_per_iter=ROWS_N * 4 * CHAIN)
    results["split_400MB"] = round(r.gb_per_second, 2)
    print(f"split  {r.gb_per_second:8.2f} GB/s", flush=True)

    @jax.jit
    def g_split_xla_stats(salt, xx):
        # stats via vmapped XLA (fuses into the salt chain) + pallas
        # encode: decomposes how much of the split cost is the pallas
        # stats pass vs the encode kernel
        s = salt
        w = None
        for i in range(CHAIN):
            xs = salted_f32(xx, s)
            mn, mx = _rows_stats_raw(xs, W, False, False)
            rng_r = jnp.repeat(jnp.max(
                (mx - mn).reshape(RB, 3), axis=1), 3)
            w = _rows_encode_recip_raw(xs, mn, rng_r, 14, W, True, False)
            s = u32_red(w[0]) ^ jnp.uint32(i)
        return s, w

    r = harness.run(lambda s: g_split_xla_stats(s, x),
                    bytes_per_iter=ROWS_N * 4 * CHAIN)
    results["split_xla_stats_400MB"] = round(r.gb_per_second, 2)
    print(f"split-xla-stats {r.gb_per_second:8.2f} GB/s", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()


def vmem_scale():
    """Same three variants at the 100 MB bench scale (VMEM regime)."""
    rng = np.random.default_rng(0)
    RB2 = 64
    n2 = RB2 * 3 * RND
    x = jax.device_put(jnp.asarray(
        rng.uniform(0, W, (RB2 * 3, RND)).astype(np.float32)))
    u32_red = lambda a: jnp.max(a).astype(jnp.uint32)  # noqa: E731

    @jax.jit
    def g_split_xla(salt, xx):
        s = salt
        w = None
        for i in range(8):
            xs = salted_f32(xx, s)
            mn, mx = _rows_stats_raw(xs, W, False, False)
            rng_r = jnp.repeat(jnp.max(
                (mx - mn).reshape(RB2, 3), axis=1), 3)
            w = _rows_encode_recip_raw(xs, mn, rng_r, 14, W, True, False)
            s = u32_red(w[0]) ^ jnp.uint32(i)
        return s, w

    r = harness.run(lambda s: g_split_xla(s, x), bytes_per_iter=n2 * 4 * 8)
    print(f"split-xla-stats-100MB {r.gb_per_second:8.2f} GB/s", flush=True)


if os.environ.get("VMEM_SCALE"):
    vmem_scale()
