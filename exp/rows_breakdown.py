"""Round-3 experiment: where does the batched rows encode lose 2.5x?

exp/recip_tpu_check.py measures the sharded/batched writer hot path
(vmapped stats + encode_pallas_recip_rows) at ~118 GB/s of input while
the single-stream fused encode (minmax + encode_pallas_recip) measures
~299 GB/s -- both formulations move the same 9.75 B/elem at depth 14,
so the rows path runs at ~40% of the single-stream traffic rate.

This experiment chains each *stage* separately on identical data
(~100 MB, 64 blocks x 3 dims x 131072) to locate the loss:

  stats_rows    vmapped per-block minmax (reads 100 MB)
  kernel_rows   encode_pallas_recip_rows alone (reads 100 MB, writes 44)
  full_rows     stats + kernel (the production path)
  stats_flat    single-stream minmax on the same 25.2M values
  kernel_flat   single-stream fused kernel alone
  full_flat     single-stream production path

Run on the real TPU:  python exp/rows_breakdown.py
"""

import os
import sys
import functools

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/minnow_jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from minnow_c_tpu.bench import harness
from minnow_c_tpu.ops import encode_pallas as ep
from minnow_c_tpu.ops import kernels
from minnow_c_tpu.parallel.sharding import (_float_block_stats,
                                            _float_rows_encode_recip)

DEPTH = 14
W = 64.0
B, ND = 64, 1 << 17          # 64 x 3 x 131072 = 25.2M elems = ~100 MB
N = B * 3 * ND
UNROLL = 16


def _salt_box(s):
    return jnp.float32(W) * (jnp.float32(1.0) +
                             s.astype(jnp.float32) * jnp.float32(1e-45))


@jax.jit
def stats_rows(xin, salt):
    s = salt
    x0s = None
    for i in range(UNROLL):
        boxs = _salt_box(s)
        x0s, rngs = jax.vmap(lambda xb: _float_block_stats(xb, boxs))(xin)
        s = x0s[0, 0].view(jnp.uint32) ^ jnp.uint32(i)
    return x0s


@jax.jit
def kernel_rows(xin, x0s, rngs, salt):
    """Rows kernel alone: stats precomputed once outside the chain; the
    salt perturbs the box (rounds away in f32) so every step's inputs
    are unique."""
    s = salt
    w = None
    for i in range(UNROLL):
        boxs = _salt_box(s)
        w = _float_rows_encode_recip(xin, x0s, rngs, DEPTH, boxs,
                                     True, False)
        s = w[0, 0, 0] ^ jnp.uint32(i)
    return w


@jax.jit
def full_rows(xin, salt):
    s = salt
    w = None
    for i in range(UNROLL):
        boxs = _salt_box(s)
        x0s, rngs = jax.vmap(lambda xb: _float_block_stats(xb, boxs))(xin)
        w = _float_rows_encode_recip(xin, x0s, rngs, DEPTH, boxs,
                                     True, False)
        s = w[0, 0, 0] ^ jnp.uint32(i)
    return w


@jax.jit
def stats_flat(xf, salt):
    s = salt
    x0 = None
    for i in range(UNROLL):
        box = _salt_box(s)
        u1 = kernels.undo_periodic(jax.lax.optimization_barrier(xf), box)
        x0 = jnp.min(u1)
        s = x0.view(jnp.uint32) ^ jnp.uint32(i)
    return x0


@jax.jit
def full_flat(xf, salt):
    s = salt
    w = None
    for i in range(UNROLL):
        box = _salt_box(s)
        w, _, _ = ep.encode_pallas_recip(xf, DEPTH, periodic_width=box)
        s = w[0] ^ jnp.uint32(i)
    return w


def main():
    rng = np.random.default_rng(7)
    xb = jax.device_put(jnp.asarray(
        rng.uniform(0, W, (B, 3, ND)).astype(np.float32)))
    xf = xb.reshape(-1)
    x0s, rngs = jax.vmap(
        lambda b: _float_block_stats(b, jnp.float32(W)))(xb)
    x0s, rngs = jax.block_until_ready((x0s, rngs))

    nbytes = N * 4 * UNROLL
    cases = [
        ("stats_rows", lambda s: stats_rows(xb, s)),
        ("kernel_rows", lambda s: kernel_rows(xb, x0s, rngs, s)),
        ("full_rows", lambda s: full_rows(xb, s)),
        ("stats_flat", lambda s: stats_flat(xf, s)),
        ("full_flat", lambda s: full_flat(xf, s)),
    ]
    for name, fn in cases:
        r = harness.run(fn, bytes_per_iter=nbytes)
        print(f"{name:>12}: {r.gb_per_second:7.2f} GB/s "
              f"({r.iterations} it x {r.trial_seconds:.3f}s)", flush=True)


if __name__ == "__main__":
    main()
