"""Round-3: Pallas rows stats kernel vs the vmapped-XLA stats pass.

Measures (salted unrolled chains, D2H readback; harness semantics):
  stats_pallas   encode_pallas.stats_pallas_rows alone (1 HBM read)
  full_new       production batched recip encode (stats_pallas + kernel)

Compare against exp/rows_breakdown.py: kernel_rows 184.6, full_rows
(XLA stats) 122.9 GB/s.  Run on the real TPU.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/minnow_jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from minnow_c_tpu.bench import harness
from minnow_c_tpu.parallel.sharding import (_float_rows_stats,
                                            _float_rows_encode_recip)

DEPTH = 14
W = 64.0
B, ND = 64, 1 << 17
N = B * 3 * ND
UNROLL = 16


def _salt_box(s):
    return jnp.float32(W) * (jnp.float32(1.0) +
                             s.astype(jnp.float32) * jnp.float32(1e-45))


@jax.jit
def stats_pallas(xin, salt):
    s = salt
    x0s = None
    for i in range(UNROLL):
        boxs = _salt_box(s)
        x0s, rngs = _float_rows_stats(xin, boxs, True, False)
        s = x0s[0, 0].view(jnp.uint32) ^ jnp.uint32(i)
    return x0s


@jax.jit
def full_new(xin, salt):
    s = salt
    w = None
    for i in range(UNROLL):
        boxs = _salt_box(s)
        x0s, rngs = _float_rows_stats(xin, boxs, True, False)
        w = _float_rows_encode_recip(xin, x0s, rngs, DEPTH, boxs,
                                     True, False)
        s = w[0, 0, 0] ^ jnp.uint32(i)
    return w


def main():
    rng = np.random.default_rng(7)
    xb = jax.device_put(jnp.asarray(
        rng.uniform(0, W, (B, 3, ND)).astype(np.float32)))
    nbytes = N * 4 * UNROLL
    for name, fn in [("stats_pallas", lambda s: stats_pallas(xb, s)),
                     ("full_new", lambda s: full_new(xb, s))]:
        r = harness.run(fn, bytes_per_iter=nbytes)
        print(f"{name:>12}: {r.gb_per_second:7.2f} GB/s "
              f"({r.iterations} it x {r.trial_seconds:.3f}s)", flush=True)


if __name__ == "__main__":
    main()
