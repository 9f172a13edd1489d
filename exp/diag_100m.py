"""Diagnose config4_100m: encode timing anomaly + within_delta_sample=false.

Runs the 100M single-pass config with per-pass timing across several fresh
buffers and reports the sample max error against BOTH the achieved bin width
(W/2^depth) and the requested delta (1e-3) to separate f32-rounding slack
from a real codec defect.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/minnow_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from minnow_c_tpu.parallel.sharding import (ShardedPositionCodec, make_mesh,
                                            spmd_depth_for)

W = 64.0
B, nb = 8, 12_500_000
rng = np.random.default_rng(7)
mesh = make_mesh()
depth = spmd_depth_for(1e-3, W)
print("depth", depth, flush=True)
codec = ShardedPositionCodec(mesh=mesh, width=W, depth=depth)


def one_pass(x):
    t0 = time.perf_counter()
    enc = codec.encode(x)
    jax.block_until_ready(enc)
    t1 = time.perf_counter()
    out = codec.decode(*enc, seed=4)
    jax.block_until_ready(out)
    t2 = time.perf_counter()
    return enc, out, t1 - t0, t2 - t1


raw = B * nb * 12
bufs = [rng.uniform(0, W, (B, 3, nb)).astype(np.float32) for _ in range(3)]
for rep in range(7):
    xh = bufs[rep % 3]
    xm = jax.device_put(jnp.asarray(xh))
    jax.block_until_ready(xm)
    enc, out, enc_s, dec_s = one_pass(xm)
    print(f"pass {rep}: enc {enc_s:.3f}s ({raw/enc_s/1e9:.2f} GB/s)  "
          f"dec {dec_s:.3f}s ({raw/dec_s/1e9:.2f} GB/s)", flush=True)
    if rep == 6:
        err = np.abs(np.asarray(out[0, :, :65536]) -
                     np.asarray(xm[0, :, :65536]))
        err = np.minimum(err, W - err)
        delta_ach = W / (1 << depth)
        print(f"max_err {err.max():.9f}  delta_ach {delta_ach:.9f}  "
              f"within_ach {bool((err <= delta_ach).all())}  "
              f"within_req {bool((err <= 1e-3).all())}", flush=True)
    del enc, out, xm
