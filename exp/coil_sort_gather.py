#!/usr/bin/env python
"""Measure the gather/scatter primitives that bound Coil/Sort device
decode (round-5 item 1: coil 1.5 GB/s, sort 0.38 GB/s vs >=25/>=5
targets).

Hypothesis: the bucketed chunked unpack is gather-bound, and the gather
SPELLING matters -- element-granular index arrays (the round-4 path)
vs row/slice-granular gathers (vmapped dynamic_slice; 1KB contiguous
rows) vs jnp.take over a 2D row axis.

Workloads at coil scale (n = 25,165,824 values, CHUNK = 256):
  elem_gather_f32    out[i] = x[perm[i]]          (sort's un-permute)
  row_take_u32       rows[perm] over (n_chunks, 256)  (chunk un-permute)
  slice_gather_words vmapped dynamic_slice of (wpc,) windows (bucket
                     collection, row-granular)
  elem_gather_words  flat take of off[:,None]+arange(wpc) (round-4 path)
  argsort_unperm     jnp.take via sorted ranks     (control)
"""
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/minnow_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from minnow_c_tpu.bench import harness

N = 25_165_824
CHUNK = 256
NCH = N // CHUNK           # 98,304 chunks
WPC = 56                   # 7-bit chunks: 256*7/32 words each
results = {}


def bench(name, fn, bytes_per_iter):
    r = harness.run(fn, bytes_per_iter=bytes_per_iter)
    results[name] = round(r.gb_per_second, 2)
    print(f"{name:24s} {r.gb_per_second:8.2f} GB/s", flush=True)


def main():
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(rng.uniform(0, 64, N).astype(np.float32)))
    perm = jax.device_put(jnp.asarray(
        rng.permutation(N).astype(np.uint32)))
    # nearly-sorted permutation (the Lagrangian-order case sort targets)
    near = np.arange(N, dtype=np.int64) + rng.integers(-8, 9, N)
    near_perm = jax.device_put(jnp.asarray(
        np.argsort(near, kind="stable").astype(np.uint32)))
    rows = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 32, (NCH, CHUNK), dtype=np.int64)
        .astype(np.uint32)))
    rperm = jax.device_put(jnp.asarray(
        rng.permutation(NCH).astype(np.int32)))
    body = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 32, NCH * WPC, dtype=np.int64)
        .astype(np.uint32)))
    # chunk word offsets in a scrambled order (bucket collection)
    off_np = (rng.permutation(NCH).astype(np.int64) * WPC).astype(np.int32)
    off = jax.device_put(jnp.asarray(off_np))

    def perturb(a, s):
        i = jax.lax.broadcasted_iota(jnp.uint32, a.shape, 0)
        if a.dtype == jnp.float32:
            return jax.lax.bitcast_convert_type(
                jax.lax.bitcast_convert_type(a, jnp.uint32) ^
                jnp.where(i == 0, s, jnp.uint32(0)), jnp.float32)
        return jnp.where(i == 0, a ^ s, a)

    # 1. element-granular f32 gather (sort's un-permute core)
    @jax.jit
    def f_elem(s, x, p):
        out = jax.lax.optimization_barrier(perturb(x, s)[p])
        v = jax.lax.bitcast_convert_type(out.ravel()[0], jnp.uint32)
        return v, out
    bench("elem_gather_f32", lambda s: f_elem(s, x, perm), N * 4)

    # 1b. same but nearly-sorted indices (locality help?)
    bench("elem_gather_f32_near", lambda s: f_elem(s, x, near_perm), N * 4)

    # 2. row-granular take over (NCH, 256) axis 0 (chunk un-permute)
    @jax.jit
    def f_rowtake(s, r, p):
        out = jax.lax.optimization_barrier(
            jnp.take(perturb(r.reshape(-1), s).reshape(NCH, CHUNK), p,
                     axis=0))
        return out.ravel()[0], out
    bench("row_take_u32", lambda s: f_rowtake(s, rows, rperm), N * 4)

    # 3. bucket collection: vmapped dynamic_slice (slice-granular gather)
    @jax.jit
    def f_slice(s, b, o):
        bb = perturb(b, s)
        out = jax.vmap(
            lambda oo: jax.lax.dynamic_slice(bb, (oo,), (WPC,)))(o)
        out = jax.lax.optimization_barrier(out)
        return out.ravel()[0], out
    bench("slice_gather_words", lambda s: f_slice(s, body, off),
          NCH * WPC * 4)

    # 4. round-4 spelling: flat element take of off[:,None]+arange(wpc)
    @jax.jit
    def f_flat(s, b, o):
        gi = (o.astype(jnp.int32)[:, None] +
              jnp.arange(WPC, dtype=jnp.int32)[None, :]).reshape(-1)
        out = jax.lax.optimization_barrier(
            jnp.take(perturb(b, s), gi, mode="clip"))
        return out.ravel()[0], out
    bench("elem_gather_words", lambda s: f_flat(s, body, off),
          NCH * WPC * 4)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
