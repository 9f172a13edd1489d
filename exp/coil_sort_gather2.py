#!/usr/bin/env python
"""Round 2 of the Coil/Sort primitive measurements (see
coil_sort_gather.py): big-row takes (the CHUNK=16384 Coil v1.1 design),
contiguous dynamic_slice spans, XLA sort as an un-permute, and a banded
one-hot-matmul un-permute for nearly-sorted ranks."""
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
results = {}


def bench(name, fn, bytes_per_iter):
    r = harness.run(fn, bytes_per_iter=bytes_per_iter)
    results[name] = round(r.gb_per_second, 2)
    print(f"{name:28s} {r.gb_per_second:8.2f} GB/s", flush=True)


def perturb(a, s):
    i = jax.lax.broadcasted_iota(jnp.uint32, a.shape, 0)
    if a.dtype == jnp.float32:
        return jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(a, jnp.uint32) ^
            jnp.where(i == 0, s, jnp.uint32(0)), jnp.float32)
    return jnp.where(i == 0, a ^ s, a)


def main():
    rng = np.random.default_rng(0)

    # 1/2: row takes at Coil-v1.1 granularities
    for chunk in (16384, 4096):
        nch = N // chunk
        rows = jax.device_put(jnp.asarray(
            rng.integers(0, 1 << 32, (nch, chunk), dtype=np.int64)
            .astype(np.uint32)))
        rperm = jax.device_put(jnp.asarray(
            rng.permutation(nch).astype(np.int32)))

        @jax.jit
        def f_rowtake(s, r, p, nch=nch, chunk=chunk):
            out = jax.lax.optimization_barrier(
                jnp.take(perturb(r.reshape(-1), s).reshape(nch, chunk), p,
                         axis=0))
            return out.ravel()[0], out
        bench(f"row_take_{chunk}", lambda s, r=rows, p=rperm:
              f_rowtake(s, r, p), N * 4)

    # 3: contiguous span copy via dynamic_slice with a traced offset
    body = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 32, N, dtype=np.int64).astype(np.uint32)))

    @jax.jit
    def f_span(s, b):
        off = (s % jnp.uint32(1024)).astype(jnp.int32) * 8
        out = jax.lax.optimization_barrier(
            jax.lax.dynamic_slice(perturb(b, s), (off,), (N // 2,)))
        return out.ravel()[0], out
    bench("dynamic_slice_span", lambda s: f_span(s, body), N // 2 * 4)

    # 4: XLA sort as un-permute: sort (rank, value) pairs by rank
    ranks = jax.device_put(jnp.asarray(
        rng.permutation(N).astype(np.uint32)))
    vals = jax.device_put(jnp.asarray(
        rng.integers(0, 1 << 32, N, dtype=np.int64).astype(np.uint32)))

    @jax.jit
    def f_sort(s, r, v):
        out = jax.lax.sort((r, perturb(v, s)), num_keys=1)[1]
        out = jax.lax.optimization_barrier(out)
        return out.ravel()[0], out
    bench("xla_sort_unperm", lambda s: f_sort(s, ranks, vals), N * 4)

    # 5: banded one-hot matmul un-permute (nearly-sorted ranks,
    # |rank[i]-i| < K).  out[i] = vals[rank[i]] via block-diag one-hot
    # matmuls: tile T outputs read only input window [T*S - K, T*S+S+K).
    K = 512
    S = 2048          # output tile
    near = np.arange(N, dtype=np.int64) + rng.integers(-K // 4, K // 4, N)
    nperm = np.argsort(near, kind="stable").astype(np.int64)
    inv = np.empty(N, np.int64)
    inv[nperm] = np.arange(N)
    # decode applies out[i] = sorted[rank[i]]; rank = inv here
    assert np.abs(inv - np.arange(N)).max() < K, "band too small"
    ranks_b = jax.device_put(jnp.asarray(inv.astype(np.int32)))
    fvals = jax.device_put(jnp.asarray(
        rng.uniform(0, 64, N).astype(np.float32)))

    T = N // S

    @jax.jit
    def f_banded(s, rk, v):
        vv = perturb(v, s)
        # window w[t] = v[t*S - K : t*S + S + K] via padded reshape
        vp = jnp.pad(vv, (K, K))
        # windows: (T, S + 2K) built from two overlapping strided views
        base = jnp.arange(T, dtype=jnp.int32) * S
        win = jax.vmap(lambda b: jax.lax.dynamic_slice(
            vp, (b,), (S + 2 * K,)))(base)        # (T, S+2K)
        rloc = rk.reshape(T, S) - base[:, None] + K   # local idx in window
        # one-hot matmul: out[t, i] = sum_j (rloc[t,i]==j) * win[t,j]
        j = jnp.arange(S + 2 * K, dtype=jnp.int32)
        oh = (rloc[:, :, None] == j[None, None, :]).astype(jnp.bfloat16)
        # split f32 values into two u16 halves for exact recombine
        vb = jax.lax.bitcast_convert_type(win, jnp.uint32)
        hi = (vb >> 16).astype(jnp.int32).astype(jnp.float32)
        lo = (vb & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
        ohf = oh.astype(jnp.float32)
        ghi = jnp.einsum("tij,tj->ti", ohf, hi)
        glo = jnp.einsum("tij,tj->ti", ohf, lo)
        out = jax.lax.bitcast_convert_type(
            (ghi.astype(jnp.uint32) << 16) | glo.astype(jnp.uint32),
            jnp.float32).reshape(-1)
        out = jax.lax.optimization_barrier(out)
        return jax.lax.bitcast_convert_type(out.ravel()[0], jnp.uint32), out
    bench("banded_onehot_unperm", lambda s: f_banded(s, ranks_b, fvals),
          N * 4)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
