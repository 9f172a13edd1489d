"""Decompose the 100M sharded-decode iteration cost (config4_100m).

Chain-slope timing: per-iteration cost = (T(K_HI) - T(K_LO)) / (K_HI -
K_LO) with K chained, salt-dependent iterations inside one jit and a
data-dependent scalar fetched to the host (the only trustworthy timing
on this runtime; see BENCH_NOTES.md).

All big device arrays are jit ARGUMENTS (closed-over arrays are
serialized as constants into the remote-compile request -- glacial /
HTTP 413; see bench_all.py config4_100m).

Variants (each body keeps its big result as the fori carry, matching
how the real dec_chain materializes its output every iteration):
  full        the production codec._decode chain (reference point)
  perturb     salt_perturb(words) alone, materialized
  transpose   pad + reshape + swapaxes (the XLA pre-transpose of
              decode_pallas_rows), materialized
  kernel      pallas_call on a pre-transposed w4 (padded out carried;
              no final slice)
  kernslice   kernel + the [:, :n] slice copy (materialized)
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/minnow_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.stdout.reconfigure(line_buffering=True)

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minnow_c_tpu.ops import decode_pallas
from minnow_c_tpu.parallel.sharding import (ShardedPositionCodec, make_mesh,
                                            spmd_depth_for)

W = 64.0
B, nb = 8, int(os.environ.get('PROF_NB', 12_500_000))
depth = spmd_depth_for(1e-3, W)  # 16
ROWS = B * 3
n_words = nb * depth // 32
TILE = decode_pallas.TILE
n_tiles = -(-nb // TILE)
wpt = TILE * depth // 32
M = TILE // 128
pad_words = n_tiles * wpt - n_words

print(f"depth={depth} rows={ROWS} n_words={n_words} n_tiles={n_tiles} "
      f"pad_words={pad_words}")

rng = np.random.default_rng(7)
mesh = make_mesh()
codec = ShardedPositionCodec(mesh=mesh, width=W, depth=depth)
xd = jax.device_put(
    jnp.asarray(rng.uniform(0, W, (B, 3, nb)).astype(np.float32)),
    codec._in_shardings())
enc = codec.encode(xd)
words_d, x0_d, rng_d = enc
jax.block_until_ready(words_d)
seed_arr = jnp.asarray([4], dtype=jnp.uint32)
zero_blk = jnp.zeros((1,), jnp.int32)
del enc, xd

K_LO, K_HI = 2, 10


def timeit(make_fn, args, label):
    times = {}
    for K in (K_LO, K_HI):
        f = make_fn(K)
        print(f"[{label} K={K}] compiling...", flush=True)
        t0 = time.perf_counter()
        s = f(jnp.uint32(1), *args)
        np.asarray(s)  # compile + first run
        print(f"[{label} K={K}] compiled+first in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            s = f(s, *args)
            np.asarray(s)
            best = min(best, time.perf_counter() - t0)
        times[K] = best
    per = (times[K_HI] - times[K_LO]) / (K_HI - K_LO)
    out_gb = ROWS * nb * 4 / 1e9
    print(f"{label:10s} {per*1e3:8.2f} ms/iter   "
          f"({out_gb/per:6.1f} GB/s of decoded f32 equiv)   "
          f"[K{K_LO}={times[K_LO]*1e3:.1f}ms K{K_HI}={times[K_HI]*1e3:.1f}ms]")
    return per


def perturb3(a, s):
    i0 = jax.lax.broadcasted_iota(jnp.uint32, a.shape, 0)
    i1 = jax.lax.broadcasted_iota(jnp.uint32, a.shape, 1)
    i2 = jax.lax.broadcasted_iota(jnp.uint32, a.shape, 2)
    hit = (i0 == 0) & (i1 == 0) & (i2 == 0)
    return jnp.where(hit, a ^ s, a)


# ---- full production decode chain ----------------------------------------
def mk_full(K):
    @jax.jit
    def f(salt, words, x0, rngb):
        def body(i, carry):
            s, _ = carry
            w = perturb3(words, s)
            out = codec._decode(w, x0, rngb, seed_arr, zero_blk)
            s2 = jax.lax.bitcast_convert_type(out[0, 0, 0], jnp.uint32)
            return (s2 ^ i.astype(jnp.uint32), out)

        s, out = jax.lax.fori_loop(
            0, K, body, (salt, jnp.zeros((B, 3, nb), jnp.float32)))
        return s ^ jax.lax.bitcast_convert_type(out[0, 0, 0], jnp.uint32)
    return f


# ---- salt perturb alone ----------------------------------------------------
def mk_perturb(K):
    @jax.jit
    def f(salt, words):
        def body(i, carry):
            s, _ = carry
            w = perturb3(words, s)
            return (w[0, 0, 0] ^ i.astype(jnp.uint32), w)

        s, w = jax.lax.fori_loop(
            0, K, body, (salt, jnp.zeros_like(words)))
        return s ^ w[0, 0, 1]
    return f


# ---- XLA pre-transpose alone ----------------------------------------------
def mk_transpose(K):
    @jax.jit
    def f(salt, w24):
        def body(i, carry):
            s, _ = carry
            i0 = jax.lax.broadcasted_iota(jnp.uint32, w24.shape, 0)
            i1 = jax.lax.broadcasted_iota(jnp.uint32, w24.shape, 1)
            w = jnp.where((i0 == 0) & (i1 == 0), w24 ^ s, w24)
            wp = jnp.pad(w, ((0, 0), (0, pad_words)))
            w4 = jnp.swapaxes(
                wp.reshape(ROWS, n_tiles, M, 4 * depth), 2, 3)
            return (w4[0, 0, 0, 0] ^ i.astype(jnp.uint32), w4)

        s, w4 = jax.lax.fori_loop(
            0, K, body,
            (salt, jnp.zeros((ROWS, n_tiles, 4 * depth, M), jnp.uint32)))
        return s ^ w4[0, 0, 0, 1]
    return f


# ---- kernel on pre-transposed input ----------------------------------------
keys = jnp.zeros((ROWS, 2), jnp.uint32) + jnp.uint32(7)
scal = jnp.stack([jnp.zeros((ROWS,), jnp.float32),
                  jnp.full((ROWS,), 1e-3, jnp.float32),
                  jnp.full((ROWS,), W, jnp.float32)], axis=1)
kernel = functools.partial(decode_pallas._decode_rows_kernel, width=depth,
                           periodic=True, tile_elems=TILE)


def run_kernel(w4, keys, scal):
    return pl.pallas_call(
        kernel,
        grid=(ROWS, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, 4 * depth, M),
                         lambda r, i: (r, i, r * 0, r * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, 2), lambda r, i: (r * 0, r * 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS, 3), lambda r, i: (r * 0, r * 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, M, 128),
                               lambda r, i: (r, i, r * 0, r * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, n_tiles, M, 128), jnp.float32),
        interpret=False,
    )(w4, keys, scal)


def perturb4(a, s):
    i0 = jax.lax.broadcasted_iota(jnp.uint32, a.shape, 0)
    i1 = jax.lax.broadcasted_iota(jnp.uint32, a.shape, 1)
    i2 = jax.lax.broadcasted_iota(jnp.uint32, a.shape, 2)
    i3 = jax.lax.broadcasted_iota(jnp.uint32, a.shape, 3)
    hit = (i0 == 0) & (i1 == 0) & (i2 == 0) & (i3 == 0)
    return jnp.where(hit, a ^ s, a)


def mk_kernel(K, do_slice):
    @jax.jit
    def f(salt, w4in, keys, scal):
        shape = (ROWS, nb) if do_slice else (ROWS, n_tiles, M, 128)

        def body(i, carry):
            s, _ = carry
            w4 = perturb4(w4in, s)
            out = run_kernel(w4, keys, scal)
            if do_slice:
                out = out.reshape(ROWS, n_tiles * TILE)[:, :nb]
                s2 = jax.lax.bitcast_convert_type(out[0, 0], jnp.uint32)
            else:
                s2 = jax.lax.bitcast_convert_type(out[0, 0, 0, 0],
                                                  jnp.uint32)
            return (s2 ^ i.astype(jnp.uint32), out)

        s, out = jax.lax.fori_loop(
            0, K, body, (salt, jnp.zeros(shape, jnp.float32)))
        tail = out[0, 1] if do_slice else out[0, 0, 0, 1]
        return s ^ jax.lax.bitcast_convert_type(tail, jnp.uint32)
    return f


def main():
    names = sys.argv[1:] or ["full", "perturb", "transpose", "kernel",
                             "kernslice"]
    for name in names:
        if name == "full":
            timeit(mk_full, (words_d, x0_d, rng_d), "full")
        elif name == "perturb":
            timeit(mk_perturb, (words_d,), "perturb")
        elif name == "transpose":
            w24 = jnp.reshape(words_d, (ROWS, n_words))
            jax.block_until_ready(w24)
            timeit(mk_transpose, (w24,), "transpose")
        elif name in ("kernel", "kernslice"):
            w24 = jnp.reshape(words_d, (ROWS, n_words))
            w4_pre = jnp.swapaxes(
                jnp.pad(w24, ((0, 0), (0, pad_words))).reshape(
                    ROWS, n_tiles, M, 4 * depth), 2, 3)
            jax.block_until_ready(w4_pre)
            timeit(lambda K: mk_kernel(K, name == "kernslice"),
                   (w4_pre, keys, scal), name)


main()
