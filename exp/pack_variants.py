"""Round-2 experiment: pack-kernel variants for the encode hot path.

Measures honest steady-state throughput (salted-chain harness) of the
uniform pack and the full fast-uniform encode with each candidate pack
formulation, on whatever backend jax selects (run on the real TPU).

Variants:
  A  current production: einsum-select u32 matmul (ops/bitpack.uniform_pack)
  B  XLA f32-matmul fold: shifted lo/hi words split into 16-bit halves,
     folded with 0/1 selection matrices via f32 dot (MXU); exact because
     contributions within each 16-bit half have disjoint bits, so every
     partial sum < 2^16 (f32-exact integers).
  C  Pallas kernel: same f32-dot fold in VMEM (no 32-way column-slice
     shift/OR unroll, which Mosaic miscompiles).
  D  Pallas fused encode: XLA computes delta=(x-x0)/dx (wire-defining IEEE
     division), kernel does scale+trunc+clamp+the C fold.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/minnow_jax_cache")
sys.path.insert(0, "/root/repo")

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minnow_c_tpu.ops import bitpack, kernels
from minnow_c_tpu.ops.bitpack import packed_words, pl_cdiv
from minnow_c_tpu.bench import harness

TILE = 1 << 14
BLOCKS = TILE // 32


def _sel_matrices(width: int):
    """Static shift amounts and 0/1 selection matrices for the 32-element
    block fold (bit b of element k lands at global bit k*width+b)."""
    lsh = np.array([(k * width) % 32 for k in range(32)], dtype=np.uint32)
    tgt = np.array([(k * width) // 32 for k in range(32)])
    straddle = (lsh + width) > 32
    rsh = np.where(straddle, 32 - lsh, 0).astype(np.uint32)
    sel_lo = np.zeros((32, width), dtype=np.float32)
    sel_lo[np.arange(32), tgt] = 1.0
    sel_hi = np.zeros((32, width), dtype=np.float32)
    in_range = tgt + 1 < width
    sel_hi[np.arange(32)[in_range], (tgt + 1)[in_range]] = 1.0
    return lsh, rsh, straddle, sel_lo, sel_hi


@functools.partial(jax.jit, static_argnames=("width",))
def pack_f32mm(x, width: int):
    """Variant B: XLA f32 matmul fold, wire-identical to uniform_pack."""
    n = x.shape[0]
    n_words = packed_words(n, width)
    if width == 0 or n == 0:
        return jnp.zeros((n_words,), dtype=jnp.uint32)
    if width == 32:
        return x
    n_blocks = pl_cdiv(n, 32)
    pad = n_blocks * 32 - n
    if pad:
        x = jnp.pad(x, (0, pad))
    lsh, rsh, straddle, sel_lo, sel_hi = _sel_matrices(width)
    vals = x.reshape(n_blocks, 32) & jnp.uint32((1 << width) - 1)
    lo = vals << jnp.asarray(lsh)[None, :]
    hi = jnp.where(jnp.asarray(straddle)[None, :],
                   vals >> jnp.asarray(rsh)[None, :], jnp.uint32(0))

    def fold(mat):
        a = (mat & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
        b = (mat >> jnp.uint32(16)).astype(jnp.int32).astype(jnp.float32)
        fa = a @ jnp.asarray(sel_lo) + \
            (b @ jnp.asarray(sel_lo)) * jnp.float32(65536.0)
        return fa

    # lo and hi contributions are disjoint bits within each target word, so
    # sum the four f32 partials then convert.  Partial sums per 16-bit half
    # < 2^16; the combined value < 2^32 needs the f64-free split below.
    a_lo = (lo & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
    b_lo = (lo >> jnp.uint32(16)).astype(jnp.int32).astype(jnp.float32)
    a_hi = (hi & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
    b_hi = (hi >> jnp.uint32(16)).astype(jnp.int32).astype(jnp.float32)
    slo = jnp.asarray(sel_lo)
    shi = jnp.asarray(sel_hi)
    half_a = a_lo @ slo + a_hi @ shi  # < 2^16, f32-exact
    half_b = b_lo @ slo + b_hi @ shi
    words = half_a.astype(jnp.int32).astype(jnp.uint32) | \
        (half_b.astype(jnp.int32).astype(jnp.uint32) << jnp.uint32(16))
    return words.reshape(-1)[:n_words]


def _pack_dot_kernel(b_ref, out_ref, *, width: int):
    """Variant C kernel: bins (1, BLOCKS, 32) u32 -> (1, BLOCKS, width)."""
    lsh, rsh, straddle, sel_lo, sel_hi = _sel_matrices(width)
    vals = b_ref[0] & jnp.uint32((1 << width) - 1)
    lo = vals << jnp.asarray(lsh)[None, :]
    hi = jnp.where(jnp.asarray(straddle)[None, :],
                   vals >> jnp.asarray(rsh)[None, :], jnp.uint32(0))
    a_lo = (lo & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
    b_lo = (lo >> jnp.uint32(16)).astype(jnp.int32).astype(jnp.float32)
    a_hi = (hi & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
    b_hi = (hi >> jnp.uint32(16)).astype(jnp.int32).astype(jnp.float32)
    slo = jnp.asarray(sel_lo)
    shi = jnp.asarray(sel_hi)
    half_a = jax.lax.dot(a_lo, slo,
                         preferred_element_type=jnp.float32) + \
        jax.lax.dot(a_hi, shi, preferred_element_type=jnp.float32)
    half_b = jax.lax.dot(b_lo, slo,
                         preferred_element_type=jnp.float32) + \
        jax.lax.dot(b_hi, shi, preferred_element_type=jnp.float32)
    out_ref[0] = half_a.astype(jnp.int32).astype(jnp.uint32) | \
        (half_b.astype(jnp.int32).astype(jnp.uint32) << jnp.uint32(16))


@functools.partial(jax.jit, static_argnames=("width", "interpret"))
def pack_pallas_dot(bins, width: int, interpret: bool = False):
    n = bins.shape[0]
    n_tiles = n // TILE
    assert n_tiles * TILE == n
    bm = bins.reshape(n_tiles, BLOCKS, 32)
    kernel = functools.partial(_pack_dot_kernel, width=width)
    words = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((1, BLOCKS, 32), lambda i: (i, 0, 0),
                               memory_space=pl.ANY
                               if interpret else pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, BLOCKS, width), lambda i: (i, 0, 0),
                               memory_space=pl.ANY
                               if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, BLOCKS, width),
                                       jnp.uint32),
        interpret=interpret,
    )(bm)
    return words.reshape(-1)


def _encode_dot_kernel(delta_ref, out_ref, *, width: int):
    """Variant D kernel: delta (1, BLOCKS, 32) f32 (already divided) ->
    packed words.  Scale+trunc+clamp per C semantics, then the C fold."""
    lsh, rsh, straddle, sel_lo, sel_hi = _sel_matrices(width)
    delta = delta_ref[0]
    num_bins = jnp.float32(float(1 << width))
    top = jnp.int32((1 << width) - 1)
    scaled = (delta * num_bins).astype(jnp.int32)
    binsi = jnp.where(delta < 0.0, jnp.int32(0),
                      jnp.where(delta >= 1.0, top, scaled))
    vals = binsi.astype(jnp.uint32) & jnp.uint32((1 << width) - 1)
    lo = vals << jnp.asarray(lsh)[None, :]
    hi = jnp.where(jnp.asarray(straddle)[None, :],
                   vals >> jnp.asarray(rsh)[None, :], jnp.uint32(0))
    a_lo = (lo & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
    b_lo = (lo >> jnp.uint32(16)).astype(jnp.int32).astype(jnp.float32)
    a_hi = (hi & jnp.uint32(0xFFFF)).astype(jnp.int32).astype(jnp.float32)
    b_hi = (hi >> jnp.uint32(16)).astype(jnp.int32).astype(jnp.float32)
    slo = jnp.asarray(sel_lo)
    shi = jnp.asarray(sel_hi)
    half_a = jax.lax.dot(a_lo, slo,
                         preferred_element_type=jnp.float32) + \
        jax.lax.dot(a_hi, shi, preferred_element_type=jnp.float32)
    half_b = jax.lax.dot(b_lo, slo,
                         preferred_element_type=jnp.float32) + \
        jax.lax.dot(b_hi, shi, preferred_element_type=jnp.float32)
    out_ref[0] = half_a.astype(jnp.int32).astype(jnp.uint32) | \
        (half_b.astype(jnp.int32).astype(jnp.uint32) << jnp.uint32(16))


@functools.partial(jax.jit,
                   static_argnames=("width", "periodic_width", "interpret"))
def encode_pallas_dot(x, width: int, periodic_width=None,
                      interpret: bool = False):
    """Variant D: full fast-uniform encode; division stays in XLA."""
    n = x.shape[0]
    if periodic_width is not None:
        x = kernels.undo_periodic(x, periodic_width)
    x0 = jnp.min(x)
    x1 = jnp.max(x)
    rng_v = x1 - x0
    delta = (x - x0) / rng_v  # wire-defining IEEE division, XLA
    delta = jax.lax.optimization_barrier(delta)
    n_tiles = n // TILE
    tail = n - n_tiles * TILE
    outs = []
    if n_tiles:
        dm = delta[: n_tiles * TILE].reshape(n_tiles, BLOCKS, 32)
        kernel = functools.partial(_encode_dot_kernel, width=width)
        words = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((1, BLOCKS, 32), lambda i: (i, 0, 0),
                                   memory_space=pl.ANY
                                   if interpret else pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, BLOCKS, width), lambda i: (i, 0, 0),
                                   memory_space=pl.ANY
                                   if interpret else pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles, BLOCKS, width),
                                           jnp.uint32),
            interpret=interpret,
        )(dm)
        outs.append(words.reshape(-1))
    if tail:
        bins_t = kernels.uniform_bin_index(x[n_tiles * TILE:], width, x0,
                                           rng_v)
        outs.append(bitpack.uniform_pack(bins_t, width))
    words = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
    return words, x0, rng_v


@functools.partial(jax.jit, static_argnames=("width", "periodic_width",
                                             "packer"))
def encode_with(x, width: int, periodic_width, packer):
    if periodic_width is not None:
        x = kernels.undo_periodic(x, periodic_width)
    x0 = jnp.min(x)
    x1 = jnp.max(x)
    rng_v = x1 - x0
    bins = kernels.uniform_bin_index(x, width, x0, rng_v)
    bins = jax.lax.optimization_barrier(bins)
    return packer(bins, width), x0, rng_v


def main():
    depth = 14
    n = TILE * 1536  # 25.2M elements = ~100 MB
    W = 64.0
    rng = np.random.default_rng(7)
    xh = rng.uniform(0, W, n).astype(np.float32)
    x = jax.device_put(jnp.asarray(xh))
    print("data on device", flush=True)
    # ALL comparisons stay on device (the D2H tunnel runs ~25 MB/s; a
    # single 100 MB fetch costs over an hour).  Only scalars come back.
    bins_dev = jax.jit(
        lambda xx: kernels.uniform_bin_index(
            xx, depth, jnp.min(xx), jnp.max(xx) - jnp.min(xx)))(x)
    bins_dev = jax.block_until_ready(bins_dev)
    print("bins ready", flush=True)

    @functools.partial(jax.jit, static_argnames=())
    def n_mismatch(a, b):
        return jnp.sum((a != b).astype(jnp.int32))

    want = bitpack.uniform_pack(bins_dev, depth)
    for name, fn in [("B f32mm", lambda b: pack_f32mm(b, depth)),
                     ("C pallas_dot", lambda b: pack_pallas_dot(b, depth))]:
        got = fn(bins_dev)
        nbad = int(n_mismatch(got, want))
        print(f"correct {name}: {nbad == 0} (bad words: {nbad})",
              flush=True)

    wd = encode_pallas_dot(x, depth, periodic_width=W)
    from minnow_c_tpu.ops import fastpath
    wref = fastpath.fast_uniform_encode(x, depth, periodic_width=W)
    nbad = int(n_mismatch(wd[0], wref[0]))
    print(f"correct D fused encode vs fastpath: {nbad == 0} "
          f"(bad words: {nbad})", flush=True)

    # --- throughput ------------------------------------------------------
    def bench_pack(name, packer):
        def fn(salt):
            b = bins_dev ^ (salt & jnp.uint32(1))
            return packer(b, depth)
        r = harness.run(fn, bytes_per_iter=n * 4)
        print(f"pack {name}: {r.gb_per_second:.2f} GB/s "
              f"({r.iterations} it x {r.trial_seconds:.3f}s)", flush=True)

    bench_pack("A einsum_u32", bitpack.uniform_pack)
    bench_pack("B f32mm", pack_f32mm)
    bench_pack("C pallas_dot", pack_pallas_dot)

    def bench_encode(name, enc):
        def fn(salt):
            xs = x + salt.astype(jnp.float32) * jnp.float32(1e-12)
            return enc(xs)[0]
        r = harness.run(fn, bytes_per_iter=n * 4)
        print(f"encode {name}: {r.gb_per_second:.2f} GB/s", flush=True)

    bench_encode("A fastpath", lambda xs: fastpath.fast_uniform_encode(
        xs, depth, periodic_width=W))
    bench_encode("B xla_f32mm", lambda xs: encode_with(
        xs, depth, W, pack_f32mm))
    bench_encode("C pallas_pack", lambda xs: encode_with(
        xs, depth, W, pack_pallas_dot))
    bench_encode("D pallas_fused", lambda xs: encode_pallas_dot(
        xs, depth, periodic_width=W))


if __name__ == "__main__":
    main()
