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


def _kernel_fold(vals, width: int):
    """Shared in-kernel fold: (BLOCKS, 32) masked u32 vals ->
    (BLOCKS, width) packed words via the f32-dot select.  All constants
    are built from iota in-kernel (Pallas forbids captured arrays)."""
    u32 = jnp.uint32
    B = vals.shape[0]
    kv = jax.lax.broadcasted_iota(u32, (B, 32), 1)
    lsh = (kv * u32(width)) & u32(31)
    straddle = (lsh + u32(width)) > u32(32)
    rsh = jnp.where(straddle, u32(32) - lsh, u32(0))
    lo = vals << lsh
    hi = jnp.where(straddle, vals >> rsh, u32(0))
    # selection matrices from iota: word tgt[k] collects element k's lo
    # half, word tgt[k]+1 its straddle half
    kk = jax.lax.broadcasted_iota(u32, (32, width), 0)
    jj = jax.lax.broadcasted_iota(u32, (32, width), 1)
    tgt = (kk * u32(width)) >> u32(5)
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    slo = jnp.where(tgt == jj, one, zero)
    shi = jnp.where(tgt + u32(1) == jj, one, zero)

    def f32(m):
        return m.astype(jnp.int32).astype(jnp.float32)

    half_a = jax.lax.dot(f32(lo & u32(0xFFFF)), slo,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST) + \
        jax.lax.dot(f32(hi & u32(0xFFFF)), shi,
                    preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
    half_b = jax.lax.dot(f32(lo >> u32(16)), slo,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST) + \
        jax.lax.dot(f32(hi >> u32(16)), shi,
                    preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
    return half_a.astype(jnp.int32).astype(u32) | \
        (half_b.astype(jnp.int32).astype(u32) << u32(16))


def _pack_dot_kernel(b_ref, out_ref, *, width: int):
    """Variant C kernel: bins (1, BLOCKS, 32) u32 -> (1, BLOCKS, width)."""
    vals = b_ref[0] & jnp.uint32((1 << width) - 1)
    out_ref[0] = _kernel_fold(vals, width)


GROUP = 4  # blocks fused per matmul row: K = 32*GROUP, N = width*GROUP


def _kernel_fold_bf16(vals128, width: int):
    """Variant E fold: (R, 128) u32 vals (4 blocks per row) ->
    (R, 4*width) words.  Each u32 splits into FOUR byte planes; byte
    planes are exact in single-pass bf16 MXU dots (values < 2^8, selection
    0/1, disjoint-bit sums < 2^8).  The selection matrix is block-diagonal
    over the 4 fused blocks, built from iota."""
    u32 = jnp.uint32
    R = vals128.shape[0]
    K = 32 * GROUP
    N = width * GROUP
    kv = jax.lax.broadcasted_iota(u32, (R, K), 1)
    ke = kv & u32(31)  # element index within its block
    lsh = (ke * u32(width)) & u32(31)
    straddle = (lsh + u32(width)) > u32(32)
    rsh = jnp.where(straddle, u32(32) - lsh, u32(0))
    lo = vals128 << lsh
    hi = jnp.where(straddle, vals128 >> rsh, u32(0))

    kk = jax.lax.broadcasted_iota(u32, (K, N), 0)
    jj = jax.lax.broadcasted_iota(u32, (K, N), 1)
    kblk = kk >> u32(5)
    kel = kk & u32(31)
    tgt = ((kel * u32(width)) >> u32(5)) + kblk * u32(width)
    jblk_ok_lo = tgt == jj
    jblk_ok_hi = (tgt + u32(1) == jj) & \
        (((kel * u32(width)) >> u32(5)) + u32(1) < u32(width))
    # i1 -> bf16 select hits a Mosaic relayout bug ((8,128) mask vs
    # (16,128) bf16 packing); select in f32 then downconvert.
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    slo = jnp.where(jblk_ok_lo, one, zero).astype(jnp.bfloat16)
    shi = jnp.where(jblk_ok_hi, one, zero).astype(jnp.bfloat16)

    def plane(m, shift):
        p = ((m >> u32(shift)) & u32(0xFF)).astype(jnp.int32)
        return p.astype(jnp.float32).astype(jnp.bfloat16)

    acc = None
    for shift in (0, 8, 16, 24):
        pa = jax.lax.dot(plane(lo, shift), slo,
                         preferred_element_type=jnp.float32) + \
            jax.lax.dot(plane(hi, shift), shi,
                        preferred_element_type=jnp.float32)
        w = pa.astype(jnp.int32).astype(u32) << u32(shift)
        acc = w if acc is None else (acc | w)
    return acc


def _pack_bf16_kernel(b_ref, out_ref, *, width: int):
    """bins (1, BLOCKS//GROUP, 32*GROUP) -> (1, BLOCKS//GROUP,
    width*GROUP); same bytes as the (BLOCKS, 32)/(BLOCKS, width) view."""
    vals = b_ref[0] & jnp.uint32((1 << width) - 1)
    out_ref[0] = _kernel_fold_bf16(vals, width)


@functools.partial(jax.jit, static_argnames=("width", "interpret"))
def pack_pallas_bf16(bins, width: int, interpret: bool = False):
    n = bins.shape[0]
    n_tiles = n // TILE
    assert n_tiles * TILE == n
    R = BLOCKS // GROUP
    bm = bins.reshape(n_tiles, R, 32 * GROUP)
    kernel = functools.partial(_pack_bf16_kernel, width=width)
    words = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((1, R, 32 * GROUP),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pl.ANY
                               if interpret else pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, R, width * GROUP),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pl.ANY
                               if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, R, width * GROUP),
                                       jnp.uint32),
        interpret=interpret,
    )(bm)
    return words.reshape(-1)


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
        in_specs=[pl.BlockSpec((1, BLOCKS, 32), lambda i: (i, i * 0, i * 0),
                               memory_space=pl.ANY
                               if interpret else pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, BLOCKS, width), lambda i: (i, i * 0, i * 0),
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
    delta = delta_ref[0]
    num_bins = jnp.float32(float(1 << width))
    top = jnp.int32((1 << width) - 1)
    scaled = (delta * num_bins).astype(jnp.int32)
    binsi = jnp.where(delta < 0.0, jnp.int32(0),
                      jnp.where(delta >= 1.0, top, scaled))
    vals = binsi.astype(jnp.uint32) & jnp.uint32((1 << width) - 1)
    out_ref[0] = _kernel_fold(vals, width)


def _encode_bf16_kernel(delta_ref, out_ref, *, width: int):
    """Variant F kernel: delta (1, R, 128) f32 -> (1, R, 4*width) words.
    Bin (C-exact trunc/clamp; division already done in XLA) + bf16 fold."""
    delta = delta_ref[0]
    num_bins = jnp.float32(float(1 << width))
    top = jnp.int32((1 << width) - 1)
    scaled = (delta * num_bins).astype(jnp.int32)
    binsi = jnp.where(delta < 0.0, jnp.int32(0),
                      jnp.where(delta >= 1.0, top, scaled))
    vals = binsi.astype(jnp.uint32) & jnp.uint32((1 << width) - 1)
    out_ref[0] = _kernel_fold_bf16(vals, width)


@functools.partial(jax.jit,
                   static_argnames=("width", "periodic_width", "interpret"))
def encode_pallas_bf16(x, width: int, periodic_width=None,
                       interpret: bool = False):
    """Variant F: full fast-uniform encode, bin+pack fused in one Pallas
    kernel (bf16 byte-plane fold); the wire-defining IEEE division stays
    in XLA."""
    n = x.shape[0]
    if periodic_width is not None:
        x = kernels.undo_periodic(x, periodic_width)
    x0 = jnp.min(x)
    x1 = jnp.max(x)
    rng_v = x1 - x0
    delta = (x - x0) / rng_v
    delta = jax.lax.optimization_barrier(delta)
    n_tiles = n // TILE
    tail = n - n_tiles * TILE
    R = BLOCKS // GROUP
    outs = []
    if n_tiles:
        dm = delta[: n_tiles * TILE].reshape(n_tiles, R, 32 * GROUP)
        kernel = functools.partial(_encode_bf16_kernel, width=width)
        words = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[pl.BlockSpec((1, R, 32 * GROUP),
                                   lambda i: (i, i * 0, i * 0),
                                   memory_space=pl.ANY
                                   if interpret else pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, R, width * GROUP),
                                   lambda i: (i, i * 0, i * 0),
                                   memory_space=pl.ANY
                                   if interpret else pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles, R, width * GROUP),
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
            in_specs=[pl.BlockSpec((1, BLOCKS, 32), lambda i: (i, i * 0, i * 0),
                                   memory_space=pl.ANY
                                   if interpret else pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, BLOCKS, width), lambda i: (i, i * 0, i * 0),
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
    # Per-variant invocation: `python exp/pack_variants.py C D` runs only
    # those variants -- the XLA f32-matmul variant (B) hangs the remote
    # compile service >12 min at full shape, so variants are isolated.
    sel = set(sys.argv[1:]) or {"A", "B", "C", "D"}
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
    checks = {"B": ("B f32mm", lambda b: pack_f32mm(b, depth)),
              "C": ("C pallas_dot", lambda b: pack_pallas_dot(b, depth)),
              "E": ("E pallas_bf16", lambda b: pack_pallas_bf16(b, depth))}
    for key, (name, fn) in checks.items():
        if key not in sel:
            continue
        got = fn(bins_dev)
        nbad = int(n_mismatch(got, want))
        print(f"correct {name}: {nbad == 0} (bad words: {nbad})",
              flush=True)

    from minnow_c_tpu.ops import fastpath
    if "D" in sel:
        wd = encode_pallas_dot(x, depth, periodic_width=W)
        wref = fastpath.fast_uniform_encode(x, depth, periodic_width=W)
        nbad = int(n_mismatch(wd[0], wref[0]))
        print(f"correct D fused encode vs fastpath: {nbad == 0} "
              f"(bad words: {nbad})", flush=True)
    if "F" in sel:
        wf = encode_pallas_bf16(x, depth, periodic_width=W)
        wref = fastpath.fast_uniform_encode(x, depth, periodic_width=W)
        nbad = int(n_mismatch(wf[0], wref[0]))
        print(f"correct F fused bf16 encode vs fastpath: {nbad == 0} "
              f"(bad words: {nbad})", flush=True)

    # --- throughput ------------------------------------------------------
    def bench_pack(name, packer):
        def fn(salt):
            b = bins_dev ^ (salt & jnp.uint32(1))
            return packer(b, depth)
        r = harness.run(fn, bytes_per_iter=n * 4)
        print(f"pack {name}: {r.gb_per_second:.2f} GB/s "
              f"({r.iterations} it x {r.trial_seconds:.3f}s)", flush=True)

    def bench_encode(name, enc):
        def fn(salt):
            xs = x + salt.astype(jnp.float32) * jnp.float32(1e-12)
            return enc(xs)[0]
        r = harness.run(fn, bytes_per_iter=n * 4)
        print(f"encode {name}: {r.gb_per_second:.2f} GB/s", flush=True)

    if "A" in sel:
        bench_pack("A einsum_u32", bitpack.uniform_pack)
    if "B" in sel:
        bench_pack("B f32mm", pack_f32mm)
    if "C" in sel:
        bench_pack("C pallas_dot", pack_pallas_dot)
    if "E" in sel:
        bench_pack("E pallas_bf16", pack_pallas_bf16)
    if "A" in sel:
        bench_encode("A fastpath", lambda xs: fastpath.fast_uniform_encode(
            xs, depth, periodic_width=W))
    if "B" in sel:
        bench_encode("B xla_f32mm", lambda xs: encode_with(
            xs, depth, W, pack_f32mm))
    if "C" in sel:
        bench_encode("C pallas_pack", lambda xs: encode_with(
            xs, depth, W, pack_pallas_dot))
    if "D" in sel:
        bench_encode("D pallas_fused", lambda xs: encode_pallas_dot(
            xs, depth, periodic_width=W))
    if "F" in sel:
        bench_encode("F pallas_fused_bf16", lambda xs: encode_pallas_bf16(
            xs, depth, periodic_width=W))


if __name__ == "__main__":
    main()
