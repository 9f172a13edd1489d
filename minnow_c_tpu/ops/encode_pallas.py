"""Pallas TPU kernel: fused fast-uniform encode (bin + pack).

STATUS: EXPERIMENTAL -- not used by the production encode path.

Measured on v5e: the Mosaic compiler lowers f32 division to an approximate
reciprocal, so ~0.2% of bin indices land one-to-several bins off versus
the IEEE-exact XLA path (wire-defining semantics require exactness); the
in-kernel *pack* stage is bit-correct.  The kernel is also slightly slower
than the XLA fast path (~7 ms vs ~5.5 ms per 100 MB), since encode is
lighter on VPU work than decode (no Threefry).  Production encode stays on
``fastpath.fast_uniform_encode``; this module is kept as the working
reference for Pallas packing and passes bit-exact tests in interpreter
mode.

Same layout trick as decode_pallas: elements are viewed as (blocks, 32)
and packed words as (blocks, width), so the pack is 32 static
shift-and-OR folds per block row with no scatter and no reshape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import kernels

TILE = 1 << 14
BLOCKS = TILE // 32


def _encode_kernel(x_ref, scal_ref, out_ref, *, width: int):
    """x (1, BLOCKS, 32) f32 -> words (1, BLOCKS, width) u32."""
    x = x_ref[0]
    x0 = scal_ref[0]
    dx = scal_ref[1]
    # num_bins/top are static given width; keep SMEM scalars out of dtype
    # conversions (they recurse in this jax version's TPU lowering).
    num_bins = jnp.float32(float(1 << width))
    top = jnp.int32((1 << width) - 1)

    # True division, not reciprocal-multiply: bin indices must be
    # bit-identical to kernels.uniform_bin_index (C semantics).
    delta = (x - x0) / dx
    scaled = delta * num_bins
    # C cast semantics: trunc toward zero; clamp the FP-error escapes
    # (util.c:159-166).  Mosaic lacks f32->u32; go via i32 (values < 2^24).
    bins = scaled.astype(jnp.int32)
    bins = jnp.where(delta < 0.0, jnp.int32(0), bins)
    bins = jnp.where(delta >= 1.0, top, bins)
    b = bins.astype(jnp.uint32)

    mask = jnp.uint32((1 << width) - 1)
    cols = []
    for j in range(width):  # output word j of each block
        lo_bit = 32 * j
        hi_bit = 32 * (j + 1)
        k_first = lo_bit // width
        k_last = (hi_bit - 1) // width
        acc = None
        for k in range(k_first, k_last + 1):
            start = k * width - lo_bit
            v = b[:, k] & mask
            part = (v << jnp.uint32(start)) if start >= 0 else \
                (v >> jnp.uint32(-start))
            acc = part if acc is None else (acc | part)
        cols.append(acc)
    out_ref[0] = jnp.stack(cols, axis=1)


@functools.partial(jax.jit,
                   static_argnames=("width", "periodic_width", "interpret"))
def encode_pallas(x, width: int, periodic_width=None,
                  interpret: bool = False):
    """floats -> (packed words, x0, range).  Pallas bin+pack for whole
    tiles; XLA handles the stats prepass and any ragged tail."""
    n = x.shape[0]
    if periodic_width is not None:
        x = kernels.undo_periodic(x, periodic_width)
    x0 = jnp.min(x)
    x1 = jnp.max(x)
    rng_v = x1 - x0
    x = jax.lax.optimization_barrier(x)

    n_tiles = n // TILE
    tail = n - n_tiles * TILE
    words_per_tile = TILE * width // 32
    outs = []
    if n_tiles:
        xm = x[: n_tiles * TILE].reshape(n_tiles, BLOCKS, 32)
        scal = jnp.stack([jnp.float32(x0), rng_v.astype(jnp.float32)])
        kernel = functools.partial(_encode_kernel, width=width)
        words = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, BLOCKS, 32), lambda i: (i, i * 0, i * 0),
                             memory_space=pl.ANY
                             if interpret else pltpu.VMEM),
                pl.BlockSpec((2,), lambda i: (i * 0,),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, BLOCKS, width),
                                   lambda i: (i, i * 0, i * 0),
                                   memory_space=pl.ANY
                                   if interpret else pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles, BLOCKS, width),
                                           jnp.uint32),
            interpret=interpret,
        )(xm, scal)
        outs.append(words.reshape(-1))
    if tail:
        from . import bitpack
        bins_t = kernels.uniform_bin_index(x[n_tiles * TILE:], width, x0,
                                           rng_v)
        outs.append(bitpack.uniform_pack(bins_t, width))
    words = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
    return words, x0, rng_v
