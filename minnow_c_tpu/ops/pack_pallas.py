"""Pallas TPU kernel: uniform bitpack (pack only).

STATUS: EXPERIMENTAL, NOT USED -- on v5e hardware Mosaic miscompiles the
32-way shift/OR fold (~0.3% of words lose interior straddle bits; the
same bug class the XLA backend shows for the equivalent unroll, while the
*decode*-direction fold compiles correctly).  Kept as a minimal
reproducer and for re-testing on future toolchains.

The production pack is ``bitpack.uniform_pack`` (einsum-select fold);
the ~50 s pathology it showed inside the batched encode was the
bin->pack *fusion*, fixed with an optimization_barrier in
``parallel/snapshot.py``.

Round-2 measurements (exp/pack_variants.py, v5e, depth 14, 100 MB --
the reference bench's workload size; smaller buffers are dispatch-
latency-bound and under-report ~8x, which is where round 1's stale
"2.5 GB/s" came from):

  einsum-select pack (production)   21.3 GB/s   exact
  full fast_uniform_encode          20.3 GB/s   exact
  Pallas f32-dot fold, default prec 26.5 GB/s   WRONG BITS (MXU f32 dot
                                                is bf16-ish on TPU)
  Pallas f32-dot, Precision.HIGHEST 17.9 GB/s   exact
  Pallas bf16 byte-plane dot fold   21.7 GB/s   exact
  Pallas fused bin+pack (bf16 fold) 13.9 GB/s   exact

The einsum-select XLA fold remains the best *exact* formulation on this
toolchain, and meets the >=20 GB/s encode target.

SUPERSEDED (round 2, later): the variants above all share the
(blocks, 32)/(blocks, width) layout, whose minor dims lane-pad 4x-12x
and whose store DMAs dominate.  The lane-dense layout of
``ops/encode_pallas.pack_pallas`` (elements as (M, 128), words as
(M, 4*width), one in-kernel transpose, static shift/OR row folds -- no
MXU involved, so no precision question at all) measures ~200 GB/s pack
/ ~110 GB/s fused encode with chain-slope+readback timing, and is the
production pack on TPU.  This module stays as the record of why the
32-way fold cannot be trusted on this toolchain (the miscompile class
is layout-independent in the *encode* direction via jnp.stack of
shifted columns; encode_pallas folds with scalar row ORs instead,
which compile correctly and are parity-tested).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1 << 14
BLOCKS = TILE // 32


def _pack_kernel(b_ref, out_ref, *, width: int):
    """bins (1, BLOCKS, 32) u32 -> words (1, BLOCKS, width) u32."""
    b = b_ref[0] & jnp.uint32((1 << width) - 1)
    cols = []
    for j in range(width):
        lo_bit = 32 * j
        hi_bit = 32 * (j + 1)
        acc = None
        for k in range(lo_bit // width, (hi_bit - 1) // width + 1):
            start = k * width - lo_bit
            v = b[:, k]
            part = (v << jnp.uint32(start)) if start >= 0 else \
                (v >> jnp.uint32(-start))
            acc = part if acc is None else (acc | part)
        cols.append(acc)
    out_ref[0] = jnp.stack(cols, axis=1)


@functools.partial(jax.jit, static_argnames=("width", "interpret"))
def pack_pallas_tiles(bins, width: int, interpret: bool = False):
    """Pack ``n_tiles*TILE`` bins; input length must be a TILE multiple.
    Returns the packed words (length n*width/32)."""
    n = bins.shape[0]
    n_tiles = n // TILE
    assert n_tiles * TILE == n
    bm = bins.reshape(n_tiles, BLOCKS, 32)
    kernel = functools.partial(_pack_kernel, width=width)
    words = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((1, BLOCKS, 32), lambda i: (i, i * 0, i * 0),
                               memory_space=pl.ANY
                               if interpret else pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, BLOCKS, width),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=pl.ANY
                               if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, BLOCKS, width),
                                       jnp.uint32),
        interpret=interpret,
    )(bm)
    return words.reshape(-1)
