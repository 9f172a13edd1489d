"""Pallas TPU kernel: fused fast-uniform decode.

One kernel performs the whole decode hot path per tile -- bitstream unpack
(static funnel shifts), Threefry-2x32-13 dither (the stream-format RNG of
ops/rng.py, re-implemented with identical arithmetic), bin undo, and
periodic rewrap -- entirely in VMEM, with no HBM intermediates between
stages.  Wire layout and output bits are identical to
``fastpath.fast_uniform_decode`` (cross-checked in tests).

Layout choice: the packed words view is (tiles, blocks, width) -- one row
of ``width`` words per 32-element block -- so the unpack is pure static
column shifts with no in-kernel reshapes; the output tile is
(blocks, 32), whose row-major order is exactly element order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bitpack import pl_cdiv
from .rng import _TF_PARITY, _TF_ROT, _TF_ROUNDS

TILE = 1 << 14  # elements per grid step (16Ki): the (BLOCKS, 32) tiles pad
# lanes to 128, and the unrolled Threefry keeps ~30 tiles live, so bigger
# tiles blow the 16 MB VMEM budget.
BLOCKS = TILE // 32  # 32-element blocks per tile


def _threefry13_tile(k0, k1, ctr):
    """Threefry-2x32-13 on a 2D u32 counter array; returns (a, b)."""
    u32 = jnp.uint32
    k2 = k0 ^ k1 ^ u32(_TF_PARITY)
    x0 = ctr + k0
    x1 = jnp.zeros_like(ctr) + k1
    ks = (k0, k1, k2)

    def rot(x, r):
        return (x << u32(r)) | (x >> u32(32 - r))

    for r in range(_TF_ROUNDS):
        x0 = x0 + x1
        x1 = rot(x1, _TF_ROT[r % 8]) ^ x0
        if r % 4 == 3:
            j = r // 4 + 1
            x0 = x0 + ks[j % 3]
            x1 = x1 + ks[(j + 1) % 3] + u32(j)
    return x0, x1


def _decode_kernel(words_ref, key_ref, scal_ref, out_ref, *, width: int,
                   periodic: bool):
    """words (1, BLOCKS, width) -> out (1, BLOCKS, 32)."""
    tile = pl.program_id(0)
    k0 = key_ref[0]
    k1 = key_ref[1]
    x0 = scal_ref[0]
    dx_bin = scal_ref[1]  # (x1-x0) / 2^width, precomputed f32
    box = scal_ref[2]

    words = words_ref[0]
    mask = jnp.uint32((1 << width) - 1)
    cols = []
    for k in range(32):
        start = k * width
        j = start // 32
        off = start % 32
        v = words[:, j] >> jnp.uint32(off)
        if off + width > 32:
            v = v | (words[:, j + 1] << jnp.uint32(32 - off))
        cols.append(v & mask)
    bins = jnp.stack(cols, axis=1)  # (BLOCKS, 32), row-major element order

    # Dither: global element index i -> counter i >> 2, u16 lane i & 3.
    # NB: keep all scalar arithmetic in u32 -- under jax_enable_x64 a
    # python-int multiply promotes to i64, which Mosaic cannot legalize.
    elem0 = tile.astype(jnp.uint32) * jnp.uint32(TILE)
    idx = jax.lax.broadcasted_iota(jnp.uint32, (BLOCKS, 32), 0) * \
        jnp.uint32(32) + \
        jax.lax.broadcasted_iota(jnp.uint32, (BLOCKS, 32), 1) + \
        elem0
    ctr = idx >> jnp.uint32(2)
    lane = idx & jnp.uint32(3)
    a, b = _threefry13_tile(k0, k1, ctr)
    word = jnp.where(lane < 2, a, b)
    shift = jnp.where((lane & 1) == 0, jnp.uint32(0), jnp.uint32(16))
    h = (word >> shift) & jnp.uint32(0xFFFF)
    # Mosaic lacks a u32->f32 cast; values fit in i32, go via int.
    u = h.astype(jnp.int32).astype(jnp.float32) * jnp.float32(
        1.0 / (1 << 16))

    x = x0 + dx_bin * (bins.astype(jnp.int32).astype(jnp.float32) + u)
    if periodic:
        x = jnp.where(x >= box, x - box, x)
        x = jnp.where(x < 0, x + box, x)
    out_ref[0] = x


@functools.partial(jax.jit,
                   static_argnames=("width", "n", "periodic", "interpret"))
def decode_pallas(words, key, width: int, n: int, x0, dx, box=0.0,
                  periodic: bool = False, interpret: bool = False):
    """Pallas fused decode; semantics identical to
    ``fastpath.fast_uniform_decode`` for width >= 1.

    Whole tiles of ``TILE`` elements run through the kernel; a ragged tail
    is handled by the XLA fast path and concatenated.
    """
    if width == 0 or n == 0:
        raise ValueError("decode_pallas requires width >= 1, n >= 1")
    n_tiles = n // TILE
    tail = n - n_tiles * TILE
    words_per_tile = TILE * width // 32

    outs = []
    if n_tiles:
        wmain = words[: n_tiles * words_per_tile].reshape(
            n_tiles, BLOCKS, width)
        dx_bin = (jnp.float32(dx) / jnp.float32(1 << width))
        scal = jnp.stack([jnp.float32(x0), dx_bin, jnp.float32(box)])
        kernel = functools.partial(_decode_kernel, width=width,
                                   periodic=periodic)
        main = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, BLOCKS, width), lambda i: (i, i * 0, i * 0),
                             memory_space=pl.ANY
                             if interpret else pltpu.VMEM),
                pl.BlockSpec((2,), lambda i: (i * 0,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((3,), lambda i: (i * 0,),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, BLOCKS, 32),
                                   lambda i: (i, i * 0, i * 0),
                                   memory_space=pl.ANY
                                   if interpret else pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles, BLOCKS, 32),
                                           jnp.float32),
            interpret=interpret,
        )(wmain, jnp.asarray(key, dtype=jnp.uint32), scal)
        outs.append(main.reshape(-1))

    if tail:
        from . import fastpath
        tail_words = words[n_tiles * words_per_tile:]
        t = fastpath.fast_uniform_decode(
            tail_words, key, width, tail, x0, dx,
            periodic_width=(box if periodic else None),
            ctr0=n_tiles * TILE)
        outs.append(t)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs)


def _decode_rows_kernel(words_ref, key_ref, scal_ref, out_ref, *,
                        width: int, periodic: bool):
    """One (row, tile) grid step: words (1, 1, BLOCKS, width) ->
    out (1, 1, BLOCKS, 32).  Same math as ``_decode_kernel`` with
    per-row key/scalars; each row is an independent stream whose dither
    counter starts at 0."""
    tile = pl.program_id(1)
    k0 = key_ref[0, 0]
    k1 = key_ref[0, 1]
    x0 = scal_ref[0, 0]
    dx_bin = scal_ref[0, 1]
    box = scal_ref[0, 2]

    words = words_ref[0, 0]
    mask = jnp.uint32((1 << width) - 1)
    cols = []
    for k in range(32):
        start = k * width
        j = start // 32
        off = start % 32
        v = words[:, j] >> jnp.uint32(off)
        if off + width > 32:
            v = v | (words[:, j + 1] << jnp.uint32(32 - off))
        cols.append(v & mask)
    bins = jnp.stack(cols, axis=1)  # (BLOCKS, 32)

    elem0 = tile.astype(jnp.uint32) * jnp.uint32(TILE)
    idx = jax.lax.broadcasted_iota(jnp.uint32, (BLOCKS, 32), 0) * \
        jnp.uint32(32) + \
        jax.lax.broadcasted_iota(jnp.uint32, (BLOCKS, 32), 1) + \
        elem0
    ctr = idx >> jnp.uint32(2)
    lane = idx & jnp.uint32(3)
    a, b = _threefry13_tile(k0, k1, ctr)
    word = jnp.where(lane < 2, a, b)
    shift = jnp.where((lane & 1) == 0, jnp.uint32(0), jnp.uint32(16))
    h = (word >> shift) & jnp.uint32(0xFFFF)
    u = h.astype(jnp.int32).astype(jnp.float32) * jnp.float32(
        1.0 / (1 << 16))

    x = x0 + dx_bin * (bins.astype(jnp.int32).astype(jnp.float32) + u)
    if periodic:
        x = jnp.where(x >= box, x - box, x)
        x = jnp.where(x < 0, x + box, x)
    out_ref[0, 0] = x


@functools.partial(jax.jit,
                   static_argnames=("width", "n", "periodic", "interpret"))
def decode_pallas_rows(words, keys, width: int, n: int, x0, dx, box=0.0,
                       periodic: bool = False, interpret: bool = False):
    """Batched fused decode of R independent streams.

    ``words``: (R, n_words) packed streams, one per row (32-aligned
    element counts => no partial tail word); ``keys``: (R, 2) u32 dither
    keys; ``x0``/``dx``: (R,) f32 per-stream offset and full range;
    ``n``: elements per stream.  Bit-identical per row to
    ``decode_pallas(words[r], keys[r], ...)``.

    This is the sharded-codec decode hot path: vmapping the XLA unpack
    over (blocks, 3) leaves ~30x throughput on the table; here every
    (row, tile) pair is one VMEM-resident kernel step, and per-row
    scalars ride SMEM."""
    if width == 0 or n == 0 or n % 32:
        raise ValueError("decode_pallas_rows requires width>=1, 32 | n")
    rows = words.shape[0]
    words_per_tile = TILE * width // 32
    n_tiles = pl_cdiv(n, TILE)
    pad_words = n_tiles * words_per_tile - words.shape[1]
    if pad_words:
        words = jnp.pad(words, ((0, 0), (0, pad_words)))
    w4 = words.reshape(rows, n_tiles, BLOCKS, width)
    dx_bin = dx.astype(jnp.float32) / jnp.float32(1 << width)
    scal = jnp.stack(
        [x0.astype(jnp.float32), dx_bin,
         jnp.full((rows,), box, jnp.float32)], axis=1)  # (R, 3)
    kernel = functools.partial(_decode_rows_kernel, width=width,
                               periodic=periodic)
    out = pl.pallas_call(
        kernel,
        grid=(rows, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, BLOCKS, width),
                         lambda r, i: (r, i, r * 0, r * 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda r, i: (r, r * 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3), lambda r, i: (r, r * 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, BLOCKS, 32),
                               lambda r, i: (r, i, r * 0, r * 0),
                               memory_space=pl.ANY
                               if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, n_tiles, BLOCKS, 32),
                                       jnp.float32),
        interpret=interpret,
    )(w4, keys.astype(jnp.uint32), scal)
    return out.reshape(rows, n_tiles * TILE)[:, :n]
