"""Pallas TPU kernel: fused fast-uniform decode.

One kernel performs the whole decode hot path per tile -- bitstream unpack
(static funnel shifts), Threefry-2x32-13 dither (the stream-format RNG of
ops/rng.py, re-implemented with identical arithmetic), bin undo, and
periodic rewrap -- entirely in VMEM, with no HBM intermediates between
stages.  Wire layout and output bits are identical to
``fastpath.fast_uniform_decode`` (cross-checked in tests).

Layout (v5e-measured): the kernel computes x[l, m] for element
e = m*128 + l, i.e. *lanes hold every-128th element*.  Then:

- the packed words ride in as (4*width, M) [M = tile/128]: row c holds
  word ``4*width*m + c`` of the tile, so the unpack for output row l is a
  static row pair (J, J2) plus a row-constant funnel shift -- all
  full-lane ops.  The (M, 4w) -> (4w, M) rearrangement happens in XLA
  before the kernel (contiguous reshape + swapaxes; measured ~free when
  fused into the surrounding program).
- Threefry runs on a compact (32, M) counter grid (4 elements share a
  counter: ctr(e) = e>>2 = 32m + (l>>2)), and the 16-bit grain of row l
  is a static sublane select -- no per-element cipher redundancy.
- the output block is x.T = (M, 128): its minor dim is a full 128 lanes,
  so the store DMA runs dense.

This layout is worth ~21x over the earlier (blocks, 32)-shaped kernel,
whose 32-lane output blocks made every store DMA 4x-padded and whose
(512, width) words block wasted ~12x on lane padding; on a v5e the
measured end-to-end rate moved from ~9 GB/s to ~190 GB/s of decoded f32
(chain-slope timing with device-to-host readback; see BENCH_NOTES.md).

Reference semantics: util.c:368-417 (undo bin index + dither),
quant.c:codes (periodic rewrap); dither spec doc/wire_format.md.
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

TILE = 1 << 19  # max elements per grid step; VMEM-bounded (~12 MB live)
_TILE_CASCADE = (1 << 19, 1 << 16, 1 << 14)  # big tiles, then mop-up sizes
ROW_CHUNK = 1024  # max streams per rows-kernel call: the per-row key and
# scalar tables ride whole in SMEM (rows x 5 u32 words), so cap the rows
# per pallas_call to bound scalar-memory use; many-block snapshots (a 1B
# file has >=100 blocks/field) split into chunks whose outputs are
# concatenated.


def _rows_per_step(rows: int, tile: int) -> int:
    """Rows per grid step for the rows kernels.

    v5e grid steps are latency-bound at ~3 us regardless of block size
    (exp/rows_breakdown.py: 48 steps of 2 MB and 192 steps of 0.5 MB
    take the same per-step time), so short rows are grouped until each
    step moves ~TILE elements again.  The group size is the largest
    divisor of ``rows`` within the cap: no row padding, so the kernel
    math and wire bits are untouched (snapshot float paths have
    rows = 3*B, so at least 3x grouping whenever the cap allows)."""
    cap = min(max(1, TILE // tile), rows)
    g = 1
    for d in range(1, cap + 1):
        if rows % d == 0:
            g = d
    return g


def rows_kernel_eligible(width: int, n: int) -> bool:
    """Shared gate for dispatching to the rows kernels
    (decode_pallas_rows / unpack_pallas_rows): they require a positive
    width and 32-aligned element count (no partial tail word per row).
    Every dispatch site must use this -- hand-copied gates have drifted
    before."""
    return width >= 1 and n >= 1 and n % 32 == 0


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


def _decode_body(W, k0, k1, x0, dx_bin, box, tile0, *, width: int,
                 periodic: bool):
    """Shared kernel math: W (4*width, M) words -> x (M, 128) f32.

    ``tile0`` is the global element index of this tile's first element,
    divided by 4 (a u32 scalar; the Threefry counter base).
    """
    M = W.shape[1]

    # ctr(e) = e>>2 = base + 32m + (l>>2): compact (32, M) cipher grid.
    ctr = tile0 + \
        jax.lax.broadcasted_iota(jnp.uint32, (32, M), 1) * jnp.uint32(32) + \
        jax.lax.broadcasted_iota(jnp.uint32, (32, M), 0)
    a, b = _threefry13_tile(k0, k1, ctr)  # (32, M)

    bins = _unpack_128(W, width)                                # (128, M)

    # Grain of row l: 16-bit half (l&1) of cipher word (l&3)<2 ? a : b,
    # at counter row l>>2 -- static sublane selects.
    S = jnp.stack([(a if (l & 3) < 2 else b)[l >> 2] for l in range(128)])
    liota = jax.lax.broadcasted_iota(jnp.uint32, (128, 1), 0)
    shc = (liota & jnp.uint32(1)) * jnp.uint32(16)
    h = (S >> shc) & jnp.uint32(0xFFFF)
    # Mosaic lacks a u32->f32 cast; values fit in i32, go via int.
    u = h.astype(jnp.int32).astype(jnp.float32) * jnp.float32(
        1.0 / (1 << 16))

    x = x0 + dx_bin * (bins.astype(jnp.int32).astype(jnp.float32) + u)
    if periodic:
        x = jnp.where(x >= box, x - box, x)
        x = jnp.where(x < 0, x + box, x)
    return x.T                                                  # (M, 128)


def _decode_kernel(words_ref, key_ref, scal_ref, out_ref, *, width: int,
                   periodic: bool, tile_elems: int, elem0: int):
    """words (1, 4*width, M) -> out (1, M, 128); ``elem0`` offsets the
    dither counters when this pallas_call covers a later slice of the
    stream (tile cascade)."""
    tile = pl.program_id(0)
    tile0 = jnp.uint32(elem0 // 4) + \
        tile.astype(jnp.uint32) * jnp.uint32(tile_elems // 4)
    out_ref[0] = _decode_body(
        words_ref[0], key_ref[0], key_ref[1], scal_ref[0], scal_ref[1],
        scal_ref[2], tile0, width=width, periodic=periodic)


def _decode_tiles(words, key, scal, width: int, n: int, tile: int,
                  elem0: int, periodic: bool, interpret: bool):
    """Run whole ``tile``-sized tiles of one stream; n % tile == 0."""
    M = tile // 128
    n_tiles = n // tile
    wpt = tile * width // 32
    w3 = jnp.swapaxes(words[: n_tiles * wpt].reshape(n_tiles, M, 4 * width),
                      1, 2)
    kernel = functools.partial(_decode_kernel, width=width,
                               periodic=periodic, tile_elems=tile,
                               elem0=elem0)
    space = pl.ANY if interpret else pltpu.VMEM
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 4 * width, M), lambda i: (i, i * 0, i * 0),
                         memory_space=space),
            pl.BlockSpec((2,), lambda i: (i * 0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((3,), lambda i: (i * 0,), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, M, 128), lambda i: (i, i * 0, i * 0),
                               memory_space=space),
        out_shape=jax.ShapeDtypeStruct((n_tiles, M, 128), jnp.float32),
        interpret=interpret,
    )(w3, key, scal)
    return out.reshape(-1)


@functools.partial(jax.jit,
                   static_argnames=("width", "n", "periodic", "interpret"))
def decode_pallas(words, key, width: int, n: int, x0, dx, box=0.0,
                  periodic: bool = False, interpret: bool = False):
    """Pallas fused decode; semantics identical to
    ``fastpath.fast_uniform_decode`` for width >= 1.

    The stream is consumed by a cascade of tile sizes (big tiles for the
    bulk, smaller ones for the remainder); a final ragged tail below the
    smallest tile is handled by the XLA fast path and concatenated.
    """
    if width == 0 or n == 0:
        raise ValueError("decode_pallas requires width >= 1, n >= 1")
    if width > 24:
        raise ValueError(
            f"float decode width {width} > 24: float depths cap at the "
            "f32 mantissa (quant.c:684-693), and the kernel's "
            "int32-routed bin->f32 cast is only exact to 24 bits")
    key = jnp.asarray(key, dtype=jnp.uint32)
    dx_bin = jnp.float32(dx) / np.float32(np.exp2(width, dtype=np.float64))
    scal = jnp.stack([jnp.float32(x0), dx_bin, jnp.float32(box)])

    outs = []
    done = 0
    for tile in _TILE_CASCADE:
        chunk = ((n - done) // tile) * tile
        if not chunk:
            continue
        w0 = done * width // 32
        outs.append(_decode_tiles(
            words[w0: w0 + chunk * width // 32], key, scal, width, chunk,
            tile, done, periodic, interpret))
        done += chunk
    if done < n:
        from . import fastpath
        t = fastpath.fast_uniform_decode(
            words[done * width // 32:], key, width, n - done, x0, dx,
            periodic_width=(box if periodic else None), ctr0=done)
        outs.append(t)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs)


def _unpack_128(W, width: int):
    """Shared unpack: W (4*width, M) words -> bins (128, M) u32.

    Element e = m*128 + l starts at bit e*width; its word is
    4*width*m + (l*width)//32 -- i.e. row (l*width)//32 of W, plus the
    next row when the field straddles a word boundary.  Static row pairs
    + row-constant funnel shifts: all full-lane ops."""
    mask = jnp.uint32((1 << width) - 1) if width < 32 else \
        jnp.uint32(0xFFFFFFFF)
    js = [(l * width) // 32 for l in range(128)]
    J = jnp.stack([W[j] for j in js])
    J2 = jnp.stack([W[min(j + 1, 4 * width - 1)] for j in js])
    liota = jax.lax.broadcasted_iota(jnp.uint32, (128, 1), 0)
    offc = (liota * jnp.uint32(width)) & jnp.uint32(31)
    sh2c = (jnp.uint32(32) - offc) & jnp.uint32(31)
    smask = jnp.where(offc > jnp.uint32(32 - width),
                      jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
    return ((J >> offc) | ((J2 << sh2c) & smask)) & mask


def _rows_tiling(words, width: int, n: int, pretranspose: bool = True):
    """Shared (R, n_words) -> tiled layout for the rows kernels: adaptive
    tile size, zero-pad to whole tiles, and (``pretranspose=True``) the
    XLA pre-transpose into the (4*width, M) static-row-pair unpack
    layout, else the natural (M, 4*width) layout (kernel transposes in
    VMEM)."""
    rows = words.shape[0]
    tile = TILE
    while tile > 1 << 14 and tile // 2 >= n:
        tile //= 2
    M = tile // 128
    words_per_tile = tile * width // 32
    n_tiles = pl_cdiv(n, tile)
    pad_words = n_tiles * words_per_tile - words.shape[1]
    if pad_words:
        words = jnp.pad(words, ((0, 0), (0, pad_words)))
    w4 = words.reshape(rows, n_tiles, M, 4 * width)
    if pretranspose:
        w4 = jnp.swapaxes(w4, 2, 3)
    return w4, rows, n_tiles, M, tile


_PRETRANSPOSE_OVERRIDE = None  # experiment hook (exp/prof100m_unrolled)


def _rows_pretranspose_default(rows: int, n: int) -> bool:
    """Layout choice for the rows kernels: the XLA pre-transpose wins in
    the VMEM-resident regime (~100 MB working sets: 292 vs 261 GB/s,
    exp/decode_notranspose.py) but becomes the DOMINANT cost in the
    HBM-bound regime -- at 8x12.5M (1.2 GB decoded) the materialized
    transpose pass alone measured ~23 ms of a 38.6 ms decode step
    (exp/prof100m_unrolled.py, round 4).  Past the VMEM scale, transpose
    in-kernel instead."""
    if _PRETRANSPOSE_OVERRIDE is not None:
        return _PRETRANSPOSE_OVERRIDE
    return rows * n * 4 <= 192 * 1024 * 1024


def _unpack_rows_kernel(words_ref, out_ref, *, width: int, group: int,
                        natural: bool = False):
    for j in range(group):
        W = words_ref[j, 0].T if natural else words_ref[j, 0]
        out_ref[j, 0] = _unpack_128(W, width).T


@functools.partial(jax.jit,
                   static_argnames=("width", "n", "interpret",
                                    "pretranspose"))
def unpack_pallas_rows(words, width: int, n: int, interpret: bool = False,
                       pretranspose=None):
    """Batched unpack of R independent streams: (R, n_words) packed u32
    -> (R, n) bin values; per row bit-identical to
    ``bitpack.uniform_unpack(words[r], width, n)`` (requires 32 | n).
    The lane-dense layout of ``decode_pallas_rows`` without the dither /
    float stages -- the IDs-decode hot path."""
    if not rows_kernel_eligible(width, n):
        raise ValueError("unpack_pallas_rows requires width>=1, 32 | n")
    if pretranspose is None:
        pretranspose = _rows_pretranspose_default(words.shape[0], n)
    if words.shape[0] > ROW_CHUNK:
        return jnp.concatenate(
            [unpack_pallas_rows(words[i:i + ROW_CHUNK], width, n,
                                interpret=interpret,
                                pretranspose=pretranspose)
             for i in range(0, words.shape[0], ROW_CHUNK)])
    w4, rows, n_tiles, M, tile = _rows_tiling(words, width, n,
                                              pretranspose)
    G = _rows_per_step(rows, tile)
    kernel = functools.partial(_unpack_rows_kernel, width=width, group=G,
                               natural=not pretranspose)
    space = pl.ANY if interpret else pltpu.VMEM
    in_block = (G, 1, 4 * width, M) if pretranspose else \
        (G, 1, M, 4 * width)
    out = pl.pallas_call(
        kernel,
        grid=(rows // G, n_tiles),
        in_specs=[
            pl.BlockSpec(in_block,
                         lambda r, i: (r, i, r * 0, r * 0),
                         memory_space=space),
        ],
        out_specs=pl.BlockSpec((G, 1, M, 128),
                               lambda r, i: (r, i, r * 0, r * 0),
                               memory_space=space),
        out_shape=jax.ShapeDtypeStruct((rows, n_tiles, M, 128),
                                       jnp.uint32),
        interpret=interpret,
    )(w4)
    return out.reshape(rows, n_tiles * tile)[:, :n]


def _decode_rows_kernel(words_ref, key_ref, scal_ref, out_ref, *,
                        width: int, periodic: bool, tile_elems: int,
                        group: int, natural: bool = False):
    """One (row-group, tile) grid step: words (G, 1, 4*width, M) (or the
    natural (G, 1, M, 4*width) when ``natural`` -- transposed in VMEM) ->
    out (G, 1, M, 128).  Each row is an independent stream whose dither
    counter restarts at 0.

    The per-row key/scalar tables ride whole in SMEM and are indexed by
    the row id: Mosaic's block-shape rule (last two dims divisible by
    (8, 128) or equal to the array's) rejects a (1, 2) SMEM window, and
    SMEM scalars support dynamic indexing anyway."""
    g = pl.program_id(0)
    tile = pl.program_id(1)
    tile0 = tile.astype(jnp.uint32) * jnp.uint32(tile_elems // 4)
    for j in range(group):
        r = g * group + j
        W = words_ref[j, 0].T if natural else words_ref[j, 0]
        out_ref[j, 0] = _decode_body(
            W, key_ref[r, 0], key_ref[r, 1], scal_ref[r, 0],
            scal_ref[r, 1], scal_ref[r, 2], tile0, width=width,
            periodic=periodic)


@functools.partial(jax.jit,
                   static_argnames=("width", "n", "periodic", "interpret",
                                    "pretranspose"))
def decode_pallas_rows(words, keys, width: int, n: int, x0, dx, box=0.0,
                       periodic: bool = False, interpret: bool = False,
                       pretranspose=None):
    """Batched fused decode of R independent streams.

    ``words``: (R, n_words) packed streams, one per row (32-aligned
    element counts => no partial tail word); ``keys``: (R, 2) u32 dither
    keys; ``x0``/``dx``: (R,) f32 per-stream offset and full range;
    ``n``: elements per stream.  Bit-identical per row to
    ``decode_pallas(words[r], keys[r], ...)``.

    This is the sharded-codec decode hot path: every (row, tile) pair is
    one VMEM-resident kernel step with dense-lane stores, and per-row
    scalars ride SMEM.  The tile size adapts to ``n`` (padding the last
    tile's words with zeros; the padded elements decode to garbage that
    the final slice discards).

    ``pretranspose``: words layout choice (bit-identical either way);
    None = auto by working-set size (see ``_rows_pretranspose_default``).
    """
    if not rows_kernel_eligible(width, n):
        raise ValueError("decode_pallas_rows requires width>=1, 32 | n")
    if width > 24:
        raise ValueError(
            f"float decode width {width} > 24 (f32 mantissa cap; see "
            "decode_pallas)")
    if pretranspose is None:
        pretranspose = _rows_pretranspose_default(words.shape[0], n)
    if words.shape[0] > ROW_CHUNK:
        return jnp.concatenate(
            [decode_pallas_rows(words[i:i + ROW_CHUNK],
                                keys[i:i + ROW_CHUNK], width, n,
                                x0[i:i + ROW_CHUNK], dx[i:i + ROW_CHUNK],
                                box=box, periodic=periodic,
                                interpret=interpret,
                                pretranspose=pretranspose)
             for i in range(0, words.shape[0], ROW_CHUNK)])
    w4, rows, n_tiles, M, tile = _rows_tiling(words, width, n,
                                              pretranspose)
    dx_bin = dx.astype(jnp.float32) / np.float32(
        np.exp2(width, dtype=np.float64))
    scal = jnp.stack(
        [x0.astype(jnp.float32), dx_bin,
         jnp.full((rows,), box, jnp.float32)], axis=1)  # (R, 3)
    G = _rows_per_step(rows, tile)
    kernel = functools.partial(_decode_rows_kernel, width=width,
                               periodic=periodic, tile_elems=tile,
                               group=G, natural=not pretranspose)
    space = pl.ANY if interpret else pltpu.VMEM
    in_block = (G, 1, 4 * width, M) if pretranspose else \
        (G, 1, M, 4 * width)
    out = pl.pallas_call(
        kernel,
        grid=(rows // G, n_tiles),
        in_specs=[
            pl.BlockSpec(in_block,
                         lambda r, i: (r, i, r * 0, r * 0),
                         memory_space=space),
            pl.BlockSpec((rows, 2), lambda r, i: (r * 0, r * 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, 3), lambda r, i: (r * 0, r * 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((G, 1, M, 128),
                               lambda r, i: (r, i, r * 0, r * 0),
                               memory_space=space),
        out_shape=jax.ShapeDtypeStruct((rows, n_tiles, M, 128),
                                       jnp.float32),
        interpret=interpret,
    )(w4, keys.astype(jnp.uint32), scal)
    return out.reshape(rows, n_tiles * tile)[:, :n]
