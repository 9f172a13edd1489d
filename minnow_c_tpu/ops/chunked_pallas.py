"""Pallas TPU kernel: fused chunked-width delta decode (Coil v1.1 /
Sort v1.2 hot path).

The chunked codecs store per-chunk bit widths (patched frame of
reference).  Round-4's device path realized this with XLA gathers --
and on this chip EVERY dynamic-offset XLA movement caps at ~0.3-25 GB/s
(measured, exp/coil_sort_gather*.py: element gathers 0.44, row takes
17-24, dynamic_slice spans 9.3 GB/s), which left Coil at 1.5 GB/s.

This kernel avoids all of it: ONE grid step runs a ``fori_loop`` over
chunks (no per-grid-step ~3 us latency), manually double-buffering DMA
of each chunk's words straight from HBM at its (scalar-prefetched) word
offset -- arbitrary offsets, no BlockSpec alignment constraints -- then
per chunk: static-width funnel unpack (``lax.switch`` over only the
width classes PRESENT in the stream; the program cache is keyed by that
width set, which is stable across segments of one dataset), optional
un-zigzag, chunk-local inclusive prefix (the scan_pallas lane/sublane
ladder), a running carry in the loop carry (sequential chunks = exact
global u32 cumsum), and a double-buffered DMA of the finished chunk
back to HBM.  Packed words are read once and bins written once: the
whole delta-family decode in a single pass.

Mosaic spellings follow the documented landmines (memory/
axon-tpu-quirks.md): no lax.div/rem on traced scalars (buffer slots are
``ci & 1``), no SMEM stores (the carry rides the fori carry as a (1, 1)
vector), scalar<->vector dtype changes go through vector bitcasts, 2D
iota only.

Wire semantics: doc/wire_format.md (chunked planes); reference hot-loop
contract util.h:36-53.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decode_pallas import _threefry13_tile, _unpack_128
from .scan_pallas import _tile_prefix

KERNEL_OK_CHUNK = 16384  # the only chunk size the Mosaic path supports


def _undo_floats_tail(bins, k0, k1, tile0, x0, dx_bin, box,
                      periodic: bool, M: int):
    """Dither + bin undo of one chunk's bins (M, 128) row-major ->
    floats (M, 128).  The math is ``decode_pallas._decode_body`` minus
    the unpack (bit-identical dither spec: compact (32, M) Threefry
    counter grid, 16-bit grain static sublane selects); ``tile0`` is
    the chunk's global element index / 4 as a TRACED i32 (converted to
    u32 via a VECTOR bitcast -- scalar dtype conversions recurse in
    Mosaic)."""
    ctr_i = (jnp.broadcast_to(tile0, (32, M)) +
             jax.lax.broadcasted_iota(jnp.int32, (32, M), 1) * 32 +
             jax.lax.broadcasted_iota(jnp.int32, (32, M), 0))
    ctr = jax.lax.bitcast_convert_type(ctr_i, jnp.uint32)
    a, b = _threefry13_tile(k0, k1, ctr)                    # (32, M)
    S = jnp.stack([(a if (l & 3) < 2 else b)[l >> 2] for l in range(128)])
    liota = jax.lax.broadcasted_iota(jnp.uint32, (128, 1), 0)
    shc = (liota & jnp.uint32(1)) * jnp.uint32(16)
    h = (S >> shc) & jnp.uint32(0xFFFF)
    u = h.astype(jnp.int32).astype(jnp.float32) * jnp.float32(
        1.0 / (1 << 16))
    bins_lm = bins.T                                        # (128, M)
    x = x0 + dx_bin * (bins_lm.astype(jnp.int32).astype(jnp.float32) + u)
    if periodic:
        x = jnp.where(x >= box, x - box, x)
        x = jnp.where(x < 0, x + box, x)
    return x.T                                              # (M, 128)


def _chunk_body_vals(scratch_words, width: int, M: int):
    """Unpack one chunk's words (VMEM scratch, flat) at a static width
    into (M, 128) u32 values in row-major element order.

    The chunk body is stored COLUMN-MAJOR (the Coil v1.1 wire layout):
    flat[c * M + m] = word ``4*width*m + c`` of the chunk's natural
    bitstream -- precisely the (4*width, M) static-row-pair layout of
    ``_unpack_128``.  ``scratch_words`` arrives as a (128, 128) 2D
    vector (M = 128), so word row c is literally scratch row c: the
    chunk's W matrix is a STATIC row slice -- no reshape (Mosaic
    rejects 1D->2D vector shape casts entirely: both (M, 4w) and
    (4w, M) views of a flat slice failed 'unsupported shape cast')."""
    if width == 0:
        return scratch_words ^ scratch_words   # (128, 128) zeros
    w4 = scratch_words[: 4 * width, :]         # (4w, 128) static slice
    return _unpack_128(w4, width).T            # (M, 128)


def _delta_kernel(woff_ref, bidx_ref, body_ref, first_ref, key_ref,
                  fscal_ref, out_ref, in_scratch, out_scratch, in_sems,
                  out_sems, *, widths_present, chunk: int, n_chunks: int,
                  zigzag: bool, prefix: bool, floats: bool,
                  periodic: bool):
    """Single-step kernel: fori over chunks with double-buffered in/out
    DMA.  ``widths_present``: static tuple of the distinct widths; the
    per-chunk SMEM table ``bidx_ref`` holds each chunk's index into it.
    ``first_ref``: (1,) SMEM i32 whose BITS are added (u32) to every
    prefix value (the stream's element-0 anchor).  ``prefix=False``
    skips the cumsum (plain chunked unpack).  ``body_ref`` is 2D
    (word_rows, 128) and ``woff_ref`` holds ROW offsets (chunk word
    offsets are multiples of 512, so rows of 128 divide evenly).

    ``floats=True`` additionally applies the dither + bin undo
    (+ optional periodic rewrap) in-kernel -- the whole float-field
    decode in one pass: ``key_ref`` (2,) SMEM u32 dither key,
    ``fscal_ref`` (3,) SMEM f32 [x0, dx_bin, box]; output dtype f32.
    (Bins mode ignores both refs.)"""
    M = chunk // 128
    max_rows = 128  # width <= 32 => at most chunk words = 128 rows

    def _i32(v):
        # python ints lower as i64 (tpu.memref_slice rejects them), but
        # converting an ALREADY-TRACED scalar recurses in Mosaic (the
        # documented SMEM-scalar dtype-conversion landmine) -- coerce
        # only literals
        return jnp.int32(v) if isinstance(v, int) else v

    def in_dma(slot, ci):
        return pltpu.make_async_copy(
            body_ref.at[pl.ds(woff_ref[_i32(ci)], max_rows)],
            in_scratch.at[_i32(slot)], in_sems.at[_i32(slot)])

    def out_dma(slot, ci):
        return pltpu.make_async_copy(
            out_scratch.at[_i32(slot)],
            out_ref.at[pl.ds(_i32(ci) * M, M)], out_sems.at[_i32(slot)])

    in_dma(0, 0).start()

    branches = [functools.partial(_chunk_body_vals, width=int(wv), M=M)
                for wv in widths_present]

    def body(ci, carry):
        one = jnp.int32(1)     # literals lower as i64; force i32
        slot = ci & one        # bitwise: lax.rem fails to legalize
        nxt = (ci + one) & one

        @pl.when(ci + 1 < n_chunks)
        def _():
            in_dma(nxt, ci + 1).start()

        in_dma(slot, ci).wait()
        z = jax.lax.switch(bidx_ref[ci], branches, in_scratch[slot])

        if zigzag:
            z = (z >> jnp.uint32(1)) ^ (jnp.uint32(0) - (z & jnp.uint32(1)))
        if prefix:
            # The carry rides as a FULL value-replicated (M, 128)
            # vector: corner slices have positional vpad layouts Mosaic
            # cannot re-broadcast ('Broadcast in both sublanes and
            # lanes'), u32 jnp.sum promotes to u64 under x64, and
            # lax.reduce with a custom monoid is unimplemented -- a
            # roll-ladder tree sum (all-rotations) leaves every element
            # holding the chunk total, so carry updates are plain
            # vector adds with no reduction, slice, or broadcast.
            # u32 addition wraps mod 2^32: total == last prefix elem.
            total = z
            for k in (1, 2, 4, 8, 16, 32, 64):
                total = total + pltpu.roll(total, jnp.int32(k), 1)
            k = 1
            while k < M:
                total = total + pltpu.roll(total, jnp.int32(k), 0)
                k *= 2
            z = _tile_prefix(z) + carry
            carry = carry + total

        if floats:
            z = _undo_floats_tail(
                z, key_ref[0], key_ref[1], ci * jnp.int32(chunk // 4),
                fscal_ref[0], fscal_ref[1], fscal_ref[2], periodic, M)

        # the out slot was last used for chunk ci-2; its DMA must have
        # drained before the buffer is overwritten
        @pl.when(ci >= 2)
        def _():
            out_dma(slot, ci - 2).wait()
        out_scratch[slot] = z
        out_dma(slot, ci).start()
        return carry

    # element-0 anchor: SMEM i32 scalar -> (M, 128) replicated vector ->
    # u32 bitcast (scalar dtype conversion recurses in Mosaic; vector
    # bitcast is fine; full shape matches the replicated carry)
    first = jax.lax.bitcast_convert_type(
        jnp.broadcast_to(first_ref[0], (M, 128)), jnp.uint32)
    init = first if prefix else first ^ first
    # i32 bounds: under the package's x64 mode a python-int bound makes
    # the induction variable i64, and every i64<->i32 promotion in the
    # body recurses in Mosaic (the scalar dtype-conversion landmine)
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(n_chunks), body, init)

    # drain the last (up to) two output DMAs; slot parities are static
    if n_chunks >= 2:
        out_dma((n_chunks - 2) & 1, n_chunks - 2).wait()
    out_dma((n_chunks - 1) & 1, n_chunks - 1).wait()


@functools.partial(
    jax.jit, static_argnames=("widths_present", "chunk", "n_chunks",
                              "zigzag", "prefix", "floats", "periodic",
                              "interpret"))
def chunked_delta_bins(body, woff, bidx, first, widths_present,
                       chunk: int, n_chunks: int, zigzag: bool = True,
                       prefix: bool = True, key=None, fscal=None,
                       floats: bool = False, periodic: bool = False,
                       interpret: bool = False):
    """Fused chunked-width delta decode.

    ``body``: (>= total words + chunk,) u32 packed chunk bodies in
    ORIGINAL chunk order (zero-padded tail: the fixed-size DMA reads
    ``chunk`` words from every offset); ``woff``: (n_chunks,) i32 word
    offset of each chunk; ``bidx``: (n_chunks,) i32 index of each
    chunk's width in the static ``widths_present`` tuple; ``first``:
    (1,) i32 array holding the u32 bits added to every prefix (the
    stream's element-0 anchor).

    Returns (n_chunks*chunk,) u32: with ``prefix=True`` the exact
    inclusive cumsum of the (optionally un-zigzagged) decoded deltas
    plus ``first`` -- bit-identical to
    ``first + jnp.cumsum(unzigzag(unpack(...)))`` in u32 wrap
    (tests/test_pallas.py) -- i.e. the decoded bins of a Coil/Sort
    plane in one device pass."""
    M = chunk // 128
    if chunk != 16384:
        # M = 128 makes a chunk's word rows a static (4w, 128) slice of
        # the 2D scratch (Mosaic rejects 1D->2D vector shape casts) and
        # makes every chunk word offset a multiple of 128 (row-aligned
        # DMA source)
        raise ValueError(
            f"chunk {chunk}: the kernel requires chunk == 16384")
    if floats and not prefix:
        raise ValueError("floats mode implies prefix=True")
    if key is None:
        key = jnp.zeros((2,), jnp.uint32)
    if fscal is None:
        fscal = jnp.zeros((3,), jnp.float32)
    kernel = functools.partial(
        _delta_kernel,
        widths_present=tuple(int(w) for w in widths_present),
        chunk=chunk, n_chunks=n_chunks, zigzag=zigzag, prefix=prefix,
        floats=floats, periodic=periodic)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,          # woff, bidx
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # body (HBM)
            # explicit i*0 index maps: the default map returns
            # python-int 0, which lowers as i64 under x64 and fails to
            # legalize
            pl.BlockSpec((1,), lambda i, *_: (i * 0,),
                         memory_space=pltpu.SMEM),      # first (1,)
            pl.BlockSpec((2,), lambda i, *_: (i * 0,),
                         memory_space=pltpu.SMEM),      # dither key
            pl.BlockSpec((3,), lambda i, *_: (i * 0,),
                         memory_space=pltpu.SMEM),      # x0/dx_bin/box
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # out (HBM)
        scratch_shapes=[
            pltpu.VMEM((2, 128, 128), jnp.uint32),       # in slots (2D)
            pltpu.VMEM((2, M, 128),
                       jnp.float32 if floats else jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    if body.shape[0] % 128:
        raise ValueError("body must be padded to a multiple of 128 words")
    body2 = body.astype(jnp.uint32).reshape(-1, 128)
    # word offsets are multiples of 512 (chunk/32 words per width unit);
    # the kernel takes ROW offsets into the (rows, 128) body view
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_chunks * M, 128),
            jnp.float32 if floats else jnp.uint32),
        interpret=interpret,
    )((woff // 128).astype(jnp.int32), bidx.astype(jnp.int32),
      body2, first, key.astype(jnp.uint32), fscal.astype(jnp.float32))
    return out.reshape(-1)


def decode_chunked_stream(body, widths, first, chunk: int, n: int,
                          zigzag: bool = True, prefix: bool = True,
                          interpret: bool = False):
    """Host-orchestrated entry: derive offsets/branch tables from the
    (host) width table, pad the body for the fixed-size DMA, and run
    the kernel.  Output trimmed to ``n`` elements.  ``first`` is a
    host int (u32 bit pattern preserved exactly)."""
    widths = np.asarray(widths, dtype=np.int64)
    n_chunks = int(widths.shape[0])
    if n_chunks == 0:
        return jnp.zeros((0,), jnp.uint32)
    if int(widths.max(initial=0)) > 32:
        raise ValueError(
            f"chunk width {int(widths.max())} > 32 in stream width table")
    words_per_chunk = (chunk * widths) // 32
    woff = np.concatenate([[0], np.cumsum(words_per_chunk)[:-1]])
    present = tuple(sorted(int(w) for w in np.unique(widths)))
    lut = {w: i for i, w in enumerate(present)}
    bidx = np.asarray([lut[int(w)] for w in widths], dtype=np.int32)
    total = int(words_per_chunk.sum())
    body = jnp.asarray(body)
    want = -(-(total + chunk) // 128) * 128  # DMA overrun + 128-row pad
    pad = want - int(body.shape[0])
    if pad > 0:
        body = jnp.pad(body, (0, pad))
    first_arr = jnp.asarray(
        np.asarray([first], dtype=np.uint64).astype(np.uint32)
        .view(np.int32))
    out = chunked_delta_bins(
        body, jnp.asarray(woff.astype(np.int32)), jnp.asarray(bidx),
        first_arr, present, chunk, n_chunks, zigzag=zigzag,
        prefix=prefix, interpret=interpret)
    return out[:n]


def body_to_cmajor(natural: np.ndarray, width: int, chunk: int
                   ) -> np.ndarray:
    """Rearrange one chunk's packed words from natural bitstream order
    (word k = bits [32k, 32k+32)) to the v1.1 column-major wire layout
    (flat[c*M + m] = natural[4*width*m + c], M = chunk // 128)."""
    if width == 0:
        return natural
    M = chunk // 128
    return np.ascontiguousarray(
        np.asarray(natural).reshape(M, 4 * width).T).reshape(-1)


def body_from_cmajor(cmajor: np.ndarray, width: int, chunk: int
                     ) -> np.ndarray:
    """Inverse of :func:`body_to_cmajor`."""
    if width == 0:
        return cmajor
    M = chunk // 128
    return np.ascontiguousarray(
        np.asarray(cmajor).reshape(4 * width, M).T).reshape(-1)


def decode_chunked_stream_floats(body, widths, first, chunk: int, n: int,
                                 key, depth: int, x0, dx, box,
                                 periodic: bool, zigzag: bool = True,
                                 interpret: bool = False):
    """Whole float-field decode in ONE kernel pass: chunked unpack +
    un-zigzag + cumsum + Threefry dither + bin undo (+ periodic
    rewrap).  Bit-identical to ``decode_chunked_stream`` followed by
    the XLA undo tail (algo_coil_v1_1._coil11_undo_tail) -- same dither
    spec and per-op rounding (tests/test_pallas.py + the tpu_smoke
    gate).  ``dx`` is the full range; the bin width dx/2^depth is
    derived here exactly as the XLA tail does."""
    widths = np.asarray(widths, dtype=np.int64)
    n_chunks = int(widths.shape[0])
    if n_chunks == 0:
        return jnp.zeros((0,), jnp.float32)
    if int(widths.max(initial=0)) > 32:
        raise ValueError(
            f"chunk width {int(widths.max())} > 32 in stream width table")
    words_per_chunk = (chunk * widths) // 32
    woff = np.concatenate([[0], np.cumsum(words_per_chunk)[:-1]])
    present = tuple(sorted(int(w) for w in np.unique(widths)))
    lut = {w: i for i, w in enumerate(present)}
    bidx = np.asarray([lut[int(w)] for w in widths], dtype=np.int32)
    total = int(words_per_chunk.sum())
    body = jnp.asarray(body)
    want = -(-(total + chunk) // 128) * 128
    pad = want - int(body.shape[0])
    if pad > 0:
        body = jnp.pad(body, (0, pad))
    first_arr = jnp.asarray(
        np.asarray([first], dtype=np.uint64).astype(np.uint32)
        .view(np.int32))
    dx_bin = jnp.float32(dx) / jnp.float32(1 << depth)
    fscal = jnp.stack([jnp.float32(x0), dx_bin, jnp.float32(box)])
    out = chunked_delta_bins(
        body, jnp.asarray(woff.astype(np.int32)), jnp.asarray(bidx),
        first_arr, present, chunk, n_chunks, zigzag=zigzag, prefix=True,
        key=jnp.asarray(key, dtype=jnp.uint32), fscal=fscal,
        floats=True, periodic=periodic, interpret=interpret)
    return out[:n]
