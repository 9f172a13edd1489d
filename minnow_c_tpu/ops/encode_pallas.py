"""Pallas TPU kernels: fast-uniform encode side (bin clamp + pack).

PRODUCTION since round 2.  The earlier experimental kernel computed the
bin *division* in-kernel and was wire-wrong (Mosaic lowers f32 division
to an approximate reciprocal, ~0.2% of bins one-off vs the IEEE-exact
XLA path).  The split that is both exact and fast: XLA computes the
wire-defining float math -- ``delta = (x - x0) / range`` and
``scaled = delta * 2^width`` (an exact power-of-two scaling, so clamp
tests on ``scaled`` are bit-equivalent to clamp tests on ``delta``) --
and the Pallas kernel does only trunc/clamp (int ops) and the bitstream
pack.

Layout mirrors ops/decode_pallas.py: the kernel reads a dense
(M, 128) tile of values (element e = m*128 + l), transposes once to
(128, M) so lanes hold every-128th element, ORs static shifted row
pairs into the (4*width, M) word matrix (element l's bits land in word
rows (l*width)//32 and +1 -- all static), and transposes back to
(M, 4*width) so the store DMA runs lane-dense.  Measured on v5e
(chain-slope timing with D2H readback, see BENCH_NOTES.md): pack
~200 GB/s, full fused encode ~110 GB/s, vs 27.7 / 23.7 GB/s for the
XLA einsum-select fold it replaces on-chip.  Wire bits unchanged
(util.c:311-355 semantics; parity + digest tests enforce).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import bitpack, kernels

TILE = 1 << 19  # max elements per grid step
_TILE_CASCADE = (1 << 19, 1 << 16, 1 << 14)


def _scaled_to_bins(scaled, width: int, int_dtype=jnp.int32):
    """C cast semantics on the pre-scaled plane: trunc toward zero, clamp
    FP-error escapes (util.c:159-166).  ``scaled`` must be
    ``delta * 2^width`` with the division done in IEEE f32 (XLA); the
    power-of-two scaling is exact, so ``scaled < 0`` iff ``delta < 0``
    and ``scaled >= 2^width`` iff ``delta >= 1``."""
    nb = jnp.float32(np.float32(np.exp2(width, dtype=np.float64)))
    si = scaled.astype(int_dtype)
    si = jnp.where(scaled < 0, int_dtype(0),
                   jnp.where(scaled >= nb, int_dtype((1 << width) - 1), si))
    # NaN (constant plane: 0/0 upstream) -> bin 0 deterministically;
    # NaN->int is unspecified on Mosaic (see kernels.uniform_bin_index).
    si = jnp.where(jnp.isnan(scaled), int_dtype(0), si)
    return si.astype(jnp.uint32)


def _pack_body(B, *, width: int, from_f32: bool):
    """Shared kernel math: B (128, M) values -> (M, 4*width) words."""
    if from_f32:
        bins = _scaled_to_bins(B, width)
    else:
        bins = B & jnp.uint32((1 << width) - 1)
    rows = [None] * (4 * width)
    for l in range(128):
        c = (l * width) // 32
        sh = (l * width) % 32
        lo = bins[l] << jnp.uint32(sh) if sh else bins[l]
        rows[c] = lo if rows[c] is None else (rows[c] | lo)
        if sh + width > 32:
            hi = bins[l] >> jnp.uint32(32 - sh)
            rows[c + 1] = hi if rows[c + 1] is None else (rows[c + 1] | hi)
    return jnp.stack(rows).T                     # (M, 4*width)


def _pack_kernel(in_ref, out_ref, *, width: int, from_f32: bool):
    out_ref[0] = _pack_body(in_ref[0].T, width=width, from_f32=from_f32)


def _pack_tiles(vals, width: int, tile: int, from_f32: bool,
                interpret: bool):
    """Pack whole ``tile``-sized tiles; len(vals) % tile == 0."""
    M = tile // 128
    n_tiles = vals.shape[0] // tile
    v3 = vals.reshape(n_tiles, M, 128)
    kernel = functools.partial(_pack_kernel, width=width, from_f32=from_f32)
    space = pl.ANY if interpret else pltpu.VMEM
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((1, M, 128), lambda i: (i, i * 0, i * 0),
                               memory_space=space)],
        out_specs=pl.BlockSpec((1, M, 4 * width),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=space),
        out_shape=jax.ShapeDtypeStruct((n_tiles, M, 4 * width), jnp.uint32),
        interpret=interpret,
    )(v3)
    return out.reshape(-1)


@functools.partial(jax.jit,
                   static_argnames=("width", "n", "from_f32", "interpret"))
def pack_pallas(vals, width: int, n: int, from_f32: bool = False,
                interpret: bool = False):
    """Bitstream pack of ``vals[:n]`` at ``width`` bits; wire-identical
    to ``bitpack.uniform_pack``.  ``from_f32=True`` treats ``vals`` as
    the pre-scaled f32 plane (see ``_scaled_to_bins``).

    Consumes the stream with a tile cascade; the ragged tail below the
    smallest tile goes through the XLA fold (tile sizes are multiples of
    32, so every cascade boundary is word-aligned).
    """
    if from_f32 and width > 24:
        raise ValueError(
            f"float pack width {width} > 24 (f32 mantissa cap; the "
            "clamp constant is only exact to 24 bits)")
    if width == 0 or n == 0:
        return jnp.zeros((bitpack.packed_words(n, width),), jnp.uint32)
    if width == 32 and not from_f32:
        return vals[:n]
    outs = []
    done = 0
    for tile in _TILE_CASCADE:
        chunk = ((n - done) // tile) * tile
        if not chunk:
            continue
        outs.append(_pack_tiles(vals[done: done + chunk], width, tile,
                                from_f32, interpret))
        done += chunk
    if done < n:
        tail = vals[done:n]
        if from_f32:
            tail = _scaled_to_bins(tail, width)
        outs.append(bitpack.uniform_pack(tail, width))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs)


def _pack_rows_kernel(in_ref, out_ref, *, width: int, from_f32: bool,
                      group: int):
    for j in range(group):
        out_ref[j, 0] = _pack_body(in_ref[j, 0].T, width=width,
                                   from_f32=from_f32)


@functools.partial(jax.jit,
                   static_argnames=("width", "from_f32", "interpret"))
def pack_pallas_rows(vals, width: int, from_f32: bool = False,
                     interpret: bool = False):
    """Pack each row of ``vals`` (R, n) independently; wire-identical per
    row to ``bitpack.uniform_pack_rows`` (requires n % 32 == 0; result is
    the dense (R, (n//32)*width) word matrix).

    Rows are padded to a whole number of tiles; padded elements pack into
    words past the real stream (element counts divisible by 32 put every
    row's last real bit on a word boundary), which the final slice drops.
    """
    rows, n = vals.shape
    if n % 32 != 0:
        raise ValueError("pack_pallas_rows requires n % 32 == 0")
    if from_f32 and width > 24:
        raise ValueError(
            f"float pack width {width} > 24 (f32 mantissa cap)")
    out_words = (n // 32) * width
    if width == 0 or n == 0:
        return jnp.zeros((rows, out_words), dtype=jnp.uint32)
    if width == 32 and not from_f32:
        return vals
    tile = TILE
    while tile > 1 << 14 and tile // 2 >= n:
        tile //= 2
    M = tile // 128
    n_tiles = -(-n // tile)
    pad = n_tiles * tile - n
    if pad:
        vals = jnp.pad(vals, ((0, 0), (0, pad)))
    v4 = vals.reshape(rows, n_tiles, M, 128)
    from .decode_pallas import _rows_per_step
    G = _rows_per_step(rows, tile)
    kernel = functools.partial(_pack_rows_kernel, width=width,
                               from_f32=from_f32, group=G)
    space = pl.ANY if interpret else pltpu.VMEM
    out = pl.pallas_call(
        kernel,
        grid=(rows // G, n_tiles),
        in_specs=[pl.BlockSpec((G, 1, M, 128),
                               lambda r, i: (r, i, r * 0, r * 0),
                               memory_space=space)],
        out_specs=pl.BlockSpec((G, 1, M, 4 * width),
                               lambda r, i: (r, i, r * 0, r * 0),
                               memory_space=space),
        out_shape=jax.ShapeDtypeStruct((rows, n_tiles, M, 4 * width),
                                       jnp.uint32),
        interpret=interpret,
    )(v4)
    return out.reshape(rows, n_tiles * tile * width // 32)[:, :out_words]


@functools.partial(jax.jit,
                   static_argnames=("width", "periodic", "interpret"))
def _encode_pallas(x, width: int, box, periodic: bool,
                   interpret: bool = False):
    """Fused fast-uniform encode: unwrap -> minmax -> scale (XLA, the
    wire-defining IEEE math) -> trunc/clamp/pack (Pallas).  Returns
    (packed words, x0, range); bit-identical to
    ``fastpath.fast_uniform_encode`` (parity-tested).

    The unwrap is deliberately RECOMPUTED for each consumer (minmax
    reduction, scale pass) behind optimization barriers instead of
    materializing one shared unwrapped plane: undo_periodic is a couple
    of VPU ops (free) while the shared plane costs a full HBM write +
    reads and, measured on v5e, a ~5x slowdown of the whole encode
    (exp/encode_traffic.py: 12.5 -> 66.7 GB/s dispatch-bound, identical
    wire bits).  The barriers stop XLA from CSEing the two unwraps back
    into one materialized buffer."""
    n = x.shape[0]
    if not (1 <= width <= 24):
        raise ValueError(
            f"float encode width {width} not in [1, 24]: float depths cap "
            "at the f32 mantissa (quant.c:684-693); the trunc/clamp "
            "constants here are only exact to 24 bits")

    def unwrap(v):
        return kernels.undo_periodic(v, box) if periodic else v

    u1 = unwrap(jax.lax.optimization_barrier(x))
    x0 = jnp.min(u1)
    rng_v = jnp.max(u1) - x0
    u2 = unwrap(jax.lax.optimization_barrier(x))
    delta = kernels.exact_div(u2 - x0, rng_v)
    scaled = delta * jnp.float32(np.float32(np.exp2(width,
                                                    dtype=np.float64)))
    scaled = jax.lax.optimization_barrier(scaled)
    words = pack_pallas(scaled, width, n, from_f32=True,
                        interpret=interpret)
    return words, x0, rng_v


def encode_pallas(x, width: int, periodic_width=None,
                  interpret: bool = False):
    """Public wrapper: the box width rides as a traced operand so
    different box sizes share one compiled program per (width, n)."""
    periodic = periodic_width is not None
    box = jnp.float32(periodic_width if periodic else 0.0)
    return _encode_pallas(x, width, box, periodic, interpret=interpret)


# ---------------------------------------------------------------------------
# 'recip' scale mode: the whole encode pass (unwrap + scale + bin + pack)
# in ONE kernel
# ---------------------------------------------------------------------------
# The C-exact division map cannot run in Mosaic (approximate f32
# division), which forces the v1.0 encode into 3 HBM passes (minmax;
# scale, because the scaled plane must come from XLA; pack) =
# 17.75 B/elem at depth 14.  The 'recip' map
# (kernels.uniform_bin_index_recip: multiply by the exactly-rounded
# reciprocal) uses only exactly-rounded ops, so pass 2 and 3 fuse:
# minmax (read) + one kernel (read x, write words) = 9.75 B/elem.
# Measured on v5e (in-jit unrolled salt chain): 177.6 -> 299.2 GB/s,
# with Pallas/XLA bit parity on uniform, offset-normal, and
# boundary-adversarial inputs (exp/encode_fused2.py).


def _recip_body(xv, x0, recip, box, anchor, *, width: int, periodic: bool):
    """Shared math of the recip map on a (128, M) value tile: anchored
    unwrap (kernels.undo_periodic semantics; ``half`` = box * 0.5 is
    exact, matching XLA's box / 2), then
    trunc(clamp(((x - x0) * recip) * 2^width)) -- every op exactly
    rounded, bit-identical to kernels.uniform_bin_index_recip after
    kernels.undo_periodic."""
    if periodic:
        half = box * jnp.float32(0.5)
        xv = jnp.where(xv - anchor >= half, xv - box, xv)
        xv = jnp.where(xv - anchor < -half, xv + box, xv)
    nb = jnp.float32(np.float32(np.exp2(width, dtype=np.float64)))
    scaled = ((xv - x0) * recip) * nb
    return scaled


def _encode_recip_kernel(x_ref, scal_ref, out_ref, *, width: int,
                         periodic: bool):
    """x (1, M, 128) raw floats -> words (1, M, 4*width); scal (SMEM) =
    [x0, recip, box, anchor]."""
    scaled = _recip_body(x_ref[0].T, scal_ref[0], scal_ref[1], scal_ref[2],
                         scal_ref[3], width=width, periodic=periodic)
    out_ref[0] = _pack_body(scaled, width=width, from_f32=True)


def _encode_recip_tiles(x, scal, width: int, tile: int, periodic: bool,
                        interpret: bool):
    M = tile // 128
    n_tiles = x.shape[0] // tile
    x3 = x.reshape(n_tiles, M, 128)
    kernel = functools.partial(_encode_recip_kernel, width=width,
                               periodic=periodic)
    space = pl.ANY if interpret else pltpu.VMEM
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, M, 128), lambda i: (i, i * 0, i * 0),
                         memory_space=space),
            pl.BlockSpec((4,), lambda i: (i * 0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, M, 4 * width),
                               lambda i: (i, i * 0, i * 0),
                               memory_space=space),
        out_shape=jax.ShapeDtypeStruct((n_tiles, M, 4 * width), jnp.uint32),
        interpret=interpret,
    )(x3, scal)
    return out.reshape(-1)


def _recip_bins_xla(x, x0, recip, box, anchor, width: int, periodic: bool):
    """The recip map in XLA, op-for-op the kernel's sequence (used for
    ragged tails and as the CPU path)."""
    if periodic:
        half = box * jnp.float32(0.5)
        x = jnp.where(x - anchor >= half, x - box, x)
        x = jnp.where(x - anchor < -half, x + box, x)
    nb = jnp.float32(np.float32(np.exp2(width, dtype=np.float64)))
    scaled = ((x - x0) * recip) * nb
    si = scaled.astype(jnp.int32)
    si = jnp.where(scaled < 0, jnp.int32(0),
                   jnp.where(scaled >= nb, jnp.int32((1 << width) - 1), si))
    return jnp.where(jnp.isnan(scaled), jnp.int32(0), si).astype(jnp.uint32)


@functools.partial(jax.jit,
                   static_argnames=("width", "periodic", "interpret"))
def _encode_pallas_recip(x, width: int, box, periodic: bool,
                         interpret: bool = False):
    """Fused recip-mode encode: minmax (XLA) + one kernel.  Returns
    (packed words, x0, range)."""
    n = x.shape[0]
    if not (1 <= width <= 24):
        raise ValueError(
            f"float encode width {width} not in [1, 24] (f32 mantissa cap)")

    def unwrap(v):
        return kernels.undo_periodic(v, box) if periodic else v

    u1 = unwrap(jax.lax.optimization_barrier(x))
    x0 = jnp.min(u1)
    rng_v = jnp.max(u1) - x0
    recip = kernels.exact_recip(rng_v)  # rn(1/rng), all backends
    anchor = x[0]
    scal = jnp.stack([x0, recip, jnp.asarray(box, jnp.float32), anchor])

    outs = []
    done = 0
    for tile in _TILE_CASCADE:
        chunk = ((n - done) // tile) * tile
        if not chunk:
            continue
        outs.append(_encode_recip_tiles(x[done: done + chunk], scal, width,
                                        tile, periodic, interpret))
        done += chunk
    if done < n:
        bins = _recip_bins_xla(x[done:n], x0, recip,
                               jnp.asarray(box, jnp.float32), anchor,
                               width, periodic)
        outs.append(bitpack.uniform_pack(bins, width))
    words = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
    return words, x0, rng_v


def encode_pallas_recip(x, width: int, periodic_width=None,
                        interpret: bool = False):
    """Public wrapper for the fused recip-mode encode (scale_mode
    'recip'); see kernels.uniform_bin_index_recip for the map's spec."""
    periodic = periodic_width is not None
    box = jnp.float32(periodic_width if periodic else 0.0)
    return _encode_pallas_recip(x, width, box, periodic,
                                interpret=interpret)


def _encode_recip_rows_kernel(x_ref, scal_ref, out_ref, *, width: int,
                              periodic: bool, group: int):
    """One (row-group, tile) grid step: x (G, 1, M, 128) -> words
    (G, 1, M, 4*width); per-row scalars (R, 4) ride whole in SMEM,
    indexed by the row id (same pattern as
    decode_pallas._decode_rows_kernel)."""
    g = pl.program_id(0)
    for j in range(group):
        r = g * group + j
        scaled = _recip_body(x_ref[j, 0].T, scal_ref[r, 0], scal_ref[r, 1],
                             scal_ref[r, 2], scal_ref[r, 3], width=width,
                             periodic=periodic)
        out_ref[j, 0] = _pack_body(scaled, width=width, from_f32=True)


@functools.partial(jax.jit,
                   static_argnames=("width", "periodic", "interpret"))
def encode_pallas_recip_rows(x, x0, recip, box, anchor, width: int,
                             periodic: bool, interpret: bool = False):
    """Batched fused recip-mode encode of R independent streams:
    x (R, n) raw floats + per-row scalars (R,) -> (R, (n//32)*width)
    packed words.  Requires 32 | n (no partial tail word per row).
    Per row bit-identical to ``encode_pallas_recip`` at the same
    scalars."""
    from .decode_pallas import ROW_CHUNK, rows_kernel_eligible
    rows, n = x.shape
    if not rows_kernel_eligible(width, n) or not (1 <= width <= 24):
        raise ValueError(
            "encode_pallas_recip_rows requires 1<=width<=24 and 32 | n")
    if rows > ROW_CHUNK:
        return jnp.concatenate(
            [encode_pallas_recip_rows(
                x[i:i + ROW_CHUNK], x0[i:i + ROW_CHUNK],
                recip[i:i + ROW_CHUNK], box[i:i + ROW_CHUNK],
                anchor[i:i + ROW_CHUNK], width, periodic,
                interpret=interpret)
             for i in range(0, rows, ROW_CHUNK)])
    out_words = (n // 32) * width
    tile = TILE
    while tile > 1 << 14 and tile // 2 >= n:
        tile //= 2
    M = tile // 128
    n_tiles = -(-n // tile)
    pad = n_tiles * tile - n
    if pad:
        # Padded elements pack into words past each row's real stream
        # (32 | n puts the last real bit on a word boundary); the final
        # slice drops them.  Pad values go through the same map; their
        # bins are garbage but never observed.
        x = jnp.pad(x, ((0, 0), (0, pad)))
    x4 = x.reshape(rows, n_tiles, M, 128)
    scal = jnp.stack([x0.astype(jnp.float32), recip.astype(jnp.float32),
                      box.astype(jnp.float32),
                      anchor.astype(jnp.float32)], axis=1)  # (R, 4)
    from .decode_pallas import _rows_per_step
    G = _rows_per_step(rows, tile)
    kernel = functools.partial(_encode_recip_rows_kernel, width=width,
                               periodic=periodic, group=G)
    space = pl.ANY if interpret else pltpu.VMEM
    out = pl.pallas_call(
        kernel,
        grid=(rows // G, n_tiles),
        in_specs=[
            pl.BlockSpec((G, 1, M, 128),
                         lambda r, i: (r, i, r * 0, r * 0),
                         memory_space=space),
            pl.BlockSpec((rows, 4), lambda r, i: (r * 0, r * 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((G, 1, M, 4 * width),
                               lambda r, i: (r, i, r * 0, r * 0),
                               memory_space=space),
        out_shape=jax.ShapeDtypeStruct((rows, n_tiles, M, 4 * width),
                                       jnp.uint32),
        interpret=interpret,
    )(x4, scal)
    return out.reshape(rows, n_tiles * tile * width // 32)[:, :out_words]


def _stats_rows_kernel(x_ref, scal_ref, out_ref, *, periodic: bool,
                       group: int, n: int, tile: int):
    """One (row-group, tile) grid step of the rows stats pass: x
    (G, 1, M, 128) raw floats -> lane-partial min/max (G, 2, 128),
    accumulated across the tile grid dim (the out block revisits).

    Math is kernels.undo_periodic verbatim (anchored unwrap around the
    row's element 0, ``half = box * 0.5`` == XLA's ``box / 2`` exactly);
    f32 min/max are order-independent, so the result is bit-identical to
    the vmapped XLA stats whatever the reduction tree."""
    i = pl.program_id(1)
    g = pl.program_id(0)
    M = tile // 128
    # Elements past each row's true length (tile padding) are masked out
    # of the reduction; only the last tile can carry padding.
    lim = jnp.int32(n) - i * jnp.int32(tile)
    idx = (jax.lax.broadcasted_iota(jnp.int32, (M, 128), 0) * 128
           + jax.lax.broadcasted_iota(jnp.int32, (M, 128), 1))
    mask = idx < lim
    inf = jnp.float32(np.inf)
    for j in range(group):
        r = g * group + j
        xv = x_ref[j, 0]                               # (M, 128)
        if periodic:
            box = scal_ref[r, 0]
            anchor = scal_ref[r, 1]
            half = box * jnp.float32(0.5)
            xv = jnp.where(xv - anchor >= half, xv - box, xv)
            xv = jnp.where(xv - anchor < -half, xv + box, xv)
        mn = jnp.min(jnp.where(mask, xv, inf), axis=0)     # (128,)
        mx = jnp.max(jnp.where(mask, xv, -inf), axis=0)

        @pl.when(i == 0)
        def _init():
            out_ref[j, 0] = mn
            out_ref[j, 1] = mx

        @pl.when(i > 0)
        def _acc():
            out_ref[j, 0] = jnp.minimum(out_ref[j, 0], mn)
            out_ref[j, 1] = jnp.maximum(out_ref[j, 1], mx)


@functools.partial(jax.jit, static_argnames=("periodic", "interpret"))
def stats_pallas_rows(x, box, anchor, periodic: bool,
                      interpret: bool = False):
    """Batched stats of R independent streams: x (R, n) raw floats +
    per-row box/anchor (R,) -> (min (R,), max (R,)) of the periodically
    unwrapped values (kernels.undo_periodic), in one HBM read.

    Replaces the vmapped-XLA stats pass ahead of
    ``encode_pallas_recip_rows`` (the batched snapshot/SPMD writers);
    bit-identical to ``jnp.min/max(undo_periodic(row))`` per row."""
    from .decode_pallas import ROW_CHUNK, _rows_per_step
    rows, n = x.shape
    if rows > ROW_CHUNK:
        parts = [stats_pallas_rows(
            x[i:i + ROW_CHUNK], box[i:i + ROW_CHUNK],
            anchor[i:i + ROW_CHUNK], periodic, interpret=interpret)
            for i in range(0, rows, ROW_CHUNK)]
        return (jnp.concatenate([p[0] for p in parts]),
                jnp.concatenate([p[1] for p in parts]))
    tile = TILE
    while tile > 1 << 14 and tile // 2 >= n:
        tile //= 2
    M = tile // 128
    n_tiles = -(-n // tile)
    pad = n_tiles * tile - n
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))  # masked out of the reduce
    x4 = x.reshape(rows, n_tiles, M, 128)
    scal = jnp.stack([box.astype(jnp.float32),
                      anchor.astype(jnp.float32)], axis=1)       # (R, 2)
    G = _rows_per_step(rows, tile)
    kernel = functools.partial(_stats_rows_kernel, periodic=periodic,
                               group=G, n=n, tile=tile)
    space = pl.ANY if interpret else pltpu.VMEM
    out = pl.pallas_call(
        kernel,
        grid=(rows // G, n_tiles),
        in_specs=[
            pl.BlockSpec((G, 1, M, 128),
                         lambda r, i: (r, i, r * 0, r * 0),
                         memory_space=space),
            pl.BlockSpec((rows, 2), lambda r, i: (r * 0, r * 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((G, 2, 128), lambda r, i: (r, r * 0, r * 0),
                               memory_space=space),
        out_shape=jax.ShapeDtypeStruct((rows, 2, 128), jnp.float32),
        interpret=interpret,
    )(x4, scal)
    return jnp.min(out[:, 0, :], axis=1), jnp.max(out[:, 1, :], axis=1)


# ---------------------------------------------------------------------------
# Fully-fused rows encode: stats + recip + bin + pack in ONE HBM pass
# ---------------------------------------------------------------------------
# The split rows pipeline (stats kernel -> XLA recip/range glue -> encode
# kernel) reads the 100 MB input from HBM twice and round-trips the salt
# chain through HBM between the two pallas calls; at the VMEM-resident
# bench scale it measured 90 GB/s vs ~300 for the single-stream fused
# encode (round-4 VERDICT weak #3).  When the bit depth is KNOWN up
# front (the sharded codecs fix it at construction; the streaming/
# multihost writers pin it), the per-block range derivation can move
# INTO the encode kernel: each grid step holds one block's D rows in
# VMEM, computes the anchored-unwrap min/max per row, the block-shared
# range, an IEEE-exact reciprocal (approx seed + two exact-residual
# Newton corrections -- the kernels.exact_div algebra, mul/add/sub only,
# every op exactly rounded in Mosaic), then bins and packs -- one HBM
# read of x, one write of words, plus a tiny stats output for the wire
# meta.  Bit parity with the split path (stats_pallas_rows +
# kernels.exact_recip + encode_pallas_recip_rows) is enforced by
# tests/test_pallas.py and the on-chip smoke gate.


def _exact_recip_scalar(d):
    """rn(1/d) from inside a kernel: approx-reciprocal seed + three
    exact-residual Newton steps (TwoProd residual; only exactly-rounded
    mul/add/sub).  Three steps because the Mosaic seed is coarser than
    XLA's ~1-ulp reciprocal; the final error is far below the rounding
    boundary (parity vs kernels.exact_recip is test- and smoke-gated).
    ``d`` is a (1, 1) f32 vector (scalar extracts recurse in Mosaic)."""
    one = jnp.float32(1.0)
    r0 = pl.reciprocal(d, approx=True)
    q = r0
    for _ in range(3):
        p, e = kernels._two_prod(q, d)
        q = q + ((one - p) - e) * r0
    # overflow/degenerate guard (mirrors kernels.exact_div): keep the
    # seed where the correction went non-finite (range 0 -> inf stays
    # inf, so constant planes still bin to 0 via the NaN clamp)
    return jnp.where(jnp.isfinite(q), q, r0)


def _encode_recip_fused_kernel(x_ref, scal_ref, w_ref, st_ref, *,
                               width: int, periodic: bool, dims: int,
                               M: int):
    """One grid step = one block: x (1, dims*M, 128) raw floats (the
    dims rows stacked along the sublane-tile axis -- a second-minor dim
    of ``dims`` would be padded to 8 sublanes by Mosaic, 2.7x the DMA
    traffic for dims=3) -> words (1, dims*M, 4*width) + stats
    (1, dims, 256) [mn | mx lanes].  scal (SMEM) (B, 1 + dims): [box,
    anchor_0..anchor_{dims-1}] per block."""
    b = pl.program_id(0)
    box = scal_ref[b, 0]

    def unwrap(r):
        xv = x_ref[0, r * M:(r + 1) * M]       # (M, 128) static slice
        if periodic:
            anchor = scal_ref[b, 1 + r]
            half = box * jnp.float32(0.5)
            xv = jnp.where(xv - anchor >= half, xv - box, xv)
            xv = jnp.where(xv - anchor < -half, xv + box, xv)
        return xv

    mns, mxs = [], []
    for r in range(dims):
        xv = unwrap(r)
        mns.append(jnp.min(xv))
        mxs.append(jnp.max(xv))
    rng = mxs[0] - mns[0]
    for r in range(1, dims):
        rng = jnp.maximum(rng, mxs[r] - mns[r])
    recip = _exact_recip_scalar(jnp.full((1, 1), rng, jnp.float32))[0, 0]
    nb = jnp.float32(np.float32(np.exp2(width, dtype=np.float64)))
    for r in range(dims):
        # RECOMPUTE the unwrap (deterministic, bit-identical) rather
        # than holding dims live (M, 128) arrays across both phases --
        # the held values spill VMEM registers, costing more traffic
        # than the recompute
        scaled = ((unwrap(r).T - mns[r]) * recip) * nb      # (128, M)
        w_ref[0, r * M:(r + 1) * M] = _pack_body(scaled, width=width,
                                                 from_f32=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 256), 1)
        st_ref[0, r] = jnp.where(lane < 128, mns[r], mxs[r])[0]


@functools.partial(jax.jit,
                   static_argnames=("width", "periodic", "interpret"))
def encode_recip_fused_blocks(x, box, anchors, width: int, periodic: bool,
                              interpret: bool = False):
    """Fully-fused recip encode of (B, D, n) blocks with the BLOCK-shared
    range derived in-kernel: returns (words (B, D, (n//32)*width),
    mn (B, D), mx (B, D)).  Requires 32 | n, 1 <= width <= 24, and the
    block's D rows to fit VMEM (n*D <= ~2^19).  Bit-identical to the
    split pipeline: stats_pallas_rows -> max-range ->
    kernels.exact_recip -> encode_pallas_recip_rows."""
    B, D, n = x.shape
    from .decode_pallas import rows_kernel_eligible
    if not rows_kernel_eligible(width, n) or not (1 <= width <= 24):
        raise ValueError(
            "encode_recip_fused_blocks requires 1<=width<=24 and 32 | n")
    if n % 128:
        raise ValueError("encode_recip_fused_blocks requires 128 | n")
    if D * n > (1 << 19):
        raise ValueError(
            f"block of {D}x{n} values exceeds the fused kernel's VMEM "
            "budget; use the split stats+encode path")
    M = n // 128
    x4 = x.reshape(B, D * M, 128)
    scal = jnp.concatenate(
        [jnp.full((B, 1), box, jnp.float32),
         anchors.astype(jnp.float32)], axis=1)               # (B, 1+D)
    kernel = functools.partial(_encode_recip_fused_kernel, width=width,
                               periodic=periodic, dims=D, M=M)
    space = pl.ANY if interpret else pltpu.VMEM
    words, st = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, D * M, 128), lambda b: (b, b * 0, b * 0),
                         memory_space=space),
            pl.BlockSpec((B, 1 + D), lambda b: (b * 0, b * 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, D * M, 4 * width),
                         lambda b: (b, b * 0, b * 0),
                         memory_space=space),
            pl.BlockSpec((1, D, 256), lambda b: (b, b * 0, b * 0),
                         memory_space=space),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, D * M, 4 * width), jnp.uint32),
            jax.ShapeDtypeStruct((B, D, 256), jnp.float32),
        ],
        interpret=interpret,
    )(x4, scal)
    return (words.reshape(B, D, M * 4 * width),
            st[:, :, 0], st[:, :, 128])
