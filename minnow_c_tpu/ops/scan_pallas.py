"""Pallas TPU kernel: u32 prefix sum (cumsum) at memory speed.

``jnp.cumsum`` lowers to an O(n log n) reduce-window on TPU and measured
~0.4 GB/s-class on 25M-element streams -- it is THE bottleneck of the
delta-family decodes (Diff/Coil/Sort: unzigzag -> cumsum -> bins;
round-4 device-phase measurements in bench_kernels.json).

Two-phase streaming design (no SMEM writes -- Mosaic recurses when a
kernel stores to an SMEM scalar, the documented landmine):

1. XLA: per-tile totals (one cheap HBM reduce) and their exclusive
   prefix (tiny, n_tiles elements) -> the per-tile carry table;
2. Pallas: per tile, a lane-prefix (7 shifted adds along the 128-lane
   axis) + a sublane-prefix of row totals (log2(M) shifted adds) build
   the tile-local inclusive prefix; the tile's carry is READ from the
   SMEM table at program_id (the same read-only SMEM pattern as the
   rows decode kernels).

All arithmetic is u32 addition (wraps mod 2^32 exactly like the wire
math of kernels.u32_unzigzag / the reference's uint32_t sums).
Bit-identical to ``jnp.cumsum`` on u32 (tests/test_pallas; u32 addition
is associative mod 2^32, so the reduction split cannot change bits).

Reference semantics: the running sums of algo_Diff/Coil/Sort decode
(doc/wire_format.md; util.c:358-406 analog).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1 << 19
_TILE_CASCADE = (1 << 19, 1 << 16, 1 << 14)


def _tile_prefix(x):
    """Inclusive prefix over a (M, 128) u32 tile in row-major element
    order.

    Shifted adds use ``pltpu.roll`` + iota masks.  Mosaic rejects both
    jnp.pad fill-constants (scalar-convert recursion, the documented
    landmine) and concatenates of offset slices ("result/input offset
    mismatch on non-concat dimension"); roll+mask uses only supported
    vector ops, and the zero fill is the constant-free ``x ^ x``."""
    M = x.shape[0]
    zero = x ^ x
    lane = jax.lax.broadcasted_iota(jnp.int32, (M, 128), 1)
    # lane prefix: 7 shifted adds along the 128-lane axis
    for k in (1, 2, 4, 8, 16, 32, 64):
        rolled = pltpu.roll(x, jnp.int32(k), 1)  # i32: a python
        # int shift lowers as i64, which tpu.dynamic_rotate rejects
        x = x + jnp.where(lane >= k, rolled, zero)
    # row totals live in lane 127; prefix them along sublanes
    totals = x[:, 127:128]                      # (M, 1)
    t = jnp.broadcast_to(totals, (M, 128))      # roll wants full lanes
    sub = jax.lax.broadcasted_iota(jnp.int32, (M, 128), 0)
    k = 1
    while k < M:
        rolled = pltpu.roll(t, jnp.int32(k), 0)
        t = t + jnp.where(sub >= k, rolled, zero)
        k *= 2
    # exclusive row prefix = inclusive - own total
    return x + (t - jnp.broadcast_to(totals, (M, 128)))


def _cumsum_kernel(x_ref, carry_ref, out_ref):
    i = pl.program_id(0)
    out_ref[0] = _tile_prefix(x_ref[0]) + carry_ref[i]


def _cumsum_tiles(x, tile: int, carry_in, interpret: bool):
    """Cumsum over whole ``tile``-sized tiles; returns (out, total)."""
    M = tile // 128
    n_tiles = x.shape[0] // tile
    x3 = x.reshape(n_tiles, M, 128)
    totals = jnp.sum(x3.astype(jnp.uint32), axis=(1, 2),
                     dtype=jnp.uint32)                      # (n_tiles,)
    incl = jnp.cumsum(totals).astype(jnp.uint32)
    carries = carry_in + jnp.concatenate(
        [jnp.zeros((1,), jnp.uint32), incl[:-1]])           # exclusive
    space = pl.ANY if interpret else pltpu.VMEM
    out = pl.pallas_call(
        _cumsum_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, M, 128), lambda i: (i, i * 0, i * 0),
                         memory_space=space),
            pl.BlockSpec((n_tiles,), lambda i: (i * 0,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, M, 128), lambda i: (i, i * 0, i * 0),
                               memory_space=space),
        out_shape=jax.ShapeDtypeStruct((n_tiles, M, 128), jnp.uint32),
        interpret=interpret,
    )(x3, carries)
    return out.reshape(-1), carry_in + incl[n_tiles - 1]


@functools.partial(jax.jit, static_argnames=("interpret",))
def cumsum_u32(x, interpret: bool = False):
    """u32 inclusive prefix sum, bit-identical to
    ``jnp.cumsum(x.astype(uint32))`` (mod-2^32 wrap; u32 addition is
    associative so the blocked reduction cannot change bits), streaming
    one VMEM pass + one reduce pass vs XLA's O(log n) passes.

    Consumes the stream with a tile cascade; a ragged tail below the
    smallest tile falls back to jnp.cumsum (tiny)."""
    n = int(x.shape[0])
    x = x.astype(jnp.uint32)
    if n == 0:
        return x
    outs = []
    done = 0
    carry = jnp.uint32(0)
    for tile in _TILE_CASCADE:
        chunk = ((n - done) // tile) * tile
        if not chunk:
            continue
        out, carry = _cumsum_tiles(x[done: done + chunk], tile, carry,
                                   interpret)
        outs.append(out)
        done += chunk
    if done < n:
        outs.append(jnp.cumsum(x[done:n]).astype(jnp.uint32) + carry)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs)


def cumsum_u32_auto(x):
    """Backend dispatch: the Pallas streaming kernel on TPU, plain
    jnp.cumsum elsewhere (same bits)."""
    if jax.default_backend() == "tpu" and x.shape[0] >= (1 << 14):
        return cumsum_u32(x)
    return jnp.cumsum(x.astype(jnp.uint32)).astype(jnp.uint32)
