"""Variable-width bitpacking: store the low ``width`` bits of each u32
contiguously in a little-endian bitstream.

Semantics match ``util_U32UniformPack`` / ``util_U32UndoUniformPack``
(util.c:311-406): bit b of element i lands at global bit ``i*width + b``;
global bit g lives in output word ``g // 32`` at position ``g % 32``; spare
bits in the last word are zero.  Word-straddling elements split across two
words exactly as in the C straddle branch (util.c:343-351).

TPU-native design -- no sequential bit cursor, no scatter:

* ``uniform_pack``: expand each element into its ``width`` bits as a dense
  (n, width) 0/1 matrix, reflatten to (n_words, 32), and fold with shifted
  sums (disjoint bits => OR == ADD).  Everything is elementwise ops and a
  row reduction that XLA vectorizes on the VPU; there is no data-dependent
  control flow.

* ``uniform_unpack``: the decode hot path.  Words are paired into u64
  windows so each element is a single aligned 64-bit funnel read:
  ``val[i] = (w64[(i*w)//32] >> (i*w % 32)) & mask`` -- one gather plus
  elementwise shifts.  A dense bit-matrix fallback with identical semantics
  is kept for cross-checking (``uniform_unpack_dense``).

* ``pack`` / ``unpack``: per-element widths (the Deltas/per-particle-depth
  mode).  Bit offsets are an exclusive prefix sum of widths; contributions
  are folded with a segment-sum over destination words.

All functions are jit-safe with static ``width``.  Pallas-tiled variants
(identical semantics, VMEM-resident intermediates) live in
``bitpack_pallas.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def packed_words(n: int, width: int) -> int:
    """Number of u32 words needed to pack n elements at ``width`` bits
    (util.c:316-317)."""
    packed_bits = n * width
    return packed_bits // 32 + (0 if packed_bits % 32 == 0 else 1)


# Elements per chunk for the chunked pack path.  Must be a multiple of 32
# so each chunk's bitstream is word-aligned (chunk*width ≡ 0 mod 32).  The
# dense bit expansion costs chunk*width*4 bytes of VMEM/HBM per step, so
# 2^20 elements tops out at 128 MB of intermediates.
_PACK_CHUNK = 1 << 20


def _dense_pack_block(x, width: int):
    """Dense bit-matrix pack of a word-aligned element block."""
    n = x.shape[0]
    shifts = jnp.arange(width, dtype=jnp.uint32)[None, :]
    bits = (x[:, None] >> shifts) & jnp.uint32(1)  # (n, width)
    lanes = bits.reshape(n * width // 32, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, :]
    return jnp.sum(lanes * weights, axis=1, dtype=jnp.uint32)


@functools.partial(jax.jit, static_argnames=("width",))
def uniform_pack(x, width: int):
    """Pack the low ``width`` bits of each element of u32 array ``x``
    (util_U32UniformPack, util.c:311-355).

    Large inputs stream through ``lax.map`` in word-aligned chunks to bound
    the dense bit-expansion intermediates (32x the input at width 32)."""
    n = x.shape[0]
    n_words = packed_words(n, width)
    if width == 0 or n == 0:
        return jnp.zeros((n_words,), dtype=jnp.uint32)
    if width == 32:
        return x
    if n <= _PACK_CHUNK:
        pad = (-n) % 32
        if pad:
            x = jnp.pad(x, (0, pad))
        return _dense_pack_block(x, width)[:n_words]
    n_chunks = pl_cdiv(n, _PACK_CHUNK)
    pad = n_chunks * _PACK_CHUNK - n
    if pad:
        x = jnp.pad(x, (0, pad))
    chunks = x.reshape(n_chunks, _PACK_CHUNK)
    words = jax.lax.map(
        lambda c: _dense_pack_block(c, width), chunks)
    return words.reshape(-1)[:n_words]


def pl_cdiv(a: int, b: int) -> int:
    return -(-a // b)


@functools.partial(jax.jit, static_argnames=("width", "n"))
def uniform_unpack(x, width: int, n: int):
    """Unpack ``n`` elements of ``width`` bits from u32 array ``x``
    (util_U32UndoUniformPack, util.c:357-406).

    Funnel-read formulation: pair adjacent words into u64 windows, then each
    element is one 64-bit read + shift + mask.
    """
    if n == 0:
        return jnp.zeros((0,), dtype=jnp.uint32)
    if width == 0:
        return jnp.zeros((n,), dtype=jnp.uint32)
    if width == 32:
        return x[:n]
    hi = jnp.concatenate([x[1:], jnp.zeros((1,), dtype=jnp.uint32)])
    w64 = x.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))
    start = jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(width)
    word = (start >> jnp.uint32(5)).astype(jnp.int32)
    off = (start & jnp.uint32(31)).astype(jnp.uint64)
    window = w64[word]  # gather
    mask = jnp.uint64((1 << width) - 1)
    return ((window >> off) & mask).astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("width", "n"))
def uniform_unpack_dense(x, width: int, n: int):
    """Bit-matrix unpack with identical semantics to ``uniform_unpack`` --
    used as a cross-check and as a u64-free path."""
    if n == 0:
        return jnp.zeros((0,), dtype=jnp.uint32)
    if width == 0:
        return jnp.zeros((n,), dtype=jnp.uint32)
    if width == 32:
        return x[:n]
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, :]
    bits = ((x[:, None] >> shifts) & jnp.uint32(1)).reshape(-1)
    bits = bits[: n * width].reshape(n, width)
    weights = (jnp.uint32(1) << jnp.arange(width, dtype=jnp.uint32))[None, :]
    return jnp.sum(bits * weights, axis=1, dtype=jnp.uint32)


# ---------------------------------------------------------------------------
# Per-element widths (variable-depth mode)
# ---------------------------------------------------------------------------


def var_packed_words(widths) -> int:
    """Host-side: words needed for per-element widths (numpy array)."""
    total = int(np.sum(widths.astype(np.int64)))
    return total // 32 + (0 if total % 32 == 0 else 1)


@functools.partial(jax.jit, static_argnames=("n_words",))
def pack(x, widths, n_words: int):
    """Pack element i's low ``widths[i]`` bits contiguously.  ``n_words``
    must equal ``var_packed_words(widths)`` (static for jit).

    Per-element bit offsets are an exclusive scan of widths; each element
    contributes to at most two words (width <= 32), folded with two
    segment-sums (disjoint bits => ADD == OR).
    """
    n = x.shape[0]
    if n == 0 or n_words == 0:
        return jnp.zeros((n_words,), dtype=jnp.uint32)
    w = widths.astype(jnp.uint32)
    mask = jnp.where(w >= 32, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1) << w) - jnp.uint32(1))
    val = (x & mask).astype(jnp.uint64)
    start = jnp.cumsum(w.astype(jnp.uint64)) - w.astype(jnp.uint64)
    word = (start >> jnp.uint64(5)).astype(jnp.int32)
    off = start & jnp.uint64(31)
    shifted = val << off  # fits in 63 bits (width<=32, off<=31)
    lo = (shifted & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (shifted >> jnp.uint64(32)).astype(jnp.uint32)
    out = jax.ops.segment_sum(lo, word, num_segments=n_words + 1)
    out = out + jax.ops.segment_sum(hi, word + 1, num_segments=n_words + 1)
    return out[:n_words].astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=())
def unpack(x, widths):
    """Inverse of ``pack``: extract element i's ``widths[i]`` bits.  Output
    length equals ``widths`` length."""
    n = widths.shape[0]
    if n == 0:
        return jnp.zeros((0,), dtype=jnp.uint32)
    w = widths.astype(jnp.uint64)
    start = jnp.cumsum(w) - w
    word = (start >> jnp.uint64(5)).astype(jnp.int32)
    off = start & jnp.uint64(31)
    hi = jnp.concatenate([x[1:], jnp.zeros((1,), dtype=jnp.uint32)])
    w64 = x.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))
    window = w64[word]
    mask = jnp.where(w >= 64, jnp.uint64(0xFFFFFFFFFFFFFFFF),
                     (jnp.uint64(1) << w) - jnp.uint64(1))
    return ((window >> off) & mask).astype(jnp.uint32)
