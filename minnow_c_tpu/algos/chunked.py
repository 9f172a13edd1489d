"""Chunked-width bitstream helpers shared by the Coil and Sort codecs.

Chunks of ``CHUNK`` elements pack at per-chunk widths, each chunk starting
on a u32 word boundary (CHUNK is a multiple of 32, so a chunk at width w
is exactly ``CHUNK*w/32`` words).

Shape discipline: every device call here uses *bucketed* shapes -- the
number of same-width chunks passed to one pack/unpack call is rounded up
to a power of two (padding with zero chunks) -- so the set of compiled
programs is O(widths x log chunks) and the persistent jit cache converges
quickly.  Without this, data-dependent group sizes force a fresh XLA
compilation per segment, which on remote-compile TPU runtimes costs
minutes per plane.

Wire behavior is identical to per-group exact-shape packing (padding is
dropped before bytes are emitted); the frozen-digest tests pin this.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..ops import bitpack

CHUNK = 256


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1).bit_length())


def chunk_widths(z: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Split a u32 stream into (n_chunks, CHUNK) rows (zero-padded) and
    per-chunk bit widths."""
    n = z.shape[0]
    n_chunks = -(-n // CHUNK)
    zp = np.zeros(n_chunks * CHUNK, dtype=np.uint32)
    zp[:n] = z
    zc = zp.reshape(n_chunks, CHUNK)
    maxes = zc.max(axis=1)
    # bit_length(m) == ceil(log2(m + 1)); exact in f64 for all u32
    # (vectorized -- the Python-loop version costs ~390k interpreter
    # iterations per 100M-element plane)
    widths = np.ceil(np.log2(maxes.astype(np.float64) + 1.0)).astype(
        np.uint8)
    return zc, widths


def pack_chunks(zc: np.ndarray, widths: np.ndarray) -> bytes:
    """Pack each chunk row at its width; returns the concatenated
    word-aligned chunk bodies as bytes (in chunk order)."""
    from ..utils.debug import debug_assert
    n_chunks = zc.shape[0]
    debug_assert(widths.shape[0] == n_chunks, "widths/chunks mismatch")
    # O(n) scan: every chunk's values must fit its declared width, or the
    # pack silently drops bits (DebugAssert tier -- free in release).
    debug_assert(
        lambda: n_chunks == 0 or bool((
            ((zc.max(axis=1) >> np.minimum(widths, 31).astype(np.uint32))
             == 0) | (widths.astype(np.int64) >= 32)).all()),
        "chunk value exceeds declared width")
    chunk_bytes = [b""] * n_chunks
    for wv in np.unique(widths):
        if wv == 0:
            continue
        idx = np.nonzero(widths == wv)[0]
        m = len(idx)
        mp = _next_pow2(m)
        rows = np.zeros((mp, CHUNK), dtype=np.uint32)
        rows[:m] = zc[idx]
        packed = np.asarray(
            bitpack.uniform_pack(jnp.asarray(rows.reshape(-1)), int(wv)))
        wpc = CHUNK * int(wv) // 32
        packed = packed[: mp * wpc].reshape(mp, wpc)
        le = packed.astype("<u4", copy=False)
        for row, c in enumerate(idx):
            chunk_bytes[c] = le[row].tobytes()
    # NOTE: the per-chunk tobytes loop is O(n_chunks) Python; at 100M
    # elements that is ~390k iterations per plane.  Kept for now -- the
    # snapshot writer's hot path uses the uniform row-folded pack, not
    # this chunked path (Coil/Sort only).
    return b"".join(chunk_bytes)


def unpack_chunks(body: np.ndarray, widths: np.ndarray) -> np.ndarray:
    """Inverse of pack_chunks: ``body`` is the concatenated u32 words,
    ``widths`` the per-chunk widths.  Returns (n_chunks, CHUNK) u32."""
    n_chunks = widths.shape[0]
    if n_chunks and int(widths.max()) > 32:
        # wire-sourced width table: malformed (checksum-colliding or
        # buggy-writer) streams must fail cleanly, not IndexError deep
        # inside the gather below
        raise ValueError(
            f"chunk width {int(widths.max())} > 32 in stream width table")
    words_per_chunk = (CHUNK * widths.astype(np.int64)) // 32
    offsets = np.concatenate([[0], np.cumsum(words_per_chunk)])
    out = np.zeros((n_chunks, CHUNK), dtype=np.uint32)
    for wv in np.unique(widths):
        if wv == 0:
            continue
        idx = np.nonzero(widths == wv)[0]
        m = len(idx)
        wpc = CHUNK * int(wv) // 32
        # vectorized gather of all same-width chunk bodies
        gidx = offsets[idx][:, None] + np.arange(wpc)[None, :]
        rows = body[gidx]  # (m, wpc)
        mp = _next_pow2(m)
        if mp != m:
            rows = np.concatenate(
                [rows, np.zeros((mp - m, wpc), dtype=np.uint32)])
        vals = np.asarray(bitpack.uniform_unpack(
            jnp.asarray(rows.reshape(-1)), int(wv), mp * CHUNK))
        out[idx] = vals.reshape(mp, CHUNK)[:m]
    return out


def total_words(widths: np.ndarray) -> int:
    return int(((CHUNK * widths.astype(np.int64)) // 32).sum())
