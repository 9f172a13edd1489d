"""Coil v1.1 -- chunked-width delta codec, kernel-native layout, frozen.

Wire evolution over Coil v1.0 (a minor bump per the spec's versioning
rules, header_format.tex:266-276), motivated by measurement: on TPU
every dynamic-offset XLA data movement caps at ~0.3-25 GB/s
(exp/coil_sort_gather*.py), which left the v1.0 bucketed-gather decode
at 1.5 GB/s -- below the 5 GB/s/chip BASELINE bar -- despite Coil being
the repo's best-ratio codec.  Two wire changes make a zero-gather fused
decode possible (ops/chunked_pallas.py, 66 GB/s at 25M on v5e):

* **Parametric chunk size** (``chunk_log2`` header byte): the encoder
  keeps 256-element chunks below 2^20 values (v1.0-class ratio on small
  planes) and switches to 16384-element chunks at scale, where width
  variation across 256-element windows is noise but per-grid-step
  latency is not.
* **Column-major chunk bodies** (word-of-lane-major,
  ``ops/chunked_pallas.body_to_cmajor``): a chunk's funnel-unpack word
  matrix is then a static (4*width, 128) slice of 2D VMEM scratch --
  Mosaic rejects 1D->2D vector shape casts, so the natural bitstream
  order cannot feed the kernel directly.

Plane payload layout::

    u32 n_chunks
    u32 first_value                      (element 0, raw)
    u8  chunk_log2                       (8..17; encoder uses 8 or 14)
    u8  reserved[3]
    u8  chunk_width[n_chunks]            (zero-padded to 4-byte alignment)
    <per chunk, in order: chunk zigzag deltas packed at chunk_width
     bits, column-major, each chunk starting on a u32 word boundary>

Streams stamped 1.0.x keep decoding through the frozen algo_coil_v1_0
module.  This module is FROZEN at v1.1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import semver
from ..ops import chunked_pallas, kernels
from ..types import AlgoCode
from . import chunked, registry
from .algo_trim_v1_0 import TrimV1_0

VERSION = semver.pack(1, 1, 0)

KERNEL_CHUNK = 16384     # the fused decode kernel's (only) chunk size
SMALL_CHUNK = 256        # v1.0-class chunks for small planes
BIG_PLANE = 1 << 20      # threshold for switching to kernel chunks


def _cmajor_blob(natural: bytes, widths: np.ndarray, chunk: int) -> bytes:
    """Convert a natural-order chunk-body blob (pack_chunks output) to
    the v1.1 column-major layout, chunk by chunk."""
    words = np.frombuffer(natural, dtype=np.uint32)
    wpcs = (chunk * widths.astype(np.int64)) // 32
    offs = np.concatenate([[0], np.cumsum(wpcs)[:-1]])
    out = np.empty_like(words)
    for c in range(len(widths)):
        w = int(widths[c])
        if not w:
            continue
        s = slice(int(offs[c]), int(offs[c] + wpcs[c]))
        out[s] = chunked_pallas.body_to_cmajor(words[s], w, chunk)
    return out.astype("<u4", copy=False).tobytes()


def _natural_blob(cmajor: np.ndarray, widths: np.ndarray,
                  chunk: int) -> np.ndarray:
    """Inverse of :func:`_cmajor_blob` (u32 words in, u32 words out)."""
    wpcs = (chunk * widths.astype(np.int64)) // 32
    offs = np.concatenate([[0], np.cumsum(wpcs)[:-1]])
    out = np.empty(int(wpcs.sum()), dtype=np.uint32)
    for c in range(len(widths)):
        w = int(widths[c])
        if not w:
            continue
        s = slice(int(offs[c]), int(offs[c] + wpcs[c]))
        out[s] = chunked_pallas.body_from_cmajor(cmajor[s], w, chunk)
    return out


class CoilV1_1(TrimV1_0):
    algo_code = int(AlgoCode.COIL)
    version = VERSION

    def _encode_plane(self, bins, depth: int):
        bins = jnp.asarray(bins)
        n = int(bins.shape[0])
        if n == 0:
            return np.zeros(3, dtype=np.uint32), 0
        chunk = KERNEL_CHUNK if n >= BIG_PLANE else SMALL_CHUNK
        first = np.uint32(np.asarray(bins[0]))
        # element 0 is carried raw; keep its slot width-neutral
        z = kernels.u32_delta_zigzag(bins).at[0].set(jnp.uint32(0))
        zc, widths = chunked.chunk_widths_auto(z, chunk)
        n_chunks = zc.shape[0]
        body = _cmajor_blob(chunked.pack_chunks_auto(zc, widths), widths,
                            chunk)

        head = np.array([n_chunks, first], dtype=np.uint32)
        tag = np.array([int(chunk).bit_length() - 1, 0, 0, 0],
                       dtype=np.uint8)
        wtab_pad = (-n_chunks) % 4
        wtab = np.concatenate([widths,
                               np.zeros(wtab_pad, dtype=np.uint8)])
        payload = np.concatenate(
            [head.view(np.uint8), tag, wtab.view(np.uint8),
             np.frombuffer(body, dtype=np.uint8)])
        return payload.view(np.uint32), 0

    def _decode_plane(self, words: np.ndarray, width: int, n: int):
        if n == 0:
            return np.zeros(0, dtype=np.uint32)
        raw = np.ascontiguousarray(words).view(np.uint8)
        n_chunks = int(raw[:4].view(np.uint32)[0])
        first = int(raw[4:8].view(np.uint32)[0])
        chunk_log2 = int(raw[8])
        if not (8 <= chunk_log2 <= 17):
            raise ValueError(
                f"Coil v1.1 chunk_log2 {chunk_log2} out of range")
        chunk = 1 << chunk_log2
        wtab_pad = (-n_chunks) % 4
        widths = raw[12:12 + n_chunks].astype(np.uint8)
        body = raw[12 + n_chunks + wtab_pad:].view(np.uint32)

        if (jax.default_backend() == "tpu" and
                chunk == chunked_pallas.KERNEL_OK_CHUNK):
            # one fused kernel pass: DMA + unpack + unzigzag + cumsum
            return chunked_pallas.decode_chunked_stream(
                body, widths, first, chunk, n, zigzag=True, prefix=True)
        nat = _natural_blob(np.ascontiguousarray(body), widths, chunk)
        z = chunked.unpack_chunks_auto(nat, widths, chunk).reshape(-1)[:n]
        # logical-shift unzigzag; the int32 form corrupts |delta| >= 2^30
        from ..ops.scan_pallas import cumsum_u32_auto
        d = kernels.u32_unzigzag(jnp.asarray(z))
        d = d.at[0].set(0)
        return jnp.uint32(first) + cumsum_u32_auto(d)


registry.register(CoilV1_1())
