"""Cart v1.0 -- Cartesian byte-plane codec, frozen.

Realizes the spec'd Cart algorithm code (header_format.tex tab. 3;
unimplemented in the reference).  Planes are binned and packed exactly like
Trim, then the packed words are byte-plane transposed and each byte plane
delta-coded before entropy coding -- the classic transform stack the
reference's util layer provides for exactly this purpose
(util_U32TransposeBytes util.c:244-281, util_U8DeltaEncode util.c:283-309)
but that no reference algorithm ever wires up.

For smooth data at depths above 8 bits, the byte planes of the packed
stream vary slowly, so delta coding turns them into near-zero runs that
LZ4 collapses; for incompressible data the entropy stage falls back to
raw storage (blocks.encode_block picks the smaller), so the worst case
costs nothing but encode time.

Plane payload = Trim's packed words, transformed; the codec's own
header words record the layout, so decode is self-describing (the block
prelude carries no transform flag).

This module is FROZEN at v1.0.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import semver
from ..ops import bitpack, kernels
from ..types import AlgoCode
from . import registry
from .algo_trim_v1_0 import TrimV1_0


VERSION = semver.pack(1, 0, 0)


def _transpose_delta(words: np.ndarray) -> np.ndarray:
    """packed u32 words -> byte-plane transpose -> per-stream u8 delta."""
    if words.size == 0:
        return words
    t = kernels.u32_transpose_bytes(jnp.asarray(words))
    d = np.asarray(kernels.u8_delta_encode(t))
    return d


def _undo_transpose_delta(payload: np.ndarray, n_words: int) -> np.ndarray:
    if n_words == 0:
        return np.zeros(0, dtype=np.uint32)
    d = kernels.u8_undo_delta_encode(jnp.asarray(payload, dtype=jnp.uint8))
    return np.asarray(kernels.u32_undo_transpose_bytes(d))


class CartV1_0(TrimV1_0):
    algo_code = int(AlgoCode.CART)
    version = VERSION

    # Plane payload = 8-byte mini-header [u32 n_words][u32 magic] followed
    # by the transposed+delta-coded bytes of the packed words; the header
    # keeps the payload self-describing (the block prelude's raw/comp
    # lengths cover the whole payload, not the pre-transform word count).

    _MAGIC = 0x43415254  # 'CART'

    def _encode_plane(self, bins, depth: int):
        words = np.asarray(bitpack.uniform_pack(jnp.asarray(bins), depth))
        transformed = _transpose_delta(words)
        head = np.array([words.size, self._MAGIC], dtype=np.uint32)
        payload = np.concatenate([head.view(np.uint8),
                                  transformed.view(np.uint8)])
        # head is 8 B and transformed is 4*n_words B, so the payload is
        # always u32-aligned (the transform preserves length).
        assert payload.size % 4 == 0
        return payload.view(np.uint32), depth

    def _decode_plane(self, words: np.ndarray, width: int, n: int):
        raw = np.ascontiguousarray(words).view(np.uint8)
        n_words = int(raw[0:4].view(np.uint32)[0])
        magic = int(raw[4:8].view(np.uint32)[0])
        if magic != self._MAGIC:
            raise ValueError("Cart plane magic mismatch")
        body = raw[8:8 + 4 * n_words]
        packed = _undo_transpose_delta(body, n_words)
        # device-resident: bins stay on device through dequantization
        return bitpack.uniform_unpack(jnp.asarray(packed), width, n)


registry.register(CartV1_0())
