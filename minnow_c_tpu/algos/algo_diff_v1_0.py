"""Diff v1.0 -- predecessor-delta codec, frozen.

Realizes the spec'd Diff algorithm code (types.h:16, header_format.tex
tab. 3; the reference never implements it): identical block/metadata
layout to Trim v1.0, but each data plane stores zigzag-mapped differences
against the previous element, packed at the width of the largest zigzag
value.  For spatially coherent input orders (cell-sorted snapshots,
Lagrangian ID order) successive bin indices are close, so the delta stream
packs far below the raw ``depth`` bits; worst case costs one extra bit
(zigzag sign).

The client controls data order (spec table 1: "Optimally ordering data" is
the client's duty; "Maintaining data order" is ours), so Diff never
reorders -- it simply exploits whatever coherence the order has.

Decode is a prefix sum (``ops/kernels.u32_undo_delta_zigzag``): the running
sum telescopes to the original bins, so intermediates stay in range.

Wire notes vs Trim v1.0: the block prelude ``Width`` field stores the
zigzag width (not the quantization depth -- that lives in the metadata
block), and per-particle-depth (Deltas) fields fall back to Trim's raw
variable-width packing unchanged.

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


class DiffV1_0(TrimV1_0):
    algo_code = int(AlgoCode.DIFF)
    version = VERSION

    def _encode_plane(self, bins, depth: int):
        bins = jnp.asarray(bins)
        n = bins.shape[0]
        if n == 0:
            return np.zeros(0, dtype=np.uint32), 1
        # Element 0 is stored raw in the plane's first word: its "delta" is
        # the absolute value, whose zigzag would otherwise force
        # width = depth + 1 for the whole plane.
        z = kernels.u32_delta_zigzag(bins)[1:]
        first = np.uint32(np.asarray(bins[0]))
        # One tiny host sync per plane: the zigzag width is data-dependent
        # and must be static for the pack.
        zmax = int(np.asarray(jnp.max(z))) if z.shape[0] else 0
        width = max(1, int(zmax).bit_length())
        words = np.asarray(bitpack.uniform_pack(z, width))
        return np.concatenate([[first], words]).astype(np.uint32), width

    def _decode_plane(self, words: np.ndarray, width: int, n: int):
        if n == 0:
            return np.zeros(0, dtype=np.uint32)
        first = jnp.uint32(words[0])
        z = bitpack.uniform_unpack(jnp.asarray(words[1:]), width, n - 1)
        zi = z.astype(jnp.int32)
        d = (zi >> 1) ^ -(zi & 1)
        rest = first.astype(jnp.int32) + jnp.cumsum(d)
        # device-resident: bins stay on device through dequantization
        return jnp.concatenate([jnp.asarray([first], dtype=jnp.uint32),
                                rest.astype(jnp.uint32)])


registry.register(DiffV1_0())
