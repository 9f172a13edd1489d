"""Data-parallel scale-out over TPU device meshes.

The reference assigns multi-node parallelism to the client and keeps
segments as the decomposition unit (doc/separation_of_duties.md:7-12,
header_format.tex:120-135): segments are independent by construction, each
self-describing.  This module is the TPU-native realization of that
contract: a snapshot is split into fixed-size particle blocks, blocks are
sharded across a ``jax.sharding.Mesh`` data-parallel axis, and the whole
quantize->bin->pack pipeline runs as one SPMD program under ``shard_map``.
Compressed streams are gathered to the host in file order; per-block
quantization headers ride along as tiny sharded arrays.

Two encode profiles:

* ``spmd`` (single-pass): bit depth is derived *statically* from the
  accuracy request and the periodic box width (range <= box width), so the
  entire encode is one jitted SPMD program with no host sync.  Files are
  slightly larger when data occupies less than the full box.
* ``adaptive`` (two-phase): a sharded stats pass computes per-block ranges,
  one scalar sync derives the tightest shared depth (max over blocks via an
  all-reduce), then a second SPMD pass bins and packs at that static depth.
  Matches the reference's data-driven depth choice (quant.c:195).

RNG parity: per-block decode dithering uses ``fold_in(seed, block)`` --
the counter-based replacement for the reference's jump-separated parallel
streams (rand.c:93-112).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import bitpack, kernels
from ..ops import rng as _rng
from ..quant import engine


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return jax.make_mesh((len(devs),), (axis,), devices=np.array(devs))


def block_split(x: np.ndarray, num_blocks: int) -> np.ndarray:
    """Reshape (3, n) or (n,) particle data into (num_blocks, ..., n_b).
    n must divide evenly; the client pads ragged tails (segmenting is the
    client's duty, spec table 1)."""
    if x.ndim == 1:
        n = x.shape[0]
        assert n % num_blocks == 0, "particle count must divide into blocks"
        return x.reshape(num_blocks, n // num_blocks)
    n = x.shape[1]
    assert n % num_blocks == 0, "particle count must divide into blocks"
    return np.moveaxis(x.reshape(x.shape[0], num_blocks, n // num_blocks),
                       1, 0)


# ---------------------------------------------------------------------------
# SPMD position pipeline (the flagship path)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ShardedPositionCodec:
    """Block-sharded position codec over a device mesh.

    ``encode`` maps (B, 3, n_b) f32 positions to packed u32 words plus
    per-block headers (x0, range); ``decode`` inverts it.  Both are single
    jitted SPMD programs; the static ``depth`` comes from the accuracy
    request (spmd profile) or the adaptive stats pass.
    """

    mesh: Mesh
    width: float  # periodic box width
    depth: int  # bits per value
    axis: str = "dp"
    # Fused Pallas decode (ops.decode_pallas_rows): None = auto (TPU
    # backend only); tests force True with interpret to check bit parity
    # on the CPU mesh.  Bits are identical either way (same dither spec,
    # same f32 op order; the one Mosaic-hostile op, the bin-width
    # division, stays in XLA).
    fused_rows: Optional[bool] = None
    interpret: bool = False

    @property
    def _on_tpu(self) -> bool:
        # Gate Pallas paths on the MESH's device platform, not
        # jax.default_backend(): in this environment the TPU plugin can
        # be the default backend while the codec runs on a forced-CPU
        # virtual mesh (dryrun_multichip), where a non-interpret
        # pallas_call fails to lower.
        return self.mesh.devices.flat[0].platform == "tpu"

    @property
    def _spec_blocks(self):
        return P(self.axis)

    def _in_shardings(self):
        return NamedSharding(self.mesh, P(self.axis))

    @functools.cached_property
    def _encode(self):
        width, depth, axis = self.width, self.depth, self.axis

        def encode_local(x):  # x: (B_local, 3, n_b)
            def one_block(xb):  # (3, n_b)
                xu = jax.vmap(
                    lambda d: kernels.undo_periodic(d, width))(xb)
                x0 = jnp.min(xu, axis=1)
                x1 = jnp.max(xu, axis=1)
                rng_b = jnp.max(x1 - x0)
                bins = jax.vmap(
                    lambda xd, o: kernels.uniform_bin_index(
                        xd, depth, o, rng_b))(xu, x0)
                return bins, x0, rng_b

            bins, x0, rng_b = jax.vmap(one_block)(x)
            # Barrier: the bin->pack fusion compiles ~1000x slow on this
            # backend (see parallel/snapshot.py).
            bins = jax.lax.optimization_barrier(bins)
            # Pack all 3 dims of every local block: (B_local, 3, n_b) ->
            # (B_local, 3, words).  The (B_local, 3) batch dims are folded
            # into the pack matmul's row dimension -- vmapping the pack
            # instead makes it a batched matmul, and XLA's TPU layout
            # assignment then picks a batch-dims-minor T(4,128) layout
            # with ~21x pad expansion (OOM at 50M+ particles).
            b_l, _, n_b = bins.shape
            if n_b % 32 == 0:
                words = bitpack.uniform_pack_rows(
                    bins.reshape(b_l * 3, n_b), depth,
                    prefer_pallas=self._on_tpu,
                ).reshape(b_l, 3, -1)
            else:
                words = jax.vmap(jax.vmap(
                    lambda b: bitpack.uniform_pack(b, depth)))(bins)
            return words, x0, rng_b

        # check_vma=False: the TPU pack (pack_pallas_rows) is a
        # pallas_call whose out_shape carries no varying-mesh-axes
        # annotation; the body is collective-free, so the check buys
        # nothing here (same reasoning as _decode below).
        return jax.jit(jax.shard_map(
            encode_local, mesh=self.mesh,
            in_specs=P(axis), out_specs=(P(axis), P(axis), P(axis)),
            check_vma=False))

    @functools.cached_property
    def _decode(self):
        width, depth, axis = self.width, self.depth, self.axis
        fused = self.fused_rows
        if fused is None:
            fused = self._on_tpu
        interpret = self.interpret

        def decode_local(words, x0, rng_b, seed_arr, block0):
            # words: (B_local, 3, n_words); block0: local base block index
            n_words = words.shape[2]
            n_b = (n_words * 32) // depth if depth else 0
            b_l = words.shape[0]
            idx = jax.lax.axis_index(axis) * b_l + jnp.arange(b_l)

            if fused and depth >= 1 and n_b and n_b % 32 == 0:
                # One Pallas grid over all (block, dim) streams: each row
                # is VMEM-resident unpack+dither+undo+rewrap with per-row
                # key/offset in SMEM.  ~30x over the vmapped XLA unpack,
                # bit-identical (enforced by test_sharding).
                from ..ops import decode_pallas

                keys = jax.vmap(lambda bi: jnp.stack(
                    [_rng.field_key_jax(seed_arr[0], bi, d)
                     for d in range(3)]))(idx)  # (B_local, 3, 2)
                out = decode_pallas.decode_pallas_rows(
                    words.reshape(b_l * 3, n_words),
                    keys.reshape(b_l * 3, 2), depth, n_b,
                    x0.reshape(b_l * 3), jnp.repeat(rng_b, 3),
                    box=width, periodic=True, interpret=interpret)
                return out.reshape(b_l, 3, n_b)

            def one_block(wb, x0b, rb, bi):
                def one_dim(wd, o, d):
                    bins = bitpack.uniform_unpack(wd, depth, n_b)
                    # Barrier: fusing the unpack into the float consumers
                    # compiles ~70x slow on this backend (see
                    # ops/fastpath.py).
                    bins = jax.lax.optimization_barrier(bins)
                    key = _rng.field_key_jax(seed_arr[0], bi, d)
                    dx = rb / jnp.float32(1 << depth)
                    u = _rng.uniform24(key, bins.shape)
                    x = o + dx * (bins.astype(jnp.float32) + u)
                    x = jax.lax.optimization_barrier(x)
                    return kernels.periodic(x, width)

                return jnp.stack([one_dim(wb[d], x0b[d], d)
                                  for d in range(3)])

            return jax.vmap(one_block)(words, x0, rng_b, idx)

        # check_vma=False: pallas_call out_shapes carry no varying-mesh-
        # axes annotation; the body is collective-free (axis_index only),
        # so the check buys nothing here.
        return jax.jit(jax.shard_map(
            decode_local, mesh=self.mesh,
            in_specs=(P(axis), P(axis), P(axis), P(), P()),
            out_specs=P(axis), check_vma=False))

    def encode(self, x):
        """x: (B, 3, n_b) f32, B divisible by mesh size.  Returns (words
        (B, 3, W), x0 (B, 3), range (B,)) device arrays, block-sharded."""
        sh = self._in_shardings()
        x = jax.device_put(x, sh)
        return self._encode(x)

    def decode(self, words, x0, rng_b, seed: int = 0):
        seed_arr = jnp.asarray([seed], dtype=jnp.uint32)
        return self._decode(words, x0, rng_b, seed_arr,
                            jnp.zeros((1,), jnp.int32))

    # -- adaptive profile helpers ------------------------------------------

    @functools.cached_property
    def _stats(self):
        width, axis = self.width, self.axis

        def stats_local(x):
            def one_block(xb):
                xu = jax.vmap(
                    lambda d: kernels.undo_periodic(d, width))(xb)
                return jnp.max(jnp.max(xu, axis=1) - jnp.min(xu, axis=1))

            local = jax.vmap(one_block)(x)
            # All-reduce the max range across the mesh so every shard (and
            # the host) sees the same global header value.
            gmax = jax.lax.pmax(jnp.max(local), axis)
            return local, gmax

        return jax.jit(jax.shard_map(
            stats_local, mesh=self.mesh,
            in_specs=P(axis), out_specs=(P(axis), P())))

    def global_range(self, x) -> float:
        """Adaptive profile phase 1: the one scalar that syncs to host."""
        sh = self._in_shardings()
        x = jax.device_put(x, sh)
        _, gmax = self._stats(x)
        return float(np.asarray(gmax))


def spmd_depth_for(delta: float, width: float) -> int:
    """Static depth for the spmd profile: the range of any block never
    exceeds the box width, so this depth always satisfies ``delta``."""
    return engine.delta_to_depth(delta, 0.0, width)


def adaptive_depth_for(codec: ShardedPositionCodec, x, delta: float) -> int:
    """Tightest shared depth across blocks (one host sync)."""
    g = codec.global_range(x)
    return engine.delta_to_depth(delta, 0.0, g)
