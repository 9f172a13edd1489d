"""Round-3 on-chip validation of the production recip scale mode.

Interpret-mode parity (tests/test_recip_mode.py) cannot catch Mosaic
real-lowering failures (e.g. SMEM window-shape rejections).  This script
runs on the real TPU:
  1. fast_uniform_encode(scale_mode='recip') vs the XLA map -- bit parity
     (single-stream kernel, cascade + tail);
  2. encode_pallas_recip_rows vs per-row XLA -- bit parity;
  3. sharded ShardedPositionCodec(scale_mode='recip') roundtrip on the
     1-device TPU mesh;
  4. chained throughput of the rows encode (the sharded/batched hot
     path).
"""

import os
import sys
import functools

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/minnow_jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from minnow_c_tpu.bench import harness
from minnow_c_tpu.ops import bitpack, encode_pallas, fastpath
from minnow_c_tpu.parallel.sharding import (ShardedPositionCodec, make_mesh,
                                            spmd_depth_for)

W = 64.0
DEPTH = 14


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(0)

    # 1. single-stream parity (cascade + ragged tail)
    n = (1 << 19) * 3 + (1 << 14) + 1000
    x = jax.device_put(jnp.asarray(rng.uniform(0, W, n).astype(np.float32)))
    for periodic in (True, False):
        box = W if periodic else None
        wk, a1, b1 = fastpath.fast_uniform_encode(x, DEPTH,
                                                  periodic_width=box,
                                                  scale_mode="recip")
        wx, a2, b2 = fastpath._fast_uniform_encode_recip_xla(
            x, DEPTH, jnp.float32(box if periodic else 0.0), periodic)
        nbad = int(jax.jit(lambda a, b: jnp.sum((a != b).astype(
            jnp.int32)))(wk, wx))
        hdr = bool(a1 == a2) and bool(b1 == b2)
        print(f"single periodic={periodic}: bad={nbad} hdr_ok={hdr}",
              flush=True)
        assert nbad == 0 and hdr

    # 2. rows kernel parity
    rows, nb = 24, 1 << 16
    xr = jax.device_put(jnp.asarray(
        rng.uniform(0, W, (rows, nb)).astype(np.float32)))
    x0 = jnp.asarray(rng.uniform(0, 4, rows).astype(np.float32))
    rngv = jnp.asarray(rng.uniform(40, 60, rows).astype(np.float32))
    recip = jnp.float32(1.0) / rngv
    anchors = xr[:, 0]
    boxes = jnp.full((rows,), np.float32(W))
    wk = encode_pallas.encode_pallas_recip_rows(
        xr, x0, recip, boxes, anchors, 11, True)
    bad = 0
    for r in range(rows):
        bins = encode_pallas._recip_bins_xla(
            xr[r], x0[r], recip[r], jnp.float32(W), anchors[r], 11, True)
        wx = bitpack.uniform_pack(bins, 11)
        bad += int(jax.jit(lambda a, b: jnp.sum((a != b).astype(
            jnp.int32)))(wk[r], wx))
    print(f"rows: bad={bad}", flush=True)
    assert bad == 0

    # 2b. Pallas rows stats parity (the batched writers' stats pass)
    from minnow_c_tpu.parallel.sharding import _float_rows_stats
    xs = jax.device_put(jnp.asarray(
        rng.uniform(0, W, (16, 3, (1 << 16) + 1000)).astype(np.float32)))
    for box in (W, None):
        x0p, rp = _float_rows_stats(xs, box, True, False)
        x0x, rx = _float_rows_stats(xs, box, False, False)
        badm = int(jnp.sum((x0p != x0x).astype(jnp.int32))
                   + jnp.sum((rp != rx).astype(jnp.int32)))
        print(f"stats periodic={box is not None}: bad={badm}", flush=True)
        assert badm == 0

    # 3. sharded codec roundtrip on the 1-device TPU mesh
    mesh = make_mesh()
    depth = spmd_depth_for(1e-3, W)
    codec = ShardedPositionCodec(mesh=mesh, width=W, depth=depth,
                                 scale_mode="recip")
    xb = rng.uniform(0, W, (8, 3, 65536)).astype(np.float32)
    words, px0, prng = codec.encode(xb)
    out = codec.decode(words, px0, prng, seed=5)
    err = jax.jit(lambda a, b: jnp.max(jnp.minimum(
        jnp.abs(a - b), W - jnp.abs(a - b))))(out, jnp.asarray(xb))
    print(f"sharded roundtrip max err = {float(err):.6f}", flush=True)
    assert float(err) <= 1e-3

    # 4. chained throughput: rows encode (stats + fused rows kernel),
    # the sharded/batched writer hot path, vs the div-mode pipeline.
    B, nb_dim = 64, 1 << 17  # 64 x 3 x 131072 f32 = ~100 MB, 32-aligned
    xbig = jax.device_put(jnp.asarray(
        rng.uniform(0, W, (B, 3, nb_dim)).astype(np.float32)))
    UNROLL = 16

    from minnow_c_tpu.parallel.sharding import (_float_block_encode,
                                                _float_block_stats,
                                                _float_rows_encode_recip,
                                                _pack_rows_folded)

    @jax.jit
    def chain_rows_recip(xin, salt):
        s = salt
        w = None
        for i in range(UNROLL):
            boxs = jnp.float32(W) * (jnp.float32(1.0) +
                                     s.astype(jnp.float32) *
                                     jnp.float32(1e-45))
            x0s, rngs = jax.vmap(
                lambda xb: _float_block_stats(xb, boxs))(xin)
            w = _float_rows_encode_recip(xin, x0s, rngs, DEPTH, boxs,
                                         True, False)
            s = w[0, 0, 0] ^ jnp.uint32(i)
        return w

    @jax.jit
    def chain_rows_div(xin, salt):
        s = salt
        w = None
        for i in range(UNROLL):
            boxs = jnp.float32(W) * (jnp.float32(1.0) +
                                     s.astype(jnp.float32) *
                                     jnp.float32(1e-45))
            bins, x0s, rngs = jax.vmap(
                lambda xb: _float_block_encode(xb, DEPTH, boxs))(xin)
            w = _pack_rows_folded(bins, DEPTH, True)
            s = w[0, 0, 0] ^ jnp.uint32(i)
        return w

    nbytes = B * 3 * nb_dim * 4
    for name, fn in (("rows div", chain_rows_div),
                     ("rows recip", chain_rows_recip)):
        r = harness.run(lambda s, fn=fn: fn(xbig, s),
                        bytes_per_iter=nbytes * UNROLL)
        print(f"{name:>11}: {r.gb_per_second:7.2f} GB/s "
              f"({r.iterations} it x {r.trial_seconds:.3f}s)", flush=True)


if __name__ == "__main__":
    main()
