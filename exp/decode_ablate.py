"""Ablate the lane-dense fused decode kernel: where does the time go?

The production kernel (`ops/decode_pallas.py`) sustains ~134 GB/s of
decoded f32 on a v5e; the dense-DMA floor is ~6x lower than that cost,
so it is compute-bound.  The body has three candidate hot stages:

  unpack   static row pairs J/J2 (2x128 sublane row reads) + funnel shift
  dither   Threefry-2x32-13 on (32, M) + the 128-row S grain stack
  undo     int->f32 cast, fma, periodic wrap, final transpose

Each variant below disables one stage (replacing it with a cheap
same-shaped stand-in) while keeping input/output DMA identical, then is
timed with chain-slope (K=4 vs K=32 in-jit chained iterations, 4-byte
D2H readback of a value depending on every iteration; see
doc/round2_status.md on why block_until_ready alone lies here).

Run: python exp/decode_ablate.py [tpu|cpu]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/minnow_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.stdout.reconfigure(line_buffering=True)

MODE = sys.argv[1] if len(sys.argv) > 1 else "tpu"
import jax

if MODE == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minnow_c_tpu.ops import decode_pallas as dp
from minnow_c_tpu.ops import native
from minnow_c_tpu.ops import rng as _rng

INTERPRET = MODE == "cpu"
WIDTH = 11
TILE = (1 << 10) if INTERPRET else dp.TILE  # CPU run is a shape check only
N = (25_000_000 // dp.TILE) * dp.TILE if not INTERPRET else 4 * TILE
BOX = 64.0


def body_variant(W, k0, k1, scal, tile0, *, width, skip_unpack,
                 skip_dither, skip_s_stack, skip_undo):
    M = W.shape[1]
    if skip_unpack:
        # same input rows touched, no row-stack/funnel: broadcast row 0.
        bins = jnp.broadcast_to(W[0], (128, M)) & jnp.uint32((1 << width) - 1)
    else:
        bins = dp._unpack_128(W, width)

    if skip_dither:
        u = jnp.float32(0.5)
    else:
        ctr = tile0 + \
            jax.lax.broadcasted_iota(jnp.uint32, (32, M), 1) * jnp.uint32(32) + \
            jax.lax.broadcasted_iota(jnp.uint32, (32, M), 0)
        a, b = dp._threefry13_tile(k0, k1, ctr)
        if skip_s_stack:
            # keep the cipher, skip the 128-row grain stack
            S = jnp.broadcast_to(a[0] ^ b[0], (128, M))
        else:
            S = jnp.stack([(a if (l & 3) < 2 else b)[l >> 2]
                           for l in range(128)])
        liota = jax.lax.broadcasted_iota(jnp.uint32, (128, 1), 0)
        shc = (liota & jnp.uint32(1)) * jnp.uint32(16)
        h = (S >> shc) & jnp.uint32(0xFFFF)
        u = h.astype(jnp.int32).astype(jnp.float32) * jnp.float32(
            1.0 / (1 << 16))

    if skip_undo:
        x = bins.astype(jnp.int32).astype(jnp.float32) + u
    else:
        x = scal[0] + scal[1] * (
            bins.astype(jnp.int32).astype(jnp.float32) + u)
        x = jnp.where(x >= scal[2], x - scal[2], x)
        x = jnp.where(x < 0, x + scal[2], x)
    return x.T


def make_decode(**flags):
    M = TILE // 128
    n_tiles = N // TILE

    def kernel(words_ref, key_ref, scal_ref, out_ref):
        t = pl.program_id(0)
        tile0 = t.astype(jnp.uint32) * jnp.uint32(TILE // 4)
        out_ref[0] = body_variant(
            words_ref[0], key_ref[0], key_ref[1], scal_ref, tile0,
            width=WIDTH, **flags)

    space = pl.ANY if INTERPRET else pltpu.VMEM

    def run(w3, key, scal):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, 4 * WIDTH, M), lambda i: (i, i * 0, i * 0),
                             memory_space=space),
                pl.BlockSpec((2,), lambda i: (i * 0,), memory_space=pltpu.SMEM),
                pl.BlockSpec((3,), lambda i: (i * 0,), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, M, 128), lambda i: (i, i * 0, i * 0),
                                   memory_space=space),
            out_shape=jax.ShapeDtypeStruct((n_tiles, M, 128), jnp.float32),
            interpret=INTERPRET,
        )(w3, key, scal).reshape(-1)

    return run


def chain_time(run, w3, key, scal, K):
    @jax.jit
    def chained(salt):
        def step(i, carry):
            s, _ = carry
            x = run(w3, key ^ s, scal)
            return (jax.lax.bitcast_convert_type(x[0], jnp.uint32) ^
                    i.astype(jnp.uint32), x)
        return jax.lax.fori_loop(0, K, step,
                                 (salt, jnp.zeros((N,), jnp.float32)))

    s, x = chained(jnp.uint32(1))
    np.asarray(s)  # compile + settle
    best = 1e9
    for trial in range(3):
        t0 = time.perf_counter()
        s, x = chained(s)
        np.asarray(s)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    bins_np = rng.integers(0, 1 << WIDTH, N, dtype=np.uint64).astype(
        np.uint32)
    packed = np.asarray(native.uniform_pack_host(bins_np, WIDTH))
    M = TILE // 128
    n_tiles = N // TILE
    w3 = jax.device_put(jnp.swapaxes(
        jnp.asarray(packed).reshape(n_tiles, M, 4 * WIDTH), 1, 2))
    key = jax.device_put(_rng.field_key_arr(1234, 0, 0))
    dxb = jnp.float32(BOX) / np.float32(np.exp2(WIDTH, dtype=np.float64))
    scal = jax.device_put(jnp.stack(
        [jnp.float32(0.0), dxb, jnp.float32(BOX)]))

    if INTERPRET:
        # Parity guard: the 'full' variant hand-duplicates the production
        # kernel's body (dp._decode_body + periodic wrap); if the
        # production kernel changes, this ablation's baseline must fail
        # loudly rather than silently measure stale math.
        full = make_decode(skip_unpack=False, skip_dither=False,
                           skip_s_stack=False, skip_undo=False)
        got = np.asarray(full(w3, key, scal))
        want = np.asarray(dp.decode_pallas(
            jnp.asarray(packed), key, WIDTH, N, 0.0, BOX, BOX,
            periodic=True, interpret=True))
        if not np.array_equal(got, want):
            raise SystemExit("parity FAILED: 'full' ablation variant no "
                             "longer matches decode_pallas bit-for-bit")
        print("parity ok: 'full' variant == decode_pallas (bit-exact)")

    variants = [
        ("full", dict(skip_unpack=False, skip_dither=False,
                      skip_s_stack=False, skip_undo=False)),
        ("no_unpack", dict(skip_unpack=True, skip_dither=False,
                           skip_s_stack=False, skip_undo=False)),
        ("no_dither", dict(skip_unpack=False, skip_dither=True,
                           skip_s_stack=False, skip_undo=False)),
        ("no_s_stack", dict(skip_unpack=False, skip_dither=False,
                            skip_s_stack=True, skip_undo=False)),
        ("no_undo", dict(skip_unpack=False, skip_dither=False,
                         skip_s_stack=False, skip_undo=True)),
        ("dma_only", dict(skip_unpack=True, skip_dither=True,
                          skip_s_stack=True, skip_undo=True)),
    ]
    KLO, KHI = 4, 32
    for name, flags in variants:
        run = make_decode(**flags)
        tlo = chain_time(run, w3, key, scal, KLO)
        thi = chain_time(run, w3, key, scal, KHI)
        per = (thi - tlo) / (KHI - KLO)
        print(f"{name:12s} per-iter {per * 1e3:7.3f} ms   "
              f"{N * 4 / per / 1e9:7.1f} GB/s")


if __name__ == "__main__":
    main()
