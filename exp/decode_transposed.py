"""Experiment: transposed-layout fused decode kernel.

The production `_decode_kernel` computes on (BLOCKS=512, 32) and
(512, width) arrays whose minor dims pad to 128 lanes (4x and ~12x
register waste), and runs Threefry per element although 4 elements share
a counter.  This variant puts *groups on lanes*: words arrive as
(width, G) [pre-transposed in XLA], every unpack shift is a full-lane op
on a (G,) vector, Threefry runs on (8, G) (4x fewer lanes), and the
16-bit grain extraction is a static sublane select per output row.

Measured with chain-slope timing (K=2 vs K=32 chained decodes inside one
jit, D2H readback of a data-dependent scalar) -- the only timing this
runtime can't distort.
"""

import os
import sys
import time
import functools

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/minnow_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minnow_c_tpu.ops import decode_pallas as dp
from minnow_c_tpu.ops import native
from minnow_c_tpu.ops import rng as _rng


def _decode_kernel_t(words_ref, key_ref, scal_ref, out_ref, *, width: int,
                     periodic: bool, tile_elems: int):
    """words (1, width, G) -> out (1, G, 32), bit-identical element math
    to `_decode_kernel`."""
    tile = pl.program_id(0)
    k0 = key_ref[0]
    k1 = key_ref[1]
    x0 = scal_ref[0]
    dx_bin = scal_ref[1]
    box = scal_ref[2]

    W = words_ref[0]          # (width, G)
    G = W.shape[1]
    mask = jnp.uint32((1 << width) - 1)

    # Threefry counters: element idx = g*32 + k (+ tile*TILE);
    # ctr = idx >> 2 = g*8 + (k>>2) + tile*TILE/4.  One (8, G) eval
    # covers all 32 rows (4 elements share each counter).
    base = tile.astype(jnp.uint32) * jnp.uint32(tile_elems // 4)
    ctr = base + \
        jax.lax.broadcasted_iota(jnp.uint32, (8, G), 1) * jnp.uint32(8) + \
        jax.lax.broadcasted_iota(jnp.uint32, (8, G), 0)
    a, b = dp._threefry13_tile(k0, k1, ctr)  # (8, G)

    rows = []
    for k in range(32):
        start = k * width
        j = start // 32
        off = start % 32
        v = W[j] >> jnp.uint32(off)
        if off + width > 32:
            v = v | (W[j + 1] << jnp.uint32(32 - off))
        binsk = v & mask                     # (G,)
        src = a if (k & 3) < 2 else b
        w16 = src[k >> 2]                    # (G,) static sublane select
        if k & 1:
            w16 = w16 >> jnp.uint32(16)
        h = w16 & jnp.uint32(0xFFFF)
        u = h.astype(jnp.int32).astype(jnp.float32) * jnp.float32(
            1.0 / (1 << 16))
        xk = x0 + dx_bin * (binsk.astype(jnp.int32).astype(jnp.float32) + u)
        if periodic:
            xk = jnp.where(xk >= box, xk - box, xk)
            xk = jnp.where(xk < 0, xk + box, xk)
        rows.append(xk)
    xt = jnp.stack(rows, axis=0)             # (32, G)
    out_ref[0] = xt.T                        # (G, 32): element order


@functools.partial(jax.jit,
                   static_argnames=("width", "n", "periodic", "tile"))
def decode_t(words, key, width: int, n: int, x0, dx, box=0.0,
             periodic: bool = False, tile: int = dp.TILE):
    """Transposed-layout decode; full tiles only (n % tile == 0)."""
    assert n % tile == 0
    G = tile // 32
    n_tiles = n // tile
    wpt = tile * width // 32
    # XLA pre-transpose: (n_tiles, G, width) -> (n_tiles, width, G)
    wmain = words[: n_tiles * wpt].reshape(n_tiles, G, width)
    wmain = jnp.swapaxes(wmain, 1, 2)
    dx_bin = jnp.float32(dx) / jnp.float32(1 << width)
    scal = jnp.stack([jnp.float32(x0), dx_bin, jnp.float32(box)])
    kernel = functools.partial(_decode_kernel_t, width=width,
                               periodic=periodic, tile_elems=tile)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, width, G), lambda i: (i, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2,), lambda i: (i * 0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((3,), lambda i: (i * 0,), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, G, 32), lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, G, 32), jnp.float32),
    )(wmain, jnp.asarray(key, dtype=jnp.uint32), scal)
    return out.reshape(-1)


def chain_time(fn, packed, key, n, label, K_lo=2, K_hi=32):
    """Per-iteration time via chain-length slope with D2H readback."""
    def make(K):
        @jax.jit
        def f(words, salt):
            def body(i, carry):
                s, _ = carry
                x = fn(words, (key[0] ^ s, key[1]))
                s2 = jax.lax.bitcast_convert_type(x[0], jnp.uint32) ^ \
                    i.astype(jnp.uint32)
                return (s2, x)
            s, x = jax.lax.fori_loop(
                0, K, body, (salt, jnp.zeros((n,), jnp.float32)))
            return s, x
        return f

    times = {}
    for K in (K_lo, K_hi):
        f = make(K)
        s, x = f(packed, jnp.uint32(1)); np.asarray(s)
        best = 1e9
        for t in range(3):
            t0 = time.perf_counter()
            s, x = f(packed, jnp.uint32(50 + t))
            np.asarray(s)
            best = min(best, time.perf_counter() - t0)
        times[K] = best
    per = (times[K_hi] - times[K_lo]) / (K_hi - K_lo)
    print("%-28s per-decode %7.3f ms -> %6.1f GB/s" %
          (label, per * 1e3, n * 4 / per / 1e9), flush=True)
    return per


def main():
    LEVEL = int(os.environ.get("LEVEL", 11))
    N = (25_000_000 // (1 << 17)) * (1 << 17)  # divisible by all tiles
    rng = np.random.default_rng(0)
    bins_np = rng.integers(0, 1 << LEVEL, N, dtype=np.uint64).astype(
        np.uint32)
    packed_np = native.uniform_pack_host(bins_np, LEVEL)
    packed = jax.device_put(jnp.asarray(packed_np))
    key = _rng.field_key_arr(1234, 0, 0)
    key = (key[0], key[1])

    # Parity first (on-chip compare, fetch one scalar)
    ref = dp.decode_pallas(packed, jnp.stack(key), LEVEL, N, 0.0, 64.0,
                           64.0, periodic=True)
    got = decode_t(packed, jnp.stack(key), LEVEL, N, 0.0, 64.0, 64.0,
                   periodic=True)
    eq = bool(np.asarray(jnp.array_equal(ref, got)))
    print("parity transposed vs production:", eq, flush=True)
    if not eq:
        bad = int(np.asarray(jnp.argmax(ref != got)))
        print("first mismatch at", bad,
              np.asarray(ref[bad]), np.asarray(got[bad]))
        return

    chain_time(lambda w, k: dp.decode_pallas(
        w, jnp.stack(k), LEVEL, N, 0.0, 64.0, 64.0, periodic=True),
        packed, key, N, "production (512,32)")
    for tile_log2 in (14, 16, 17):
        t = 1 << tile_log2
        chain_time(lambda w, k, t=t: decode_t(
            w, jnp.stack(k), LEVEL, N, 0.0, 64.0, 64.0, periodic=True,
            tile=t),
            packed, key, N, "transposed tile=%dK" % (t // 1024))


if __name__ == "__main__":
    main()
