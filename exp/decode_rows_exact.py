"""Exact-shape rows decode variant: no XLA pre-transpose, no input pad,
no output slice.

The production ``decode_pallas_rows`` pays three full-array XLA data
movements around its kernel at 100M scale: jnp.pad of the words
(~0.6 GB copy), the (M, 4w) -> (4w, M) pre-transpose (~1.3 GB traffic),
and the final [:, :n] slice (~2.4 GB traffic).  This variant moves the
rearrangement INTO the kernel:

- input: 2D BlockSpec (1, words_per_tile) over the RAW (R, n_words)
  words; the last block may be partial (Mosaic pads the read).
- in-kernel: view the (wpt,) vector as (M, 4w) [word 4w*m + c at
  (m, c) -- row-major, no data movement] and transpose to the (4w, M)
  unpack layout.
- output: 2D BlockSpec (1, tile) over the EXACT (R, n) output; the
  kernel flattens x.T (M, 128) row-major to (tile,), which is stream
  order; the last block's write is masked.

Open Mosaic questions this experiment answers on real hardware:
(a) is the (M, 4w) -> (4w, M) in-kernel transpose supported/lowered,
(b) is the (M, 128) -> (tile,) collapse supported,
(c) do partial boundary blocks work for both operands,
(d) net perf vs the production kernel + XLA movements.

Run: python exp/decode_rows_exact.py [cpu|tpu]
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/minnow_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.stdout.reconfigure(line_buffering=True)

MODE = sys.argv[1] if len(sys.argv) > 1 else "cpu"
if MODE == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import functools

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minnow_c_tpu.ops import decode_pallas as dp
from minnow_c_tpu.ops import native

INTERPRET = MODE == "cpu"


def _decode_rows_exact_kernel(words_ref, key_ref, scal_ref, out_ref, *,
                              width: int, tile_elems: int):
    r = pl.program_id(0)
    tile = pl.program_id(1)
    tile0 = tile.astype(jnp.uint32) * jnp.uint32(tile_elems // 4)
    M = tile_elems // 128
    W = words_ref[0].reshape(M, 4 * width).T  # (4w, M) unpack layout
    x = dp._decode_body(W, key_ref[r, 0], key_ref[r, 1], scal_ref[r, 0],
                        scal_ref[r, 1], scal_ref[r, 2], tile0, width=width,
                        periodic=True)  # (M, 128)
    out_ref[0] = x.reshape(tile_elems)  # stream order: e = m*128 + l


@functools.partial(jax.jit, static_argnames=("width", "n", "interpret"))
def decode_rows_exact(words, keys, width: int, n: int, x0, dx, box,
                      interpret: bool = False):
    rows = words.shape[0]
    tile = dp.TILE
    while tile > 1 << 14 and tile // 2 >= n:
        tile //= 2
    wpt = tile * width // 32
    n_tiles = -(-n // tile)
    M = tile // 128
    dx_bin = dx.astype(jnp.float32) / np.float32(
        np.exp2(width, dtype=np.float64))
    scal = jnp.stack([x0.astype(jnp.float32), dx_bin,
                      jnp.full((rows,), box, jnp.float32)], axis=1)
    kernel = functools.partial(_decode_rows_exact_kernel, width=width,
                               tile_elems=tile)
    return pl.pallas_call(
        kernel,
        grid=(rows, n_tiles),
        in_specs=[
            pl.BlockSpec((1, wpt), lambda r, i: (r, i)),
            pl.BlockSpec((rows, 2), lambda r, i: (r * 0, r * 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, 3), lambda r, i: (r * 0, r * 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, tile), lambda r, i: (r, i)),
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.float32),
        interpret=interpret,
    )(words, keys.astype(jnp.uint32), scal)


def main():
    width = 16
    R = 6
    W_box = 64.0
    rng = np.random.default_rng(3)
    if MODE == "cpu":
        n = (1 << 14) * 3 + 14 * 32  # partial last tile, 32-aligned
    else:
        n = 12_500_000
    bins = rng.integers(0, 1 << width, (R, n), dtype=np.uint64).astype(
        np.uint32)
    words = np.stack([native.uniform_pack_host(b, width) for b in bins])
    keys = rng.integers(0, 1 << 32, (R, 2), dtype=np.uint64).astype(
        np.uint32)
    x0 = jnp.asarray(rng.uniform(0, 1, R).astype(np.float32))
    dx = jnp.asarray(rng.uniform(1, 2, R).astype(np.float32))
    wd = jnp.asarray(words)
    kd = jnp.asarray(keys)

    ref = dp.decode_pallas_rows(wd, kd, width, n, x0, dx, box=W_box,
                                periodic=True, interpret=INTERPRET)
    got = decode_rows_exact(wd, kd, width, n, x0, dx, W_box,
                            interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    print(f"bit parity OK ({MODE}, n={n}, partial last tile "
          f"{n % dp.TILE != 0})")

    if MODE == "tpu":
        # chain-slope timing
        @functools.partial(jax.jit, static_argnames=("k", "which"))
        def chain(wdin, salt, k, which):
            def body(i, carry):
                s, _ = carry
                i0 = jax.lax.broadcasted_iota(jnp.uint32, wdin.shape, 0)
                i1 = jax.lax.broadcasted_iota(jnp.uint32, wdin.shape, 1)
                w = jnp.where((i0 == 0) & (i1 == 0), wdin ^ s, wdin)
                if which == "exact":
                    out = decode_rows_exact(w, kd, width, n, x0, dx, W_box)
                else:
                    out = dp.decode_pallas_rows(w, kd, width, n, x0, dx,
                                                box=W_box, periodic=True)
                s2 = jax.lax.bitcast_convert_type(out[0, 0], jnp.uint32)
                return (s2 ^ i.astype(jnp.uint32), out)

            s, out = jax.lax.fori_loop(
                0, k, body, (salt, jnp.zeros((R, n), jnp.float32)))
            return s ^ jax.lax.bitcast_convert_type(out[0, 1], jnp.uint32)

        for which in ("prod", "exact"):
            ts = {}
            for k in (2, 10):
                s = chain(wd, jnp.uint32(1), k, which)
                np.asarray(s)
                best = 1e9
                for _ in range(3):
                    t0 = time.perf_counter()
                    s = chain(wd, s, k, which)
                    np.asarray(s)
                    best = min(best, time.perf_counter() - t0)
                ts[k] = best
            per = (ts[10] - ts[2]) / 8
            gb = R * n * 4 / 1e9
            print(f"{which:6s} {per*1e3:7.2f} ms/iter  "
                  f"{gb/per:6.1f} GB/s decoded")


main()
