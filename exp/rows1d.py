"""Round-4: flat-grid rows decode — close the 2x gap vs single-stream.

Production decode_pallas_rows runs grid (R, n_tiles) and measures ~132
GB/s effective HBM at 24x12.58M while the single-stream kernel hits
~256 GB/s effective on the same volume.  This variant makes the rows
kernel SHAPE-IDENTICAL to the single-stream kernel: the (R, n_tiles)
leading dims merge into one flat grid dim (a free leading-dim reshape),
the words pre-transpose stays in XLA (it fuses into the salt/perturb
producer), and the only rows-specific work is a per-step SMEM scalar
lookup with the row id derived in the kernel body (lax.div on i32 --
the jnp '//' promotion recurses in Mosaic, and divmod in BlockSpec
index maps fails to legalize).

Run on TPU: python exp/rows1d.py [nb]
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/minnow_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.stdout.reconfigure(line_buffering=True)

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minnow_c_tpu.bench import harness
from minnow_c_tpu.ops import decode_pallas as dp

W = 64.0
DEPTH = 16
ROWS = 24
nb = int(sys.argv[1]) if len(sys.argv) > 1 else 12_582_912
TILE = dp.TILE
M = TILE // 128
CHAIN = 8


def _kernel_flat(words_ref, rowtab_ref, key_ref, scal_ref, out_ref, *,
                 width, periodic, tile_elems):
    # row/tile of this flat grid step from a tiny SMEM table (divmod in
    # the kernel fails Mosaic legalization on this backend)
    k = pl.program_id(0)
    r = rowtab_ref[k, 0]
    t = rowtab_ref[k, 1]
    tile0 = t.astype(jnp.uint32) * jnp.uint32(tile_elems // 4)
    out_ref[0] = dp._decode_body(
        words_ref[0], key_ref[r, 0], key_ref[r, 1], scal_ref[r, 0],
        scal_ref[r, 1], scal_ref[r, 2], tile0, width=width,
        periodic=periodic)


@functools.partial(jax.jit, static_argnames=("width", "n"))
def decode_rows_flat(words, keys, width, n, x0, dx, box, periodic=True):
    nt = n // TILE
    # (R, n_words) -> (R*nt, M, 4w) -> pre-transpose (R*nt, 4w, M);
    # leading-dim merges are layout-free and the transpose fuses into
    # the producer of ``words`` (e.g. the bench's salt perturb).
    w3 = jnp.swapaxes(words.reshape(ROWS * nt, M, 4 * width), 1, 2)
    dx_bin = dx.astype(jnp.float32) / np.float32(
        np.exp2(width, dtype=np.float64))
    scal = jnp.stack([x0.astype(jnp.float32), dx_bin,
                      jnp.full((ROWS,), box, jnp.float32)], axis=1)
    kernel = functools.partial(_kernel_flat, width=width,
                               periodic=periodic, tile_elems=TILE)
    rowtab = jnp.stack(
        [jnp.repeat(jnp.arange(ROWS, dtype=jnp.int32), nt),
         jnp.tile(jnp.arange(nt, dtype=jnp.int32), ROWS)], axis=1)
    out = pl.pallas_call(
        kernel,
        grid=(ROWS * nt,),
        in_specs=[
            pl.BlockSpec((1, 4 * width, M), lambda k: (k, k * 0, k * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS * nt, 2), lambda k: (k * 0, k * 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS, 2), lambda k: (k * 0, k * 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS, 3), lambda k: (k * 0, k * 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, M, 128), lambda k: (k, k * 0, k * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS * nt, M, 128), jnp.float32),
    )(w3, rowtab, keys, scal)
    return out.reshape(ROWS, n)


def perturb(a, s):
    hit = None
    for d in range(a.ndim):
        i = jax.lax.broadcasted_iota(jnp.uint32, a.shape, d)
        hit = (i == 0) if hit is None else (hit & (i == 0))
    return jnp.where(hit, a ^ s, a)


def main():
    rng = np.random.default_rng(0)
    n_words = nb * DEPTH // 32
    words = jax.device_put(jnp.asarray(rng.integers(
        0, 1 << 32, (ROWS, n_words), dtype=np.int64).astype(np.uint32)))
    keys = jnp.asarray(rng.integers(0, 1 << 32, (ROWS, 2),
                                    dtype=np.int64).astype(np.uint32))
    x0 = jnp.zeros((ROWS,), jnp.float32)
    dx = jnp.full((ROWS,), W, jnp.float32)

    # parity vs production (small slice to keep it quick)
    small = TILE * 2
    ws = words[:, : small * DEPTH // 32]
    a = decode_rows_flat(ws, keys, DEPTH, small, x0, dx, W)
    b = dp.decode_pallas_rows(ws, keys, DEPTH, small, x0, dx, box=W,
                              periodic=True)
    bad = int(jax.jit(lambda p, q: jnp.sum((p != q).astype(jnp.int32)))(
        jax.lax.bitcast_convert_type(a, jnp.uint32),
        jax.lax.bitcast_convert_type(b, jnp.uint32)))
    print(f"parity small: bad={bad}", flush=True)
    assert bad == 0

    raw = ROWS * nb * 4

    def chain(step):
        @jax.jit
        def f(salt, w):
            s = salt
            out = None
            for i in range(CHAIN):
                out = step(s, w)
                s = jax.lax.bitcast_convert_type(out[0, 0], jnp.uint32) ^ \
                    jnp.uint32(i)
            return s, out
        return f

    from minnow_c_tpu.ops import rng as _rng
    key1 = _rng.field_key_arr(1234, 0, 0)
    ntot = ROWS * nb

    cases = [
        ("single", chain(lambda s, w: dp.decode_pallas(
            perturb(w, s).reshape(-1), key1, DEPTH, ntot, 0.0, W, W,
            periodic=True).reshape(ROWS, nb))),
        ("rows_flat", chain(lambda s, w: decode_rows_flat(
            perturb(w, s), keys, DEPTH, nb, x0, dx, W))),
        ("rows_2d", chain(lambda s, w: dp.decode_pallas_rows(
            perturb(w, s), keys, DEPTH, nb, x0, dx, box=W,
            periodic=True, pretranspose=False))),
    ]
    for name, f in cases:
        r = harness.run(lambda s, f=f: f(s, words),
                        bytes_per_iter=raw * CHAIN)
        print(f"{name}: {r.gb_per_second:7.2f} GB/s "
              f"({raw / r.bytes_per_second * 1e3:6.2f} ms/step)",
              flush=True)


main()
