"""Round-3 experiment: move the decode words-transpose into the kernel.

Production `decode_pallas` pre-transposes the packed words in XLA
(`swapaxes(words.reshape(n_tiles, M, 4w), 1, 2)`) so the kernel can read
static row pairs.  That pre-transpose materializes the words a second
time in HBM: +2x word traffic (2.75 B/elem at level 11 on top of the
5.375 B/elem the decode fundamentally needs -- a ~1.5x traffic tax).

Variant here: feed the kernel the NATURAL (1, M, 4w) block and transpose
in-kernel (`in_ref[0].T`, one Mosaic-supported transpose; the kernel
already does one on the output side).  Bit parity is asserted on device
before timing; timing is the unrolled in-jit salt chain of
exp/decode_chain_variants.py.

Run on the real TPU:  python exp/decode_notranspose.py

RESULT (v5e, 2026-08-19): parity True; prod 292.4 GB/s, notranspose
261.0 GB/s.  The XLA pre-transpose is NOT a materialized extra pass in
practice (XLA overlaps/fuses it into the pipeline), while the in-kernel
transpose serializes VPU work inside the kernel.  Production keeps the
XLA pre-transpose.
"""

import os
import sys
import functools

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/minnow_jax_cache")
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minnow_c_tpu.bench import harness
from minnow_c_tpu.ops import decode_pallas as dp
from minnow_c_tpu.ops import native
from minnow_c_tpu.ops import rng as _rng

LEVEL = 11
N = (25_000_000 // dp.TILE) * dp.TILE
W = 64.0
UNROLL = 32


def _decode_kernel_nt(words_ref, key_ref, scal_ref, out_ref, *,
                      width: int, periodic: bool, tile_elems: int):
    """words (1, M, 4*width) NATURAL layout -> out (1, M, 128)."""
    tile = pl.program_id(0)
    tile0 = tile.astype(jnp.uint32) * jnp.uint32(tile_elems // 4)
    out_ref[0] = dp._decode_body(
        words_ref[0].T, key_ref[0], key_ref[1], scal_ref[0], scal_ref[1],
        scal_ref[2], tile0, width=width, periodic=periodic)


@functools.partial(jax.jit, static_argnames=("width", "n", "periodic"))
def decode_nt(words, key, width: int, n: int, x0, dx, box=0.0,
              periodic: bool = False):
    tile = dp.TILE
    M = tile // 128
    n_tiles = n // tile
    assert n % tile == 0
    wpt = tile * width // 32
    w3 = words[: n_tiles * wpt].reshape(n_tiles, M, 4 * width)
    key = jnp.asarray(key, dtype=jnp.uint32)
    dx_bin = jnp.float32(dx) / np.float32(np.exp2(width, dtype=np.float64))
    scal = jnp.stack([jnp.float32(x0), dx_bin, jnp.float32(box)])
    kernel = functools.partial(_decode_kernel_nt, width=width,
                               periodic=periodic, tile_elems=tile)
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, M, 4 * width), lambda i: (i, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2,), lambda i: (i * 0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((3,), lambda i: (i * 0,), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, M, 128), lambda i: (i, i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, M, 128), jnp.float32),
    )(w3, key, scal)
    return out.reshape(-1)


def main():
    rng = np.random.default_rng(0)
    bins = rng.integers(0, 1 << LEVEL, N, dtype=np.uint64).astype(np.uint32)
    packed = jax.device_put(jnp.asarray(native.uniform_pack_host(
        bins, LEVEL)))
    key = _rng.field_key_arr(1234, 0, 0)

    # bit parity vs production
    want = dp.decode_pallas(packed, key, LEVEL, N, 0.0, W, W, periodic=True)
    got = decode_nt(packed, key, LEVEL, N, 0.0, W, W, periodic=True)
    nbad = int(jax.jit(lambda a, b: jnp.sum((a != b).astype(jnp.int32)))(
        want, got))
    print(f"parity: {nbad == 0} (bad {nbad})", flush=True)
    if nbad:
        return

    def chain(one):
        @jax.jit
        def f(words, salt):
            s = salt
            x = None
            for i in range(UNROLL):
                x = one(words, s)
                s = jax.lax.bitcast_convert_type(x[0], jnp.uint32) ^ \
                    jnp.uint32(i)
            return x
        return f

    prod = chain(lambda w, s: dp.decode_pallas(
        w, key ^ s, LEVEL, N, 0.0, W, W, periodic=True))
    nt = chain(lambda w, s: decode_nt(
        w, key ^ s, LEVEL, N, 0.0, W, W, periodic=True))
    for name, fn in (("prod", prod), ("notranspose", nt)):
        r = harness.run(lambda s, fn=fn: fn(packed, s),
                        bytes_per_iter=N * 4 * UNROLL)
        print(f"{name:>12}: {r.gb_per_second:7.2f} GB/s "
              f"({r.iterations} it x {r.trial_seconds:.3f}s)", flush=True)


if __name__ == "__main__":
    main()
