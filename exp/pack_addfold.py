"""Round-2 experiment: ADD-fold pack variants.

The direct 32-way column-slice/shift fold is the cheapest pack
formulation (~2 ops/element vs ~56 for the production einsum-select
matmuls), but both the XLA TPU backend and Mosaic miscompile it when the
fold combinator is OR (wrong interior straddle bits, ~0.3% of words).
Since every element's bit window is disjoint, OR == ADD exactly; this
experiment checks whether an ADD fold takes a different (correct)
codegen path, and what it's worth.

Variants:
  G  XLA add-fold: per-output-column static shifts of whole (n_blocks,32)
     column slices, folded with u32 +.
  H  Pallas add-fold: same fold in VMEM per TILE block.

Run: python exp/pack_addfold.py [G H]  (on the real TPU)
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/minnow_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minnow_c_tpu.ops import bitpack, kernels
from minnow_c_tpu.ops.bitpack import pl_cdiv, packed_words
from minnow_c_tpu.bench import harness

TILE = 1 << 14
BLOCKS = TILE // 32


def _fold_cols(vals, width: int):
    """vals: (..., 32) u32 block matrix -> (..., width) u32 words via the
    direct fold: output word j = sum of the (<=3) elements whose bit
    windows intersect bits [32j, 32j+32), each shifted into place.
    Disjoint windows => + == |."""
    vals = vals & jnp.uint32((1 << width) - 1)
    cols = []
    for j in range(width):
        lo_bit = 32 * j
        hi_bit = lo_bit + 32
        acc = None
        for k in range(lo_bit // width, (hi_bit - 1) // width + 1):
            start = k * width - lo_bit
            v = vals[..., k]
            part = (v << jnp.uint32(start)) if start >= 0 else \
                (v >> jnp.uint32(-start))
            acc = part if acc is None else acc + part
        cols.append(acc)
    return jnp.stack(cols, axis=-1)


@functools.partial(jax.jit, static_argnames=("width",))
def pack_xla_addfold(x, width: int):
    n = x.shape[0]
    n_words = packed_words(n, width)
    n_blocks = pl_cdiv(n, 32)
    pad = n_blocks * 32 - n
    if pad:
        x = jnp.pad(x, (0, pad))
    words = _fold_cols(x.reshape(n_blocks, 32), width)
    return words.reshape(-1)[:n_words]


def _pack_addfold_kernel(b_ref, out_ref, *, width: int):
    out_ref[0] = _fold_cols(b_ref[0], width)


def pack_pallas_addfold(bins, width: int, interpret: bool = False):
    n = bins.shape[0]
    n_words = packed_words(n, width)
    n_tiles = pl_cdiv(n, TILE)
    pad = n_tiles * TILE - n
    if pad:
        bins = jnp.pad(bins, (0, pad))
    b3 = bins.reshape(n_tiles, BLOCKS, 32)
    out = pl.pallas_call(
        functools.partial(_pack_addfold_kernel, width=width),
        out_shape=jax.ShapeDtypeStruct((n_tiles, BLOCKS, width),
                                       jnp.uint32),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((1, BLOCKS, 32),
                               lambda i: (i, i * 0, i * 0))],
        out_specs=pl.BlockSpec((1, BLOCKS, width),
                               lambda i: (i, i * 0, i * 0)),
        interpret=interpret,
    )(b3)
    return out.reshape(-1)[:n_words]


def main():
    sel = set(sys.argv[1:]) or {"G", "H"}
    depth = 14
    n = TILE * 1536  # 25.2M elements = ~100 MB
    W = 64.0
    rng = np.random.default_rng(7)
    x = jax.device_put(jnp.asarray(
        rng.uniform(0, W, n).astype(np.float32)))
    bins_dev = jax.jit(
        lambda xx: kernels.uniform_bin_index(
            xx, depth, jnp.min(xx), jnp.max(xx) - jnp.min(xx)))(x)
    bins_dev = jax.block_until_ready(bins_dev)
    print("bins ready", flush=True)

    n_mismatch = jax.jit(
        lambda a, b: jnp.sum((a != b).astype(jnp.int32)))
    want = bitpack.uniform_pack(bins_dev, depth)

    variants = {"G": ("G xla_addfold", pack_xla_addfold),
                "H": ("H pallas_addfold", pack_pallas_addfold)}
    # Every variant: exactness at MULTIPLE widths on-chip first (the OR
    # fold's miscompile is width-dependent: straddle columns only).
    for key, (name, fn) in variants.items():
        if key not in sel:
            continue
        for w in (14, 9, 17, 24, 31, 8, 16):
            bw = jax.jit(lambda b, ww=w: b & jnp.uint32((1 << ww) - 1)
                         )(bins_dev)
            got = fn(bw, w)
            ref = bitpack.uniform_pack(bw, w)
            nbad = int(n_mismatch(got, ref))
            print(f"correct {name} width={w}: {nbad == 0} "
                  f"(bad words: {nbad})", flush=True)

    def bench_pack(name, packer):
        def fn(salt):
            b = bins_dev ^ (salt & jnp.uint32(1))
            return packer(b, depth)
        r = harness.run(fn, bytes_per_iter=n * 4)
        print(f"pack {name}: {r.gb_per_second:.2f} GB/s "
              f"({r.iterations} it x {r.trial_seconds:.3f}s)", flush=True)

    for key, (name, fn) in variants.items():
        if key in sel:
            bench_pack(name, fn)


if __name__ == "__main__":
    main()
