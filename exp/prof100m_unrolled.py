"""Round-4: phase-by-phase profile of the 100M sharded decode/encode
(config4_100m) with PYTHON-UNROLLED salt chains — the same chain shape
the production bench uses (fori_loop chains under-report; see
exp/decode_chain_variants.py, 134 vs 291 GB/s).

Decode phases (each timed as its own unrolled chain via bench.harness):

  perturb    salt_perturb(words) alone, materialized      (0.6r+0.6w GB)
  transpose  perturb + pad + reshape + swapaxes           (+0.6r+0.63w)
  kernel     pallas rows kernel on pre-transposed w4      (0.63r+1.26w)
  kernslice  kernel + the [:, :n] slice copy              (+1.26r+1.2w)
  full       codec._decode (production)                   (everything)

Encode phases:

  estats     vmapped div-mode stats (unwrap+min/max)      (0.6r x2)
  ebins      stats + bin (no pack)
  efull      codec._encode div (production)
  erecip     codec._encode recip (production)

Run:  python exp/prof100m_unrolled.py [phase...]
Env:  PROF_NB (block size, default 12_500_000), PROF_CHAIN (default 8)
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
from minnow_c_tpu.ops import decode_pallas
from minnow_c_tpu.parallel.sharding import (ShardedPositionCodec, make_mesh,
                                            spmd_depth_for,
                                            _float_block_encode)

W = 64.0
B, nb = 8, int(os.environ.get("PROF_NB", 12_500_000))
CHAIN = int(os.environ.get("PROF_CHAIN", 8))
depth = spmd_depth_for(1e-3, W)  # 16
ROWS = B * 3
n_words = nb * depth // 32
TILE = decode_pallas.TILE
n_tiles = -(-nb // TILE)
wpt = TILE * depth // 32
M = TILE // 128
pad_words = n_tiles * wpt - n_words
raw = B * 3 * nb * 4

print(f"nb={nb} depth={depth} rows={ROWS} n_words={n_words} "
      f"n_tiles={n_tiles} pad_words={pad_words} chain={CHAIN}")

rng = np.random.default_rng(7)
mesh = make_mesh()
codec = ShardedPositionCodec(mesh=mesh, width=W, depth=depth)
codec_r = ShardedPositionCodec(mesh=mesh, width=W, depth=depth,
                               scale_mode="recip")
seed_arr = jnp.asarray([4], dtype=jnp.uint32)
zero_blk = jnp.zeros((1,), jnp.int32)

_cache = {}


def get_xd():
    if "xd" not in _cache:
        _cache["xd"] = jax.device_put(
            jnp.asarray(rng.uniform(0, W, (B * 3, nb)).astype(np.float32)),
            codec._in_shardings())  # ROWS boundary (see sharding.py)
    return _cache["xd"]


def get_words():
    """(words, x0, rng_b) -- encodes once, then DROPS the 1.2 GB input."""
    if "words" not in _cache:
        enc = codec.encode(get_xd())
        _cache["words"] = tuple(jax.block_until_ready(enc))
        del enc
        _cache.pop("xd", None)
    return _cache["words"]


def perturb_nd(a, s):
    """XOR s into element [0,...,0], elementwise form."""
    hit = None
    for d in range(a.ndim):
        i = jax.lax.broadcasted_iota(jnp.uint32, a.shape, d)
        hit = (i == 0) if hit is None else (hit & (i == 0))
    return jnp.where(hit, a ^ s, a)


def first_u32(a):
    v = a
    for _ in range(a.ndim):
        v = v[0]
    if v.dtype == jnp.float32:
        v = jax.lax.bitcast_convert_type(v, jnp.uint32)
    return v


def chain(step):
    """Unrolled salt chain around a words->result step."""
    @jax.jit
    def f(salt, *args):
        s = salt
        out = None
        for i in range(CHAIN):
            out = step(s, *args)
            s = first_u32(out) ^ jnp.uint32(i)
        return s, out
    return f


# ---- decode phases ---------------------------------------------------------

def mk_perturb():
    return chain(lambda s, w: perturb_nd(w, s)), (get_words()[0],)


def mk_transpose():
    def step(s, w):
        wp = perturb_nd(w, s).reshape(ROWS, n_words)
        wp = jnp.pad(wp, ((0, 0), (0, pad_words)))
        return jnp.swapaxes(wp.reshape(ROWS, n_tiles, M, 4 * depth), 2, 3)
    return chain(step), (get_words()[0],)


keys = jnp.zeros((ROWS, 2), jnp.uint32) + jnp.uint32(7)
scal = jnp.stack([jnp.zeros((ROWS,), jnp.float32),
                  jnp.full((ROWS,), 1e-3, jnp.float32),
                  jnp.full((ROWS,), W, jnp.float32)], axis=1)
G = decode_pallas._rows_per_step(ROWS, TILE)
kern = functools.partial(decode_pallas._decode_rows_kernel, width=depth,
                         periodic=True, tile_elems=TILE, group=G)


def run_kernel(w4):
    return pl.pallas_call(
        kern,
        grid=(ROWS // G, n_tiles),
        in_specs=[
            pl.BlockSpec((G, 1, 4 * depth, M),
                         lambda r, i: (r, i, r * 0, r * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, 2), lambda r, i: (r * 0, r * 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ROWS, 3), lambda r, i: (r * 0, r * 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((G, 1, M, 128),
                               lambda r, i: (r, i, r * 0, r * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, n_tiles, M, 128),
                                       jnp.float32),
    )(w4, keys, scal)


def pre_transposed():
    w24 = jnp.reshape(get_words()[0], (ROWS, n_words))
    w4 = jnp.swapaxes(
        jnp.pad(w24, ((0, 0), (0, pad_words))).reshape(
            ROWS, n_tiles, M, 4 * depth), 2, 3)
    # Strip the mesh NamedSharding: a committed-sharded operand turns the
    # bare pallas_call's refs into sharded refs, which reject the
    # kernel's integer SMEM indexing ("sharded ref can only be indexed
    # by slices").  The production path is inside shard_map, where refs
    # are per-shard; this ad-hoc call is not.
    w4 = jax.device_put(w4, jax.devices()[0])
    return jax.block_until_ready(w4)


def mk_kernel():
    return chain(lambda s, w4: run_kernel(perturb_nd(w4, s))), \
        (pre_transposed(),)


def mk_kernslice():
    def step(s, w4):
        out = run_kernel(perturb_nd(w4, s))
        return out.reshape(ROWS, n_tiles * TILE)[:, :nb]
    return chain(step), (pre_transposed(),)


def mk_full():
    words_d, x0_d, rng_d = get_words()
    def step(s, w):
        return codec._decode(perturb_nd(w, s), x0_d, rng_d, seed_arr,
                             zero_blk)
    return chain(step), (words_d,)


def mk_rows():
    """Production decode_pallas_rows straight on the 2D words (the
    shard_map body's hot call): transpose + kernel + slice, no
    shard_map wrapper."""
    words_d, x0_d, rng_d = get_words()
    w2 = jax.device_put(jnp.reshape(words_d, (ROWS, n_words)),
                        jax.devices()[0])
    keys2 = jnp.zeros((ROWS, 2), jnp.uint32) + jnp.uint32(7)
    x0r = jnp.zeros((ROWS,), jnp.float32)
    dxr = jnp.full((ROWS,), W, jnp.float32)

    def step(s, w):
        return decode_pallas.decode_pallas_rows(
            perturb_nd(w, s), keys2, depth, nb, x0r, dxr, box=W,
            periodic=True)
    return chain(step), (jax.block_until_ready(w2),)


def mk_slice():
    """The [:, :nb] tail-trim copy alone on a padded-size u32 array."""
    big = jax.block_until_ready(
        jnp.ones((ROWS, n_tiles * TILE), jnp.uint32))

    def step(s, a):
        return perturb_nd(a, s)[:, :nb]
    return chain(step), (big,)


def mk_rows_nt():
    """decode_pallas_rows with the in-kernel transpose (natural words
    layout; round-4 variant)."""
    words_d, x0_d, rng_d = get_words()
    w2 = jax.device_put(jnp.reshape(words_d, (ROWS, n_words)),
                        jax.devices()[0])
    keys2 = jnp.zeros((ROWS, 2), jnp.uint32) + jnp.uint32(7)
    x0r = jnp.zeros((ROWS,), jnp.float32)
    dxr = jnp.full((ROWS,), W, jnp.float32)

    def step(s, w):
        return decode_pallas.decode_pallas_rows(
            perturb_nd(w, s), keys2, depth, nb, x0r, dxr, box=W,
            periodic=True, pretranspose=False)
    return chain(step), (jax.block_until_ready(w2),)


# ---- encode phases ---------------------------------------------------------

def salt_box(s):
    return jnp.float32(W) * (jnp.float32(1.0) +
                             s.astype(jnp.float32) * jnp.float32(1e-45))


def mk_estats():
    def step(s, xf):
        box = salt_box(s)
        x = xf.reshape(B, 3, nb)

        def one(xb):
            from minnow_c_tpu.ops import kernels
            u = jax.vmap(lambda d: kernels.undo_periodic(d, box))(
                jax.lax.optimization_barrier(xb))
            return jnp.min(u, axis=1), jnp.max(jnp.max(u, axis=1) -
                                               jnp.min(u, axis=1))
        return jax.vmap(one)(x)[0]
    return chain(step), (get_xd(),)


def mk_ebins():
    def step(s, xf):
        box = salt_box(s)
        bins, x0, rb = jax.vmap(
            lambda xb: _float_block_encode(xb, depth, box))(
                xf.reshape(B, 3, nb))
        return bins
    return chain(step), (get_xd(),)


def mk_efull():
    m = jnp.uint32(0x3FFFFF)

    def step(s, x):
        xs = perturb_nd(x, s & m)
        return codec._encode(xs)[0]
    return chain(step), (get_xd(),)


def mk_erecip():
    m = jnp.uint32(0x3FFFFF)

    def step(s, x):
        xs = perturb_nd(x, s & m)
        return codec_r._encode(xs)[0]
    return chain(step), (get_xd(),)


PHASES = {
    "perturb": mk_perturb, "transpose": mk_transpose, "kernel": mk_kernel,
    "kernslice": mk_kernslice, "rows": mk_rows, "rows_nt": mk_rows_nt, "slice": mk_slice,
    "full": mk_full,
    "estats": mk_estats, "ebins": mk_ebins, "efull": mk_efull,
    "erecip": mk_erecip,
}


def main():
    names = sys.argv[1:] or list(PHASES)
    for name in names:
        try:
            f, args = PHASES[name]()
            r = harness.run(lambda s: f(s, *args),
                            bytes_per_iter=raw * CHAIN)
            per_ms = raw * CHAIN / r.bytes_per_second / CHAIN * 1e3
            print(f"{name:>10}: {r.gb_per_second:7.2f} GB/s of "
                  f"decoded-f32 equiv   ({per_ms:6.2f} ms/step)",
                  flush=True)
        except Exception as e:
            print(f"{name:>10}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


main()


# A/B the production shard_map decode under both layouts in one process:
#   python exp/prof100m_unrolled.py ab
def run_ab():
    words_d, x0_d, rng_d = get_words()
    w2 = jax.device_put(jnp.reshape(words_d, (ROWS, n_words)),
                        jax.devices()[0])
    w2 = jax.block_until_ready(w2)
    keys2 = jnp.zeros((ROWS, 2), jnp.uint32) + jnp.uint32(7)
    x0r = jnp.zeros((ROWS,), jnp.float32)
    dxr = jnp.full((ROWS,), W, jnp.float32)

    import minnow_c_tpu.ops.decode_pallas as dp

    def measure(name, f, args):
        r = harness.run(lambda s: f(s, *args), bytes_per_iter=raw * CHAIN)
        per_ms = raw / r.bytes_per_second * 1e3
        print(f"{name:>14}: {r.gb_per_second:7.2f} GB/s ({per_ms:6.2f} "
              f"ms/step)", flush=True)

    for mode in (True, False):
        dp._PRETRANSPOSE_OVERRIDE = mode
        tag = "pre" if mode else "nat"
        codec_ab = ShardedPositionCodec(mesh=mesh, width=W, depth=depth)

        def step_full(s, w, c=codec_ab):
            return c._decode(perturb_nd(w, s), x0_d, rng_d, seed_arr,
                             zero_blk)

        def step_rows(s, w, m=mode):
            return decode_pallas.decode_pallas_rows(
                perturb_nd(w, s), keys2, depth, nb, x0r, dxr, box=W,
                periodic=True, pretranspose=m)

        measure(f"rows_{tag}", chain(step_rows), (w2,))
        measure(f"full_{tag}", chain(step_full), (words_d,))
    dp._PRETRANSPOSE_OVERRIDE = None


if sys.argv[1:] == ["ab"]:
    run_ab()


def run_body():
    """The decode_local BODY in plain jit (no shard_map): isolates the
    wrapper's cost.  python exp/prof100m_unrolled.py body"""
    from minnow_c_tpu.parallel.sharding import (_block_keys,
                                                _float_rows_decode)
    words_d, x0_d, rng_d = get_words()
    w1 = jax.device_put(words_d, jax.devices()[0])
    x01 = jax.device_put(x0_d, jax.devices()[0])
    rng1 = jax.device_put(rng_d, jax.devices()[0])
    w1 = jax.block_until_ready(w1)

    def step(s, w):
        wp = perturb_nd(w, s)
        keys2 = _block_keys(seed_arr, jnp.arange(B))
        return _float_rows_decode(wp, x01, rng1, keys2, depth, nb, W,
                                  True, True, False)

    f = chain(step)
    r = harness.run(lambda s: f(s, w1), bytes_per_iter=raw * CHAIN)
    print(f"body_nosm: {r.gb_per_second:7.2f} GB/s "
          f"({raw / r.bytes_per_second * 1e3:6.2f} ms/step)", flush=True)


if sys.argv[1:] == ["body"]:
    run_body()


def run_single():
    """One flat 300M-element stream through decode_pallas (the bench.py
    kernel) at this depth: python exp/prof100m_unrolled.py single"""
    from minnow_c_tpu.ops import rng as _rng
    words_d, _, _ = get_words()
    ntot = B * 3 * nb
    wflat = jax.device_put(jnp.reshape(words_d, (-1,)), jax.devices()[0])
    wflat = jax.block_until_ready(wflat)
    key = _rng.field_key_arr(1234, 0, 0)

    def step(s, w):
        return decode_pallas.decode_pallas(
            perturb_nd(w, s), key, depth, ntot, 0.0, W, W, periodic=True)

    f = chain(step)
    r = harness.run(lambda s: f(s, wflat), bytes_per_iter=raw * CHAIN)
    print(f"single300M: {r.gb_per_second:7.2f} GB/s "
          f"({raw / r.bytes_per_second * 1e3:6.2f} ms/step)", flush=True)


if sys.argv[1:] == ["single"]:
    run_single()
