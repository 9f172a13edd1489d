#!/usr/bin/env python
"""TPU probe of ops/chunked_pallas.py: Mosaic compile, bit-parity at
25M, and throughput at several chunk sizes (the Coil v1.1 decode
core)."""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/minnow_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from minnow_c_tpu.bench import harness
from minnow_c_tpu.ops import bitpack, chunked_pallas, kernels

N = 25_165_824
results = {}


def build(chunk):
    rng = np.random.default_rng(3)
    walk = np.cumsum(rng.integers(-40, 41, N), dtype=np.int64)
    bins = ((walk - walk.min()) % (1 << 14)).astype(np.uint32)
    zz = np.asarray(kernels.u32_delta_zigzag(jnp.asarray(bins))).copy()
    zz[0] = 0
    first = int(bins[0])
    n_chunks = -(-N // chunk)
    zp = np.zeros(n_chunks * chunk, np.uint32)
    zp[:N] = zz
    zc = zp.reshape(n_chunks, chunk)
    maxes = zc.max(axis=1)
    widths = np.ceil(np.log2(maxes.astype(np.float64) + 1.0)).astype(
        np.uint8)
    parts = []
    for w in np.unique(widths):
        if w == 0:
            continue
        idx = np.nonzero(widths == w)[0]
        vals = jnp.asarray(zc[idx].reshape(-1))
        packed = np.asarray(bitpack.uniform_pack(vals, int(w)))
        wpc = chunk * int(w) // 32
        parts.append((idx, packed.reshape(len(idx), wpc)))
    # assemble body in original chunk order, v1.1 column-major layout
    wpcs = (chunk * widths.astype(np.int64)) // 32
    offs = np.concatenate([[0], np.cumsum(wpcs)[:-1]])
    body = np.zeros(int(wpcs.sum()), np.uint32)
    for idx, rows in parts:
        w = rows.shape[1] * 32 // chunk
        for k, c in enumerate(idx):
            body[offs[c]:offs[c] + rows.shape[1]] = \
                chunked_pallas.body_to_cmajor(rows[k], w, chunk)
    return bins, body, widths, first


def main():
    for chunk in (16384,):
        bins, body, widths, first = build(chunk)
        print(f"chunk={chunk}: n_chunks={len(widths)} "
              f"widths={np.unique(widths)}", flush=True)
        t0 = time.time()
        out = np.asarray(chunked_pallas.decode_chunked_stream(
            jax.device_put(jnp.asarray(body)), widths, first, chunk, N))
        print(f"  compile+run {time.time()-t0:.1f}s  "
              f"match={np.array_equal(out, bins)}", flush=True)
        if not np.array_equal(out, bins):
            bad = np.nonzero(out != bins)[0]
            print("  FIRST BAD", bad[:5], out[bad[:3]], bins[bad[:3]])
            continue
        # throughput: salted chain over the kernel
        widths_l = np.asarray(widths, dtype=np.int64)
        n_chunks = len(widths)
        wpcs = (chunk * widths_l) // 32
        woff = np.concatenate([[0], np.cumsum(wpcs)[:-1]]).astype(np.int32)
        present = tuple(sorted(int(w) for w in np.unique(widths)))
        lut = {w: i for i, w in enumerate(present)}
        bidx = np.asarray([lut[int(w)] for w in widths_l], np.int32)
        total = int(wpcs.sum())
        bd = jnp.asarray(np.concatenate(
            [body, np.zeros(chunk, np.uint32)]))
        bd = jax.block_until_ready(jax.device_put(bd))
        first_arr = jnp.asarray(np.asarray([first], np.uint32)
                                .view(np.int32))
        woff_d = jnp.asarray(woff)
        bidx_d = jnp.asarray(bidx)
        CHAIN = 8

        @jax.jit
        def f(salt, b, wo, bi, fa):
            s = salt
            o = None
            for i in range(CHAIN):
                io = jax.lax.broadcasted_iota(jnp.uint32, b.shape, 0)
                bb = jnp.where(io == 0, b ^ s, b)
                o = chunked_pallas.chunked_delta_bins(
                    bb, wo, bi, fa, present, chunk, n_chunks)
                s = o.ravel()[0].astype(jnp.uint32) ^ jnp.uint32(i)
            return s, o

        r = harness.run(lambda s: f(s, bd, woff_d, bidx_d, first_arr),
                        bytes_per_iter=N * 4 * CHAIN)
        results[f"chunk_{chunk}"] = round(r.gb_per_second, 2)
        print(f"  {r.gb_per_second:8.2f} GB/s", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
