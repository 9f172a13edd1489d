#!/usr/bin/env python
"""Per-codec encode/decode throughput: all six spec'd algorithms at 25M
values (~100 MB), coherent and random inputs (VERDICT round-3 item: "no
silent ~6 GB/s codecs behind a 291 GB/s headline").

Measures warm end-to-end wall time through the public segment API
(``compress_segment`` / ``decompress_segment(fused=True)``): device
kernels + host orchestration + LZ4 + (de)serialization -- what a user
actually gets per segment.  Decoded outputs stay on device; completion
is bounded by a tiny data-dependent fetch (block_until_ready alone can
lie on this runtime, see bench/harness.py).

Updates the "codecs" section of bench_kernels.json.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/minnow_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import minnow_c_tpu as mnw  # noqa: E402
from minnow_c_tpu import semver  # noqa: E402
from minnow_c_tpu.bench import harness  # noqa: E402
from minnow_c_tpu.segment import api  # noqa: E402

N = 25_165_824  # 3 x 8,388,608 values = 100.66 MB f32
W = 64.0

ALGOS = [
    ("trim", mnw.AlgoCode.TRIM, semver.pack(1, 0, 0)),
    ("diff", mnw.AlgoCode.DIFF, semver.pack(1, 0, 0)),
    ("coil", mnw.AlgoCode.COIL, semver.pack(1, 1, 0)),
    ("octo", mnw.AlgoCode.OCTO, semver.pack(1, 1, 0)),
    ("sort", mnw.AlgoCode.SORT, semver.pack(1, 2, 0)),
    ("cart", mnw.AlgoCode.CART, semver.pack(1, 0, 0)),
]


def make_inputs():
    n = N // 3
    rng = np.random.default_rng(7)
    steps = rng.normal(0, 0.003, (3, n)).astype(np.float32)
    coherent = ((np.cumsum(steps, axis=1) + W / 2) % W).astype(np.float32)
    random = rng.uniform(0, W, (3, n)).astype(np.float32)
    return {"coherent": coherent, "random": random}


def fetch_barrier(seg):
    """Tiny data-dependent D2H read bounding all decode work."""
    f = seg.fields[0]
    arr = f.data
    if hasattr(arr, "addressable_shards") or hasattr(arr, "device"):
        np.asarray(arr[(0,) * (arr.ndim - 1)][:1])
    return seg


def _cache_programs() -> int:
    """Entries in the persistent compile cache (the compile-cost
    budget's unit: on this runtime every new program is a 5-30 s remote
    compile, so per-codec warm-up ~= programs_compiled x latency)."""
    d = os.environ.get("JAX_COMPILATION_CACHE_DIR", "")
    try:
        return len(os.listdir(d))
    except OSError:
        return 0


def main():
    harness._wait_for_fast_mode()
    results = {}
    inputs = make_inputs()
    raw = N * 4
    for name, algo, ver in ALGOS:
        for kind, pos in inputs.items():
            seg = mnw.Seg(fields=[mnw.Field(
                hd=mnw.FieldHeader(mnw.FieldCode.POSN, algo, ver,
                                   pos.shape[1]),
                data=pos, acc=mnw.PositionAccuracy(delta=1e-3, width=W))])
            progs0 = _cache_programs()
            t0 = time.perf_counter()
            blob = api.compress_segment(seg, seed=3)   # warm (compiles)
            warm_enc = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = api.decompress_segment(blob, fused=True)
            fetch_barrier(out)
            warm_dec = time.perf_counter() - t0
            progs = _cache_programs() - progs0

            REPS = 3
            enc_s = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                blob = api.compress_segment(seg, seed=3)
                enc_s.append(time.perf_counter() - t0)
            dec_s = []
            for _ in range(REPS):
                t0 = time.perf_counter()
                out = api.decompress_segment(blob, fused=True)
                fetch_barrier(out)
                dec_s.append(time.perf_counter() - t0)
            enc = sorted(enc_s)[REPS // 2]
            dec = sorted(dec_s)[REPS // 2]
            results[f"{name}_{kind}"] = {
                "encode_s": round(enc, 3),
                "decode_s": round(dec, 3),
                "encode_GBps": round(raw / enc / 1e9, 2),
                "decode_GBps": round(raw / dec / 1e9, 2),
                "ratio": round(len(blob) / raw, 4),
                "warm_enc_s": round(warm_enc, 1),
                "warm_dec_s": round(warm_dec, 1),
                "programs_compiled": progs,
            }
            print(f"{name:>5} {kind:>8}: enc {raw/enc/1e9:6.2f} GB/s  "
                  f"dec {raw/dec/1e9:6.2f} GB/s  "
                  f"ratio {len(blob)/raw:.3f}", flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_kernels.json")
    from minnow_c_tpu.bench import records
    codecs = records.load(path).get("codecs", {})
    codecs.update({
        "meta": {
            "workload": f"POSN field, {N} f32 values (~100 MB), "
                        "delta=1e-3, warm end-to-end wall via "
                        "compress_segment/decompress_segment(fused) "
                        "incl. host LZ4 + (de)serialization; decoded "
                        "output device-resident",
            "device": jax.devices()[0].device_kind,
            "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
        },
        "results": results,
    })
    records.update_sections(path, {"codecs": codecs})
    print("updated bench_kernels.json [codecs]", flush=True)


def device_decode_rates():
    """Device-phase decode rates for the delta-family codecs (the
    VERDICT round-3 ask: Diff/Coil >= 10x the 6.12 GB/s generic
    composition).  Words are pre-staged on device; the salt chain
    perturbs them (decoded values are garbage -- widths tables stay
    fixed -- but every step is real dependent work); output is decoded
    f32 (diff) / bins (coil, sort) on device."""
    from minnow_c_tpu.algos import chunked
    from minnow_c_tpu.algos.algo_diff_v1_0 import _diff_plane_fused
    from minnow_c_tpu.ops import bitpack, kernels
    from minnow_c_tpu.ops import rng as _rng

    n = N
    rng = np.random.default_rng(3)
    walk = np.cumsum(rng.integers(-40, 41, n), dtype=np.int64)
    walk -= walk.min()
    bins = (walk % (1 << 14)).astype(np.uint32)
    CHAIN = 8
    out = {}

    def perturb(w, s):
        i = jax.lax.broadcasted_iota(jnp.uint32, w.shape, 0)
        return jnp.where(i == 0, w ^ s, w)

    def chain(step):
        @jax.jit
        def f(salt, *args):
            s = salt
            o = None
            for i in range(CHAIN):
                o = step(s, *args)
                v = o.ravel()[0]
                if v.dtype == jnp.float32:
                    v = jax.lax.bitcast_convert_type(v, jnp.uint32)
                s = v.astype(jnp.uint32) ^ jnp.uint32(i)
            return s, o
        return f

    # Diff: fused unpack -> unzigzag -> cumsum -> dithered undo
    z = kernels.u32_delta_zigzag(jnp.asarray(bins))[1:]
    width = max(1, int(np.asarray(jnp.max(z))).bit_length())
    dwords = jnp.concatenate([
        jnp.asarray([bins[0]], jnp.uint32),
        bitpack.uniform_pack(z, width)])
    dwords = jax.block_until_ready(dwords)
    key = _rng.field_key_arr(7, 0, 0)

    def diff_step(s, w):
        return _diff_plane_fused(perturb(w, s), key, width, n, 14,
                                 0.0, W, jnp.float32(W), True)

    f_diff = chain(diff_step)  # hoisted: a fresh jit wrapper per call
    # retraces/reloads the executable every iteration (~0.8 s/call)
    r = harness.run(lambda s: f_diff(s, dwords),
                    bytes_per_iter=n * 4 * CHAIN)
    out["diff_device_decode_GBps"] = round(r.gb_per_second, 2)
    print(f"diff device decode: {r.gb_per_second:.2f} GB/s", flush=True)

    # Coil v1.1: ONE fused kernel pass (DMA + chunked unpack + unzigzag
    # + cumsum, ops/chunked_pallas.py); the v1.0 bucketed-gather path
    # this replaces measured 1.5 GB/s (round-4 record)
    from minnow_c_tpu.algos.algo_coil_v1_1 import KERNEL_CHUNK, _cmajor_blob
    from minnow_c_tpu.ops import chunked_pallas
    zs = np.asarray(kernels.u32_delta_zigzag(jnp.asarray(bins))).copy()
    zs[0] = 0
    zc, widths = chunked.chunk_widths(zs, KERNEL_CHUNK)
    body = np.frombuffer(
        _cmajor_blob(chunked.pack_chunks(zc, widths), widths,
                     KERNEL_CHUNK), dtype=np.uint32)
    n_chunks = len(widths)
    wpcs = (KERNEL_CHUNK * widths.astype(np.int64)) // 32
    woff = np.concatenate([[0], np.cumsum(wpcs)[:-1]])
    present = tuple(sorted(int(w) for w in np.unique(widths)))
    lut = {w: i for i, w in enumerate(present)}
    bidx = np.asarray([lut[int(w)] for w in widths], np.int32)
    pad = -(-(int(wpcs.sum()) + KERNEL_CHUNK) // 128) * 128
    body_d = jax.block_until_ready(jnp.asarray(np.concatenate(
        [body, np.zeros(pad - len(body), np.uint32)])))
    woff_d = jnp.asarray(woff.astype(np.int32))  # word offsets; the
    # kernel wrapper converts to 128-word row offsets itself
    first_arr = jnp.asarray(np.asarray([bins[0]], np.uint32)
                            .view(np.int32))

    @jax.jit
    def coil_step(s, b, wo, bi, fa):
        out = chunked_pallas.chunked_delta_bins(
            perturb(b, s), wo, bi, fa, present, KERNEL_CHUNK, n_chunks)
        return out[:n]

    f_coil = chain(coil_step)
    r = harness.run(lambda s: f_coil(s, body_d, woff_d,
                                     jnp.asarray(bidx), first_arr),
                    bytes_per_iter=n * 4 * CHAIN)
    out["coil_device_decode_GBps"] = round(r.gb_per_second, 2)
    print(f"coil device decode: {r.gb_per_second:.2f} GB/s", flush=True)

    # coil to FLOATS (apples-to-apples with the diff row, which includes
    # the dither/undo): the whole float decode in ONE kernel pass
    # (floats mode: in-kernel dither + undo + rewrap)
    fscal = jnp.stack([jnp.float32(0.0),
                       jnp.float32(W) / jnp.float32(1 << 14),
                       jnp.float32(W)])

    @jax.jit
    def coil_float_step(s, b, wo, bi, fa):
        out = chunked_pallas.chunked_delta_bins(
            perturb(b, s), wo, bi, fa, present, KERNEL_CHUNK, n_chunks,
            key=jnp.asarray(key, jnp.uint32), fscal=fscal, floats=True,
            periodic=True)
        return out[:n]

    f_coil_f = chain(coil_float_step)
    r = harness.run(lambda s: f_coil_f(s, body_d, woff_d,
                                       jnp.asarray(bidx), first_arr),
                    bytes_per_iter=n * 4 * CHAIN)
    out["coil_device_decode_floats_GBps"] = round(r.gb_per_second, 2)
    print(f"coil device decode (floats): {r.gb_per_second:.2f} GB/s",
          flush=True)

    # Sort v1.2: both profiles.  Order-free (the niche) = ONE fused
    # kernel pass over the sorted-delta stream; ranked additionally
    # pays the order-restoring element gather, which is this chip's
    # hard floor (~0.4 GB/s, exp/coil_sort_gather.py) and the reason
    # the order-free profile exists.
    sv = np.sort(bins)
    deltas = np.diff(sv, prepend=np.uint32(0)).astype(np.uint32)
    first_s = int(deltas[0]); deltas[0] = 0

    def stage_chunked(stream):
        zc2, wid = chunked.chunk_widths(stream, KERNEL_CHUNK)
        body2 = np.frombuffer(
            _cmajor_blob(chunked.pack_chunks(zc2, wid), wid,
                         KERNEL_CHUNK), dtype=np.uint32)
        nch = len(wid)
        wp = (KERNEL_CHUNK * wid.astype(np.int64)) // 32
        wo = np.concatenate([[0], np.cumsum(wp)[:-1]])
        pres = tuple(sorted(int(w) for w in np.unique(wid)))
        lu = {w: i for i, w in enumerate(pres)}
        bi = np.asarray([lu[int(w)] for w in wid], np.int32)
        padto = -(-(int(wp.sum()) + KERNEL_CHUNK) // 128) * 128
        bd = jax.block_until_ready(jnp.asarray(np.concatenate(
            [body2, np.zeros(padto - len(body2), np.uint32)])))
        return bd, jnp.asarray(wo.astype(np.int32)), jnp.asarray(bi), \
            pres, nch

    db_d, dwo, dbi, dpres, dnch = stage_chunked(deltas)

    @jax.jit
    def sort_of_step(s, b, wo, bi):
        out = chunked_pallas.chunked_delta_bins(
            perturb(b, s), wo, bi,
            jnp.asarray(np.asarray([first_s], np.uint32).view(np.int32)),
            dpres, KERNEL_CHUNK, dnch, zigzag=False)
        return out[:n]

    f_sof = chain(sort_of_step)
    r = harness.run(lambda s: f_sof(s, db_d, dwo, dbi),
                    bytes_per_iter=n * 4 * CHAIN)
    out["sort_orderfree_device_decode_GBps"] = round(r.gb_per_second, 2)
    print(f"sort order-free device decode: {r.gb_per_second:.2f} GB/s",
          flush=True)

    order = np.argsort(bins, kind="stable")
    ranks = np.empty(n, np.uint32); ranks[order] = np.arange(n)
    rz = np.asarray(kernels.u32_delta_zigzag(jnp.asarray(ranks))).copy()
    rz[0] = 0
    rb_d, rwo, rbi, rpres, rnch = stage_chunked(rz)

    @jax.jit
    def sort_ranked_step(s, db, dwo_, dbi_, rb, rwo_, rbi_):
        sorted_vals = chunked_pallas.chunked_delta_bins(
            perturb(db, s), dwo_, dbi_,
            jnp.asarray(np.asarray([first_s], np.uint32).view(np.int32)),
            dpres, KERNEL_CHUNK, dnch, zigzag=False)[:n]
        rr = chunked_pallas.chunked_delta_bins(
            perturb(rb, s), rwo_, rbi_,
            jnp.asarray(np.asarray([ranks[0]], np.uint32).view(np.int32)),
            rpres, KERNEL_CHUNK, rnch, zigzag=True)[:n]
        sorted_vals = jax.lax.optimization_barrier(sorted_vals)
        rr = jax.lax.optimization_barrier(rr)
        return sorted_vals[rr]

    f_sort = chain(lambda s, *a: sort_ranked_step(s, *a))
    r = harness.run(lambda s: f_sort(s, db_d, dwo, dbi, rb_d, rwo, rbi),
                    bytes_per_iter=n * 4 * CHAIN)
    out["sort_device_decode_GBps"] = round(r.gb_per_second, 2)
    print(f"sort ranked device decode: {r.gb_per_second:.2f} GB/s",
          flush=True)
    return out


if __name__ == "__main__":
    if os.environ.get("CODEC_DEVICE_ONLY"):
        harness._wait_for_fast_mode()
        res = device_decode_rates()
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_kernels.json")
        from minnow_c_tpu.bench import records
        codecs = records.load(path).get("codecs", {})
        codecs["device_decode"] = res
        records.update_sections(path, {"codecs": codecs})
        print("updated bench_kernels.json [codecs.device_decode]")
        sys.exit(0)
    main()
