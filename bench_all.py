#!/usr/bin/env python
"""Full benchmark matrix over the BASELINE.json configs.

Writes ``BENCH_NOTES.md`` + ``bench_results.json``.  The headline driver
metric stays in ``bench.py``; this runner covers the five configs:

1. 1M-value single-block round trip (correctness oracle config)
2. 1M-particle positions: quantize+bin+pack encode kernel, single chip
3. 10M-particle pos+vel+ids full wire format, 1 chip (tunnel-I/O bound;
   reported with the device-compute number separated)
4. 100M-particle positions sharded across 8 blocks, ordered gather
5. multichip SPMD dry-run (8-way mesh semantics; single real chip here)

Environment notes (see memory/axon-tpu-quirks): device->host through this
tunnel is ~25 MB/s, so end-to-end file numbers are transfer-bound; the
per-chip compute numbers are reported separately.
"""

import io
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/minnow_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

results = {}


def log(msg):
    print(msg, flush=True)


def salt_perturb(arr, pairs):
    """XOR salt words into selected elements of ``arr[0, 0, :]``,
    expressed elementwise (iota masks + where).

    A scatter (``.at[0,0,i].set``) is the obvious spelling but (a) inside
    a fori_loop body XLA assigns the scatter copy a pathological
    ``T(4,128)`` layout over the two small leading dims -- 21x padding,
    11.9 GB for a 572 MB array, instant OOM -- and (b) on a sharded
    operand the scatter's output sharding is ambiguous and errors.  The
    elementwise form has neither problem and fuses into the consumer.

    ``pairs`` is a sequence of (element_index, uint32_value).
    """
    last = arr.ndim - 1
    first = None
    for d in range(last):
        i = jax.lax.broadcasted_iota(jnp.uint32, arr.shape, d)
        first = (i == 0) if first is None else (first & (i == 0))
    if first is None:
        first = jnp.ones(arr.shape, bool)
    il = jax.lax.broadcasted_iota(jnp.uint32, arr.shape, last)
    bits = arr if arr.dtype == jnp.uint32 else \
        jax.lax.bitcast_convert_type(arr, jnp.uint32)
    for idx, val in pairs:
        bits = bits ^ jnp.where(first & (il == jnp.uint32(idx)), val,
                                jnp.uint32(0))
    return bits if arr.dtype == jnp.uint32 else \
        jax.lax.bitcast_convert_type(bits, jnp.float32)


def config1():
    import minnow_c_tpu as mnw
    from minnow_c_tpu.algos import registry
    from minnow_c_tpu.segment import api

    n, W = 1_000_000, 64.0
    rng = np.random.default_rng(0)
    pos = rng.uniform(0, W, (3, n)).astype(np.float32)
    ver = registry.newest(mnw.AlgoCode.TRIM)

    def make(p):
        return mnw.Seg(fields=[mnw.Field(
            hd=mnw.FieldHeader(mnw.FieldCode.POSN, mnw.AlgoCode.TRIM, ver,
                               n),
            data=p, acc=mnw.PositionAccuracy(delta=1e-3, width=W))])

    # Warm: compile every program in the pipeline on identical shapes
    # (the bench.c pause/resume intent -- compiles are not throughput).
    warm = api.compress_segment(make(pos), seed=0)
    api.decompress_segment(warm, fused=True)
    t0 = time.perf_counter()
    blob = api.compress_segment(make(pos), seed=1)
    t1 = time.perf_counter()
    out = api.decompress_segment(blob, fused=True)
    t2 = time.perf_counter()
    err = np.abs(np.asarray(out.fields[0].data) - pos)
    err = np.minimum(err, W - err)
    ok = bool((err <= 1e-3).all())
    results["config1_1M_roundtrip"] = {
        "within_delta": ok, "encode_s": round(t1 - t0, 3),
        "decode_s": round(t2 - t1, 3),
        "ratio": round(len(blob) / pos.nbytes, 4),
        "note": "warm (compiles excluded); fused decode"}
    log(f"config1: ok={ok} enc={t1-t0:.2f}s dec={t2-t1:.2f}s "
        f"ratio={len(blob)/pos.nbytes:.3f}")


def config2():
    from minnow_c_tpu.ops import bitpack, fastpath, kernels
    from minnow_c_tpu.bench import harness

    # 100 MB of f32 input -- the reference bench's workload size
    # (test/compress_util_bench.c:318).  Smaller buffers (the old 12 MB)
    # are dispatch-latency-bound through the remote runtime and
    # under-report by ~8x; per-chip kernel throughput needs the dispatch
    # amortized.
    n, W = (1 << 14) * 1536, 64.0  # 25.2M values
    rng = np.random.default_rng(1)
    x = jax.device_put(jnp.asarray(
        rng.uniform(0, W, n).astype(np.float32)))
    depth = 14

    CHAIN = 16  # in-jit chained iterations: single dispatches are
    # enqueue-bound on this runtime (~4 ms/dispatch caps any kernel at
    # ~25 GB/s); the salt chain keeps every iteration a real dependent
    # computation (see bench.py).  Chains are PYTHON-UNROLLED, not
    # fori_loop: the loop carry forces a per-iteration copy of the
    # carried array and the while-loop adds per-step overhead (measured
    # 134 vs 291 GB/s on the decode chain,
    # exp/decode_chain_variants.py).  The salt rides into each step as a
    # box-width perturbation that rounds away in f32 (W * (1 + s*1e-45)
    # == W exactly), so inputs are unique per step -- no replay -- with
    # zero extra per-element traffic.

    # x/bins ride as jit ARGUMENTS (closures serialize into the remote
    # compile request; see config4_100m).
    @jax.jit
    def enc(xin, salt):
        s = salt
        w = None
        for i in range(CHAIN):
            box = jnp.float32(W) * (jnp.float32(1.0) +
                                    s.astype(jnp.float32) *
                                    jnp.float32(1e-45))
            w, _, _ = fastpath.fast_uniform_encode(xin, depth,
                                                   periodic_width=box)
            s = w[0] ^ jnp.uint32(i)
        return s, w

    res = harness.run(lambda s: enc(x, s), bytes_per_iter=n * 4 * CHAIN)

    @jax.jit
    def enc_recip(xin, salt):
        s = salt
        w = None
        for i in range(CHAIN):
            box = jnp.float32(W) * (jnp.float32(1.0) +
                                    s.astype(jnp.float32) *
                                    jnp.float32(1e-45))
            w, _, _ = fastpath.fast_uniform_encode(xin, depth,
                                                   periodic_width=box,
                                                   scale_mode="recip")
            s = w[0] ^ jnp.uint32(i)
        return s, w

    res_r = harness.run(lambda s: enc_recip(x, s),
                        bytes_per_iter=n * 4 * CHAIN)

    bins = jax.block_until_ready(jax.jit(
        lambda xx: kernels.uniform_bin_index(
            xx, depth, jnp.min(xx), jnp.max(xx) - jnp.min(xx)))(x))

    from minnow_c_tpu.ops import encode_pallas

    @jax.jit
    def pack_only(bins_in, salt):
        # The salt XOR is a full elementwise pass (it cannot fuse into
        # the pallas_call), so this chain carries +8 B/elem of parasitic
        # traffic on top of the pack's own ~5.75 B/elem -- the recorded
        # number UNDERSTATES the bare pack kernel by ~2.4x in the
        # HBM-bound limit.
        s = salt
        w = None
        for i in range(CHAIN):
            b = bins_in ^ s
            if jax.default_backend() == "tpu":
                w = encode_pallas.pack_pallas(b, depth, n)
            else:
                w = bitpack.uniform_pack(b, depth)
            s = w[0] ^ jnp.uint32(i)
        return s, w

    res_p = harness.run(lambda s: pack_only(bins, s),
                        bytes_per_iter=n * 4 * CHAIN)
    results["config2_encode_kernel"] = {
        "GBps": round(res.gb_per_second, 2),
        "recip_mode_GBps": round(res_r.gb_per_second, 2),
        "pack_only_GBps": round(res_p.gb_per_second, 2),
        "pack_only_note": "includes a non-fusable salt XOR pass "
                          "(+8 B/elem); understates the bare kernel",
        "depth": depth, "input_MB": round(n * 4 / 1e6),
        "note": "GBps = default div map (C-exact IEEE division, 3 HBM "
                "passes); recip_mode_GBps = scale_mode='recip' "
                "single-kernel encode (doc/wire_format.md section 6)"}
    log(f"config2: encode {res.gb_per_second:.2f} GB/s, "
        f"recip {res_r.gb_per_second:.2f} GB/s, "
        f"pack {res_p.gb_per_second:.2f} GB/s")


def config3():
    import minnow_c_tpu as mnw
    from minnow_c_tpu.parallel import snapshot

    n, W = 10_000_000, 64.0
    rng = np.random.default_rng(2)
    steps = rng.normal(0, 0.01, (3, n)).astype(np.float32)
    pos = (np.cumsum(steps, axis=1) + W / 2).astype(np.float32) % W
    vel = rng.normal(0, 200, (3, n)).astype(np.float32)
    ids = rng.permutation(1 << 24)[:n].astype(np.uint64)
    raw = pos.nbytes + vel.nbytes + ids.nbytes
    spec = snapshot.SnapshotSpec(
        pos=mnw.PositionAccuracy(delta=1e-3, width=W),
        vel=mnw.VelocityAccuracy(delta=1.0),
        ids=mnw.IDAccuracy(width=1024))
    # warm (compiles) -- both directions: decode compiles its own pallas
    # programs per (width, shape), which must not land in the timed run
    buf = io.BytesIO()
    snapshot.compress_snapshot(buf, pos, vel, ids, spec, num_blocks=8)
    buf.seek(0)
    snapshot.decompress_snapshot(buf)
    t0 = time.perf_counter()
    buf = io.BytesIO()
    stats = snapshot.compress_snapshot(buf, pos, vel, ids, spec,
                                       num_blocks=8, seed=1)
    t1 = time.perf_counter()
    buf.seek(0)
    out = snapshot.decompress_snapshot(buf)
    t2 = time.perf_counter()
    err = np.abs(out["pos"] - pos)
    err = np.minimum(err, W - err)
    ok = bool((err <= 1e-3).all() and (out["ids"] == ids).all())
    results["config3_10M_multifield"] = {
        "ok": ok, "encode_s": round(t1 - t0, 2),
        "decode_s": round(t2 - t1, 2), "ratio": round(stats["bytes"] / raw,
                                                      4),
        "note": "end-to-end incl. ~25MB/s tunnel D2H; see kernel metrics"}
    log(f"config3: ok={ok} enc={t1-t0:.1f}s dec={t2-t1:.1f}s "
        f"ratio={stats['bytes']/raw:.3f}")


def config4_100m():
    """The literal BASELINE config: 100M particles, single pass, 1 chip.

    Encode and decode device phases are timed as separate salted chains
    (bench/harness.py): every chain step's input carries bits derived from
    the previous step's output, so the runtime cannot elide, reorder, or
    replay any step.  Unsalted single dispatches are NOT timeable on this
    runtime -- block_until_ready on a lazily-materialized remote array
    returns in ~1 ms and reports fantasy multi-TB/s numbers (measured:
    exp/diag_100m.py).  Correctness is checked over the FULL 100M output
    on device (one scalar fetched), not a host-side sample."""
    from minnow_c_tpu.bench import harness
    from minnow_c_tpu.parallel.sharding import (ShardedPositionCodec,
                                                make_mesh, spmd_depth_for)

    W = 64.0
    # nb is TILE-aligned (24 x 2^19): the rows kernels then have no pad
    # words and the [:, :n] tail-trim slice is a no-op -- and n stays
    # >= 100M particles (100.66M).
    B, nb = 8, 12_582_912
    n = B * nb
    raw = n * 12
    rng = np.random.default_rng(7)
    mesh = make_mesh()
    depth = spmd_depth_for(1e-3, W)
    codec = ShardedPositionCodec(mesh=mesh, width=W, depth=depth)
    seed_arr = jnp.asarray([4], dtype=jnp.uint32)
    zero_blk = jnp.zeros((1,), jnp.int32)

    # ROWS (B*3, nb) device layout: (B, 3, n) jit boundaries draw
    # pathological TPU layouts (T(4,128) second-minor-3 padding + a full
    # output relayout, ~21 ms/step of pure copies; see
    # sharding.ShardedPositionCodec._encode).
    xd = jax.device_put(jnp.asarray(
        rng.uniform(0, W, (B * 3, nb)).astype(np.float32)),
        codec._in_shardings())
    jax.block_until_ready(xd)

    # Full-array correctness first (also warms both programs): max
    # periodic error across all 100M outputs, reduced on device.
    enc0 = codec.encode(xd)
    out0 = codec.decode(*enc0, seed=4)

    @jax.jit
    def max_err(a, b):
        e = jnp.abs(a - b)
        return jnp.max(jnp.minimum(e, W - e))

    err = float(max_err(out0, xd))
    words_d, hdrs = enc0[0], enc0[1:]
    del enc0, out0

    CHAIN = 16  # dispatches are ~1-100 ms through the tunnel; chaining
    # amortizes the RPC while the salt dependency serializes real work
    # (CHAIN=4 left ~7 ms/iter of dispatch in the number)

    m = jnp.uint32(0x3FFFFF)  # f32 mantissa-only perturbation mask

    # Big device arrays are jit ARGUMENTS, never closures: closed-over
    # arrays are serialized as constants into the remote-compile request
    # (HTTP 413 over ~100 MB).  Chains are Python-unrolled (a fori_loop
    # carrying the 600 MB words / 1.2 GB output forces a per-iteration
    # copy of the carry; measured 134 vs 291 GB/s on the decode chain,
    # exp/decode_chain_variants.py).  The salt_perturb pass itself cannot
    # fuse into the SPMD program's first stage, so these numbers carry
    # +8 B/elem of parasitic traffic -- they UNDERSTATE the codec.
    @jax.jit
    def enc_chain(xin, salt):
        s = salt
        words = None
        for i in range(CHAIN):
            xs = salt_perturb(xin, [(0, s & m),
                                    (1, (s >> jnp.uint32(10)) & m)])
            words, x0b, rng_b = codec._encode(xs)
            s = words[0, 0] ^ jnp.uint32(i)
        return words

    res_e = harness.run(lambda s: enc_chain(xd, s),
                        bytes_per_iter=raw * CHAIN)
    log(f"config4_100M encode: {res_e.gb_per_second:.1f} GB/s")

    codec_r = ShardedPositionCodec(mesh=mesh, width=W, depth=depth,
                                   scale_mode="recip")

    @jax.jit
    def enc_chain_recip(xin, salt):
        s = salt
        words = None
        for i in range(CHAIN):
            xs = salt_perturb(xin, [(0, s & m),
                                    (1, (s >> jnp.uint32(10)) & m)])
            words, x0b, rng_b = codec_r._encode(xs)
            s = words[0, 0] ^ jnp.uint32(i)
        return words

    res_er = harness.run(lambda s: enc_chain_recip(xd, s),
                         bytes_per_iter=raw * CHAIN)
    log(f"config4_100M encode (recip): {res_er.gb_per_second:.1f} GB/s")

    @jax.jit
    def dec_chain(wd, salt):
        s = salt
        out = None
        for i in range(CHAIN):
            w = salt_perturb(wd, [(0, s)])
            out = codec._decode(w, *hdrs, seed_arr, zero_blk)
            s = jax.lax.bitcast_convert_type(out[0, 0], jnp.uint32) ^ \
                jnp.uint32(i)
        return out

    res_d = harness.run(lambda s: dec_chain(words_d, s),
                        bytes_per_iter=raw * CHAIN)
    log(f"config4_100M decode: {res_d.gb_per_second:.1f} GB/s")

    results["config4_100M_single_pass"] = {
        "particles": n, "blocks": B, "depth": depth,
        "encode_GBps": round(res_e.gb_per_second, 2),
        "encode_recip_GBps": round(res_er.gb_per_second, 2),
        "decode_GBps": round(res_d.gb_per_second, 2),
        "max_err_full_array": err,
        "delta_requested": 1e-3,
        "within_delta": bool(err <= 1e-3),
        "note": "salted-chain device phases (see bench/harness.py); "
                "D2H excluded (tunnel-bound, see config4_sharded_blocks "
                "gather time); error checked over the full 100M output "
                "on device"}


def config4():
    from minnow_c_tpu.parallel.sharding import (ShardedPositionCodec,
                                                make_mesh, spmd_depth_for)
    from minnow_c_tpu.ops import entropy

    W = 64.0
    # ~50M particles for the harness variant: the salted-chain harness
    # keeps a 4-output rolling window live (anti-elision), and at 100M
    # that window alone is 4.8 GB -- with encode+decode intermediates it
    # exhausts the 16 GB chip.  The literal 100M single-pass run lives in
    # config4_100m.  nb is 32-aligned so the pack takes the row-folded
    # matmul (the vmapped fallback's batched matmul draws a T(4,128)
    # batch-minor layout: 21x padding, OOM).
    B, nb = 8, 6_249_984
    n = B * nb
    rng = np.random.default_rng(3)
    x = rng.uniform(0, W, (B * 3, nb)).astype(np.float32)  # ROWS
    mesh = make_mesh()
    depth = spmd_depth_for(1e-3, W)
    codec = ShardedPositionCodec(mesh=mesh, width=W, depth=depth)
    xd = jax.device_put(jnp.asarray(x))
    from minnow_c_tpu.bench import harness

    seed_arr = jnp.asarray([4], dtype=jnp.uint32)
    zero_blk = jnp.zeros((1,), jnp.int32)
    CHAIN = 4  # roundtrips per dispatch: today's tunnel dispatch latency
    # can reach tens of ms/call, which starves one-dispatch-per-iter
    # benchmarks; chaining keeps the salt data dependency while
    # amortizing the RPC.

    # The input buffer is a jit ARGUMENT, not a closure: closed-over
    # device arrays are serialized as constants into the remote-compile
    # request, which rejects the 600 MB body with HTTP 413.
    @jax.jit
    def roundtrip(xin, salt):
        # Replay-proof: the input buffer must be UNIQUE every iteration --
        # the runtime replays cached executions for previously-seen
        # buffers and reports numbers above the memory-bandwidth floor
        # (observed 446 and 372 GB/s for a pipeline floored at ~150 GB/s).
        # Spread the full 32-bit salt across two elements' mantissas
        # (22+22 overlapping bits reconstruct all 32), so the buffer space
        # covers every salt value.  Python-unrolled (no 600 MB loop
        # carry; see config4_100m).
        s = salt
        out = None
        for i in range(CHAIN):
            m = jnp.uint32(0x3FFFFF)
            xs = salt_perturb(xin, [(0, s & m),
                                    (1, (s >> jnp.uint32(10)) & m)])
            words, x0b, rng_b = codec._encode(xs)
            out = codec._decode(words, x0b, rng_b, seed_arr, zero_blk)
            s = jax.lax.bitcast_convert_type(out[0, 0], jnp.uint32) ^ \
                jnp.uint32(i)
        return out

    res = harness.run(lambda s: roundtrip(xd, s),
                      bytes_per_iter=n * 12 * CHAIN)
    enc = dec = (n * 12) / res.bytes_per_second / 2  # split evenly
    words, x0b, rng_b = codec.encode(xd)
    out = codec.decode(words, x0b, rng_b, seed=4)
    jax.block_until_ready(out)
    # ordered host gather of compressed streams
    tg0 = time.perf_counter()
    words_h = np.asarray(words)
    tg1 = time.perf_counter()
    words_h = words_h.reshape(B, 3, -1)
    blobs = entropy.encode_blocks(
        [np.ascontiguousarray(words_h[b, i]) for b in range(B)
         for i in range(3)])
    tg2 = time.perf_counter()
    raw = n * 12
    comp = sum(len(b) for b in blobs)
    # error over the FULL output, reduced on device (one scalar fetched;
    # a host-side slice fetch is minutes through the ~25 MB/s tunnel)
    e = jnp.abs(out - xd)
    err = float(jax.jit(lambda e: jnp.max(jnp.minimum(e, W - e)))(e))
    results["config4_sharded_blocks"] = {
        "particles": n, "blocks": B,
        "device_roundtrip_GBps": round(raw / (enc + dec) / 1e9, 2),
        "gather_D2H_s": round(tg1 - tg0, 2),
        "host_lz4_s": round(tg2 - tg1, 2),
        "max_err_full_array": err,
        "within_delta_sample": bool(err <= 1e-3),
        "packed_ratio": round(comp / raw, 4),
        "note": "salted-chain roundtrip (encode+decode); D2H bounded by "
                "~25MB/s tunnel, not chip"}
    log(f"config4: dev roundtrip {raw/(enc+dec)/1e9:.2f} GB/s, "
        f"D2H {tg1-tg0:.1f}s")


def config6_streaming():
    """1B-particle *shape* at reduced scale: stream blocks through the
    device in waves with segments written incrementally -- peak memory
    must stay flat (independent of total snapshot size).  The wall time
    here is dominated by the ~25 MB/s D2H tunnel (compressed words must
    cross to the host to be written); the per-wave device phase is the
    chip-relevant number."""
    import resource

    import minnow_c_tpu as mnw
    from minnow_c_tpu.parallel import snapshot

    W = 64.0
    nb = 4_000_000
    waves = 6  # 24M total; same code path runs at 1B with equal memory
    rng = np.random.default_rng(11)
    spec = snapshot.SnapshotSpec(
        pos=mnw.PositionAccuracy(delta=1e-3, width=W))

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    rss_per_wave = []
    dev_s = []

    def blocks():
        for _ in range(waves):
            pos = rng.uniform(0, W, (3, nb)).astype(np.float32)
            t0 = time.perf_counter()
            yield {"pos": pos}
            dev_s.append(time.perf_counter() - t0)
            rss_per_wave.append(
                resource.getrusage(resource.RUSAGE_SELF).ru_maxrss)

    t0 = time.perf_counter()
    with open("/tmp/minnow_stream_bench.min", "wb") as f:
        stats = snapshot.compress_snapshot_streaming(
            f, blocks(), spec, seed=3, depths={"pos": 17})
    wall = time.perf_counter() - t0
    os.unlink("/tmp/minnow_stream_bench.min")
    # flat-memory proof: RSS growth after the first wave stays under one
    # block's footprint (compiles + allocator warm-up land in wave 1)
    growth_mb = (rss_per_wave[-1] - rss_per_wave[0]) / 1024
    results["config6_streaming"] = {
        "particles": nb * waves, "wave_particles": nb,
        "waves": waves, "bytes": stats["bytes"],
        "wall_s": round(wall, 1),
        "wave_s_after_warm": round(np.median(dev_s[1:]), 2),
        "rss_growth_after_wave1_MB": round(growth_mb, 1),
        "note": "wall time is D2H-tunnel-bound (~25 MB/s); flat RSS "
                "growth demonstrates snapshot-size-independent memory"}
    log(f"config6: {nb*waves/1e6:.0f}M streamed, wall {wall:.0f}s, "
        f"RSS growth {growth_mb:.0f} MB")


def config5():
    r = subprocess.run(
        [sys.executable, "-c",
         "import os;"
         "os.environ['XLA_FLAGS']="
         "'--xla_force_host_platform_device_count=8';"
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import __graft_entry__ as g; g.dryrun_multichip(8);"
         "print('OK')"],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    ok = "OK" in r.stdout
    r2 = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/test_multihost.py", "-q"],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.abspath(__file__)))
    mh_ok = r2.returncode == 0
    results["config5_multichip_dryrun"] = {
        "dryrun_8way_mesh": ok,
        "two_process_spmd": mh_ok,
        "note": "8-way mesh SPMD encode+decode with header all-reduce, "
                "plus a real two-process jax.distributed run (DCN over "
                "localhost); single physical chip available, so ICI "
                "scaling efficiency is untestable in this environment"}
    log(f"config5: dryrun ok={ok} two-process spmd ok={mh_ok}")
    if not ok:
        log(r.stderr[-2000:])


def main():
    import sys as _sys
    selected = set(_sys.argv[1:])
    all_fns = (config1, config2, config3, config4, config4_100m, config5,
               config6_streaming)
    fns = [f for f in all_fns if not selected or f.__name__ in selected]
    # merge-safe: always start from what is on disk so foreign sections
    # (config5_1B from exp/config5_1b.py) survive a full-matrix refresh
    # (the round-4 records-clobbering lesson, bench/records.py)
    from minnow_c_tpu.bench import records
    # records.load tolerates a corrupt/truncated file (a damaged
    # records file must never block a multi-hour bench run)
    results.update(records.load("bench_results.json"))
    for fn in fns:
        try:
            results.pop(fn.__name__, None)  # clear stale error entries
            # (BEFORE the run: config6_streaming's result key equals its
            # function name, and popping after deleted the fresh result
            # -- the round-3 "config6 vanished" bug)
            fn()
        except Exception as e:  # keep the matrix running
            results[fn.__name__] = {"error": repr(e)[:500]}
            log(f"{fn.__name__} FAILED: {e!r}")
    records.update_sections("bench_results.json", results)
    preamble = [
        "# BENCH NOTES (full config matrix)", "",
        "Generated by bench_all.py; headline metric lives in bench.py.", "",
        "## Timing integrity", "",
        "This environment's remote runtime can return from",
        "`jax.block_until_ready` before the computation has actually",
        "executed (observed: an 8192^3 bf16 matmul \"completing\" in",
        "0.5 ms -- an impossible 2200 TFLOP/s on a ~200 TFLOP/s v5e).",
        "Every timing therefore ends with a device-to-host readback of a",
        "value that data-depends on all timed work (`bench/harness.py`",
        "fetches the chained salt; ad-hoc timings use chain-slope: K",
        "chained iterations inside one jit, per-iteration cost from the",
        "K=2 vs K=32 slope).  Numbers recorded before this barrier",
        "existed were inflated -- round 1's 194 GB/s decode headline was",
        "such an artifact (the same kernel honestly measured 9.2 GB/s),",
        "which is what exposed the lane-padding bottleneck that the",
        "round-2 lane-dense kernels fixed.  Round 3 additionally found",
        "that fori_loop salt chains under-report (the loop carry copies",
        "the carried array every iteration and the while-loop adds",
        "per-step overhead): chains are now Python-unrolled inside one",
        "jit (exp/decode_chain_variants.py: 134 -> 291 GB/s for",
        "identical decode work).  Two elision holes that unrolling",
        "opens for pure-XLA bodies are closed in bench_kernels.py:",
        "additive salts are algebraically factorable (XLA hoists",
        "min(x+c)=min(x)+c out of the chain) -> salts inject as a",
        "mantissa-LSB xor; and element-[0] salt derivation lets a",
        "slice-rooted fusion DCE an elementwise chain to one lane ->",
        "next-salts derive from a full reduction.  Pallas custom calls",
        "are opaque and immune to both.  A 100 MB working set also fits",
        "v5e's 128 MB VMEM, so chained XLA-kernel rows can legitimately",
        "exceed the ~819 GB/s HBM rate (see bench_kernels.json meta).",
        "Round 4 additionally found the runtime's SLOW MODE: the first",
        "substantial program(s) of a process run up to ~1000x slow for",
        "30+ s, consistently (an encode chain 'measured' 0.03 GB/s as",
        "its process's first phase and 71 GB/s re-measured after",
        "warm-up).  bench/harness now gates every measurement on a",
        "known-speed matmul canary (_wait_for_fast_mode).  Numbers",
        "recorded before that gate are suspect whenever they were the",
        "first phase of their process.", "",
        "## Round 4: the 100M (config4) gap, closed and accounted", "",
        "Round 3 left config4_100M at 19.8-22.4 GB/s vs the 291 GB/s",
        "100 MB headline, unexplained.  Phase-profiling with unrolled",
        "chains (exp/prof100m_unrolled.py) found the gap was mostly",
        "LAYOUT pathology, not kernel cost:",
        "(a) jax.make_mesh defaults to Explicit axis types, poisoning",
        "direct pallas calls on codec outputs; (b) the (B, 3, n) jit",
        "boundary drew a T(4,128) second-minor-3 padded input copy plus",
        "a {2,0,1} full-output relayout; (c) (B,3n)<->(B*3,n)",
        "row-regrouping reshapes lowered as while-loop layout",
        "conversions through a linear T(1024) staging buffer (~100",
        "ms/step of loop copies at 8x12.5M).  Fix: the SPMD codecs'",
        "device contract is now block-major ROWS (B*3, n) end to end,",
        "and the rows kernels choose their words layout by working-set",
        "size (XLA pre-transpose in the VMEM regime, in-kernel",
        "transpose past it).  config4_100M decode moved 22.4 -> ~45",
        "GB/s, encode 19.8 -> 25.9 (div) / 21.0 -> 31.0 (recip).",
        "The remaining distance to the 100 MB headline is accounted:",
        "the rows decode kernel sustains ~130-190 GB/s of actual HBM",
        "traffic at the 1.2 GB scale (VPU-bound unpack+Threefry+undo",
        "plus salt-chain overhead of +8 B/elem), while the 100 MB",
        "headline runs in the VMEM-resident regime where chained",
        "traffic does not pay full HBM round trips.  Both numbers are",
        "honest; they measure different memory regimes of the same",
        "kernel.  Per-chip decode at the literal BASELINE config is",
        "~45 GB/s = 9x the 5 GB/s target.", "",
        "Current honest kernel numbers (100 MB, VMEM regime): decode",
        "~279-291 GB/s, full fused encode ~165 GB/s (div mode:",
        "kernels.exact_div makes the TPU wire correctly rounded in all",
        "observed cases -- 0 mismatches in 2^24 targeted trials, 2 per",
        "2^27 in an adversarial divisor hunt, none ever observed to",
        "flip a bin; the CPU wire stays authoritative and the",
        "`make tpu-test` digest gate is mandatory before trusting",
        "TPU-encoded bytes) / ~237-309 GB/s (recip scale mode) per",
        "chip.", "",
        "## TPU-tunnel availability", "",
        "The axon TPU tunnel has had multi-hour outages (trivial",
        "programs hang in jax.devices()).  bench.py carries a 2100 s",
        "SIGALRM watchdog: if the chip is unreachable when the driver",
        "runs it, it prints its one JSON line with value 0.0 and an",
        "error field naming the cause instead of hanging.  A recorded",
        "error line means the tunnel was down at collection time, not",
        "that the codec regressed.", "",
        "## On the BASELINE target \"decode bit-exact vs minnow_c\"", "",
        "This target is unmeetable as literally stated: the reference's",
        "decode dither RNG is seeded from `clock()` at call time",
        "(`/root/reference/src/quant.c:639`), so *two consecutive runs of",
        "the reference itself* produce different decode bits.  Bit-exact",
        "parity is therefore asserted at every deterministic boundary",
        "instead, against a compiled build of the reference C",
        "(`tests/ref_oracle.py`): bin indices (the lossy map), bit-packed",
        "streams at all widths 0-32 incl. word straddles, checksums, and",
        "the xoroshiro128+ RNG stream itself (state-for-state).  Our own",
        "decode is made deterministic by a header-carried seed and a",
        "spec'd counter-based dither (Threefry-2x32-13), frozen by",
        "committed encode AND decode digests",
        "(`tests/fixtures/wire_digests.json`).  Statistically, decode",
        "output matches the reference's distribution exactly: same bins,",
        "same uniform-in-bin law.", "",
        "## On the BASELINE target \"compressed size <= C reference\"", "",
        "Interpretation (stated explicitly so no unqualified \"<=\" claim",
        "stands anywhere in these records): the framework's segments are",
        "self-describing (algo/version headers, accuracy metadata, and",
        "per-field checksums -- up to 512 B/segment, bounded and tested",
        "in tests/test_ratio_sweep.py), while the bare reference stream",
        "(test/compress_util_bench.c:234-298) stores no metadata at all.",
        "On *incoherent* (randomly ordered) data the best codec is Trim,",
        "which matches the reference stream to within that fixed header",
        "overhead (ref + ~156 B observed at n = 200k).  *Outright* size",
        "wins -- up to 2.6x smaller than the reference stream -- require",
        "input coherence (sorted/clustered orderings), where the",
        "delta-family codecs (Coil, Diff, Octo) collapse the residual",
        "structure the reference's flat pipeline cannot see.  Both",
        "regimes are recorded per field/order/delta in",
        "doc/ratio_table.md and pinned by tests/test_ratio_sweep.py.", "",
        '## Round 5: the dynamic-offset wall, the chunked kernel, and the',
        '## rows-encode envelope',
        '',
        '**The wall.**  Every spelling of data-dependent data movement in',
        'XLA:TPU caps at ~0.3-25 GB/s on this chip (exp/coil_sort_gather*.py):',
        'element gathers 0.44, vmapped dynamic_slice 0.27, row takes 17-24',
        '(any row size 256 B - 64 KB), contiguous dynamic_slice spans 9.3,',
        "lax.sort-as-unpermute 1.06.  Coil's round-4 decode (1.5 GB/s) was",
        'gather-bound with no gather-shaped fix available.',
        '',
        '**The chunked kernel** (ops/chunked_pallas.py) eliminates the gathers:',
        'one grid step fori-loops over 16384-element chunks, double-buffering',
        'manual DMA at scalar-prefetched offsets, unpacking at per-chunk static',
        'widths (lax.switch), un-zigzagging, prefixing, and carrying the cumsum',
        'across chunks -- one HBM read of packed words, one write of bins.',
        'Recorded device-phase decode (bench_kernels.json [codecs.device_decode],',
        'bit-parity gated on-chip by tpu_smoke):',
        '',
        '    coil (v1.1), bins      65.9 GB/s   (was 1.5; bar >= 25)',
        '    coil (v1.1), floats    29.8 GB/s   (kernel bins + dither/undo tail',
        '                                       -- apples-to-apples with diff)',
        '    sort order-free (v1.2) 69.7 GB/s   (bar >= 5)',
        '    diff (floats)          25.1 GB/s',
        '    sort ranked (v1.2)      0.45 GB/s  -- the order-restoring element',
        '                                       gather IS the wall; the',
        '                                       order-free profile exists to',
        '                                       skip it',
        '',
        '**Rows recip encode: the measured envelope.**  Round 4 left',
        'rows_recip_encode at 90 GB/s vs the 304 single-stream headline, with',
        '"done = >= 200 or a breakdown".  The breakdown, from four structural',
        'variants (exp/rows_encode_hbm.py):',
        '',
        '    100 MB (VMEM regime): pallas-stats split 90.8 | XLA-stats split',
        '    86.1 | fused one-pass kernel 88.9',
        '    400 MB (HBM-bound):   pallas-stats split 66.7 | XLA-stats split',
        '    78.2 | fused one-pass kernel 51.3',
        '',
        'The fused kernel (encode_pallas.encode_recip_fused_blocks: stats +',
        'block range + in-kernel IEEE-exact reciprocal + bin + pack, one HBM',
        'pass, on-chip parity-gated) is a documented NEGATIVE result: the',
        'monolithic block-per-step kernel pipelines worse than the split',
        "kernels' smaller grid steps, and holding or recomputing the unwrap",
        'in-kernel costs more than the saved stats read.  The single-stream',
        "headline's remaining margin is VMEM-chain fusion (its XLA stats+scale",
        'fuse into the measuring chain for free) that no rows-contract pipeline',
        'can use: per-block scalars force a materialized boundary before the',
        'pack kernel.  Production keeps the pallas-stats split (best at the',
        'VMEM scale; within 17% of best at the HBM scale, where it reads cold',
        "data at ~2.2x the XLA stats pass's rate in isolation).",
        '',
        '**Compile budget.**  Chunked streams with > 8 distinct widths use the',
        'native C++ pack/unpack (byte-identical; zero XLA programs) -- the Octo',
        'Morton plane compiled ~20 per-width device programs at 5-30 s remote',
        'compile each (254 s warm encode in the round-4 record).',
        'bench_codecs.py records programs_compiled per codec.  Final HEAD',
        'numbers (persistent cache primed): trim 11-12 s, diff 9-17, cart',
        '19-21, coil 27-35, octo 10-45 (was 254 s in round 4) -- ALL at',
        'programs_compiled = 0; the residue is per-program executable upload',
        'through the remote runtime plus the tunnel-bound first segment.  One',
        "outlier stays: sort v1.2's coherent-input encode warms in ~310 s at",
        'ZERO new programs -- its many cached programs (argsort + two chunked',
        'streams) each pay a several-second executable upload through this',
        'tunnel, a per-process one-time cost specific to the remote runtime.',
        'Floor on this runtime: cold warm-up = new programs x remote-compile',
        'latency (observed up to ~60 s each) + executable loads; steady-state',
        'segments are seconds.',
        '',
        '**End-to-end codec rows** in bench_kernels.json [codecs] measure the',
        'full segment API on this TUNNEL-bound runtime (100 MB crosses a',
        '~25 MB/s link each way), so their GB/s are environment artifacts; the',
        'device_decode section carries the chip-relevant numbers.', "",
        "## Results", "",
    ]
    lines = preamble + ["```json", json.dumps(results, indent=2), "```"]
    with open("BENCH_NOTES.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    log("wrote bench_results.json, BENCH_NOTES.md")


if __name__ == "__main__":
    main()
