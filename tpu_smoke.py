#!/usr/bin/env python
"""On-TPU parity gate: the chip-side analog of the reference's
tests-as-verdict runner (/root/reference/scripts/run_tests.py:55-91).

The pytest suite runs CPU-only (conftest forces the platform), so Mosaic
compilation of the Pallas kernels is never exercised by ``make test``.
Given the documented Mosaic landmines (approximate f32 division, missing
u32<->f32 cast, the 32-way unroll miscompile), a chip-side kernel
regression would otherwise surface only as a silently-wrong bench
number.  This gate runs the bit-level checks ON THE REAL CHIP:

  dither_vector        XLA Threefry-2x32-13 dither == numpy mirror
  decode_parity        decode_pallas == XLA fast path (cascade + ragged
                       tail, periodic + not, boundary-adversarial bins)
  decode_rows_parity   decode_pallas_rows == per-stream decode_pallas
  unpack_rows_parity   unpack_pallas_rows == bitpack.uniform_unpack
  pack_parity          pack_pallas / pack_pallas_rows == XLA fold
  encode_div_parity    fused div encode == XLA (wire-defining math)
  encode_recip_parity  recip kernel == XLA map (single + rows, incl.
                       inputs placed +-1 ulp around bin edges)
  stats_rows_parity    Pallas rows stats == vmapped XLA stats
  digest_trim          frozen Trim v1.0/v1.1 encode AND decode sha256 ==
                       committed fixture (the whole segment path on-chip)

Prints ONE JSON line and writes TPU_SMOKE.json:
  {"metric": "tpu_parity_gate", "value": 1.0|0.0, "unit": "pass",
   "checks": {name: "ok" | "FAIL: ..."}}

Run: ``make tpu-test`` (never concurrently with another TPU process).
"""

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/minnow_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

WATCHDOG_S = 2100
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "TPU_SMOKE.json")

checks = {}


def _emit(ok: bool, error=None):
    rec = {"metric": "tpu_parity_gate", "value": 1.0 if ok else 0.0,
           "unit": "pass", "checks": checks}
    if error:
        rec["error"] = error
    line = json.dumps(rec)
    print(line, flush=True)
    try:
        with open(OUT, "w") as f:
            f.write(line + "\n")
    except OSError:
        pass


def check(name):
    def deco(fn):
        def run():
            try:
                fn()
                checks[name] = "ok"
                print(f"[tpu_smoke] {name}: ok", file=sys.stderr,
                      flush=True)
            except Exception as exc:  # noqa: BLE001 - collect, don't abort
                checks[name] = f"FAIL: {type(exc).__name__}: {exc}"[:300]
                print(f"[tpu_smoke] {name}: FAIL {exc}", file=sys.stderr,
                      flush=True)
        return run
    return deco


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    if jax.default_backend() != "tpu":
        raise RuntimeError(f"not on TPU: backend={jax.default_backend()}")

    from minnow_c_tpu.ops import (bitpack, decode_pallas, encode_pallas,
                                  fastpath)
    from minnow_c_tpu.ops import rng as _rng

    rng = np.random.default_rng(0)
    W = 64.0

    @jax.jit
    def _neq(a, b):
        return jnp.sum((a != b).astype(jnp.int32))

    def neq(a, b):
        return int(_neq(a, b))

    @check("dither_vector")
    def c_dither():
        key = (np.uint32(0xDEADBEEF), np.uint32(0x12345678))
        n = 40003
        dev = np.asarray(jax.jit(
            lambda: _rng.dither_u16(key, n, ctr0=4096))())
        ref = _rng.dither_u16_np(key, n, ctr0=4096)
        assert np.array_equal(dev, ref), \
            f"{(dev != ref).sum()} dither lanes differ"
        fk = np.asarray(_rng.field_key_arr(777, 3, 1))
        fk_ref = np.asarray(_rng.field_key(777, 3, 1), dtype=np.uint32)
        assert np.array_equal(fk, fk_ref), "field_key mismatch"

    # boundary-adversarial bins: all-zero, all-max, random
    def adversarial_bins(n, width):
        top = (1 << width) - 1
        b = rng.integers(0, top + 1, n, dtype=np.int64)
        b[: n // 8] = 0
        b[n // 8: n // 4] = top
        return b.astype(np.uint32)

    @check("decode_parity")
    def c_decode():
        n = (1 << 16) * 3 + (1 << 14) + 1009   # cascade + ragged tail
        for width in (11, 16, 24):
            bins = adversarial_bins(n, width)
            words = jnp.asarray(bitpack.uniform_pack(jnp.asarray(bins),
                                                     width))
            key = _rng.field_key_arr(42, 0, 0)
            for periodic in (True, False):
                got = decode_pallas.decode_pallas(
                    words, key, width, n, 0.0, W, W, periodic=periodic)
                want = fastpath.fast_uniform_decode(
                    words, key, width, n, 0.0, W,
                    periodic_width=(W if periodic else None))
                bad = neq(jax.lax.bitcast_convert_type(got, jnp.uint32),
                          jax.lax.bitcast_convert_type(want, jnp.uint32))
                assert bad == 0, \
                    f"width={width} periodic={periodic}: {bad} values"

    @check("decode_rows_parity")
    def c_decode_rows():
        rows, n, width = 24, 1 << 16, 16
        words = jnp.asarray(np.stack([
            np.asarray(bitpack.uniform_pack(
                jnp.asarray(adversarial_bins(n, width)), width))
            for _ in range(rows)]))
        keys = jnp.asarray(
            rng.integers(0, 1 << 32, (rows, 2), dtype=np.int64)
            .astype(np.uint32))
        x0 = jnp.asarray(rng.uniform(0, 4, rows).astype(np.float32))
        dx = jnp.asarray(rng.uniform(40, 60, rows).astype(np.float32))
        got = decode_pallas.decode_pallas_rows(
            words, keys, width, n, x0, dx, box=W, periodic=True)
        bad = 0
        for r in range(rows):
            want = decode_pallas.decode_pallas(
                words[r], keys[r], width, n, x0[r], dx[r], W,
                periodic=True)
            bad += neq(jax.lax.bitcast_convert_type(got[r], jnp.uint32),
                       jax.lax.bitcast_convert_type(want, jnp.uint32))
        assert bad == 0, f"{bad} values"

    @check("unpack_rows_parity")
    def c_unpack_rows():
        rows, n = 6, 1 << 15
        for width in (1, 9, 21, 32):
            bins = np.stack([adversarial_bins(n, min(width, 31))
                             for _ in range(rows)])
            words = jnp.asarray(np.stack([
                np.asarray(bitpack.uniform_pack(jnp.asarray(bins[r]),
                                                width))
                for r in range(rows)]))
            got = decode_pallas.unpack_pallas_rows(words, width, n)
            for r in range(rows):
                want = bitpack.uniform_unpack(words[r], width, n)
                assert neq(got[r], want) == 0, f"width={width} row={r}"

    @check("pack_parity")
    def c_pack():
        n = (1 << 16) + (1 << 14) + 1001
        for width in (7, 16, 24):
            bins = jnp.asarray(adversarial_bins(n, width))
            got = encode_pallas.pack_pallas(bins, width, n)
            want = bitpack.uniform_pack(bins, width)
            assert neq(got, want) == 0, f"width={width}"
        rows, nr = 9, 1 << 15
        binsr = jnp.asarray(np.stack(
            [adversarial_bins(nr, 13) for _ in range(rows)]))
        gotr = encode_pallas.pack_pallas_rows(binsr, 13)
        wantr = jnp.stack([bitpack.uniform_pack(binsr[r], 13)
                           for r in range(rows)])
        assert neq(gotr, wantr) == 0

    def edge_values(n, width, x0, rngv):
        """Values placed +-1 ulp around bin edges (f64 edge, cast f32)."""
        k = rng.integers(0, 1 << width, n)
        edge = (x0 + (k / (1 << width)) * rngv).astype(np.float64)
        x = edge.astype(np.float32)
        bump = np.where(rng.random(n) < 0.5, 1, -1).astype(np.int32)
        return np.where(
            rng.random(n) < 0.5, x,
            np.nextafter(x, np.float32(np.where(bump > 0, np.inf,
                                                -np.inf)),
                         dtype=np.float32)).astype(np.float32)

    @check("encode_div_parity")
    def c_encode_div():
        n = (1 << 16) + 1001
        x = jnp.asarray(np.concatenate([
            rng.uniform(0, W, n // 2).astype(np.float32),
            edge_values(n - n // 2, 14, 0.0, W)]))
        for periodic in (True, False):
            box = W if periodic else None
            got = encode_pallas.encode_pallas(x, 14, periodic_width=box)
            want = fastpath._fast_uniform_encode_xla(
                x, 14, jnp.float32(W if periodic else 0.0), periodic)
            assert neq(got[0], want[0]) == 0, f"periodic={periodic}"
            assert float(got[1]) == float(want[1])
            assert float(got[2]) == float(want[2])

    @check("encode_recip_parity")
    def c_encode_recip():
        n = (1 << 16) + 1001
        x = jnp.asarray(np.concatenate([
            rng.uniform(0, W, n // 2).astype(np.float32),
            edge_values(n - n // 2, 14, 0.0, W)]))
        for periodic in (True, False):
            box = W if periodic else None
            got = fastpath.fast_uniform_encode(x, 14, periodic_width=box,
                                               scale_mode="recip")
            want = fastpath._fast_uniform_encode_recip_xla(
                x, 14, jnp.float32(W if periodic else 0.0), periodic)
            assert neq(got[0], want[0]) == 0, f"periodic={periodic}"
        rows, nb = 12, 1 << 15
        xr = jnp.asarray(np.stack(
            [edge_values(nb, 11, 2.0, 50.0) for _ in range(rows)]))
        x0 = jnp.asarray(rng.uniform(0, 4, rows).astype(np.float32))
        rngv = jnp.asarray(rng.uniform(40, 60, rows).astype(np.float32))
        recip = jnp.float32(1.0) / rngv
        anchors = xr[:, 0]
        boxes = jnp.full((rows,), np.float32(W))
        wk = encode_pallas.encode_pallas_recip_rows(
            xr, x0, recip, boxes, anchors, 11, True)
        for r in range(rows):
            bins = encode_pallas._recip_bins_xla(
                xr[r], x0[r], recip[r], jnp.float32(W), anchors[r], 11,
                True)
            wx = bitpack.uniform_pack(bins, 11)
            assert neq(wk[r], wx) == 0, f"row {r}"

    @check("stats_rows_parity")
    def c_stats():
        from minnow_c_tpu.parallel.sharding import _float_rows_stats
        xs = jnp.asarray(
            rng.uniform(0, W, (16, 3, (1 << 15) + 1009))
            .astype(np.float32))
        for box in (W, None):
            x0p, rp = _float_rows_stats(xs, box, True, False)
            x0x, rx = _float_rows_stats(xs, box, False, False)
            assert neq(x0p, x0x) == 0 and neq(rp, rx) == 0, \
                f"periodic={box is not None}"

    @check("division_rounding")
    def c_division():
        from minnow_c_tpu.ops import kernels
        n = 1 << 22
        xs = rng.uniform(0, 64, n).astype(np.float32)
        total_bad = 0
        raw_bad = 0
        for dv in (63.99731, 3.14159, 7.77e-7, 1.23456e8):
            d = np.float32(dv)
            ref = (xs / d).astype(np.float32)
            got = np.asarray(jax.jit(kernels.exact_div)(
                jnp.asarray(xs), jnp.float32(d)))
            total_bad += int(((ref != got) & np.isfinite(ref)).sum())
            raw = np.asarray(jax.jit(lambda a, b: a / b)(
                jnp.asarray(xs), jnp.float32(d)))
            raw_bad += int(((ref != raw) & np.isfinite(ref)).sum())
        assert total_bad == 0, \
            f"exact_div: {total_bad} quotients differ from IEEE " \
            f"(raw XLA division: {raw_bad} differ -- expected ~73%)"

    @check("digest_trim")
    def c_digest():
        """Encode digests must equal the committed (CPU-generated)
        fixtures bit-for-bit -- kernels.exact_div makes the TPU div-mode
        wire identical to the C-exact CPU wire.

        Decode is checked against the NORMATIVE strict per-op f32 oracle
        (the numpy dither mirror + undo formula): TPU XLA and Mosaic
        round each op separately and match it exactly.  The committed
        decode digests are NOT used here: XLA:CPU contracts
        ``x0 + dx*t`` into an FMA (not disableable -- barriers, double
        bitcasts, and --xla_allow_excess_precision=false all measured
        ineffective, round 4), so the CPU digests pin that backend's
        1-ulp-on-~3%-of-elements artifact for CPU regression only."""
        import hashlib
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tests"))
        import test_freeze as tf
        from minnow_c_tpu.ops import rng as rng_mod
        from minnow_c_tpu.segment import api
        from minnow_c_tpu.types import FieldCode
        with open(tf.FIXTURE) as f:
            want = json.load(f)
        for name in ("trim", "trim_v1_1"):
            algo, ver = tf.ALGOS[name]
            blob = api.compress_segment(tf.reference_segment(algo, ver),
                                        seed=777)
            enc = hashlib.sha256(blob).hexdigest()
            assert enc == want[f"{name}_encode_sha256"], \
                f"{name} encode digest"
            # normative strict-rounding decode oracle (numpy)
            qs = api.decompress(api.wire_to_cseg(blob))
            seg = api.decompress_segment(blob)
            for fi, (qf, fld) in enumerate(zip(qs.fields, seg.fields)):
                got = np.asarray(fld.data)
                code = qf.hd.field_code
                if code in (int(FieldCode.PTID), int(FieldCode.UNSI)):
                    ref = np.asarray(fld.data)  # int fields: exact by
                    continue                    # construction; skip
                q = qf.quant
                if code == int(FieldCode.UNSF):
                    bins = np.asarray(qf.data).reshape(-1)
                    key = rng_mod.field_key(q.seed, fi, 0)
                    u = rng_mod.uniform24_np(key, bins.shape)
                    dx = np.float32((np.float32(q.x1) - np.float32(q.x0))
                                    / np.float32(1 << q.depth))
                    ref = np.float32(q.x0) + dx * (
                        bins.astype(np.float32) + u)
                else:
                    x0a = np.asarray(q.x0, np.float32)
                    x1a = np.asarray(q.x1, np.float32)
                    md = np.float32(np.max(x1a - x0a))
                    bins = np.asarray(qf.data).reshape(3, -1)
                    dims = []
                    for d in range(3):
                        key = rng_mod.field_key(q.seed, fi, d)
                        u = rng_mod.uniform24_np(key, bins[d].shape)
                        x1e = np.float32(x0a[d] + md)
                        dx = np.float32((x1e - x0a[d])
                                        / np.float32(1 << q.depth))
                        y = x0a[d] + dx * (bins[d].astype(np.float32) + u)
                        if code == int(FieldCode.POSN):
                            W_ = np.float32(q.width)
                            y = np.where(y >= W_, y - W_, y)
                            y = np.where(y < 0, y + W_, y)
                        dims.append(np.float32(y))
                    ref = np.stack(dims)
                bad = int((got.astype(np.float32).view(np.uint32) !=
                           np.float32(ref).view(np.uint32)).sum())
                assert bad == 0, \
                    f"{name} field {fi} ({code:#x}): {bad} values off " \
                    "the strict-rounding oracle"

    @check("chunked_delta_parity")
    def c_chunked():
        """ops/chunked_pallas.chunked_delta_bins (the Coil v1.1 fused
        decode) == host math, bit for bit, incl. mixed widths and a
        zero-width chunk."""
        from minnow_c_tpu.algos.algo_coil_v1_1 import _cmajor_blob
        from minnow_c_tpu.algos import chunked
        from minnow_c_tpu.ops import chunked_pallas, kernels
        CH = chunked_pallas.KERNEL_OK_CHUNK
        n = 3 * CH + 1009
        walk = np.cumsum(rng.integers(-40, 41, n), dtype=np.int64)
        bins = ((walk - walk.min()) % (1 << 14)).astype(np.uint32)
        bins[:CH // 2] = bins[0]  # a constant run (narrow/zero widths)
        zz = np.asarray(kernels.u32_delta_zigzag(jnp.asarray(bins))).copy()
        zz[0] = 0
        zc, widths = chunked.chunk_widths(zz, CH)
        body = np.frombuffer(
            _cmajor_blob(chunked.pack_chunks(zc, widths), widths, CH),
            dtype=np.uint32)
        got = np.asarray(chunked_pallas.decode_chunked_stream(
            body, widths, int(bins[0]), CH, n))
        assert np.array_equal(got, bins), \
            f"{(got != bins).sum()} of {n} bins differ"

    @check("encode_recip_fused_parity")
    def c_fused_encode():
        """encode_recip_fused_blocks (one-pass stats+recip+bin+pack) ==
        the split pipeline on-chip -- gates the in-kernel exact
        reciprocal (approx seed + Newton corrections) against XLA's
        rn(1/range), including adversarial ranges."""
        from minnow_c_tpu.parallel.sharding import (_rows_encode_recip_raw,
                                                    _rows_stats_raw)
        B, D, nb = 4, 3, 8192
        x = rng.uniform(0, W, (B, D, nb)).astype(np.float32)
        # adversarial block: tiny range (subnormal-adjacent recip) and
        # near-power-of-two range
        x[1] = 5.0 + rng.uniform(0, 1e-5, (D, nb)).astype(np.float32)
        x[2] = rng.uniform(0, 2.0, (D, nb)).astype(np.float32)
        xd = jnp.asarray(x)
        for depth in (11, 14, 24):
            w1, mn1, mx1 = encode_pallas.encode_recip_fused_blocks(
                xd, jnp.float32(W), xd[:, :, 0], depth, True)
            rows = xd.reshape(B * D, nb)
            mn2, mx2 = _rows_stats_raw(rows, W, True, False)
            rng_r = jnp.repeat(
                jnp.max((mx2 - mn2).reshape(B, D), axis=1), D)
            w2 = _rows_encode_recip_raw(rows, mn2, rng_r, depth, W,
                                        True, False)
            assert neq(w1.reshape(B * D, -1), w2) == 0, \
                f"depth {depth}: fused encode words differ from split"
            assert neq(mn1.reshape(-1), mn2) == 0, "mn mismatch"
            assert neq(mx1.reshape(-1), mx2) == 0, "mx mismatch"

    @check("chunked_floats_parity")
    def c_chunked_floats():
        """floats mode of the chunked kernel (one-pass unpack + cumsum
        + dither + undo + rewrap) == kernel bins + the XLA undo tail,
        bit for bit, on-chip."""
        from minnow_c_tpu.algos.algo_coil_v1_1 import _coil11_undo_tail
        from minnow_c_tpu.algos import chunked
        from minnow_c_tpu.algos.algo_coil_v1_1 import _cmajor_blob
        from minnow_c_tpu.ops import chunked_pallas, kernels
        from minnow_c_tpu.ops import rng as rng_mod
        CH = chunked_pallas.KERNEL_OK_CHUNK
        n = 2 * CH + 513
        depth = 14
        walk = np.cumsum(rng.integers(-40, 41, n), dtype=np.int64)
        bins = ((walk - walk.min()) % (1 << depth)).astype(np.uint32)
        zz = np.asarray(kernels.u32_delta_zigzag(jnp.asarray(bins))).copy()
        zz[0] = 0
        zc, widths = chunked.chunk_widths(zz, CH)
        body = np.frombuffer(
            _cmajor_blob(chunked.pack_chunks(zc, widths), widths, CH),
            dtype=np.uint32)
        key = rng_mod.field_key_arr(99, 1, 2)
        for periodic in (True, False):
            got = np.asarray(chunked_pallas.decode_chunked_stream_floats(
                body, widths, int(bins[0]), CH, n, np.asarray(key),
                depth, 0.25, 63.0, W, periodic))
            ref_bins = chunked_pallas.decode_chunked_stream(
                body, widths, int(bins[0]), CH, n)
            ref = np.asarray(_coil11_undo_tail(
                jnp.asarray(ref_bins), jnp.asarray(key), n, depth, 0.25,
                63.0, jnp.float32(W), periodic))
            assert np.array_equal(got.view(np.uint32),
                                  ref.view(np.uint32)), \
                f"periodic={periodic}: " \
                f"{(got.view(np.uint32) != ref.view(np.uint32)).sum()} off"

    for fn in (c_dither, c_decode, c_decode_rows, c_unpack_rows, c_pack,
               c_encode_div, c_encode_recip, c_stats, c_division,
               c_chunked, c_fused_encode, c_chunked_floats, c_digest):
        fn()

    ok = all(v == "ok" for v in checks.values())
    _emit(ok)
    return 0 if ok else 1


if __name__ == "__main__":
    import signal

    def _on_alarm(signum, frame):
        _emit(False, error="watchdog: no result within %ds (TPU tunnel "
                           "down or compile stuck)" % WATCHDOG_S)
        os._exit(3)

    signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(WATCHDOG_S)
    try:
        rc = main()
        signal.alarm(0)
        sys.stdout.flush()
        os._exit(rc)
    except Exception as exc:  # noqa: BLE001
        signal.alarm(0)
        _emit(False, error="%s: %s" % (type(exc).__name__, exc))
        sys.stdout.flush()
        os._exit(2)
