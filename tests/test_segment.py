"""L3/L4 tests: registry semantics, end-to-end segment round-trips over the
spec wire format and the v0 funcs.c format, graceful degradation under
corruption, and multi-segment file I/O."""

import io as _io

import numpy as np
import pytest

import minnow_c_tpu as mnw
from minnow_c_tpu import semver
from minnow_c_tpu.algos import registry
from minnow_c_tpu.segment import api, io as seg_io


def make_seg(n=20000, seed=0, W=64.0):
    rng = np.random.default_rng(seed)
    ver = registry.newest(mnw.AlgoCode.TRIM)
    pos = rng.uniform(0, W, (3, n)).astype(np.float32)
    vel = rng.normal(0, 200, (3, n)).astype(np.float32)
    ids = rng.permutation(1024 * 1024 * 8)[:n].astype(np.uint64)

    def hd(code):
        return mnw.FieldHeader(code, mnw.AlgoCode.TRIM, ver, n)

    return mnw.Seg(fields=[
        mnw.Field(hd=hd(mnw.FieldCode.POSN), data=pos,
                  acc=mnw.PositionAccuracy(delta=1e-3, width=W)),
        mnw.Field(hd=hd(mnw.FieldCode.VELC), data=vel,
                  acc=mnw.VelocityAccuracy(delta=1.0)),
        mnw.Field(hd=hd(mnw.FieldCode.PTID), data=ids,
                  acc=mnw.IDAccuracy(width=1024)),
    ]), pos, vel, ids


class TestRegistry:
    def test_newest_and_get(self):
        v = registry.newest(mnw.AlgoCode.TRIM)
        assert semver.major(v) == 1 and semver.minor(v) == 1  # Trim v1.1
        codec = registry.get(mnw.AlgoCode.TRIM, v)
        assert codec.algo_code == mnw.AlgoCode.TRIM

    def test_patch_insensitive_lookup(self):
        # a stream stamped 1.0.7 resolves to the registered 1.0.x
        v = semver.pack(1, 0, 7)
        assert registry.supports(mnw.AlgoCode.TRIM, v)
        registry.get(mnw.AlgoCode.TRIM, v)

    def test_unknown_version_raises(self):
        assert not registry.supports(mnw.AlgoCode.TRIM, semver.pack(9, 9, 9))
        with pytest.raises(KeyError):
            registry.get(mnw.AlgoCode.TRIM, semver.pack(9, 9, 9))

    def test_unknown_algo_raises(self):
        with pytest.raises(KeyError):
            registry.newest(0xDEADBEEF)


class TestSegmentRoundTrip:
    def test_spec_format(self):
        seg, pos, vel, ids = make_seg()
        W = 64.0
        data = api.compress_segment(seg, seed=42)
        # Compresses: 3 fields x 20k particles
        raw = pos.nbytes + vel.nbytes + ids.nbytes
        assert len(data) < raw
        out = api.decompress_segment(data)
        p2 = np.asarray(out.fields[0].data)
        err = np.abs(p2 - pos)
        err = np.minimum(err, W - err)
        assert err.max() <= 1e-3
        assert np.abs(np.asarray(out.fields[1].data) - vel).max() <= 1.0
        np.testing.assert_array_equal(np.asarray(out.fields[2].data), ids)

    def test_decode_deterministic(self):
        seg, *_ = make_seg(n=5000)
        data = api.compress_segment(seg, seed=7)
        a = api.decompress_segment(data)
        b = api.decompress_segment(data)
        for fa, fb in zip(a.fields, b.fields):
            np.testing.assert_array_equal(np.asarray(fa.data),
                                          np.asarray(fb.data))

    def test_v0_bytes_format(self):
        # funcs.c pipeline parity: Quantize -> Compress -> ToBytes ->
        # FromBytes -> Decompress -> UndoQuantize (funcs.c:268-301).
        seg, pos, vel, ids = make_seg(n=3000)
        qs = api.quantize(seg, seed=3)
        cs = api.compress(qs)
        blob = api.to_bytes(cs)
        cs2 = api.from_bytes(blob)
        qs2 = api.decompress(cs2)
        out = api.undo_quantize(qs2)
        np.testing.assert_array_equal(np.asarray(out.fields[2].data), ids)
        err = np.abs(np.asarray(out.fields[0].data) - pos)
        err = np.minimum(err, 64.0 - err)
        assert err.max() <= 1e-3

    def test_mismatched_particle_len_raises(self):
        seg, *_ = make_seg(n=100)
        seg.fields[1].hd = mnw.FieldHeader(
            seg.fields[1].hd.field_code, seg.fields[1].hd.algo_code,
            seg.fields[1].hd.algo_version, 99)
        with pytest.raises(ValueError):
            api.compress_segment(seg)


class TestCorruption:
    def _flip(self, data: bytes, offset: int) -> bytes:
        b = bytearray(data)
        b[offset] ^= 0xFF
        return bytes(b)

    def test_corrupt_block_localizes_damage(self):
        seg, pos, vel, ids = make_seg(n=4000)
        data = api.compress_segment(seg, seed=1)
        # Flip a byte deep in the blocks region (positions' dim data).
        # Headers: 16 + 3*16 = 64, block table follows; blocks start after.
        corrupted = self._flip(data, len(data) // 2)
        out = api.decompress_segment(corrupted)
        # At least the ID field or some fields still decode; damaged field
        # is flagged invalid rather than raising.
        assert any(f.valid for f in out.fields)
        assert any(not f.valid for f in out.fields)

    def test_corrupt_dim_block_gives_nan_plane(self):
        seg, pos, vel, ids = make_seg(n=4000)
        data = api.compress_segment(seg, seed=1)
        from minnow_c_tpu.segment import format as wire
        parsed = wire.deserialize(data)
        # Corrupt exactly the Y-dim block of the position field (block 2 of
        # field 0), then re-serialize with a *stale* checksum by flipping a
        # byte inside that block region in the original bytes.
        # Find its offset: headers + block table + block 0 (meta) + block 1.
        f0 = parsed.fields[0]
        hdr = 16 + 16 * len(parsed.fields) + 8 * sum(
            len(f.blocks) for f in parsed.fields)
        off = hdr + len(f0.blocks[0]) + len(f0.blocks[1]) + 24
        corrupted = self._flip(data, off)
        out = api.decompress_segment(corrupted)
        posf = out.fields[0]
        assert not posf.valid
        arr = np.asarray(posf.data)
        assert np.isnan(arr[1]).all()  # damaged dim -> NaN plane
        assert not np.isnan(arr[0]).any()  # other dims decode
        assert not np.isnan(arr[2]).any()
        # other fields untouched
        np.testing.assert_array_equal(np.asarray(out.fields[2].data), ids)

    def test_corrupt_header_raises(self):
        seg, *_ = make_seg(n=500)
        data = api.compress_segment(seg)
        with pytest.raises(ValueError):
            api.decompress_segment(self._flip(data, 8))


class TestFileIO:
    def test_multi_segment_chain(self):
        segs = []
        originals = []
        for i in range(3):
            seg, pos, vel, ids = make_seg(n=1000 + 100 * i, seed=i)
            segs.append(api.compress_segment(seg, seed=i))
            originals.append(ids)
        buf = _io.BytesIO()
        geometry = [((0.0, 0.0, float(i)), (64.0, 64.0, 64.0))
                    for i in range(3)]
        seg_io.write_segments(buf, segs, geometry)
        buf.seek(0)
        got = list(seg_io.iter_segments(buf))
        assert len(got) == 3
        for i, (hd, seg_bytes) in enumerate(got):
            assert hd.origin[2] == float(i)
            out = api.decompress_segment(seg_bytes)
            np.testing.assert_array_equal(np.asarray(out.fields[2].data),
                                          originals[i])

    def test_skip_ahead_headers(self):
        segs = [api.compress_segment(make_seg(n=500, seed=i)[0])
                for i in range(4)]
        buf = _io.BytesIO()
        seg_io.write_segments(buf, segs)
        buf.seek(0)
        hds = list(seg_io.iter_headers(buf))
        assert len(hds) == 4
        assert all(h.segment_bytes == len(s) for h, s in zip(hds, segs))

    def test_bad_magic(self):
        buf = _io.BytesIO(b"\x00" * 48)
        with pytest.raises(ValueError):
            list(seg_io.iter_segments(buf))


class TestMultiVersionDispatch:
    """Two frozen versions of one algorithm coexist; streams decode with
    the version they were written with (header_format.tex:239-283)."""

    def test_newest_prefers_v1(self):
        from minnow_c_tpu import semver as sv
        v = registry.newest(mnw.AlgoCode.TEST)
        assert sv.major(v) == 1 and sv.minor(v) == 0

    def test_old_version_stream_decodes_with_old_module(self):
        from minnow_c_tpu import semver as sv
        n, W = 2000, 16.0
        rng = np.random.default_rng(0)
        pos = rng.uniform(0, W, (3, n)).astype(np.float32)

        def seg_at(version):
            return mnw.Seg(fields=[mnw.Field(
                hd=mnw.FieldHeader(mnw.FieldCode.POSN, mnw.AlgoCode.TEST,
                                   version, n),
                data=pos, acc=mnw.PositionAccuracy(delta=1e-3, width=W))])

        v09 = sv.pack(0, 9, 0, sv.DEV)
        v10 = sv.pack(1, 0, 0)
        blob09 = api.compress_segment(seg_at(v09), seed=1)
        blob10 = api.compress_segment(seg_at(v10), seed=1)
        # v0.9 stores unpacked words -> strictly bigger stream
        assert len(blob09) > len(blob10)
        for blob in (blob09, blob10):
            out = api.decompress_segment(blob)
            err = np.abs(np.asarray(out.fields[0].data) - pos)
            err = np.minimum(err, W - err)
            assert err.max() <= 1e-3

    def test_patch_resolves_to_registered_minor(self):
        from minnow_c_tpu import semver as sv
        assert registry.supports(mnw.AlgoCode.TEST, sv.pack(0, 9, 7))
        assert registry.supports(mnw.AlgoCode.TEST, sv.pack(1, 0, 3))
        assert not registry.supports(mnw.AlgoCode.TEST, sv.pack(2, 0, 0))


class TestFusedDecode:
    def test_fused_bits_match_generic(self):
        """fused=True must produce byte-identical decode output for
        eligible fields and fall back for the rest."""
        seg, pos, vel, ids = make_seg(n=33000)
        blob = api.compress_segment(seg, seed=21)
        a = api.decompress_segment(blob)
        b = api.decompress_segment(blob, fused=True)
        for fa, fb in zip(a.fields, b.fields):
            np.testing.assert_array_equal(np.asarray(fa.data),
                                          np.asarray(fb.data))

    def test_fused_falls_back_for_other_codecs(self):
        n, W = 2000, 16.0
        rng = np.random.default_rng(1)
        pos = rng.uniform(0, W, (3, n)).astype(np.float32)
        ver = registry.newest(mnw.AlgoCode.COIL)
        seg = mnw.Seg(fields=[mnw.Field(
            hd=mnw.FieldHeader(mnw.FieldCode.POSN, mnw.AlgoCode.COIL, ver,
                               n),
            data=pos, acc=mnw.PositionAccuracy(delta=1e-3, width=W))])
        blob = api.compress_segment(seg, seed=2)
        a = api.decompress_segment(blob)
        b = api.decompress_segment(blob, fused=True)
        np.testing.assert_array_equal(np.asarray(a.fields[0].data),
                                      np.asarray(b.fields[0].data))

    def test_fused_scaled_fields_match_generic(self):
        """symlog velocities and log10/symlog Unsf decode on the fast
        path, bit-identical to the generic path (no silent fallback for
        writer-producible streams)."""
        n, W = 33000, 64.0
        rng = np.random.default_rng(17)
        vel = rng.normal(0, 300, (3, n)).astype(np.float32)
        uf_log = rng.uniform(1e-3, 1e4, n).astype(np.float32)
        uf_sym = rng.normal(0, 50, n).astype(np.float32)
        ver = registry.newest(mnw.AlgoCode.TRIM)

        def hd(code):
            return mnw.FieldHeader(code, mnw.AlgoCode.TRIM, ver, n)

        seg = mnw.Seg(fields=[
            mnw.Field(hd=hd(mnw.FieldCode.VELC), data=vel,
                      acc=mnw.VelocityAccuracy(
                          delta=0.05, sym_log10_scaled=2,
                          sym_log10_threshold=10.0)),
            mnw.Field(hd=hd(mnw.FieldCode.UNSF), data=uf_log,
                      acc=mnw.FloatAccuracy(delta=1e-3, log10_scaled=1)),
            mnw.Field(hd=hd(mnw.FieldCode.UNSF), data=uf_sym,
                      acc=mnw.FloatAccuracy(delta=1e-3, log10_scaled=2,
                                            sym_log10_threshold=5.0)),
        ])
        blob = api.compress_segment(seg, seed=41)
        a = api.decompress_segment(blob)
        b = api.decompress_segment(blob, fused=True)
        for fa, fb in zip(a.fields, b.fields):
            np.testing.assert_array_equal(np.asarray(fa.data),
                                          np.asarray(fb.data))

    def test_fused_per_particle_depths_match_generic(self):
        """Deltas mode (per-particle accuracy) decodes through the fused
        var path for both Trim v1.0 (exact bitstream) and v1.1 (chunked),
        bit-identical to generic."""
        from minnow_c_tpu import semver as sv
        n, W = 21000, 64.0
        rng = np.random.default_rng(23)
        pos = rng.uniform(0, W, (3, n)).astype(np.float32)
        uf = rng.uniform(1, 9, n).astype(np.float32)
        deltas = rng.choice(
            np.array([1e-1, 1e-2, 1e-3], dtype=np.float32), n)
        for ver in (sv.pack(1, 0, 0), sv.pack(1, 1, 0)):
            def hd(code):
                return mnw.FieldHeader(code, mnw.AlgoCode.TRIM, ver, n)

            seg = mnw.Seg(fields=[
                mnw.Field(hd=hd(mnw.FieldCode.POSN), data=pos,
                          acc=mnw.PositionAccuracy(
                              delta=0.0, width=W, deltas=deltas)),
                mnw.Field(hd=hd(mnw.FieldCode.UNSF), data=uf,
                          acc=mnw.FloatAccuracy(delta=0.0,
                                                deltas=deltas)),
            ])
            blob = api.compress_segment(seg, seed=47)
            a = api.decompress_segment(blob)
            b = api.decompress_segment(blob, fused=True)
            for fa, fb in zip(a.fields, b.fields):
                np.testing.assert_array_equal(np.asarray(fa.data),
                                              np.asarray(fb.data))

    def test_fused_mixed_fallback_keeps_field_indices(self):
        """A segment where some fields decode fused and others fall back:
        the fallback fields' dither keys must use their true segment
        positions, so fused=True stays bit-identical to fused=False."""
        n, W = 2048, 64.0
        rng = np.random.default_rng(29)
        pos = rng.uniform(0, W, (3, n)).astype(np.float32)
        uf = rng.uniform(1, 2, n).astype(np.float32)
        deltas = np.full(n, 1e-2, dtype=np.float32)
        ver = registry.newest(mnw.AlgoCode.TRIM)

        def hd(code):
            return mnw.FieldHeader(code, mnw.AlgoCode.TRIM, ver, n)

        # field 0 eligible (uniform pos), field 1 tiny n uniform float
        # (n >= 32 so eligible), field 2 per-particle depths -- exercise
        # several paths in one segment with distinct field indices.
        seg = mnw.Seg(fields=[
            mnw.Field(hd=hd(mnw.FieldCode.POSN), data=pos,
                      acc=mnw.PositionAccuracy(delta=1e-3, width=W)),
            mnw.Field(hd=hd(mnw.FieldCode.UNSF), data=uf,
                      acc=mnw.FloatAccuracy(delta=1e-4)),
            mnw.Field(hd=hd(mnw.FieldCode.UNSF), data=uf,
                      acc=mnw.FloatAccuracy(delta=0.0, deltas=deltas)),
        ])
        blob = api.compress_segment(seg, seed=53)
        a = api.decompress_segment(blob)
        b = api.decompress_segment(blob, fused=True)
        for fa, fb in zip(a.fields, b.fields):
            np.testing.assert_array_equal(np.asarray(fa.data),
                                          np.asarray(fb.data))

    def test_fused_diff_bits_match_generic(self):
        n, W = 33000, 64.0
        rng = np.random.default_rng(8)
        steps = rng.normal(0, 0.02, (3, n)).astype(np.float32)
        pos = (np.cumsum(steps, axis=1) + W / 2).astype(np.float32) % W
        vel = rng.normal(0, 150, (3, n)).astype(np.float32)
        uf = rng.uniform(1, 2, n).astype(np.float32)
        ver = registry.newest(mnw.AlgoCode.DIFF)

        def hd(code):
            return mnw.FieldHeader(code, mnw.AlgoCode.DIFF, ver, n)

        seg = mnw.Seg(fields=[
            mnw.Field(hd=hd(mnw.FieldCode.POSN), data=pos,
                      acc=mnw.PositionAccuracy(delta=1e-3, width=W)),
            mnw.Field(hd=hd(mnw.FieldCode.VELC), data=vel,
                      acc=mnw.VelocityAccuracy(delta=0.5)),
            mnw.Field(hd=hd(mnw.FieldCode.UNSF), data=uf,
                      acc=mnw.FloatAccuracy(delta=1e-4)),
        ])
        blob = api.compress_segment(seg, seed=31)
        a = api.decompress_segment(blob)
        b = api.decompress_segment(blob, fused=True)
        for fa, fb in zip(a.fields, b.fields):
            np.testing.assert_array_equal(np.asarray(fa.data),
                                          np.asarray(fb.data))


def test_corrupt_block_prelude_degrades_not_crashes():
    """Damage inside a block prelude makes split_blocks unparseable; the
    checksum must be verified FIRST so the field degrades to
    valid=False instead of raising (funcs.c:40-60)."""
    from minnow_c_tpu.segment import api
    seg, _, _, _ = make_seg(n=4096)
    qs = api.quantize(seg, seed=2)
    cs = api.compress(qs)
    blob = bytearray(cs.fields[0].data)
    blob[4] ^= 0xFF  # inside the first block prelude (length fields)
    cs.fields[0].data = bytes(blob)
    cs.fields[0].blocks = None  # force re-split from the blob
    out = api.decompress(cs)
    assert out.fields[0].valid is False
    assert out.fields[1].valid is not False  # others unaffected


class TestTranscodeAndFilter:
    def test_transcode_preserves_decoded_bits(self):
        """Repacking to a different codec at the bin level must decode
        to bit-identical floats (no generation loss) and keep IDs
        exact."""
        seg, pos, vel, ids = make_seg(n=20000)
        blob = api.compress_segment(seg, seed=7)
        ref = api.decompress_segment(blob)
        for algo in (mnw.AlgoCode.DIFF, mnw.AlgoCode.CART,
                     mnw.AlgoCode.TRIM, mnw.AlgoCode.COIL,
                     mnw.AlgoCode.OCTO, mnw.AlgoCode.SORT):
            blob2 = api.transcode_segment(blob, algo)
            out = api.decompress_segment(blob2)
            for a, b in zip(ref.fields, out.fields):
                np.testing.assert_array_equal(np.asarray(a.data),
                                              np.asarray(b.data))

    def test_transcode_chain_zero_generation_loss(self):
        """An archive migrated through several codecs over its lifetime
        must decode bit-identically to the original at every hop."""
        seg, *_ = make_seg(n=8192)
        blob = api.compress_segment(seg, seed=11)
        ref = api.decompress_segment(blob)
        for algo in (mnw.AlgoCode.SORT, mnw.AlgoCode.COIL,
                     mnw.AlgoCode.OCTO, mnw.AlgoCode.TRIM):
            blob = api.transcode_segment(blob, algo)
            out = api.decompress_segment(blob)
            for a, b in zip(ref.fields, out.fields):
                np.testing.assert_array_equal(np.asarray(a.data),
                                              np.asarray(b.data))

    def test_transcode_deltas_mode(self):
        """Per-particle-depth (Deltas) streams transcode too: the
        per-element depth table must survive the codec switch."""
        rng = np.random.default_rng(3)
        n = 8192
        pos = rng.uniform(0, 64.0, (3, n)).astype(np.float32)
        deltas = rng.choice([1e-2, 1e-3, 1e-4], n).astype(np.float32)
        from minnow_c_tpu.algos import registry
        f = mnw.Field(
            hd=mnw.FieldHeader(mnw.FieldCode.POSN, mnw.AlgoCode.TRIM,
                               registry.newest(mnw.AlgoCode.TRIM), n),
            data=pos,
            acc=mnw.PositionAccuracy(delta=1e-3, width=64.0,
                                     deltas=deltas))
        blob = api.compress_segment(mnw.Seg(fields=[f]), seed=9)
        ref = api.decompress_segment(blob)
        for algo in (mnw.AlgoCode.DIFF, mnw.AlgoCode.COIL,
                     mnw.AlgoCode.SORT):
            out = api.decompress_segment(
                api.transcode_segment(blob, algo))
            np.testing.assert_array_equal(
                np.asarray(ref.fields[0].data),
                np.asarray(out.fields[0].data))

    def test_transcode_refuses_corrupt_field(self):
        seg, *_ = make_seg(n=4096)
        blob = bytearray(api.compress_segment(seg, seed=2))
        blob[-50] ^= 0xFF
        with pytest.raises(ValueError):
            api.transcode_segment(bytes(blob), mnw.AlgoCode.DIFF)

    def test_field_filter_decodes_selected_only(self):
        """fields= skips non-selected fields entirely but decodes the
        selected ones bit-identically to a full decode (keys ride the
        true field positions)."""
        seg, pos, vel, ids = make_seg(n=8192)
        blob = api.compress_segment(seg, seed=3)
        full = api.decompress_segment(blob)
        only_pos = api.decompress_segment(blob,
                                          fields={mnw.FieldCode.POSN})
        assert only_pos.fields[1] is None and only_pos.fields[2] is None
        np.testing.assert_array_equal(np.asarray(only_pos.fields[0].data),
                                      np.asarray(full.fields[0].data))
        # same under the fused path
        only_vel = api.decompress_segment(blob, fused=True,
                                          fields={mnw.FieldCode.VELC})
        np.testing.assert_array_equal(np.asarray(only_vel.fields[1].data),
                                      np.asarray(full.fields[1].data))


class TestSelectedSegments:
    """iter_segments_selected: skip-ahead read of only chosen chain
    positions (the distributed reader's primitive, round-5 item 4)."""

    def _chain(self, k=5):
        segs = [api.compress_segment(make_seg(n=500, seed=i)[0], seed=i)
                for i in range(k)]
        buf = _io.BytesIO()
        seg_io.write_segments(buf, segs)
        return buf, segs

    def test_selected_bodies_match(self):
        buf, segs = self._chain()
        buf.seek(0)
        got = list(seg_io.iter_segments_selected(buf, [1, 3]))
        assert [i for i, _, _ in got] == [1, 3]
        assert got[0][2] == segs[1] and got[1][2] == segs[3]

    def test_foreign_bodies_never_read(self):
        buf, segs = self._chain()

        class Spans:
            def __init__(self, f):
                self.f = f
                self.spans = []

            def read(self, n=-1):
                off = self.f.tell()
                d = self.f.read(n)
                self.spans.append((off, len(d)))
                return d

            def seek(self, *a):
                return self.f.seek(*a)

            def tell(self):
                return self.f.tell()

        buf.seek(0)
        rf = Spans(buf)
        list(seg_io.iter_segments_selected(rf, [2]))
        # compute body spans of all other segments
        buf.seek(0)
        offs, off = [], 0
        for hd in seg_io.iter_headers(buf):
            offs.append((off + seg_io.IO_HEADER_BYTES, hd.segment_bytes))
            off = hd.next_io_header
        for i, (fo, fl) in enumerate(offs):
            if i == 2:
                continue
            for ro, rl in rf.spans:
                assert not (ro < fo + fl and fo < ro + rl)

    def test_count_segments(self):
        buf, _ = self._chain(4)
        buf.seek(0)
        assert seg_io.count_segments(buf) == 4

    def test_out_of_range_raises(self):
        buf, _ = self._chain(3)
        buf.seek(0)
        with pytest.raises(ValueError, match="beyond end"):
            list(seg_io.iter_segments_selected(buf, [5]))
