"""Byteswapped-wire verification -- the analog of the reference's
mock-endian fake-backend tests (Makefile:38-40, util.c:447-553,
test/compress_util_test.c:661-729).

The reference cannot run on big-endian hardware in CI, so it compiles its
endian-conversion layer with DEBUG_MOCK_BIG_ENDIAN and asserts the wire
bytes are unchanged.  The equivalent here: every wire write goes through
explicit '<' codes, so feeding *byteswapped views* of every input array
must produce byte-identical streams, and the byte stream layer itself
must be invariant under forced big-endian array inputs.
"""

import hashlib
import io as _io

import numpy as np

import minnow_c_tpu as mnw
from minnow_c_tpu import semver as _sv
from minnow_c_tpu.parallel import snapshot
from minnow_c_tpu.segment import api
from minnow_c_tpu.segment.stream import Reader, Writer

from test_freeze import ALGOS, reference_segment


def swap_field(f):
    """Byteswapped big-endian view of a field's data."""
    d = np.asarray(f.data)
    f.data = d.astype(d.dtype.newbyteorder(">"))
    return f


class TestStreamLayer:
    def test_writer_array_is_byteorder_invariant(self):
        a = np.arange(100, dtype=np.uint32)
        w_le = Writer()
        w_le.array(a.astype("<u4"))
        w_be = Writer()
        w_be.array(a.astype(">u4"))
        assert w_le.data == w_be.data

    def test_writer_raw_is_byteorder_invariant(self):
        a = np.linspace(0, 1, 64, dtype=np.float32)
        w_le = Writer()
        w_le.raw(a.astype("<f4"))
        w_be = Writer()
        w_be.raw(a.astype(">f4"))
        assert w_le.data == w_be.data

    def test_reader_returns_native_arrays(self):
        a = np.arange(32, dtype=np.uint64)
        w = Writer()
        w.array(a)
        out = Reader(w.data).array(np.uint64, 32)
        assert out.dtype.isnative
        np.testing.assert_array_equal(out, a)


class TestSegmentWire:
    def test_all_codecs_byteswapped_inputs_identical_wire(self):
        """Encode every codec's digest segment from big-endian input
        views; the wire must be byte-identical (same sha256 as the
        frozen fixtures path)."""
        for name, (algo, ver) in ALGOS.items():
            seg_le = reference_segment(algo, ver)
            seg_be = reference_segment(algo, ver)
            for f in seg_be.fields:
                swap_field(f)
            blob_le = api.compress_segment(seg_le, seed=777)
            blob_be = api.compress_segment(seg_be, seed=777)
            assert hashlib.sha256(blob_le).hexdigest() == \
                hashlib.sha256(blob_be).hexdigest(), name

    def test_snapshot_byteswapped_inputs_identical_wire(self):
        rng = np.random.default_rng(3)
        n, W = 8192, 64.0
        pos = rng.uniform(0, W, (3, n)).astype(np.float32)
        vel = rng.normal(0, 100, (3, n)).astype(np.float32)
        ids = rng.permutation(1 << 20)[:n].astype(np.uint64)
        spec = snapshot.SnapshotSpec(
            pos=mnw.PositionAccuracy(delta=1e-3, width=W),
            vel=mnw.VelocityAccuracy(delta=1.0),
            ids=mnw.IDAccuracy(width=1024))
        b1 = _io.BytesIO()
        snapshot.compress_snapshot(b1, pos, vel, ids, spec, num_blocks=2,
                                   seed=9)
        b2 = _io.BytesIO()
        snapshot.compress_snapshot(
            b2, pos.astype(">f4"), vel.astype(">f4"), ids.astype(">u8"),
            spec, num_blocks=2, seed=9)
        assert b1.getvalue() == b2.getvalue()
