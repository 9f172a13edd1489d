"""Spatial IOHeader geometry + skip-ahead box queries.

The spec's IOHeader carries Origin[3]/Width[3] so a reader can skip
segments outside a region of interest without parsing their bodies
(header_format.tex:206-218).  The snapshot writer populates these from
each block's position bounding box; ``iter_segments_intersecting``
follows the NextIOHeader chain and yields only matching segments.
"""

import io as _io

import numpy as np
import pytest

import minnow_c_tpu as mnw
from minnow_c_tpu.parallel import snapshot
from minnow_c_tpu.segment import io as seg_io

W = 64.0
SPEC = snapshot.SnapshotSpec(
    pos=mnw.PositionAccuracy(delta=1e-3, width=W),
    ids=mnw.IDAccuracy(width=1024),
)


def clustered_snapshot(B=4, nb=2048):
    """B blocks, block b confined to x in [b*16, b*16+8)."""
    rng = np.random.default_rng(11)
    pos = np.empty((3, B * nb), dtype=np.float32)
    for b in range(B):
        sl = slice(b * nb, (b + 1) * nb)
        pos[0, sl] = rng.uniform(b * 16.0, b * 16.0 + 8.0, nb)
        pos[1, sl] = rng.uniform(0, W, nb)
        pos[2, sl] = rng.uniform(0, W, nb)
    ids = rng.permutation(1024 ** 2 * 4)[: B * nb].astype(np.uint64)
    return pos, ids


class TestBoxIntersects:
    def test_basic_overlap(self):
        assert seg_io.box_intersects((0, 0, 0), (4, 4, 4),
                                     (3, 3, 3), (4, 4, 4))
        assert not seg_io.box_intersects((0, 0, 0), (4, 4, 4),
                                         (5, 0, 0), (4, 4, 4))

    def test_zero_geometry_matches_everything(self):
        # Writers that record no geometry leave zeros: conservative match.
        assert seg_io.box_intersects((0, 0, 0), (0, 0, 0),
                                     (50, 50, 50), (1, 1, 1))

    def test_touching_edges_count(self):
        assert seg_io.box_intersects((0, 0, 0), (4, 4, 4),
                                     (4, 0, 0), (4, 4, 4))

    def test_periodic_wrap(self):
        # Segment near the high seam, query near the low edge: only
        # intersecting modulo the box length.
        assert not seg_io.box_intersects((60, 0, 0), (8, 4, 4),
                                         (1, 0, 0), (2, 4, 4))
        assert seg_io.box_intersects((60, 0, 0), (8, 4, 4),
                                     (1, 0, 0), (2, 4, 4), periodic=W)
        assert not seg_io.box_intersects((60, 0, 0), (8, 4, 4),
                                         (10, 0, 0), (2, 4, 4), periodic=W)


class TestSnapshotGeometry:
    def test_writer_populates_headers(self):
        pos, ids = clustered_snapshot()
        buf = _io.BytesIO()
        snapshot.compress_snapshot(buf, pos, None, ids, SPEC, num_blocks=4)
        buf.seek(0)
        heads = list(seg_io.iter_headers(buf))
        assert len(heads) == 4
        for b, hd in enumerate(heads):
            assert hd.origin[0] == pytest.approx(b * 16.0, abs=0.1)
            assert hd.width[0] == pytest.approx(8.0, abs=0.2)
            assert hd.width[1] == pytest.approx(W, abs=0.5)

    def test_box_query_reads_one_of_n(self):
        pos, ids = clustered_snapshot()
        buf = _io.BytesIO()
        snapshot.compress_snapshot(buf, pos, None, ids, SPEC, num_blocks=4)
        # query a box strictly inside block 2's x-slab
        buf.seek(0)
        hits = list(seg_io.iter_segments_intersecting(
            buf, (33.0, 10.0, 10.0), (4.0, 4.0, 4.0)))
        assert len(hits) == 1
        buf.seek(0)
        out = snapshot.decompress_snapshot(
            buf, box=((33.0, 10.0, 10.0), (4.0, 4.0, 4.0)))
        nb = pos.shape[1] // 4
        want = pos[:, 2 * nb: 3 * nb]
        err = np.abs(out["pos"] - want)
        err = np.minimum(err, W - err)
        assert err.max() <= 1e-3

    def test_box_query_no_match(self):
        pos, ids = clustered_snapshot()
        buf = _io.BytesIO()
        snapshot.compress_snapshot(buf, pos, None, ids, SPEC, num_blocks=4)
        buf.seek(0)
        # y/z cover everything, so pick an x gap: blocks cover
        # [0,8) [16,24) [32,40) [48,56); query [9,15].
        out = snapshot.decompress_snapshot(
            buf, box=((9.0, 0.0, 0.0), (6.0, W, W)))
        assert out == {}

    def test_files_without_geometry_still_fully_read(self):
        # vel-only snapshot: writer has no positions, geometry stays zero,
        # any box query conservatively returns every segment.
        rng = np.random.default_rng(5)
        vel = rng.normal(0, 100, (3, 4096)).astype(np.float32)
        spec = snapshot.SnapshotSpec(vel=mnw.VelocityAccuracy(delta=1.0))
        buf = _io.BytesIO()
        snapshot.compress_snapshot(buf, None, vel, None, spec, num_blocks=2)
        buf.seek(0)
        out = snapshot.decompress_snapshot(
            buf, box=((1.0, 1.0, 1.0), (2.0, 2.0, 2.0)))
        assert out["vel"].shape == (3, 4096)


def test_corrupt_chain_does_not_loop_forever():
    """A NextIOHeader that fails to advance (no checksum covers it) must
    raise, not iterate the same segment forever."""
    import io as _io
    from minnow_c_tpu.segment import io as seg_io
    buf = _io.BytesIO()
    seg_io.write_segments(buf, [b"A" * 8, b"B" * 8])
    raw = bytearray(buf.getvalue())
    # 0 in NextIOHeader is the end marker: truncating the chain is legal.
    raw[40:48] = (0).to_bytes(8, "little")
    assert len(list(seg_io.iter_segments(_io.BytesIO(bytes(raw))))) == 1
    # Point the SECOND header's NextIOHeader back at itself: without the
    # guard this iterates that segment forever.
    raw = bytearray(buf.getvalue())
    second = 48 + 8  # first header + first segment
    raw[second + 40:second + 48] = second.to_bytes(8, "little")
    with pytest.raises(ValueError, match="does not advance"):
        list(seg_io.iter_segments(_io.BytesIO(bytes(raw))))


def test_periodic_seam_touching_counts():
    """Closed intervals that touch exactly at the periodic seam must
    intersect, matching the non-periodic touching convention."""
    from minnow_c_tpu.segment.io import box_intersects
    # segment [56, 64] in an L=64 box touches a query starting at 0
    assert box_intersects((56.0, 0.0, 0.0), (8.0, 1.0, 1.0),
                          (0.0, 0.0, 0.0), (2.0, 1.0, 1.0),
                          periodic=64.0)


def test_append_segments_extends_chain():
    """append_segments patches only the last chain link and the new
    segments become part of one chain."""
    import io as _io
    from minnow_c_tpu.segment import io as seg_io
    buf = _io.BytesIO()
    seg_io.write_segments(buf, [b"A" * 8, b"B" * 16])
    before = buf.getvalue()
    buf.seek(0)
    n = seg_io.append_segments(buf, iter([(b"C" * 24, None),
                                          (b"D" * 8, ((1, 2, 3),
                                                      (4, 5, 6)))]))
    assert n == 2
    buf.seek(0)
    got = [seg for _, seg in seg_io.iter_segments(buf)]
    assert got == [b"A" * 8, b"B" * 16, b"C" * 24, b"D" * 8]
    # original bytes untouched except the patched 8-byte link
    after = buf.getvalue()
    diffs = [i for i in range(len(before)) if before[i] != after[i]]
    link = set(range(48 + 8 + 40, 48 + 8 + 48))  # 2nd header's u64 link
    assert diffs and set(diffs) <= link
    # appending to an empty file is a plain write
    buf2 = _io.BytesIO()
    assert seg_io.append_segments(buf2, iter([(b"X" * 8, None)])) == 1
    buf2.seek(0)
    assert [seg for _, seg in seg_io.iter_segments(buf2)] == [b"X" * 8]


def test_append_segments_empty_iter_leaves_file_untouched():
    """An empty append must not patch the chain link: a dangling
    link-to-EOF would make every later walk fail as truncated."""
    import io as _io
    from minnow_c_tpu.segment import io as seg_io
    buf = _io.BytesIO()
    seg_io.write_segments(buf, [b"A" * 8, b"B" * 16])
    before = buf.getvalue()
    buf.seek(0)
    assert seg_io.append_segments(buf, iter([])) == 0
    assert buf.getvalue() == before
    # the file is still appendable afterwards
    buf.seek(0)
    assert seg_io.append_segments(buf, iter([(b"C" * 8, None)])) == 1
    buf.seek(0)
    assert [s for _, s in seg_io.iter_segments(buf)] == \
        [b"A" * 8, b"B" * 16, b"C" * 8]
