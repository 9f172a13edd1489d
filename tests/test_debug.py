"""DebugAssert tier (debug.h:52-63 analog): internal-invariant checks
that are free in release mode and active under MINNOW_DEBUG / set_debug."""

import numpy as np
import pytest

from minnow_c_tpu.utils import debug as dbg


@pytest.fixture
def debug_on():
    dbg.set_debug(True)
    yield
    dbg.set_debug(False)


class TestDebugAssert:
    def test_noop_when_disabled(self):
        calls = []

        def pred():
            calls.append(1)
            return False

        dbg.set_debug(False)
        dbg.debug_assert(pred, "never evaluated")
        assert calls == []  # predicate not even evaluated in release

    def test_raises_when_enabled(self, debug_on):
        with pytest.raises(AssertionError, match="boom"):
            dbg.debug_assert(False, "boom")
        dbg.debug_assert(True, "fine")

    def test_catches_chunk_width_violation(self, debug_on):
        from minnow_c_tpu.algos import chunked
        zc = np.full((2, chunked.CHUNK), 7, dtype=np.uint32)
        widths = np.array([3, 2], dtype=np.uint8)  # 7 needs 3 bits
        with pytest.raises(AssertionError, match="exceeds declared width"):
            chunked.pack_chunks(zc, widths)
        widths_ok = np.array([3, 3], dtype=np.uint8)
        chunked.pack_chunks(zc, widths_ok)  # no raise

    def test_quantize_invariant_clean_run(self, debug_on):
        import minnow_c_tpu as mnw
        from minnow_c_tpu.algos import registry
        from minnow_c_tpu.quant import engine
        n, W = 4096, 64.0
        pos = np.random.default_rng(0).uniform(
            0, W, (3, n)).astype(np.float32)
        ver = registry.newest(mnw.AlgoCode.TRIM)
        f = mnw.Field(
            hd=mnw.FieldHeader(mnw.FieldCode.POSN, mnw.AlgoCode.TRIM, ver,
                               n),
            data=pos, acc=mnw.PositionAccuracy(delta=1e-3, width=W))
        engine.quantize(f, seed=1)  # invariant holds, no raise


def test_debug_flag_tolerant_parse():
    """MINNOW_DEBUG=true/on/yes must enable (not crash import)."""
    from minnow_c_tpu.utils.debug import _parse_flag
    assert _parse_flag("true") and _parse_flag("ON") and _parse_flag("1")
    assert not _parse_flag("0") and not _parse_flag("") \
        and not _parse_flag("garbage")


def test_debug_flag_nonzero_integers_enable():
    """MINNOW_DEBUG=2 (any nonzero int) enables, matching the historic
    bool(int(...)) behavior."""
    from minnow_c_tpu.utils.debug import _parse_flag
    assert _parse_flag("2") and _parse_flag("-1") and _parse_flag(" 3 ")
    assert not _parse_flag("00")


class TestProfilingSpans:
    """utils/profiling is load-bearing: the snapshot pipeline wraps its
    phases in ``phase()`` spans, printed under MINNOW_PROFILE=1."""

    def test_phase_prints_under_env(self, monkeypatch):
        from minnow_c_tpu.utils import profiling
        lines = []
        monkeypatch.setenv("MINNOW_PROFILE", "1")
        with profiling.phase("unit", sink=lines.append, nbytes=10 ** 9):
            pass
        assert len(lines) == 1 and "unit" in lines[0] \
            and "GB/s" in lines[0]
        monkeypatch.delenv("MINNOW_PROFILE")
        with profiling.phase("quiet", sink=lines.append):
            pass
        assert len(lines) == 1  # silent without the env var

    def test_snapshot_pipeline_emits_phases(self, monkeypatch, capsys):
        import io as _io

        import numpy as np

        import minnow_c_tpu as mnw
        from minnow_c_tpu.parallel import snapshot
        monkeypatch.setenv("MINNOW_PROFILE", "1")
        n = 4096
        rng = np.random.default_rng(0)
        pos = rng.uniform(0, 64.0, (3, n)).astype(np.float32)
        ids = rng.permutation(64 ** 3)[:n].astype(np.uint64)
        spec = snapshot.SnapshotSpec(
            pos=mnw.PositionAccuracy(delta=1e-3, width=64.0),
            ids=mnw.IDAccuracy(width=64))
        buf = _io.BytesIO()
        snapshot.compress_snapshot(buf, pos, None, ids, spec,
                                   num_blocks=2)
        buf.seek(0)
        snapshot.decompress_snapshot(buf)
        outp = capsys.readouterr().out
        for span in ("pos.h2d+stats", "pos.binpack", "pos.gather",
                     "pos.entropy", "ids.decompose", "serialize",
                     "decode.parse", "decode.pos"):
            assert f"[minnow] {span}:" in outp, span
