"""Wire-robustness fuzzing: mutated/truncated/garbage segment bytes must
fail with controlled errors (ValueError/EOFError/KeyError) or degrade
gracefully -- never crash with an uncontrolled exception class."""

import numpy as np
import pytest

import minnow_c_tpu as mnw
from minnow_c_tpu.algos import registry
from minnow_c_tpu.segment import api

ALLOWED = (ValueError, EOFError, KeyError)


def base_blob(n=600, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(0, 8.0, (3, n)).astype(np.float32)
    ids = rng.permutation(1 << 16)[:n].astype(np.uint64)
    ver = registry.newest(mnw.AlgoCode.TRIM)
    seg = mnw.Seg(fields=[
        mnw.Field(hd=mnw.FieldHeader(mnw.FieldCode.POSN, mnw.AlgoCode.TRIM,
                                     ver, n),
                  data=pos, acc=mnw.PositionAccuracy(delta=1e-2, width=8.0)),
        mnw.Field(hd=mnw.FieldHeader(mnw.FieldCode.PTID, mnw.AlgoCode.TRIM,
                                     ver, n),
                  data=ids, acc=mnw.IDAccuracy(width=64)),
    ])
    return api.compress_segment(seg, seed=1)


def _try(blob):
    try:
        api.decompress_segment(blob)
    except ALLOWED:
        pass
    try:
        api.decompress_segment(blob, fused=True)
    except ALLOWED:
        pass


def test_single_byte_mutations():
    blob = base_blob()
    rng = np.random.default_rng(1)
    # mutate a spread of offsets incl. every header region
    offsets = list(range(0, 120, 4)) + \
        list(rng.integers(0, len(blob), 60))
    for off in offsets:
        b = bytearray(blob)
        b[off % len(blob)] ^= rng.integers(1, 256)
        _try(bytes(b))


def test_truncations():
    blob = base_blob()
    for cut in (0, 1, 4, 15, 16, 63, 64, len(blob) // 2, len(blob) - 1):
        _try(blob[:cut])


def test_garbage():
    rng = np.random.default_rng(2)
    for n in (0, 3, 16, 64, 4096):
        _try(rng.integers(0, 256, n).astype(np.uint8).tobytes())


def test_header_field_count_lies():
    blob = bytearray(base_blob())
    # claim an absurd field count (the header checksum will catch it; and
    # even with a fixed-up checksum the parser must fail cleanly)
    blob[8:12] = (10 ** 6).to_bytes(4, "little")
    _try(bytes(blob))


def test_unknown_block_flags_rejected():
    """Reserved prelude flag bits must be refused, not silently return a
    misdecoded payload."""
    from minnow_c_tpu.algos import blocks
    blk = bytearray(blocks.encode_block(b"x" * 32, width=8,
                                        try_entropy=False))
    blk[9] |= 0x02  # set a reserved flag bit
    with pytest.raises(ValueError, match="unknown block flag"):
        blocks.decode_block(bytes(blk))


def test_fused_decode_short_block_list_degrades():
    """A checksum-valid segment whose field has too few blocks must
    degrade (or fall back), never IndexError out of the fused path."""
    from minnow_c_tpu.segment import format as seg_fmt
    seg, pos, _, _ = __import__("test_segment").make_seg(n=4096)
    blob = api.compress_segment(seg, seed=1)
    parsed = seg_fmt.deserialize(blob)
    # Rebuild the segment with the POSN field truncated to 1 block.
    fields = [seg_fmt.WireField(f.field_code, f.algo_code, f.version,
                                f.blocks[:1] if i == 0 else f.blocks)
              for i, f in enumerate(parsed.fields)]
    cut = seg_fmt.serialize(fields, parsed.particle_num)
    out = api.decompress_segment(cut, fused=True)
    assert out.fields[0] is None or out.fields[0].data is None \
        or not getattr(out.fields[0], "valid", True)


def test_file_layer_mutations_and_truncations():
    """Whole-file fuzz through decompress_snapshot: every mutated or
    truncated .min file must raise ValueError (the documented corrupt-
    input contract) or decode -- never OverflowError from unchecked u64
    header fields, bare EOFError, or an index crash."""
    import io as _io
    from minnow_c_tpu.parallel import snapshot
    rng = np.random.default_rng(0)
    n = 2048
    pos = rng.uniform(0, 64.0, (3, n)).astype(np.float32)
    spec = snapshot.SnapshotSpec(
        pos=mnw.PositionAccuracy(delta=1e-3, width=64.0),
        vel=None, ids=None)
    buf = _io.BytesIO()
    snapshot.compress_snapshot(buf, pos, None, None, spec, num_blocks=2,
                               seed=1)
    blob = buf.getvalue()
    idxs = list(range(96)) + list(range(96, len(blob), 509))
    for i in idxs:
        b = bytearray(blob)
        b[i] ^= 0xFF
        try:
            snapshot.decompress_snapshot(_io.BytesIO(bytes(b)))
        except ValueError:
            pass
    for cut in range(0, len(blob), 251):
        try:
            snapshot.decompress_snapshot(_io.BytesIO(blob[:cut]))
        except ValueError:
            pass
