"""Gadget-2 driver tests: full snapshot-file round trip through the CLI
surface."""

import io as _io
import os
import subprocess
import sys

import numpy as np
import pytest

from minnow_c_tpu.drivers import gadget2


def make_gadget2_file(n=8192, box=64.0, seed=0, per_particle_mass=False):
    rng = np.random.default_rng(seed)
    steps = rng.normal(0, 0.05, (3, n)).astype(np.float32)
    pos = (np.cumsum(steps, axis=1) + box / 2).astype(np.float32) % box
    vel = rng.normal(0, 150, (3, n)).astype(np.float32)
    ids = rng.permutation(64 ** 3)[:n].astype(np.uint64)
    # Per the Gadget-2 convention a mass-table 0 with npart > 0 means a
    # per-particle MASS record follows; use a table mass otherwise.
    mass_table = (0.0,) * 6 if per_particle_mass else \
        (0.0, 1.0, 0.0, 0.0, 0.0, 0.0)
    hdr = gadget2.Gadget2Header(
        npart=(0, n, 0, 0, 0, 0), mass=mass_table, time=1.0, redshift=0.0,
        box_size=box, omega0=0.3, omega_lambda=0.7, hubble_param=0.7)
    mass = None
    if per_particle_mass:
        mass = (10.0 ** rng.uniform(-2, 2, n)).astype(np.float32)
    buf = _io.BytesIO()
    gadget2.write_snapshot(buf, hdr, pos, vel, ids, mass=mass)
    return buf.getvalue(), pos, vel, ids, mass


class TestGadget2:
    def test_read_write_roundtrip(self):
        raw, pos, vel, ids, _ = make_gadget2_file()
        hdr, p2, v2, i2 = gadget2.read_snapshot(_io.BytesIO(raw))
        assert hdr.box_size == 64.0
        np.testing.assert_array_equal(p2, pos)
        np.testing.assert_array_equal(v2, vel)
        np.testing.assert_array_equal(i2, ids)

    def test_compress_decompress(self):
        raw, pos, vel, ids, _ = make_gadget2_file()
        comp = _io.BytesIO()
        stats = gadget2.compress(_io.BytesIO(raw), comp, pos_delta=1e-3,
                                 vel_delta=1.0, id_grid_width=64,
                                 num_blocks=4)
        assert comp.tell() < len(raw)
        comp.seek(0)
        out = _io.BytesIO()
        hdr = gadget2.decompress(comp, out)
        assert hdr.box_size == 64.0
        _, p2, v2, i2 = gadget2.read_snapshot(_io.BytesIO(out.getvalue()))
        err = np.abs(p2 - pos)
        err = np.minimum(err, 64.0 - err)
        assert err.max() <= 1e-3
        assert np.abs(v2 - vel).max() <= 1.0
        np.testing.assert_array_equal(i2, ids)

    def test_per_particle_mass_roundtrip(self):
        """MASS records (mass table 0, npart > 0) are compressed as a
        UNSF field and restored within relative accuracy -- the client
        driver duty of header_format.tex:44-68."""
        raw, pos, vel, ids, mass = make_gadget2_file(
            per_particle_mass=True)
        assert mass is not None
        comp = _io.BytesIO()
        rel = 1e-4
        gadget2.compress(_io.BytesIO(raw), comp, pos_delta=1e-3,
                         vel_delta=1.0, id_grid_width=64, num_blocks=4,
                         mass_rel_delta=rel)
        comp.seek(0)
        out = _io.BytesIO()
        gadget2.decompress(comp, out)
        hdr2, p2, v2, i2, m2 = gadget2.read_snapshot_ext(
            _io.BytesIO(out.getvalue()))
        assert m2 is not None
        rel_err = np.abs(m2 - mass) / mass
        assert rel_err.max() <= 1.5 * rel
        np.testing.assert_array_equal(i2, ids)

    def test_mixed_table_and_variable_mass_types(self):
        """Two particle types: type 1 with a table mass, type 2 with
        per-particle masses -- the MASS record covers only type 2 and
        the expansion/extraction keeps type order."""
        n1, n2 = 3000, 5000
        n = n1 + n2
        rng = np.random.default_rng(3)
        pos = rng.uniform(0, 64.0, (3, n)).astype(np.float32)
        vel = rng.normal(0, 100, (3, n)).astype(np.float32)
        ids = rng.permutation(64 ** 3)[:n].astype(np.uint64)
        hdr = gadget2.Gadget2Header(
            npart=(0, n1, n2, 0, 0, 0),
            mass=(0.0, 2.5, 0.0, 0.0, 0.0, 0.0),
            time=1.0, redshift=0.0, box_size=64.0, omega0=0.3,
            omega_lambda=0.7, hubble_param=0.7)
        m_var = rng.uniform(0.5, 4.0, n2).astype(np.float32)
        full = np.concatenate(
            [np.full(n1, 2.5, np.float32), m_var])
        buf = _io.BytesIO()
        gadget2.write_snapshot(buf, hdr, pos, vel, ids, mass=full)
        # the record on disk holds only the variable-type entries
        buf.seek(0)
        h2, _, _, _, m2 = gadget2.read_snapshot_ext(buf)
        np.testing.assert_array_equal(m2[:n1],
                                      np.full(n1, 2.5, np.float32))
        np.testing.assert_array_equal(m2[n1:], m_var)
        # full compress/decompress keeps both populations
        buf.seek(0)
        comp = _io.BytesIO()
        gadget2.compress(buf, comp, pos_delta=1e-3, vel_delta=1.0,
                         id_grid_width=64, num_blocks=4,
                         mass_rel_delta=1e-4)
        comp.seek(0)
        out = _io.BytesIO()
        gadget2.decompress(comp, out)
        _, _, _, _, m3 = gadget2.read_snapshot_ext(
            _io.BytesIO(out.getvalue()))
        # table-mass particles re-read exactly (filled from the header's
        # mass table, not the lossy stream)
        np.testing.assert_array_equal(m3[:n1],
                                      np.full(n1, 2.5, np.float32))
        assert (np.abs(m3[n1:] - m_var) / m_var).max() <= 1.5e-4

    def test_missing_mass_record_raises(self):
        hdr = gadget2.Gadget2Header(
            npart=(0, 8, 0, 0, 0, 0), mass=(0.0,) * 6, time=1.0,
            redshift=0.0, box_size=1.0, omega0=0.3, omega_lambda=0.7,
            hubble_param=0.7)
        pos = np.zeros((3, 8), np.float32)
        vel = np.zeros((3, 8), np.float32)
        ids = np.arange(8, dtype=np.uint64)
        with pytest.raises(ValueError, match="per-particle masses"):
            gadget2.write_snapshot(_io.BytesIO(), hdr, pos, vel, ids)

    def test_cli_end_to_end(self, tmp_path):
        raw, pos, vel, ids, _ = make_gadget2_file(n=4096)
        src = tmp_path / "snap.g2"
        comp = tmp_path / "snap.g2.min"
        back = tmp_path / "snap_out.g2"
        src.write_bytes(raw)
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        r = subprocess.run(
            [sys.executable, "-m", "minnow_c_tpu", "compress", str(src),
             str(comp), "--blocks", "2"],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(__file__)))
        assert r.returncode == 0, r.stderr
        assert "ratio" in r.stdout
        r2 = subprocess.run(
            [sys.executable, "-m", "minnow_c_tpu", "info", str(comp)],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(__file__)))
        assert r2.returncode == 0, r2.stderr
        assert "segment 0" in r2.stdout and "segment 1" in r2.stdout
        r3 = subprocess.run(
            [sys.executable, "-m", "minnow_c_tpu", "decompress", str(comp),
             str(back)],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(__file__)))
        assert r3.returncode == 0, r3.stderr
        r4 = subprocess.run(
            [sys.executable, "-m", "minnow_c_tpu", "query", str(comp),
             "--origin", "1", "1", "1", "--size", "2", "2", "2",
             "--periodic", "64"],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(__file__)))
        assert r4.returncode == 0, r4.stderr
        assert "of 2 segments intersect" in r4.stdout
        r5 = subprocess.run(
            [sys.executable, "-m", "minnow_c_tpu", "verify", str(comp)],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(__file__)))
        assert r5.returncode == 0, r5.stderr
        assert " OK " in r5.stdout
        blob = bytearray(comp.read_bytes())
        blob[-100] ^= 0xFF  # damage one payload block
        bad = tmp_path / "bad.min"
        bad.write_bytes(bytes(blob))
        r6 = subprocess.run(
            [sys.executable, "-m", "minnow_c_tpu", "verify", str(bad)],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(__file__)))
        assert r6.returncode == 1
        assert "CORRUPT" in r6.stdout and "blocks corrupt" in r6.stdout
        _, p2, _, i2 = gadget2.read_snapshot(_io.BytesIO(back.read_bytes()))
        err = np.abs(p2 - pos)
        err = np.minimum(err, 64.0 - err)
        assert err.max() <= 1e-3
        np.testing.assert_array_equal(i2, ids)


def test_header_offsets_match_gadget2_io_header():
    """BoxSize lives at byte 128 of struct io_header (after flag_sfr,
    flag_feedback, npartTotal[6], flag_cooling, num_files) -- a shared
    pack/unpack offset bug would round-trip internally while misreading
    every real Gadget-2 file."""
    import struct
    raw = bytearray(256)
    raw[0:24] = struct.pack("<6I", 0, 7, 0, 0, 0, 0)
    raw[120:128] = struct.pack("<2i", 1, 1)     # flag_cooling, num_files
    raw[128:136] = struct.pack("<d", 205.0)     # BoxSize
    raw[136:160] = struct.pack("<3d", 0.31, 0.69, 0.677)
    hdr = gadget2.Gadget2Header.unpack(bytes(raw))
    assert hdr.box_size == 205.0
    assert hdr.omega0 == 0.31
    # pack() preserves the unmodeled flag bytes verbatim
    packed = hdr.pack()
    assert packed[120:128] == bytes(raw[120:128])


def test_illustris_negative_coordinates_roundtrip(tmp_path):
    """BoxSize == 0 (non-periodic) data with negative coordinates must
    round-trip within delta -- the driver shifts by the per-dim minimum
    so the codec's periodic rewrap never touches real values."""
    h5py = pytest.importorskip("h5py")
    from minnow_c_tpu.drivers import illustris
    n = 4096
    rng = np.random.default_rng(2)
    coords = rng.uniform(-120.0, 80.0, (n, 3)).astype(np.float32)
    src = tmp_path / "src.hdf5"
    with h5py.File(src, "w") as f:
        h = f.create_group("Header")
        h.attrs["BoxSize"] = 0.0
        h.attrs["Redshift"] = 0.0
        h.attrs["Time"] = 1.0
        h.attrs["NumPart_ThisFile"] = np.array([0, n, 0, 0, 0, 0])
        g = f.create_group("PartType1")
        g.create_dataset("Coordinates", data=coords)
        g.create_dataset("ParticleIDs",
                         data=np.arange(1, n + 1, dtype=np.uint64))
    out = tmp_path / "snap.il.min"
    with open(out, "wb") as f:
        illustris.compress(str(src), f, pos_delta=1e-3)
    back = tmp_path / "back.hdf5"
    with open(out, "rb") as f:
        illustris.decompress(f, str(back))
    with h5py.File(back, "r") as f:
        got = np.asarray(f["PartType1"]["Coordinates"])
        assert f["Header"].attrs["NumPart_ThisFile"][1] == n  # attrs kept
    assert np.abs(got - coords).max() <= 1e-3
    assert got.min() < 0  # negatives actually restored


def test_cli_archive_commands_on_plain_min_files(tmp_path):
    """info/verify/query/repack accept plain .min files (no Gadget-2
    client header, chain starts at the Mnw magic) as well as .g2.min --
    and verify reports a corrupt chain instead of crashing."""
    import struct
    import minnow_c_tpu as mnw
    from minnow_c_tpu.parallel import snapshot
    rng = np.random.default_rng(2)
    n = 4096
    pos = rng.uniform(0, 64.0, (3, n)).astype(np.float32)
    spec = snapshot.SnapshotSpec(
        pos=mnw.PositionAccuracy(delta=1e-3, width=64.0),
        vel=None, ids=None)
    plain = tmp_path / "plain.min"
    with open(plain, "wb") as f:
        snapshot.compress_snapshot(f, pos, None, None, spec,
                                   num_blocks=2, seed=1)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cwd = os.path.dirname(os.path.dirname(__file__))

    def run(*cmd):
        return subprocess.run(
            [sys.executable, "-m", "minnow_c_tpu", *cmd],
            capture_output=True, text=True, env=env, cwd=cwd)

    r = run("verify", str(plain))
    assert r.returncode == 0, r.stderr
    assert " OK " in r.stdout
    r = run("info", str(plain))
    assert r.returncode == 0 and "segment 1" in r.stdout, r.stderr
    r = run("query", str(plain), "--origin", "0", "0", "0",
            "--size", "64", "64", "64")
    assert r.returncode == 0 and "2 of 2" in r.stdout, r.stderr
    out = tmp_path / "plain.cart.min"
    r = run("repack", str(plain), str(out), "--algo", "Cart")
    assert r.returncode == 0, r.stderr
    r = run("verify", str(out))
    assert r.returncode == 0, r.stderr
    # corrupt chain (huge SegmentBytes): report CORRUPT, don't crash
    blob = bytearray(plain.read_bytes())
    blob[32:40] = struct.pack("<Q", 2 ** 64 - 1)
    badf = tmp_path / "chain.min"
    badf.write_bytes(bytes(blob))
    r = run("verify", str(badf))
    assert r.returncode == 1, r.stderr
    assert "CORRUPT" in r.stdout and "Traceback" not in r.stderr


def test_legacy_massless_file_reads_with_warning():
    """A file whose header declares per-particle masses but that has no
    MASS record (e.g. written by the pre-round-4 decompress) must read
    with a warning and mass=None, not fail (advisor round-4 finding).
    A *wrong-sized* MASS record must still raise."""
    import warnings
    raw, pos, vel, ids, mass = make_gadget2_file(per_particle_mass=True)
    # strip the trailing MASS record: header + POS + VEL + ID records
    fp = _io.BytesIO(raw)
    gadget2._read_record(fp)  # header
    gadget2._read_record(fp)  # POS
    gadget2._read_record(fp)  # VEL
    gadget2._read_record(fp)  # ID
    legacy = raw[: fp.tell()]
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        hdr, p2, v2, i2, m2 = gadget2.read_snapshot_ext(
            _io.BytesIO(legacy))
    assert m2 is None
    assert any("no MASS record" in str(x.message) for x in w)
    np.testing.assert_array_equal(p2, pos)
    np.testing.assert_array_equal(i2, ids)
    # truncated-but-present MASS record is corruption, not tolerance
    n = ids.shape[0]
    bad = _io.BytesIO()
    bad.write(legacy)
    gadget2._write_record(
        bad, np.zeros(n - 1, dtype="<f4").tobytes())
    with pytest.raises(ValueError, match="MASS record"):
        gadget2.read_snapshot_ext(_io.BytesIO(bad.getvalue()))
