"""Illustris (HDF5) driver round-trip tests."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from minnow_c_tpu.drivers import illustris


def make_h5(path, n=4096, box=75000.0, seed=0, two_types=False):
    rng = np.random.default_rng(seed)
    with h5py.File(path, "w") as f:
        hdr = f.create_group("Header")
        hdr.attrs["BoxSize"] = box
        hdr.attrs["Redshift"] = 0.5
        hdr.attrs["Time"] = 0.667
        types = ["PartType1"] + (["PartType0"] if two_types else [])
        data = {}
        for t in types:
            g = f.create_group(t)
            pos = rng.uniform(0, box, (n, 3)).astype(np.float32)
            vel = rng.normal(0, 300, (n, 3)).astype(np.float32)
            ids = rng.permutation(128 ** 3)[:n].astype(np.uint64)
            g.create_dataset("Coordinates", data=pos)
            g.create_dataset("Velocities", data=vel)
            g.create_dataset("ParticleIDs", data=ids)
            data[t] = (pos, vel, ids)
    return data


def test_roundtrip(tmp_path):
    src = tmp_path / "snap.hdf5"
    comp = tmp_path / "snap.il.min"
    back = tmp_path / "snap_out.hdf5"
    data = make_h5(str(src), two_types=True)
    with open(comp, "wb") as f:
        stats = illustris.compress(str(src), f, pos_delta=1.0,
                                   vel_delta=1.0, seed=3)
    assert comp.stat().st_size < src.stat().st_size
    with open(comp, "rb") as f:
        meta = illustris.decompress(f, str(back))
    assert meta["box_size"] == 75000.0
    with h5py.File(back, "r") as f:
        assert f["Header"].attrs["Redshift"] == 0.5
        for t, (pos, vel, ids) in data.items():
            p2 = np.asarray(f[t]["Coordinates"])
            err = np.abs(p2 - pos)
            err = np.minimum(err, 75000.0 - err)
            assert err.max() <= 1.0
            assert np.abs(np.asarray(f[t]["Velocities"]) - vel).max() <= 1.0
            np.testing.assert_array_equal(
                np.asarray(f[t]["ParticleIDs"]), ids)


def test_multi_file_roundtrip(tmp_path):
    """compress_multi merges a chunked snapshot (the real Illustris
    layout: snap_X.0.hdf5 ... snap_X.N-1.hdf5) into one archive that
    decompresses to the concatenated logical snapshot."""
    box = 75000.0
    paths, want = [], {}
    sizes = [3000, 1000, 2000]  # ragged chunks, incl. a type-0-only file
    for i, n in enumerate(sizes):
        p = tmp_path / f"snap.{i}.hdf5"
        data = make_h5(str(p), n=n, box=box, seed=10 + i,
                       two_types=(i != 1))
        paths.append(str(p))
        for t, (pos, vel, ids) in data.items():
            w = want.setdefault(t, ([], [], []))
            w[0].append(pos), w[1].append(vel), w[2].append(ids)
    comp = tmp_path / "snap.il.min"
    with open(comp, "wb") as f:
        stats = illustris.compress_multi(paths, f, pos_delta=1.0,
                                         vel_delta=1.0, seed=3)
    back = tmp_path / "merged.hdf5"
    with open(comp, "rb") as f:
        meta = illustris.decompress(f, str(back))
    assert meta["files"] == paths
    with h5py.File(back, "r") as f:
        for t, (ps, vs, is_) in want.items():
            pos = np.concatenate(ps)
            vel = np.concatenate(vs)
            ids = np.concatenate(is_)
            assert f[t]["Coordinates"].shape == pos.shape
            err = np.abs(np.asarray(f[t]["Coordinates"]) - pos)
            err = np.minimum(err, box - err)
            assert err.max() <= 1.0
            assert np.abs(np.asarray(f[t]["Velocities"]) - vel).max() <= 1.0
            np.testing.assert_array_equal(
                np.asarray(f[t]["ParticleIDs"]), ids)


def test_multi_file_nonperiodic_offsets(tmp_path):
    """Per-chunk pos_offset: non-periodic chunks with different negative
    ranges must each restore their own offset."""
    paths, want = [], []
    for i in range(2):
        p = tmp_path / f"z.{i}.hdf5"
        rng = np.random.default_rng(20 + i)
        pos = rng.uniform(-500.0 * (i + 1), 200.0, (1500, 3)).astype(
            np.float32)
        with h5py.File(p, "w") as f:
            hdr = f.create_group("Header")
            hdr.attrs["BoxSize"] = 0.0
            g = f.create_group("PartType1")
            g.create_dataset("Coordinates", data=pos)
        paths.append(str(p))
        want.append(pos)
    comp = tmp_path / "z.il.min"
    with open(comp, "wb") as f:
        illustris.compress_multi(paths, f, pos_delta=0.01)
    back = tmp_path / "z.hdf5"
    with open(comp, "rb") as f:
        illustris.decompress(f, str(back))
    with h5py.File(back, "r") as f:
        got = np.asarray(f["PartType1"]["Coordinates"])
    exp = np.concatenate(want)
    assert got.shape == exp.shape
    assert np.abs(got - exp).max() <= 0.01


def test_cli_archive_commands_on_multi_chain_il_min(tmp_path):
    """verify/info/repack walk ALL chains of an .il.min archive (one
    chain per particle type), not just the first."""
    import os
    import subprocess
    import sys
    data = make_h5(str(tmp_path / "s.hdf5"), n=2048, two_types=True)
    comp = tmp_path / "s.il.min"
    with open(comp, "wb") as f:
        illustris.compress(str(tmp_path / "s.hdf5"), f, pos_delta=1.0)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cwd = os.path.dirname(os.path.dirname(__file__))

    def run(*cmd):
        return subprocess.run(
            [sys.executable, "-m", "minnow_c_tpu", *cmd],
            capture_output=True, text=True, env=env, cwd=cwd)

    r = run("verify", str(comp))
    assert r.returncode == 0, r.stderr
    assert "2 segments" in r.stdout  # both type chains walked
    r = run("info", str(comp))
    assert r.returncode == 0 and "segment 1" in r.stdout
    out = tmp_path / "s.diff.il.min"
    r = run("repack", str(comp), str(out), "--algo", "Diff")
    assert r.returncode == 0, r.stderr
    assert "2 segments transcoded" in r.stdout
    # chain boundaries preserved: the repacked archive still decompresses
    back = tmp_path / "back.hdf5"
    with open(out, "rb") as f:
        illustris.decompress(f, str(back))
    with h5py.File(back, "r") as f:
        for t, (pos, vel, ids) in data.items():
            np.testing.assert_array_equal(
                np.asarray(f[t]["ParticleIDs"]), ids)


def test_cli_compress_decompress_routes_hdf5(tmp_path):
    """CLI compress/decompress detect HDF5 inputs by magic (single file
    and multi-chunk merge) and route .il.min back to HDF5."""
    import os
    import subprocess
    import sys
    box = 75000.0
    paths, want = [], []
    for i, n in enumerate((1024, 1536)):
        p = tmp_path / f"snap.{i}.hdf5"
        make_h5(str(p), n=n, box=box, seed=20 + i)
        paths.append(str(p))
        with h5py.File(p, "r") as f:
            want.append(np.asarray(f["PartType1"]["Coordinates"]))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    cwd = os.path.dirname(os.path.dirname(__file__))

    def run(*cmd):
        return subprocess.run(
            [sys.executable, "-m", "minnow_c_tpu", *cmd],
            capture_output=True, text=True, env=env, cwd=cwd)

    comp = tmp_path / "snap.il.min"
    r = run("compress", *paths, str(comp), "--pos-delta", "1.0")
    assert r.returncode == 0, r.stderr
    assert "2560 particles" in r.stdout
    back = tmp_path / "back.hdf5"
    r = run("decompress", str(comp), str(back))
    assert r.returncode == 0, r.stderr
    assert "2560 particles" in r.stdout
    with h5py.File(back, "r") as f:
        got = np.asarray(f["PartType1"]["Coordinates"])
    exp = np.concatenate(want)
    err = np.abs(got - exp)
    err = np.minimum(err, box - err)
    assert got.shape == exp.shape and err.max() <= 1.0
    # mixing formats is refused loudly
    r = run("compress", paths[0], "/dev/null", str(tmp_path / "x.min"))
    assert r.returncode != 0 and "mix" in r.stderr
