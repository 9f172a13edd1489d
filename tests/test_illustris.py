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
