"""Bench records must be merge-safe: round 4's kernel refresh destroyed
the per-codec section because one writer dumped its dict wholesale over
bench_kernels.json (VERDICT r4 weak #1 / next-round item 2).  These tests
pin the read-modify-write contract of bench/records.py and that the two
real writers (bench_kernels.dump_results, bench_codecs' section update)
preserve each other's sections."""

import json
import os

from minnow_c_tpu.bench import records


def test_update_preserves_foreign_sections(tmp_path):
    path = str(tmp_path / "rec.json")
    records.update_sections(path, {"codecs": {"results": {"coil": 1.5}}})
    records.update_sections(path, {"meta": {"u": "GB/s"},
                                   "results": {"minmax": 400.0}})
    data = json.loads(open(path).read())
    assert data["codecs"]["results"]["coil"] == 1.5
    assert data["results"]["minmax"] == 400.0
    # and the reverse order round-trips too
    records.update_sections(path, {"codecs": {"results": {"coil": 25.0}}})
    data = json.loads(open(path).read())
    assert data["results"]["minmax"] == 400.0
    assert data["codecs"]["results"]["coil"] == 25.0


def test_update_replaces_only_named_section(tmp_path):
    path = str(tmp_path / "rec.json")
    records.update_sections(path, {"a": 1, "b": 2})
    records.update_sections(path, {"a": 10})
    data = records.load(path)
    assert data == {"a": 10, "b": 2}


def test_load_tolerates_corrupt_file(tmp_path):
    path = str(tmp_path / "rec.json")
    with open(path, "w") as f:
        f.write("{ truncated")
    assert records.load(path) == {}
    # and update recovers by rewriting
    records.update_sections(path, {"x": 1})
    assert records.load(path) == {"x": 1}


def test_atomic_write_leaves_no_tmp(tmp_path):
    path = str(tmp_path / "rec.json")
    records.update_sections(path, {"x": 1})
    leftovers = [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]
    assert leftovers == []


def test_real_writers_roundtrip(tmp_path, monkeypatch):
    """bench_kernels.dump_results must preserve a codecs section."""
    import importlib.util
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_kernels_mod", os.path.join(repo, "bench_kernels.py"))
    bk = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bk)

    path = str(tmp_path / "bench_kernels.json")
    records.update_sections(path, {"codecs": {"results": {"sort": 0.38}}})

    # point dump_results at the tmp file
    monkeypatch.setattr(bk.os.path, "dirname", lambda p: str(tmp_path))
    bk.results["minmax"] = 123.0
    bk.dump_results()
    data = json.loads(open(path).read())
    assert data["codecs"]["results"]["sort"] == 0.38
    assert data["results"]["minmax"] == 123.0
