"""Illustris/IllustrisTNG snapshot driver (the L5 client layer).

The spec's second standardized driver (header_format.tex:37-42): converts
HDF5 snapshots in the Illustris layout -- a ``Header`` group with
``BoxSize``/``NumPart_ThisFile`` attributes and ``PartType<i>`` groups
holding ``Coordinates`` (N, 3), ``Velocities`` (N, 3), and ``ParticleIDs``
(N,) datasets -- into ``*.il.min`` files and back.

The ``.il.min`` layout mirrors the Gadget-2 driver: one Fortran-framed
JSON header record carrying the snapshot attributes and the particle-type
table, followed by chained compressed segments per particle type.  Every
JSON-representable Header attribute round-trips; particle types are
loaded and compressed one at a time (peak memory is one type, not the
whole snapshot).

Non-periodic data (``BoxSize == 0``): coordinates may be negative, and
the codec's position path wraps decodes into [0, width).  The driver
therefore shifts each type by its per-dim minimum (recorded in the JSON
meta as ``pos_offset``), encodes with a width more than twice the data
range -- so the periodic unwrap/rewrap never touches real values -- and
restores the offset on decompress.
"""

from __future__ import annotations

import json
from typing import BinaryIO, Optional

import numpy as np

from ..parallel import snapshot
from ..types import IDAccuracy, PositionAccuracy, VelocityAccuracy
from .gadget2 import _read_record, _write_record


def _pick_blocks(n: int, target: int = 4_000_000) -> int:
    nb = max(1, n // target)
    while n % nb:
        nb -= 1
    return nb


def _json_safe(v):
    a = np.asarray(v)
    if a.dtype.kind in "iufb":
        return a.tolist()
    return str(v)


def compress(h5_path: str, out_fp: BinaryIO,
             pos_delta: float = 1e-3,
             vel_delta: float = 1.0,
             part_types: Optional[list] = None,
             seed: int = 0) -> dict:
    """Illustris HDF5 snapshot -> .il.min."""
    import h5py

    stats = {"types": {}}
    with h5py.File(h5_path, "r") as f:
        hdr = dict(f["Header"].attrs)
        box = float(np.atleast_1d(hdr.get("BoxSize", 0.0))[0])
        meta = {
            "box_size": box,
            "redshift": float(np.atleast_1d(hdr.get("Redshift", 0.0))[0]),
            "time": float(np.atleast_1d(hdr.get("Time", 0.0))[0]),
            "attrs": {k: _json_safe(v) for k, v in hdr.items()},
            "part_types": [],
        }
        types = sorted(part_types if part_types is not None else
                       [k for k in f.keys() if k.startswith("PartType")])
        # Meta first, from shapes only (no data loaded yet).
        for t in types:
            g = f[t]
            if "Coordinates" not in g:
                continue
            n = int(g["Coordinates"].shape[0])
            entry = {"name": t, "n": n, "blocks": _pick_blocks(n),
                     "has_vel": "Velocities" in g,
                     "has_ids": "ParticleIDs" in g,
                     "pos_offset": [0.0, 0.0, 0.0]}
            if box == 0.0:
                # Non-periodic: shift by the per-dim minimum so the
                # periodic rewrap never touches real data.
                lo = np.asarray(g["Coordinates"]).min(axis=0)
                entry["pos_offset"] = [float(v) for v in lo]
            meta["part_types"].append(entry)

        # The JSON record length depends only on shapes/offsets above.
        _write_record(out_fp, json.dumps(meta).encode())

        # One type at a time: peak memory is a single type's arrays.
        for entry in meta["part_types"]:
            g = f[entry["name"]]
            pos = np.ascontiguousarray(
                np.asarray(g["Coordinates"], dtype=np.float32).T)
            off = np.asarray(entry["pos_offset"], dtype=np.float32)
            if off.any():
                pos = pos - off[:, None]
            vel = np.ascontiguousarray(
                np.asarray(g["Velocities"], dtype=np.float32).T) \
                if entry["has_vel"] else None
            ids = np.asarray(g["ParticleIDs"], dtype=np.uint64) \
                if entry["has_ids"] else None
            if box:
                width = box
            else:
                # Non-periodic: the codec's position path is periodic, so
                # pick width > 2x the data range -- undo_periodic then
                # never unwraps (everything is within width/2 of any
                # anchor) and dithered decodes can't cross a boundary.
                width = max(float(pos.max()) * 2.01, 1e-6)
            grid = int(np.ceil((float(ids.max()) + 1) ** (1 / 3))) \
                if ids is not None else 0
            spec = snapshot.SnapshotSpec(
                pos=PositionAccuracy(delta=pos_delta, width=width),
                vel=VelocityAccuracy(delta=vel_delta) if vel is not None
                else None,
                ids=IDAccuracy(width=grid) if ids is not None else None)
            st = snapshot.compress_snapshot(out_fp, pos, vel, ids, spec,
                                            entry["blocks"], seed)
            stats["types"][entry["name"]] = st
    stats["meta"] = meta
    return stats


def decompress(in_fp: BinaryIO, h5_path: str) -> dict:
    """.il.min -> Illustris HDF5 snapshot."""
    import h5py

    from ..segment import io as seg_io
    from ..segment.api import decompress_segment
    from ..types import FieldCode

    meta = json.loads(_read_record(in_fp).decode())
    with h5py.File(h5_path, "w") as f:
        hdr = f.create_group("Header")
        for k, v in meta.get("attrs", {}).items():
            hdr.attrs[k] = v
        hdr.attrs["BoxSize"] = meta["box_size"]
        hdr.attrs["Redshift"] = meta["redshift"]
        hdr.attrs["Time"] = meta["time"]
        for ti in meta["part_types"]:
            # Each type's chained segments end with NextIOHeader = 0;
            # iter_segments consumes exactly one chain (with the corrupt-
            # chain advance guard) and leaves the file positioned at the
            # next type's chain.
            chain = list(seg_io.iter_segments(in_fp))
            if len(chain) != ti["blocks"]:
                raise ValueError(
                    f"{ti['name']}: expected {ti['blocks']} chained "
                    f"segments, found {len(chain)}")
            pos_parts, vel_parts, id_parts = [], [], []
            for _io_hd, seg_bytes in chain:
                seg = decompress_segment(seg_bytes, fused=True)
                for fld in seg.fields:
                    arr = np.asarray(fld.data)
                    if fld.hd.field_code == FieldCode.POSN:
                        pos_parts.append(arr)
                    elif fld.hd.field_code == FieldCode.VELC:
                        vel_parts.append(arr)
                    elif fld.hd.field_code == FieldCode.PTID:
                        id_parts.append(arr)
            g = f.create_group(ti["name"])
            pos = np.concatenate(pos_parts, axis=1)
            off = np.asarray(ti.get("pos_offset", [0.0] * 3),
                             dtype=np.float32)
            if off.any():
                pos = pos + off[:, None]
            g.create_dataset("Coordinates",
                             data=pos.T.astype(np.float32))
            if vel_parts:
                g.create_dataset(
                    "Velocities",
                    data=np.concatenate(vel_parts,
                                        axis=1).T.astype(np.float32))
            if id_parts:
                g.create_dataset("ParticleIDs",
                                 data=np.concatenate(id_parts))
    return meta
