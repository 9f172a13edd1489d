"""Illustris/IllustrisTNG snapshot driver (the L5 client layer).

The spec's second standardized driver (header_format.tex:37-42): converts
HDF5 snapshots in the Illustris layout -- a ``Header`` group with
``BoxSize``/``NumPart_ThisFile`` attributes and ``PartType<i>`` groups
holding ``Coordinates`` (N, 3), ``Velocities`` (N, 3), and ``ParticleIDs``
(N,) datasets -- into ``*.il.min`` files and back.

The ``.il.min`` layout mirrors the Gadget-2 driver: one Fortran-framed
JSON header record carrying the snapshot attributes and the particle-type
table, followed by chained compressed segments per particle type.
"""

from __future__ import annotations

import json
import struct
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
            "part_types": [],
        }
        types = part_types if part_types is not None else [
            k for k in f.keys() if k.startswith("PartType")]
        payloads = []
        for t in sorted(types):
            g = f[t]
            if "Coordinates" not in g:
                continue
            pos = np.ascontiguousarray(
                np.asarray(g["Coordinates"], dtype=np.float32).T)
            vel = np.ascontiguousarray(
                np.asarray(g["Velocities"], dtype=np.float32).T) \
                if "Velocities" in g else None
            ids = np.asarray(g["ParticleIDs"], dtype=np.uint64) \
                if "ParticleIDs" in g else None
            n = pos.shape[1]
            nb = _pick_blocks(n)
            meta["part_types"].append(
                {"name": t, "n": n, "blocks": nb, "has_vel": vel is not None,
                 "has_ids": ids is not None})
            payloads.append((t, pos, vel, ids, nb))

    _write_record(out_fp, json.dumps(meta).encode())
    for t, pos, vel, ids, nb in payloads:
        width = meta["box_size"] or float(pos.max()) * 1.001
        grid = int(np.ceil((float(ids.max()) + 1) ** (1 / 3))) \
            if ids is not None else 0
        spec = snapshot.SnapshotSpec(
            pos=PositionAccuracy(delta=pos_delta, width=width),
            vel=VelocityAccuracy(delta=vel_delta) if vel is not None
            else None,
            ids=IDAccuracy(width=grid) if ids is not None else None)
        st = snapshot.compress_snapshot(out_fp, pos, vel, ids, spec, nb,
                                        seed)
        stats["types"][t] = st
    stats["meta"] = meta
    return stats


def decompress(in_fp: BinaryIO, h5_path: str) -> dict:
    """.il.min -> Illustris HDF5 snapshot."""
    import h5py

    meta = json.loads(_read_record(in_fp).decode())
    with h5py.File(h5_path, "w") as f:
        hdr = f.create_group("Header")
        hdr.attrs["BoxSize"] = meta["box_size"]
        hdr.attrs["Redshift"] = meta["redshift"]
        hdr.attrs["Time"] = meta["time"]
        for ti in meta["part_types"]:
            # each type's segments are contiguous in the chain; read
            # exactly `blocks` segments for this type
            from ..segment import io as seg_io
            from ..segment.api import decompress_segment
            from ..types import FieldCode
            pos_parts, vel_parts, id_parts = [], [], []
            count = 0
            offset = in_fp.tell()
            while count < ti["blocks"]:
                in_fp.seek(offset)
                raw = in_fp.read(seg_io.IO_HEADER_BYTES)
                io_hd = seg_io.IOHeader.unpack(raw)
                seg = decompress_segment(
                    in_fp.read(io_hd.segment_bytes), fused=True)
                for fld in seg.fields:
                    arr = np.asarray(fld.data)
                    if fld.hd.field_code == FieldCode.POSN:
                        pos_parts.append(arr)
                    elif fld.hd.field_code == FieldCode.VELC:
                        vel_parts.append(arr)
                    elif fld.hd.field_code == FieldCode.PTID:
                        id_parts.append(arr)
                count += 1
                offset = io_hd.next_io_header if io_hd.next_io_header \
                    else in_fp.tell()
            g = f.create_group(ti["name"])
            g.create_dataset(
                "Coordinates",
                data=np.concatenate(pos_parts, axis=1).T.astype(np.float32))
            if vel_parts:
                g.create_dataset(
                    "Velocities",
                    data=np.concatenate(vel_parts,
                                        axis=1).T.astype(np.float32))
            if id_parts:
                g.create_dataset("ParticleIDs",
                                 data=np.concatenate(id_parts))
    return meta
