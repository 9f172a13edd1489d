"""Gadget-2 snapshot driver (the L5 client layer).

The spec ships standardized drivers that compress Gadget-2 and Illustris
snapshots into ``*.g2.min`` files (header_format.tex:37-42); the reference
repo itself contains none -- this module provides the Gadget-2 one.

Reads the classic Gadget-2 "format 1" binary snapshot layout (public
format: 256-byte header record with particle counts/masses/cosmology,
followed by POS (3xN f32), VEL (3xN f32), ID (N u32/u64) records, each
wrapped in Fortran-style 4-byte length markers), then compresses the
fields through the snapshot pipeline into a chained-segment ``.min`` file.
``decompress_to_arrays`` reads a ``.min`` back.

The driver honors the client-duty split (spec table 1): it owns
segmenting (the ``num_blocks`` choice), accuracy targets, and file
open/close; the library owns compression and format.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import BinaryIO, Optional, Tuple

import numpy as np

from ..parallel import snapshot
from ..types import IDAccuracy, PositionAccuracy, VelocityAccuracy

HEADER_BYTES = 256


@dataclass
class Gadget2Header:
    npart: Tuple[int, ...]  # 6 particle types
    mass: Tuple[float, ...]
    time: float
    redshift: float
    box_size: float
    omega0: float
    omega_lambda: float
    hubble_param: float
    # Original 256-byte record: pack() starts from it, so fields this
    # driver does not model (flag_sfr/feedback, npartTotal, flag_cooling,
    # num_files, trailing entries) round-trip losslessly.
    raw: bytes = b""

    @classmethod
    def unpack(cls, raw: bytes) -> "Gadget2Header":
        npart = struct.unpack("<6I", raw[0:24])
        mass = struct.unpack("<6d", raw[24:72])
        time, redshift = struct.unpack("<2d", raw[72:88])
        # bytes 88-128: flag_sfr, flag_feedback, npartTotal[6],
        # flag_cooling, num_files (preserved via ``raw``); BoxSize and
        # the cosmology doubles start at byte 128 of struct io_header.
        box_size, omega0, omega_lambda, hubble = struct.unpack(
            "<4d", raw[128:160])
        return cls(npart=npart, mass=mass, time=time, redshift=redshift,
                   box_size=box_size, omega0=omega0,
                   omega_lambda=omega_lambda, hubble_param=hubble,
                   raw=bytes(raw[:HEADER_BYTES]).ljust(HEADER_BYTES,
                                                       b"\x00"))

    def pack(self) -> bytes:
        raw = bytearray(self.raw) if len(self.raw) == HEADER_BYTES \
            else bytearray(HEADER_BYTES)
        raw[0:24] = struct.pack("<6I", *self.npart)
        raw[24:72] = struct.pack("<6d", *self.mass)
        raw[72:88] = struct.pack("<2d", self.time, self.redshift)
        raw[128:160] = struct.pack("<4d", self.box_size, self.omega0,
                                   self.omega_lambda, self.hubble_param)
        return bytes(raw)


def _read_record(fp: BinaryIO) -> bytes:
    """One Fortran-style record: [u32 len][payload][u32 len]."""
    head = fp.read(4)
    if len(head) < 4:
        raise EOFError("unexpected end of Gadget-2 file")
    (n,) = struct.unpack("<I", head)
    payload = fp.read(n)
    tail = fp.read(4)
    if len(payload) != n or struct.unpack("<I", tail)[0] != n:
        raise ValueError("corrupt Gadget-2 record framing")
    return payload


def _write_record(fp: BinaryIO, payload: bytes) -> None:
    fp.write(struct.pack("<I", len(payload)))
    fp.write(payload)
    fp.write(struct.pack("<I", len(payload)))


def read_snapshot(fp: BinaryIO
                  ) -> Tuple[Gadget2Header, np.ndarray, np.ndarray,
                             np.ndarray]:
    """Read header, positions (3, n), velocities (3, n), IDs (n,)."""
    hdr = Gadget2Header.unpack(_read_record(fp))
    n = sum(hdr.npart)
    pos = np.frombuffer(_read_record(fp), dtype="<f4").reshape(n, 3).T
    vel = np.frombuffer(_read_record(fp), dtype="<f4").reshape(n, 3).T
    id_rec = _read_record(fp)
    id_dtype = "<u8" if len(id_rec) == 8 * n else "<u4"
    ids = np.frombuffer(id_rec, dtype=id_dtype).astype(np.uint64)
    return hdr, np.ascontiguousarray(pos), np.ascontiguousarray(vel), ids


def write_snapshot(fp: BinaryIO, hdr: Gadget2Header, pos: np.ndarray,
                   vel: np.ndarray, ids: np.ndarray) -> None:
    """Write a format-1 Gadget-2 snapshot (inverse of read_snapshot)."""
    _write_record(fp, hdr.pack())
    _write_record(fp, np.ascontiguousarray(pos.T, dtype="<f4").tobytes())
    _write_record(fp, np.ascontiguousarray(vel.T, dtype="<f4").tobytes())
    _write_record(fp, ids.astype("<u8").tobytes())


def compress(in_fp: BinaryIO, out_fp: BinaryIO,
             pos_delta: float = 1e-3,
             vel_delta: float = 1.0,
             id_grid_width: Optional[int] = None,
             num_blocks: Optional[int] = None,
             seed: int = 0,
             scale_mode: str = "div") -> dict:
    """Gadget-2 snapshot -> .g2.min: the raw header is written first as one
    Fortran-style record, then the chained compressed segments."""
    hdr, pos, vel, ids = read_snapshot(in_fp)
    n = ids.shape[0]
    import warnings
    for i in range(6):
        if hdr.npart[i] and hdr.mass[i] == 0.0:
            warnings.warn(
                f"particle type {i} uses a per-particle MASS record "
                "(mass table 0 with npart > 0); this driver compresses "
                "POS/VEL/ID only -- the MASS data will be dropped")
            break
    if in_fp.read(1):
        warnings.warn("trailing Gadget-2 records beyond POS/VEL/ID are "
                      "not compressed and will be dropped")
    if num_blocks is None:
        # nearest divisor of n to the <10^7-particles-per-segment target
        target = max(1, n // 4_000_000)
        down = target
        while down > 1 and n % down:
            down -= 1
        up = target
        while up < n and n % up:
            up += 1
        num_blocks = down if (target - down) <= (up - target) else up
        if n // num_blocks > 10_000_000:
            raise ValueError(
                f"n={n} has no block count near the 10^7-particle "
                "segment limit (spec, header_format.tex:120-127); pass "
                "num_blocks explicitly or pad the input")
    if id_grid_width is None:
        id_grid_width = int(np.ceil((float(ids.max()) + 1) ** (1 / 3)))
    spec = snapshot.SnapshotSpec(
        pos=PositionAccuracy(delta=pos_delta, width=hdr.box_size),
        vel=VelocityAccuracy(delta=vel_delta),
        ids=IDAccuracy(width=id_grid_width))
    _write_record(out_fp, hdr.pack())
    stats = snapshot.compress_snapshot(out_fp, pos, vel, ids, spec,
                                       num_blocks, seed,
                                       scale_mode=scale_mode)
    stats["n"] = n
    return stats


def decompress(in_fp: BinaryIO, out_fp: BinaryIO) -> Gadget2Header:
    """.g2.min -> Gadget-2 snapshot."""
    hdr = Gadget2Header.unpack(_read_record(in_fp))
    fields = snapshot.decompress_snapshot(in_fp)
    write_snapshot(out_fp, hdr, fields["pos"], fields["vel"], fields["ids"])
    return hdr
