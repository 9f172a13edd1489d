"""Bit-exact parity oracle: compiles the *reference* C library (read-only at
/root/reference) into a shared object under /tmp and exposes its kernels via
ctypes.  No reference code is copied into this repository -- the reference
build is used purely as a test-time oracle, exactly as SURVEY.md section 7
prescribes ("bit-exact differ against a small C reference build").

The reference's ``util_EntropyEncode`` needs LZ4 (a git submodule that is
not checked out), so we generate a minimal ``lz4.h`` declaring the three
functions it uses and link against the system liblz4.  If anything fails to
build, tests that need the oracle are skipped.
"""

from __future__ import annotations

import ctypes
import glob
import os
import subprocess

import numpy as np

REF_SRC = "/root/reference/src"
BUILD_DIR = "/tmp/minnow_ref_oracle"
LIB = os.path.join(BUILD_DIR, "libminnow_ref.so")

_LZ4_H = """
#ifndef LZ4_STUB_H
#define LZ4_STUB_H
int LZ4_compressBound(int inputSize);
int LZ4_compress_fast(const char* src, char* dst, int srcSize,
                      int dstCapacity, int acceleration);
int LZ4_decompress_fast(const char* src, char* dst, int originalSize);
#endif
"""

_lib = None
_build_failed = False


def _find_system_lz4():
    for cand in ("/lib/x86_64-linux-gnu/liblz4.so",
                 "/lib/x86_64-linux-gnu/liblz4.so.1",
                 "/usr/lib/x86_64-linux-gnu/liblz4.so.1"):
        if os.path.exists(cand):
            return cand
    hits = glob.glob("/usr/lib/**/liblz4.so*", recursive=True)
    return hits[0] if hits else None


def build():
    global _build_failed
    if os.path.exists(LIB):
        return LIB
    if _build_failed:
        return None
    os.makedirs(BUILD_DIR, exist_ok=True)
    with open(os.path.join(BUILD_DIR, "lz4.h"), "w") as f:
        f.write(_LZ4_H)
    lz4 = _find_system_lz4()
    srcs = [os.path.join(REF_SRC, s)
            for s in ("util.c", "rand.c", "seq.c", "semver.c")]
    cmd = ["gcc", "-O2", "-fPIC", "-shared", "-I", REF_SRC, "-I", BUILD_DIR,
           "-o", LIB] + srcs
    if lz4:
        cmd.append(lz4)
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except subprocess.CalledProcessError as e:
        _build_failed = True
        print("reference oracle build failed:", e.stderr[:2000])
        return None
    return LIB


def lib():
    """ctypes handle to the reference library, or None if unbuildable."""
    global _lib
    if _lib is not None:
        return _lib
    path = build()
    if path is None:
        return None
    _lib = ctypes.CDLL(path)
    return _lib


# --- thin wrappers over reference entry points (struct-by-value Seqs) ---

class _Seq(ctypes.Structure):
    """Matches the reference's {Data*, int32 Len, int32 Cap} layout
    (base_seq.h:30-33)."""

    _fields_ = [("Data", ctypes.c_void_p), ("Len", ctypes.c_int32),
                ("Cap", ctypes.c_int32)]


def _wrap_seq(arr: np.ndarray) -> _Seq:
    s = _Seq()
    s.Data = arr.ctypes.data_as(ctypes.c_void_p).value
    s.Len = arr.shape[0]
    s.Cap = arr.shape[0]
    return s


class _BigSeq(ctypes.Structure):
    """{Data*, int64 Len, int64 Cap} (base_seq.h:76-79)."""

    _fields_ = [("Data", ctypes.c_void_p), ("Len", ctypes.c_int64),
                ("Cap", ctypes.c_int64)]


def ref_checksum(data: bytes) -> int:
    l = lib()
    arr = np.frombuffer(data, dtype=np.uint8)
    s = _BigSeq()
    s.Data = arr.ctypes.data_as(ctypes.c_void_p).value
    s.Len = arr.shape[0]
    l.util_Checksum.restype = ctypes.c_uint32
    l.util_Checksum.argtypes = [_BigSeq]
    return int(l.util_Checksum(s))


def ref_uniform_pack(x: np.ndarray, width: int) -> np.ndarray:
    """Call util_U32UniformPack through the reference, letting it allocate
    the output (empty buf)."""
    l = lib()
    l.util_U32UniformPack.restype = _Seq
    l.util_U32UniformPack.argtypes = [_Seq, ctypes.c_uint8, _Seq]
    x = np.ascontiguousarray(x, dtype=np.uint32)
    out = l.util_U32UniformPack(_wrap_seq(x), width, _Seq())
    n = out.Len
    if n == 0:
        return np.zeros(0, dtype=np.uint32)
    return np.ctypeslib.as_array(
        ctypes.cast(out.Data, ctypes.POINTER(ctypes.c_uint32)),
        shape=(n,)).copy()


def ref_uniform_unpack(x: np.ndarray, width: int, n: int) -> np.ndarray:
    l = lib()
    l.util_U32UndoUniformPack.restype = _Seq
    l.util_U32UndoUniformPack.argtypes = [_Seq, ctypes.c_uint8,
                                          ctypes.c_int32, _Seq]
    x = np.ascontiguousarray(x, dtype=np.uint32)
    out = l.util_U32UndoUniformPack(_wrap_seq(x), width, n, _Seq())
    if out.Len == 0:
        return np.zeros(0, dtype=np.uint32)
    return np.ctypeslib.as_array(
        ctypes.cast(out.Data, ctypes.POINTER(ctypes.c_uint32)),
        shape=(out.Len,)).copy()


def ref_uniform_bin_index(x: np.ndarray, level: int, x0: float,
                          dx: float) -> np.ndarray:
    l = lib()
    l.util_UniformBinIndex.restype = _Seq
    l.util_UniformBinIndex.argtypes = [_Seq, ctypes.c_uint8, ctypes.c_float,
                                       ctypes.c_float, _Seq]
    x = np.ascontiguousarray(x, dtype=np.float32)
    out = l.util_UniformBinIndex(_wrap_seq(x), level, x0, dx, _Seq())
    if out.Len == 0:
        return np.zeros(0, dtype=np.uint64)
    return np.ctypeslib.as_array(
        ctypes.cast(out.Data, ctypes.POINTER(ctypes.c_uint64)),
        shape=(out.Len,)).copy()


def ref_rand_floats(seed: int, count: int) -> np.ndarray:
    """rand_Seed(seed, 1) then count rand_Float draws."""
    l = lib()
    l.rand_Seed.restype = ctypes.c_void_p
    l.rand_Seed.argtypes = [ctypes.c_uint64, ctypes.c_int32]
    l.rand_Float.restype = ctypes.c_float
    l.rand_Float.argtypes = [ctypes.c_void_p]
    state = l.rand_Seed(seed, 1)
    return np.array([l.rand_Float(state) for _ in range(count)],
                    dtype=np.float32)


def ref_rand_u64(seed: int, count: int, streams: int = 1,
                 stream: int = 0) -> np.ndarray:
    l = lib()
    l.rand_Seed.restype = ctypes.c_void_p
    l.rand_Seed.argtypes = [ctypes.c_uint64, ctypes.c_int32]
    l.rand_Uint64.restype = ctypes.c_uint64
    l.rand_Uint64.argtypes = [ctypes.c_void_p]
    state = l.rand_Seed(seed, streams)
    ptr = state + 16 * stream  # rand_State = uint64_t[2]
    return np.array([l.rand_Uint64(ptr) for _ in range(count)],
                    dtype=np.uint64)


def ref_periodic(x: np.ndarray, L: float) -> np.ndarray:
    """util_Periodic (util.c:70-84); in-place on a copy."""
    l = lib()
    l.util_Periodic.restype = None
    l.util_Periodic.argtypes = [_Seq, ctypes.c_float]
    x = np.ascontiguousarray(x, dtype=np.float32).copy()
    l.util_Periodic(_wrap_seq(x), L)
    return x


def ref_undo_periodic(x: np.ndarray, L: float) -> np.ndarray:
    """util_UndoPeriodic (util.c:97-113); in-place on a copy."""
    l = lib()
    l.util_UndoPeriodic.restype = None
    l.util_UndoPeriodic.argtypes = [_Seq, ctypes.c_float]
    x = np.ascontiguousarray(x, dtype=np.float32).copy()
    l.util_UndoPeriodic(_wrap_seq(x), L)
    return x


def ref_u64_periodic(x: np.ndarray, L: int) -> np.ndarray:
    l = lib()
    l.util_U64Periodic.restype = None
    l.util_U64Periodic.argtypes = [_Seq, ctypes.c_uint64]
    x = np.ascontiguousarray(x, dtype=np.uint64).copy()
    l.util_U64Periodic(_wrap_seq(x), L)
    return x


def ref_u64_undo_periodic(x: np.ndarray, L: int) -> np.ndarray:
    l = lib()
    l.util_U64UndoPeriodic.restype = None
    l.util_U64UndoPeriodic.argtypes = [_Seq, ctypes.c_uint64]
    x = np.ascontiguousarray(x, dtype=np.uint64).copy()
    l.util_U64UndoPeriodic(_wrap_seq(x), L)
    return x


def ref_transpose_bytes(x: np.ndarray) -> np.ndarray:
    """util_U32TransposeBytes (util.c:244-259)."""
    l = lib()
    l.util_U32TransposeBytes.restype = _Seq
    l.util_U32TransposeBytes.argtypes = [_Seq, _Seq]
    x = np.ascontiguousarray(x, dtype=np.uint32)
    out = l.util_U32TransposeBytes(_wrap_seq(x), _Seq())
    if out.Len == 0:
        return np.zeros(0, dtype=np.uint8)
    return np.ctypeslib.as_array(
        ctypes.cast(out.Data, ctypes.POINTER(ctypes.c_uint8)),
        shape=(out.Len,)).copy()


def ref_undo_transpose_bytes(x: np.ndarray) -> np.ndarray:
    l = lib()
    l.util_U32UndoTransposeBytes.restype = _Seq
    l.util_U32UndoTransposeBytes.argtypes = [_Seq, _Seq]
    x = np.ascontiguousarray(x, dtype=np.uint8)
    out = l.util_U32UndoTransposeBytes(_wrap_seq(x), _Seq())
    if out.Len == 0:
        return np.zeros(0, dtype=np.uint32)
    return np.ctypeslib.as_array(
        ctypes.cast(out.Data, ctypes.POINTER(ctypes.c_uint32)),
        shape=(out.Len,)).copy()


def ref_u8_delta_encode(x: np.ndarray) -> np.ndarray:
    l = lib()
    l.util_U8DeltaEncode.restype = _Seq
    l.util_U8DeltaEncode.argtypes = [_Seq, _Seq]
    x = np.ascontiguousarray(x, dtype=np.uint8)
    out = l.util_U8DeltaEncode(_wrap_seq(x), _Seq())
    if out.Len == 0:
        return np.zeros(0, dtype=np.uint8)
    return np.ctypeslib.as_array(
        ctypes.cast(out.Data, ctypes.POINTER(ctypes.c_uint8)),
        shape=(out.Len,)).copy()


def ref_bin_index(x: np.ndarray, levels: np.ndarray, x0: float,
                  dx: float) -> np.ndarray:
    """util_BinIndex with per-element depths (util.c:145-170)."""
    l = lib()
    l.util_BinIndex.restype = _Seq
    l.util_BinIndex.argtypes = [_Seq, _Seq, ctypes.c_float,
                                ctypes.c_float, _Seq]
    x = np.ascontiguousarray(x, dtype=np.float32)
    levels = np.ascontiguousarray(levels, dtype=np.uint8)
    out = l.util_BinIndex(_wrap_seq(x), _wrap_seq(levels), x0, dx, _Seq())
    if out.Len == 0:
        return np.zeros(0, dtype=np.uint64)
    return np.ctypeslib.as_array(
        ctypes.cast(out.Data, ctypes.POINTER(ctypes.c_uint64)),
        shape=(out.Len,)).copy()


def ref_lz4_available() -> bool:
    l = lib()
    if l is None:
        return False
    try:
        l.LZ4_compressBound
        return True
    except AttributeError:
        return False
