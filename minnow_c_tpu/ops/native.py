"""ctypes bindings to the native host library (``native/minnow_native.cpp``).

Loads ``libminnow_native.so``, building it on first use if the shared object
is missing (mirrors the reference's make-driven lib build,
Makefile:83-101).  All entry points release the GIL for the duration of the
call, so Python-level thread pools achieve real parallelism across
independent fields/blocks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libminnow_native.so")

_lock = threading.Lock()
_lib = None


def _build() -> None:
    subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                   capture_output=True)


def lib() -> ctypes.CDLL:
    """The loaded native library, building it if needed."""
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            _build()
        l = ctypes.CDLL(_LIB_PATH)

        l.mnw_checksum.restype = ctypes.c_uint32
        l.mnw_checksum.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.c_uint32]

        l.mnw_lz4_compress_bound.restype = ctypes.c_int32
        l.mnw_lz4_compress_bound.argtypes = [ctypes.c_int32]

        l.mnw_lz4_compress.restype = ctypes.c_int32
        l.mnw_lz4_compress.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                       ctypes.c_void_p, ctypes.c_int32,
                                       ctypes.c_int32]

        l.mnw_lz4_decompress.restype = ctypes.c_int32
        l.mnw_lz4_decompress.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                         ctypes.c_void_p, ctypes.c_int32]

        l.mnw_uniform_pack.restype = None
        l.mnw_uniform_pack.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                       ctypes.c_int32, ctypes.c_void_p,
                                       ctypes.c_int32]

        l.mnw_uniform_unpack.restype = None
        l.mnw_uniform_unpack.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                         ctypes.c_int32, ctypes.c_void_p,
                                         ctypes.c_int32]
        _lib = l
        return _lib


def uniform_pack_host(x: np.ndarray, width: int) -> np.ndarray:
    """Host bitpack oracle (bit-exact vs the TPU kernel)."""
    from . import bitpack
    x = np.ascontiguousarray(x, dtype=np.uint32)
    n_words = bitpack.packed_words(x.shape[0], width)
    out = np.zeros(n_words, dtype=np.uint32)
    lib().mnw_uniform_pack(x.ctypes.data, x.shape[0], width, out.ctypes.data,
                           n_words)
    return out


def uniform_unpack_host(x: np.ndarray, width: int, n: int) -> np.ndarray:
    x = np.ascontiguousarray(x, dtype=np.uint32)
    out = np.zeros(n, dtype=np.uint32)
    lib().mnw_uniform_unpack(x.ctypes.data, x.shape[0], width,
                             out.ctypes.data, n)
    return out
