"""ctypes binding for the native host-side packing codec (csrc/packlib.cpp).

Builds the shared library on first use when a compiler is available
(mirroring the reference's on-install CUDA extension build,
setup.py:130-195 — here it is a dependency-free g++ one-liner), and
degrades silently to the numpy implementations in quant/layouts.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from ..utils.logger import get_logger

logger = get_logger()

__all__ = [
    "available",
    "pack_fields_rows",
    "unpack_fields_rows",
    "pack_bitstream_rows",
    "unpack_bitstream_rows",
]

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATH = os.path.abspath(os.path.join(_CSRC, "libpacklib.so"))
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(_CSRC, "packlib.cpp")
    try:
        if (
            not os.path.exists(_LIB_PATH)
            or os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)
        ) and not os.environ.get("QLLM_TPU_NO_NATIVE_BUILD"):
            subprocess.run(
                ["make", "-C", os.path.abspath(_CSRC)],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        i64, i32p, u32p, ci = (
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int,
        )
        lib.pack_fields_rows.argtypes = [i32p, u32p, i64, i64, ci]
        lib.unpack_fields_rows.argtypes = [u32p, i32p, i64, i64, ci]
        lib.pack_bitstream_rows.argtypes = [i32p, u32p, i64, i64, ci]
        lib.unpack_bitstream_rows.argtypes = [u32p, i32p, i64, i64, ci]
        lib.awq_interleave_cols.argtypes = [i32p, i32p, i64, i64, ci]
        lib.packlib_version.restype = ctypes.c_int
        assert lib.packlib_version() == 1
        _LIB = lib
        logger.debug("native packlib loaded")
    except Exception as e:  # pragma: no cover - env dependent
        logger.debug(f"native packlib unavailable ({e}); using numpy path")
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def _i32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _u32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def pack_fields_rows(q: np.ndarray, bits: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    q = np.ascontiguousarray(q, np.int32)
    K, N = q.shape
    out = np.empty((K // (32 // bits), N), np.uint32)
    lib.pack_fields_rows(_i32(q), _u32(out), K, N, bits)
    return out


def unpack_fields_rows(p: np.ndarray, bits: int, K: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    p = np.ascontiguousarray(p).view(np.uint32)
    N = p.shape[1]
    out = np.empty((K, N), np.int32)
    lib.unpack_fields_rows(_u32(p), _i32(out), K, N, bits)
    return out


def pack_bitstream_rows(q: np.ndarray, bits: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    q = np.ascontiguousarray(q, np.int32)
    K, N = q.shape
    out = np.empty((K * bits // 32, N), np.uint32)
    lib.pack_bitstream_rows(_i32(q), _u32(out), K, N, bits)
    return out.view(np.int32)  # match the numpy reference dtype


def unpack_bitstream_rows(
    p: np.ndarray, bits: int, K: int
) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    p = np.ascontiguousarray(p).view(np.uint32)
    N = p.shape[1]
    out = np.empty((K, N), np.int32)
    lib.unpack_bitstream_rows(_u32(p), _i32(out), K, N, bits)
    return out
