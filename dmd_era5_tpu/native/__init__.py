"""ctypes bindings for the native snapshot packer.

Builds ``libpacker.so`` on first use (g++ is part of the baseline
toolchain; there is no pybind11 in this image, hence the C ABI +
ctypes).  Every entry point has a numpy fallback so the package works
— more slowly — without a compiler.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_LIB_PATH = _HERE / "libpacker.so"

_lib = None
_build_failed = False


def _load() -> ctypes.CDLL | None:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-s", "-C", str(_HERE)],
                check=True,
                capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError):
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _build_failed = True
        return None

    i64 = ctypes.c_int64
    f32p = ctypes.POINTER(ctypes.c_float)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    lib.pack_space_time_f32.argtypes = [f32p, f32p, i64, i64]
    lib.pack_space_time_bf16.argtypes = [f32p, u16p, i64, i64]
    lib.row_stats_f32.argtypes = [f32p, i64, i64, f32p, f32p, ctypes.c_int]
    lib.convert_f32_to_bf16.argtypes = [f32p, u16p, i64]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u16p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))


def pack_space_time(
    snapshots: np.ndarray, bf16: bool = False
) -> np.ndarray:
    """(T, n_space) time-major -> (n_space, T) space-major snapshot matrix.

    With ``bf16=True`` the output is bfloat16 stored as uint16 words
    (reinterpret with ``.view(ml_dtypes.bfloat16)`` or feed to
    ``jnp.asarray`` via the loader).
    """
    snapshots = np.ascontiguousarray(snapshots, dtype=np.float32)
    n_time, n_space = snapshots.shape
    lib = _load()
    if lib is None:
        out = np.ascontiguousarray(snapshots.T)
        if bf16:
            return _numpy_bf16(out)
        return out
    if bf16:
        out16 = np.empty((n_space, n_time), dtype=np.uint16)
        lib.pack_space_time_bf16(_f32p(snapshots), _u16p(out16), n_time, n_space)
        return out16
    out = np.empty((n_space, n_time), dtype=np.float32)
    lib.pack_space_time_f32(_f32p(snapshots), _f32p(out), n_time, n_space)
    return out


def row_stats(x: np.ndarray, ddof: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Per-row (mean, std) of a (rows, cols) float32 matrix, one pass."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    rows, cols = x.shape
    lib = _load()
    if lib is None:
        return x.mean(axis=1), x.std(axis=1, ddof=ddof)
    mean = np.empty(rows, dtype=np.float32)
    std = np.empty(rows, dtype=np.float32)
    lib.row_stats_f32(_f32p(x), rows, cols, _f32p(mean), _f32p(std), ddof)
    return mean, std


def _numpy_bf16(x: np.ndarray) -> np.ndarray:
    bits = x.astype(np.float32).view(np.uint32)
    bias = np.uint32(0x7FFF) + ((bits >> np.uint32(16)) & np.uint32(1))
    return ((bits + bias) >> np.uint32(16)).astype(np.uint16)


def to_bf16_words(x: np.ndarray) -> np.ndarray:
    """fp32 -> bf16 (round-to-nearest-even), returned as uint16 words."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    lib = _load()
    if lib is None:
        return _numpy_bf16(x)
    out = np.empty(x.shape, dtype=np.uint16)
    lib.convert_f32_to_bf16(_f32p(x), _u16p(out.ravel()), x.size)
    return out
