"""ctypes bindings for the native ETL kernels (fastetl.cpp).

Builds lazily with g++ on first use (no pybind11 in this environment; the
ABI is plain C + numpy pointers). Every entry point has a pure-Python
fallback, so the package works without a toolchain — the native path is a
host-throughput optimization, not a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
import zlib
from typing import Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastetl.cpp")
_LIB = os.path.join(_DIR, "libfastetl.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(
            _LIB
        ) < os.path.getmtime(_SRC):
            try:
                subprocess.run(
                    [
                        "g++", "-O3", "-shared", "-fPIC", _SRC,
                        "-o", _LIB, "-lz",
                    ],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except (subprocess.SubprocessError, FileNotFoundError):
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.parse_ml1m_ratings.restype = ctypes.c_int64
        lib.parse_ml1m_ratings.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        lib.crc32_bucket.restype = None
        lib.crc32_bucket.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.pack_bags.restype = None
        lib.pack_bags.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def parse_ml1m_ratings(
    path: str, max_rows: int = 1_100_000
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Fast ratings.dat parse -> (uid, mid, rating, ts) int64 arrays.
    Returns None when the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    uid = np.empty(max_rows, np.int64)
    mid = np.empty(max_rows, np.int64)
    rating = np.empty(max_rows, np.int64)
    ts = np.empty(max_rows, np.int64)
    n = lib.parse_ml1m_ratings(
        path.encode(), _i64p(uid), _i64p(mid), _i64p(rating), _i64p(ts),
        max_rows,
    )
    if n < 0:
        raise FileNotFoundError(path)
    return uid[:n], mid[:n], rating[:n], ts[:n]


def crc32_bucket(values: Sequence, num_buckets: int) -> np.ndarray:
    """Batched CRC32 % buckets. Falls back to the Python loop."""
    lib = _load()
    encoded = [
        v if isinstance(v, bytes) else str(v).encode("utf-8")
        for v in values
    ]
    if lib is None:
        return np.asarray(
            [zlib.crc32(b) % num_buckets for b in encoded], np.int32
        )
    buf = b"".join(encoded)
    offsets = np.zeros(len(encoded) + 1, np.int64)
    np.cumsum([len(b) for b in encoded], out=offsets[1:])
    out = np.empty(len(encoded), np.int32)
    lib.crc32_bucket(buf, _i64p(offsets), len(encoded), num_buckets, _i32p(out))
    return out


def pack_bags(
    flat_ids: np.ndarray, row_offsets: np.ndarray, max_len: int
) -> Tuple[np.ndarray, np.ndarray]:
    """CSR bags -> padded (N, L) ids + weights."""
    n_rows = len(row_offsets) - 1
    flat_ids = np.ascontiguousarray(flat_ids, np.int32)
    row_offsets = np.ascontiguousarray(row_offsets, np.int64)
    ids = np.empty((n_rows, max_len), np.int32)
    wt = np.empty((n_rows, max_len), np.float32)
    lib = _load()
    if lib is None:
        ids[:] = 0
        wt[:] = 0.0
        for r in range(n_rows):
            lo, hi = row_offsets[r], min(
                row_offsets[r + 1], row_offsets[r] + max_len
            )
            ids[r, : hi - lo] = flat_ids[lo:hi]
            wt[r, : hi - lo] = 1.0
        return ids, wt
    lib.pack_bags(
        _i32p(flat_ids), _i64p(row_offsets), n_rows, max_len,
        _i32p(ids), _f32p(wt),
    )
    return ids, wt
