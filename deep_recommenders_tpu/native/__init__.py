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
_SRCS = [
    os.path.join(_DIR, "fastetl.cpp"),
    os.path.join(_DIR, "loader.cpp"),
]
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
        if not os.path.exists(_LIB) or any(
            os.path.getmtime(_LIB) < os.path.getmtime(s) for s in _SRCS
        ):
            try:
                subprocess.run(
                    [
                        "g++", "-O3", "-shared", "-fPIC", *_SRCS,
                        "-o", _LIB, "-lz", "-lpthread",
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
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_create.argtypes = [
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_uint64,
            ctypes.c_int,
        ]
        lib.loader_slot_ptrs.restype = None
        lib.loader_slot_ptrs.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_void_p),
        ]
        lib.loader_acquire.restype = ctypes.c_int64
        lib.loader_acquire.argtypes = [ctypes.c_void_p]
        lib.loader_release.restype = None
        lib.loader_release.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.loader_destroy.restype = None
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
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


class NativeStreamLoader:
    """Background-prefetch batch iterator over an encoded in-RAM corpus.

    The tf.data replacement for the STREAMING path (corpora too large for
    DeviceData's upload-once design): a C++ producer thread (loader.cpp)
    gathers shuffled batch rows into a ring of pre-allocated slots ahead of
    consumption, so host batch assembly overlaps device compute. Each
    ``next_batch()`` returns zero-copy numpy views of a ready slot; the slot
    is recycled on the following call (jax.device_put copies host buffers,
    so handing the previous views back is safe).

    Falls back to synchronous numpy gathers when the native lib is missing.
    Epochs cycle forever with per-epoch reshuffles; the remainder batch is
    dropped (reference take/skip semantics, ref datasets/movielens.py:148-168
    count full batches the same way).
    """

    def __init__(
        self,
        features: dict,
        labels: np.ndarray,
        batch_size: int,
        capacity: int = 4,
        seed: int = 42,
        shuffle: bool = True,
    ):
        self._names = list(features.keys()) + ["__labels__"]
        self._arrays = [
            np.ascontiguousarray(features[k]) for k in features
        ] + [np.ascontiguousarray(labels)]
        n_rows = self._arrays[0].shape[0]
        for a in self._arrays:
            if a.shape[0] != n_rows:
                raise ValueError("all columns must share the leading dim")
        if n_rows < batch_size:
            raise ValueError("corpus smaller than one batch")
        self.batch_size = batch_size
        self.num_examples = n_rows
        self.steps_per_epoch = n_rows // batch_size
        self._seed = seed
        self._shuffle = shuffle
        self._lib = _load()
        self._handle = None
        self._pending_slot = None

        if self._lib is not None:
            n_cols = len(self._arrays)
            col_ptrs = (ctypes.c_void_p * n_cols)(
                *[a.ctypes.data_as(ctypes.c_void_p).value
                  for a in self._arrays]
            )
            row_bytes = (ctypes.c_int64 * n_cols)(
                *[a.strides[0] for a in self._arrays]
            )
            self._handle = self._lib.loader_create(
                n_cols, col_ptrs, row_bytes, n_rows, batch_size,
                capacity, seed, int(shuffle),
            )
            if not self._handle:
                self._lib = None
        if self._lib is not None:
            # wrap every slot's buffers as numpy views once
            self._slot_views = []
            n_cols = len(self._arrays)
            for s in range(capacity):
                ptrs = (ctypes.c_void_p * n_cols)()
                self._lib.loader_slot_ptrs(self._handle, s, ptrs)
                views = []
                for c, a in enumerate(self._arrays):
                    buf_t = ctypes.c_char * (batch_size * a.strides[0])
                    buf = buf_t.from_address(ptrs[c])
                    v = np.frombuffer(buf, dtype=a.dtype).reshape(
                        (batch_size,) + a.shape[1:]
                    )
                    views.append(v)
                self._slot_views.append(views)
        else:
            self._epoch = 0
            self._cursor = 0
            self._perm = self._new_perm()

    # -- pure-python fallback ---------------------------------------------
    def _new_perm(self):
        idx = np.arange(self.num_examples)
        if self._shuffle:
            np.random.default_rng(self._seed + self._epoch).shuffle(idx)
        return idx

    def next_batch(self):
        """-> (features dict, labels), each a numpy array of batch rows."""
        if self._lib is not None:
            if self._pending_slot is not None:
                self._lib.loader_release(self._handle, self._pending_slot)
            s = self._lib.loader_acquire(self._handle)
            if s < 0:
                raise RuntimeError("loader stopped")
            self._pending_slot = s
            views = self._slot_views[s]
            feats = dict(zip(self._names[:-1], views[:-1]))
            return feats, views[-1]
        rows = self._perm[self._cursor : self._cursor + self.batch_size]
        self._cursor += self.batch_size
        if self._cursor + self.batch_size > self.num_examples:
            self._epoch += 1
            self._cursor = 0
            self._perm = self._new_perm()
        feats = {
            k: a[rows]
            for k, a in zip(self._names[:-1], self._arrays[:-1])
        }
        return feats, self._arrays[-1][rows]

    def __iter__(self):
        while True:
            yield self.next_batch()

    def close(self):
        if self._lib is not None and self._handle:
            self._lib.loader_destroy(self._handle)
            self._handle = None
            self._lib = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def epoch_batches(self):
        """One epoch's batches — plugs into Trainer.fit(train_batches=...)."""
        for _ in range(self.steps_per_epoch):
            yield self.next_batch()
