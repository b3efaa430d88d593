"""ctypes bindings for the native runtime (native/lili_runtime.cc).

The library is auto-built with ``make`` on first import if the shared object
is missing (g++ is part of the toolchain). Every class degrades gracefully:
if the build fails, ``available()`` is False and callers fall back to the
pure-Python paths (io/pcd.py etc.).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "liblili_runtime.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    # signatures
    lib.ring_create.restype = ctypes.c_void_p
    lib.ring_create.argtypes = [ctypes.c_size_t, ctypes.c_size_t]
    lib.ring_destroy.argtypes = [ctypes.c_void_p]
    lib.ring_push.restype = ctypes.c_int
    lib.ring_push.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.ring_pop.restype = ctypes.c_int
    lib.ring_pop.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.ring_size.restype = ctypes.c_size_t
    lib.ring_size.argtypes = [ctypes.c_void_p]
    lib.seq_create.restype = ctypes.c_void_p
    lib.seq_create.argtypes = [ctypes.c_int, ctypes.c_double]
    lib.seq_destroy.argtypes = [ctypes.c_void_p]
    lib.seq_push.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_double, ctypes.c_uint64]
    lib.seq_try_pop.restype = ctypes.c_int
    lib.seq_try_pop.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_double),
                                ctypes.POINTER(ctypes.c_uint64)]
    lib.pcd_write.restype = ctypes.c_int
    lib.pcd_write.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                              ctypes.c_uint64, ctypes.c_int]
    lib.log_writer_open.restype = ctypes.c_void_p
    lib.log_writer_open.argtypes = [ctypes.c_char_p]
    lib.log_writer_append.restype = ctypes.c_int
    lib.log_writer_append.argtypes = [ctypes.c_void_p, ctypes.c_uint32,
                                      ctypes.c_void_p, ctypes.c_uint32]
    lib.log_writer_close.argtypes = [ctypes.c_void_p]
    lib.log_reader_open.restype = ctypes.c_void_p
    lib.log_reader_open.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    lib.log_reader_peek.restype = ctypes.c_int64
    lib.log_reader_peek.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint32)]
    lib.log_reader_pop.restype = ctypes.c_int
    lib.log_reader_pop.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.log_reader_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class Ring:
    """Lock-free SPSC ring of fixed-size records (bounded topic queue)."""

    def __init__(self, record_size: int, capacity: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._h = lib.ring_create(record_size, capacity)
        self.record_size = record_size

    def push(self, rec: np.ndarray) -> bool:
        rec = np.ascontiguousarray(rec)
        assert rec.nbytes == self.record_size
        return self._lib.ring_push(self._h, rec.ctypes.data_as(ctypes.c_void_p)) == 0

    def pop(self) -> Optional[np.ndarray]:
        out = np.empty(self.record_size, np.uint8)
        if self._lib.ring_pop(self._h, out.ctypes.data_as(ctypes.c_void_p)) != 0:
            return None
        return out

    def __len__(self):
        return int(self._lib.ring_size(self._h))

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.ring_destroy(self._h)
            self._h = None


class Sequencer:
    """Multi-stream stamp aligner (the backend's 5-input gate)."""

    def __init__(self, n_streams: int, tol: float = 0.1):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._h = lib.seq_create(n_streams, tol)
        self.n = n_streams

    def push(self, stream: int, stamp: float, handle: int):
        self._lib.seq_push(self._h, stream, stamp, handle)

    def try_pop(self):
        stamps = (ctypes.c_double * self.n)()
        handles = (ctypes.c_uint64 * self.n)()
        if self._lib.seq_try_pop(self._h, stamps, handles) != 1:
            return None
        return list(stamps), list(handles)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.seq_destroy(self._h)
            self._h = None


def pcd_write_native(path: str, pts: np.ndarray, intensity: np.ndarray | None = None) -> bool:
    lib = _load()
    if lib is None:
        return False
    if intensity is not None:
        data = np.concatenate([np.asarray(pts, np.float32),
                               np.asarray(intensity, np.float32)[:, None]], axis=1)
        nf = 4
    else:
        data = np.asarray(pts, np.float32)
        nf = 3
    data = np.ascontiguousarray(data, np.float32)
    return lib.pcd_write(path.encode(), data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                         data.shape[0], nf) == 0


# record kinds for the dataset log
KIND_SCAN = 1
KIND_IMU = 2
KIND_META = 3


class LogWriter:
    """Dataset record-log writer (the rosbag replacement)."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._h = lib.log_writer_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open {path}")

    def append(self, kind: int, payload: np.ndarray):
        payload = np.ascontiguousarray(payload)
        rc = self._lib.log_writer_append(
            self._h, kind, payload.ctypes.data_as(ctypes.c_void_p), payload.nbytes)
        if rc != 0:
            raise IOError("log append failed")

    def close(self):
        if self._h:
            self._lib.log_writer_close(self._h)
            self._h = None

    def __del__(self):
        self.close()


class LogReader:
    """Dataset record-log reader with native readahead thread."""

    def __init__(self, path: str, readahead: int = 64):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self._h = lib.log_reader_open(path.encode(), readahead)
        if not self._h:
            raise IOError(f"cannot open {path}")

    def __iter__(self):
        return self

    def __next__(self):
        import time

        kind = ctypes.c_uint32()
        while True:
            n = self._lib.log_reader_peek(self._h, ctypes.byref(kind))
            if n == -1:
                raise StopIteration
            if n == -2:
                time.sleep(0.0005)
                continue
            out = np.empty(int(n), np.uint8)
            if self._lib.log_reader_pop(self._h, out.ctypes.data_as(ctypes.c_void_p)) != 0:
                continue
            return int(kind.value), out

    def close(self):
        if self._h:
            self._lib.log_reader_close(self._h)
            self._h = None

    def __del__(self):
        self.close()
