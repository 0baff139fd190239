"""ctypes bindings for the native C++ loader (runtime/native_src/loader.cc).

Compiled on first use with g++ into the package build dir; every entry point
has a NumPy fallback so the engine works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, List, Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "native_src", "loader.cc")
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "native_src", "build")
_SO = os.path.join(_BUILD_DIR, "libliodom_loader.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                os.makedirs(_BUILD_DIR, exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     "-pthread", _SRC, "-o", _SO],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            lib.liodom_read_bin.restype = ctypes.c_long
            lib.liodom_read_bin.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_long]
            lib.liodom_prefetch_create.restype = ctypes.c_void_p
            lib.liodom_prefetch_create.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_long,
                ctypes.c_long, ctypes.c_int, ctypes.c_int]
            lib.liodom_prefetch_next.restype = ctypes.c_long
            lib.liodom_prefetch_next.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
            lib.liodom_prefetch_destroy.restype = None
            lib.liodom_prefetch_destroy.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def read_bin(path: str, cap_points: int = 300000) -> np.ndarray:
    """(N, 4) float32 records from a KITTI velodyne .bin."""
    lib = _load()
    if lib is None:
        return np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    buf = np.empty((cap_points * 4,), np.float32)
    n = lib.liodom_read_bin(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        buf.size)
    if n < 0:
        raise FileNotFoundError(path)
    return buf[:n].reshape(-1, 4)


class Prefetcher:
    """Bounded multithreaded scan prefetcher over a file list.

    Native equivalent of the reference's ingest thread + SharedData FIFO
    (shared_data.cc:37-62) — but bounded (backpressure) and zero-GIL."""

    def __init__(self, paths: List[str], cap_points: int,
                 depth: int = 4, n_threads: int = 2):
        self.paths = list(paths)
        self.cap_points = cap_points
        lib = _load()
        self._lib = lib
        self._i = 0
        if lib is not None:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths])
            self._keepalive = arr
            self._h = lib.liodom_prefetch_create(
                arr, len(self.paths), cap_points, depth, n_threads)
        else:
            self._h = None

    def next(self) -> Optional[Tuple[np.ndarray, int]]:
        """((cap_points, 3) float32 xyz, n_points) or None at end."""
        if self._h is not None:
            out = np.empty((self.cap_points, 3), np.float32)
            n = self._lib.liodom_prefetch_next(
                self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            if n < 0:
                return None
            return out, int(n)
        # fallback: synchronous numpy read
        if self._i >= len(self.paths):
            return None
        rec = np.fromfile(self.paths[self._i], dtype=np.float32)
        self._i += 1
        rec = rec.reshape(-1, 4)[:self.cap_points]
        out = np.zeros((self.cap_points, 3), np.float32)
        out[:len(rec)] = rec[:, :3]
        return out, len(rec)

    def close(self) -> None:
        if self._h is not None:
            self._lib.liodom_prefetch_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def iter_padded(paths: List[str], capacity: int, prefetch: int = 2
                ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield (xyz (capacity, 3), valid (capacity,)) per scan file."""
    pf = Prefetcher(paths, capacity, depth=max(prefetch, 1))
    try:
        while True:
            item = pf.next()
            if item is None:
                return
            xyz, n = item
            n = min(n, capacity)
            valid = np.zeros((capacity,), bool)
            valid[:n] = True
            xyz[n:] = 0.0
            yield xyz, valid
    finally:
        pf.close()
