"""Native runtime components (C++, ctypes-bound).

``ImageWriterPool`` is the TPU-native equivalent of the reference's
fork-based image-saving ``WorkerPool`` (``netdissect/workerpool.py:35-157``):
a std::thread pool with an in-process zlib PNG encoder, so frame encoding and
disk writes run off the GIL with no per-worker process images or pickling.

The shared library compiles on first use (g++ -O2, cached next to the
source); if the toolchain is unavailable the pool transparently falls back
to synchronous PIL writes so the pipeline never hard-fails.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).parent / "src" / "fastio.cpp"
_LIB = Path(__file__).parent / "src" / "libfastio.so"
_lock = threading.Lock()
_lib_handle: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _lib_handle, _build_failed
    with _lock:
        if _lib_handle is not None:
            return _lib_handle
        if _build_failed:
            return None
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                   str(_SRC), "-o", str(_LIB), "-lz", "-lpthread"]
            try:
                subprocess.run(cmd, check=True, capture_output=True)
            except (subprocess.CalledProcessError, FileNotFoundError) as e:
                print(f"fastio: native build failed ({e}); using PIL fallback")
                _build_failed = True
                return None
        lib = ctypes.CDLL(str(_LIB))
        lib.fastio_pool_create.restype = ctypes.c_void_p
        lib.fastio_pool_create.argtypes = [ctypes.c_int]
        lib.fastio_submit_png.restype = ctypes.c_int
        lib.fastio_submit_png.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.fastio_submit_raw.restype = ctypes.c_int
        lib.fastio_submit_raw.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_long]
        lib.fastio_pool_wait.argtypes = [ctypes.c_void_p]
        lib.fastio_pool_errors.restype = ctypes.c_long
        lib.fastio_pool_errors.argtypes = [ctypes.c_void_p]
        lib.fastio_pool_destroy.argtypes = [ctypes.c_void_p]
        _lib_handle = lib
        return lib


class ImageWriterPool:
    """Async PNG/raw writer.  Usage:

        with ImageWriterPool(4) as pool:
            pool.save_png(path, uint8_hwc)
        # context exit waits for the queue to drain
    """

    def __init__(self, n_threads: int = 4):
        self._lib = _build()
        self._pool = (self._lib.fastio_pool_create(n_threads)
                      if self._lib is not None else None)
        self._sync_errors = 0

    @property
    def native(self) -> bool:
        return self._pool is not None

    def save_png(self, path, img: np.ndarray) -> None:
        img = np.ascontiguousarray(img)
        if img.dtype != np.uint8:
            raise ValueError("save_png expects uint8")
        if img.ndim == 2:
            img = img[:, :, None]
        h, w, c = img.shape
        if self._pool is not None:
            rc = self._lib.fastio_submit_png(
                self._pool, str(path).encode(),
                img.ctypes.data_as(ctypes.c_char_p), h, w, c)
            if rc != 0:
                raise RuntimeError("fastio_submit_png failed")
        else:
            try:
                from PIL import Image
                Image.fromarray(img.squeeze()).save(str(path))
            except Exception:
                self._sync_errors += 1

    def save_raw(self, path, data: bytes) -> None:
        if self._pool is not None:
            buf = np.frombuffer(data, dtype=np.uint8)
            rc = self._lib.fastio_submit_raw(
                self._pool, str(path).encode(),
                buf.ctypes.data_as(ctypes.c_char_p), len(data))
            if rc != 0:
                raise RuntimeError("fastio_submit_raw failed")
        else:
            Path(path).write_bytes(data)

    def wait(self) -> None:
        if self._pool is not None:
            self._lib.fastio_pool_wait(self._pool)

    def errors(self) -> int:
        if self._pool is not None:
            return int(self._lib.fastio_pool_errors(self._pool))
        return self._sync_errors

    def close(self) -> None:
        if self._pool is not None:
            self._lib.fastio_pool_wait(self._pool)
            self._lib.fastio_pool_destroy(self._pool)
            self._pool = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


# ---------------------------------------------------------------------------
# fastrand: numpy-legacy-exact gaussian sampling, threaded (fastrand.cpp)
# ---------------------------------------------------------------------------

_RAND_SRC = Path(__file__).parent / "src" / "fastrand.cpp"
_RAND_LIB = Path(__file__).parent / "src" / "libfastrand.so"
_rand_handle: Optional[ctypes.CDLL] = None
_rand_failed = False


def _build_rand() -> Optional[ctypes.CDLL]:
    global _rand_handle, _rand_failed
    with _lock:
        if _rand_handle is not None:
            return _rand_handle
        if _rand_failed:
            return None
        if not _RAND_LIB.exists() or \
                _RAND_LIB.stat().st_mtime < _RAND_SRC.stat().st_mtime:
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                   str(_RAND_SRC), "-o", str(_RAND_LIB), "-lpthread"]
            try:
                subprocess.run(cmd, check=True, capture_output=True)
            except (subprocess.CalledProcessError, FileNotFoundError) as e:
                print(f"fastrand: native build failed ({e}); using numpy")
                _rand_failed = True
                return None
        lib = ctypes.CDLL(str(_RAND_LIB))
        lib.fastrand_normal_batches.argtypes = [
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.fastrand_normal_f64.argtypes = [
            ctypes.c_uint32, ctypes.c_int64, ctypes.POINTER(ctypes.c_double)]
        _rand_handle = lib
        return lib


def have_fastrand() -> bool:
    return _build_rand() is not None


def normal_batches(seeds, n_per: int, n_threads: int = 0) -> "np.ndarray":
    """[len(seeds), n_per] float32; row b is bit-identical to
    ``np.random.RandomState(seeds[b]).standard_normal(n_per).astype(np.float32)``.
    Threaded across rows (0 = one thread per core, capped at 16)."""
    import os
    seeds = np.ascontiguousarray(seeds, dtype=np.uint32)
    lib = _build_rand()
    if lib is None:
        return np.stack([
            np.random.RandomState(int(s)).standard_normal(n_per)
            .astype(np.float32) for s in seeds])
    out = np.empty((len(seeds), n_per), np.float32)
    if n_threads <= 0:
        n_threads = min(os.cpu_count() or 1, 16)
    lib.fastrand_normal_batches(
        seeds.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(seeds),
        n_per, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads)
    return out


def normal_f64(seed: int, n: int) -> "np.ndarray":
    """Bit-exact ``np.random.RandomState(seed).standard_normal(n)``."""
    lib = _build_rand()
    if lib is None:
        return np.random.RandomState(int(seed)).standard_normal(n)
    out = np.empty((n,), np.float64)
    lib.fastrand_normal_f64(
        ctypes.c_uint32(int(seed)), n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out
