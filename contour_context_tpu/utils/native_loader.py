"""ctypes bindings for the native data plane (csrc/loader.cpp).

The reference's loader is C++ (pointcloud_util.h:11-50); ours is too: an
mmap'd `.bin` reader plus a multi-threaded in-order prefetch ring that keeps
the device upload queue fed without Python file IO on the critical path.
Build with `make -C csrc` (done lazily here if g++ is available); everything
falls back to the pure-numpy readers in utils/io.py when the library cannot
be built, so the native path is an accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libcont2.so")
_lib = None
_lib_tried = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    # `make` does its own dependency check (loader.cpp is a prerequisite) and
    # the Makefile renames atomically, so concurrent builders are safe and a
    # fresh .so is a no-op
    try:
        subprocess.run(["make", "-C", _CSRC], check=True,
                       capture_output=True, timeout=120)
    except Exception:
        if not os.path.exists(_LIB_PATH):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.c2_read_bin_padded.restype = ctypes.c_int
        lib.c2_read_bin_padded.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.c2_prefetcher_create.restype = ctypes.c_void_p
        lib.c2_prefetcher_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int]
        lib.c2_prefetcher_next.restype = ctypes.c_int
        lib.c2_prefetcher_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
        lib.c2_prefetcher_destroy.restype = None
        lib.c2_prefetcher_destroy.argtypes = [ctypes.c_void_p]
        lib.c2_read_block.restype = ctypes.c_int
        lib.c2_read_block.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int)]
    except (OSError, AttributeError):
        # missing lib, broken dlopen, or a stale .so lacking newer symbols:
        # the native path is an accelerator, never a requirement
        return None
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


def read_bin_padded_into(path: str, out: np.ndarray) -> int:
    """Read + pad one scan directly into a caller-owned (max_points, 4) f32
    row-contiguous buffer (zero extra copies; used by block staging).
    Returns the point count. Falls back to numpy when the lib is missing."""
    assert out.dtype == np.float32 and out.flags["C_CONTIGUOUS"]
    max_points = out.shape[0]
    lib = _load_lib()
    if lib is None:
        from contour_context_tpu.utils.io import pad_points, read_kitti_bin
        pts = read_kitti_bin(path, max_points)
        out[:] = pad_points(pts, max_points)
        return len(pts)
    n = lib.c2_read_bin_padded(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_points)
    if n < 0:
        raise IOError(f"c2_read_bin_padded failed for {path}")
    return n


def read_block_into(paths: List[str], out: np.ndarray,
                    n_threads: int = 4) -> None:
    """Fill a (B, max_points, 4) f32 block buffer, one scan per row, with a
    native thread pool (the host side of the batched replay). Falls back to
    sequential reads without the library."""
    B = len(paths)
    assert out.shape[0] >= B and out.dtype == np.float32 \
        and out.flags["C_CONTIGUOUS"]
    lib = _load_lib()
    if lib is None:
        for j, p in enumerate(paths):
            read_bin_padded_into(p, out[j])
        return
    arr = (ctypes.c_char_p * B)(*[p.encode() for p in paths])
    counts = (ctypes.c_int * B)()
    rc = lib.c2_read_block(
        arr, B, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.shape[1], n_threads, counts)
    if rc != 0:
        bad = [paths[i] for i in range(B) if counts[i] < 0]
        raise IOError(f"c2_read_block failed for {bad}")


def read_bin_padded(path: str, max_points: int) -> np.ndarray:
    """Read + pad one scan natively -> (max_points, 4) f32 [x y z valid].

    Exact layout parity with utils/io.py read_kitti_bin + pad_points; falls
    back to them when the native library is unavailable.
    """
    lib = _load_lib()
    if lib is None:
        from contour_context_tpu.utils.io import pad_points, read_kitti_bin
        return pad_points(read_kitti_bin(path, max_points), max_points)
    out = np.empty((max_points, 4), np.float32)
    n = lib.c2_read_bin_padded(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_points)
    if n < 0:
        raise IOError(f"c2_read_bin_padded failed for {path}")
    return out


class ScanPrefetcher:
    """In-order threaded prefetcher over a list of `.bin` paths.

    Iterating yields (max_points, 4) padded f32 arrays in submission order;
    reads happen on native threads up to `depth` scans ahead. Falls back to
    synchronous numpy reads without the native library.
    """

    def __init__(self, paths: List[str], max_points: int,
                 depth: int = 8, n_threads: int = 4):
        self.paths = list(paths)
        self.max_points = max_points
        self._i = 0
        lib = _load_lib()
        self._lib = lib
        self._h = None
        if lib is not None and self.paths:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths])
            self._h = lib.c2_prefetcher_create(
                arr, len(self.paths), max_points, depth, n_threads)

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._i >= len(self.paths):
            raise StopIteration
        self._i += 1
        if self._h is not None:
            out = np.empty((self.max_points, 4), np.float32)
            n = self._lib.c2_prefetcher_next(
                self._h,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
            if n == -2:
                raise StopIteration
            if n == -1:
                raise IOError(
                    f"prefetcher read failed for {self.paths[self._i - 1]}")
            return out
        return read_bin_padded(self.paths[self._i - 1], self.max_points)

    def close(self) -> None:
        if self._h is not None:
            self._lib.c2_prefetcher_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
