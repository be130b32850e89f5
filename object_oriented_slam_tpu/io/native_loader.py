"""ctypes binding for the native C++ frame loader (native/src/tum_loader.cpp).

Provides threaded-prefetch frame decode for TUM sequences; falls back to
cv2 transparently when the shared library cannot be built.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_LIB = None
_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SO = os.path.join(_REPO, "native", "lib", "liboslam_native.so")


def _build_locked() -> bool:
    """Run native/build.sh under an exclusive file lock.

    build.sh writes to a temp path and atomically renames into place, so
    readers never see a partial .so; the lock additionally serializes
    concurrent builders (pytest workers, the 2-process distributed test,
    multi-rank jobs) so they don't duplicate the compile.
    """
    lock_path = os.path.join(_REPO, "native", "lib", ".build.lock")
    try:
        os.makedirs(os.path.dirname(lock_path), exist_ok=True)
        import fcntl
        with open(lock_path, "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            try:
                # another process may have finished the build while we
                # waited on the lock
                if os.path.exists(_SO):
                    probe = ctypes.CDLL(_SO)
                    if hasattr(probe, "oslam_cluster_labels"):
                        return True
                subprocess.run(
                    ["sh", os.path.join(_REPO, "native", "build.sh")],
                    check=True, capture_output=True)
                return True
            finally:
                fcntl.flock(lk, fcntl.LOCK_UN)
    except Exception:
        return False


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO) and not _build_locked():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    if not hasattr(lib, "oslam_cluster_labels"):
        # stale library from before native/src/cluster.cpp existed;
        # rebuild replaces it atomically (no removal window)
        if not _build_locked():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        if not hasattr(lib, "oslam_cluster_labels"):
            return None
    lib.oslam_loader_create.restype = ctypes.c_void_p
    lib.oslam_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.oslam_loader_get.restype = ctypes.c_int
    lib.oslam_loader_get.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.oslam_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.oslam_decode_depth.restype = ctypes.c_int
    lib.oslam_decode_depth.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint16),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.oslam_decode_rgb.restype = ctypes.c_int
    lib.oslam_decode_rgb.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.oslam_cluster_labels.restype = ctypes.c_int
    lib.oslam_cluster_labels.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.c_int32)]
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def cluster_labels(pts: np.ndarray, mask: np.ndarray,
                   tol: float) -> Optional[np.ndarray]:
    """Grid-hash union-find connected components (native/src/cluster.cpp).

    pts: [N, 3] float32; mask: [N] bool.  Returns int32 labels [N] with
    the ops/cluster.py convention (label = min point index in component,
    masked points -> N), or None when the native library is unavailable.
    """
    lib = _load_lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(pts, np.float32)
    m = np.ascontiguousarray(mask, np.uint8)
    n = len(pts)
    out = np.empty(n, np.int32)
    rc = lib.oslam_cluster_labels(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, ctypes.c_float(tol),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if rc != 0:
        return None
    return out


def decode_depth(path: str, max_hw=(480, 640)) -> Optional[np.ndarray]:
    lib = _load_lib()
    if lib is None:
        return None
    buf = np.zeros(max_hw, np.uint16)
    h, w = ctypes.c_int(), ctypes.c_int()
    rc = lib.oslam_decode_depth(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        return None
    return buf[:h.value, :w.value].copy()


def decode_rgb(path: str, max_hw=(480, 640)) -> Optional[np.ndarray]:
    lib = _load_lib()
    if lib is None:
        return None
    buf = np.zeros((*max_hw, 3), np.uint8)
    h, w = ctypes.c_int(), ctypes.c_int()
    rc = lib.oslam_decode_rgb(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        return None
    # native gives RGB; repo convention (cv2) is BGR
    return buf[:h.value, :w.value, ::-1].copy()


class PrefetchingLoader:
    """Threaded-prefetch sequential frame reader."""

    def __init__(self, depth_paths: List[str], rgb_paths: List[str],
                 n_threads: int = 4, lookahead: int = 8,
                 max_hw=(480, 640)):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        n = len(depth_paths)
        self._dp = (ctypes.c_char_p * n)(*[p.encode() for p in depth_paths])
        self._rp = (ctypes.c_char_p * n)(*[p.encode() for p in rgb_paths])
        self._handle = lib.oslam_loader_create(self._dp, self._rp, n,
                                               n_threads, lookahead)
        self._n = n
        self._max_hw = max_hw

    def get(self, index: int):
        """Returns (depth u16 [H,W], rgb u8 [H,W,3] BGR) or None."""
        depth = np.zeros(self._max_hw, np.uint16)
        rgb = np.zeros((*self._max_hw, 3), np.uint8)
        h, w = ctypes.c_int(), ctypes.c_int()
        rc = self._lib.oslam_loader_get(
            self._handle, index,
            depth.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.byref(h), ctypes.byref(w))
        if rc != 0:
            return None
        return (depth[:h.value, :w.value].copy(),
                rgb[:h.value, :w.value, ::-1].copy())

    def close(self):
        if self._handle:
            self._lib.oslam_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
