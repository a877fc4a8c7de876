"""ctypes bindings for the native tile service (native/tileservice.cc).

All entry points degrade gracefully: ``available()`` is False when the
shared library has not been built (``make -C native``), and callers fall
back to the pure-Python (PIL) paths.
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import List, Optional, Tuple

import numpy as np

_LIB = None
_LOCK = threading.Lock()


def _search_paths():
    """Env override FIRST (so a user-supplied .so beats the repo build) and
    read at load time, not import time (tests set it after import)."""
    return [
        os.environ.get("TPUMIL_TILESERVICE", ""),
        os.path.join(os.path.dirname(__file__), "..", "..", "native", "build",
                     "libtileservice.so"),
    ]


def _load():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        for path in _search_paths():
            if path and os.path.exists(path):
                try:
                    lib = ctypes.CDLL(os.path.abspath(path))
                except OSError:
                    continue
                lib.ts_decode_batch.restype = ctypes.c_int
                lib.ts_decode_batch.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                    ctypes.c_int, ctypes.c_int]
                lib.ts_encode_jpeg.restype = ctypes.c_int
                lib.ts_encode_jpeg.argtypes = [
                    ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.c_char_p]
                lib.ts_edge_energy.restype = None
                lib.ts_edge_energy.argtypes = [
                    ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
                    ctypes.c_int]
                lib.ts_tiff_open.restype = ctypes.c_void_p
                lib.ts_tiff_open.argtypes = [ctypes.c_char_p]
                lib.ts_tiff_close.argtypes = [ctypes.c_void_p]
                lib.ts_tiff_levels.restype = ctypes.c_int
                lib.ts_tiff_levels.argtypes = [ctypes.c_void_p]
                lib.ts_tiff_dims.argtypes = [
                    ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p]
                lib.ts_tiff_read_region.restype = ctypes.c_int
                lib.ts_tiff_read_region.argtypes = [
                    ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
                lib.ts_tiff_description.restype = ctypes.c_int
                lib.ts_tiff_description.argtypes = [
                    ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
                # added in round 2 — older .so builds lack them
                if hasattr(lib, "ts_tiff_is_tiled"):
                    lib.ts_tiff_is_tiled.restype = ctypes.c_int
                    lib.ts_tiff_is_tiled.argtypes = [ctypes.c_void_p, ctypes.c_int]
                if hasattr(lib, "ts_write_tiled_pyramid"):
                    lib.ts_write_tiled_pyramid.restype = ctypes.c_int
                    lib.ts_write_tiled_pyramid.argtypes = [
                        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int,
                        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                        ctypes.c_char_p]
                _LIB = lib
                return lib
        _LIB = False
        return False


def available() -> bool:
    return bool(_load())


def can_write_pyramid() -> bool:
    """True iff the loaded .so has the round-2 pyramid writer (older builds
    lack it — callers should fall back to PIL, not crash)."""
    lib = _load()
    return bool(lib) and hasattr(lib, "ts_write_tiled_pyramid")


def decode_batch(paths: List[str], size: int, num_threads: int = 8,
                 as_float: bool = True,
                 allow_resize: bool = False) -> Tuple[np.ndarray, np.ndarray]:
    """Decode JPEGs in parallel into [N, size, size, 3]. Returns
    (float01 array if as_float else uint8 array, err codes [N]).

    By default sources whose size differs from ``size`` are NOT resized
    natively (err -4): native bilinear point-sampling differs from PIL's
    convolution resampling, and cross-path feature parity matters more than
    resizing speed. Callers redecode err -4 entries via PIL."""
    lib = _load()
    if not lib:
        raise RuntimeError("native tile service not built (make -C native)")
    num_threads = max(1, min(num_threads, os.cpu_count() or 1))
    n = len(paths)
    out_u8 = np.zeros((n, size, size, 3), np.uint8)
    out_f = np.zeros((n, size, size, 3), np.float32) if as_float else None
    err = np.zeros((n,), np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.ts_decode_batch(
        arr, n, size,
        out_u8.ctypes.data_as(ctypes.c_void_p),
        out_f.ctypes.data_as(ctypes.c_void_p) if as_float else None,
        err.ctypes.data_as(ctypes.c_void_p), num_threads,
        1 if allow_resize else 0)
    return (out_f if as_float else out_u8), err


def encode_jpeg(img: np.ndarray, path: str, quality: int = 70) -> None:
    lib = _load()
    if not lib:
        raise RuntimeError("native tile service not built")
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    rc = lib.ts_encode_jpeg(img.ctypes.data_as(ctypes.c_void_p), w, h,
                            quality, path.encode())
    if rc != 0:
        raise IOError(f"jpeg encode failed ({rc}): {path}")


def edge_energy_batch(imgs_u8: np.ndarray, num_threads: int = 8) -> np.ndarray:
    """FIND_EDGES background energies for [N, S, S, 3] uint8 images."""
    lib = _load()
    if not lib:
        raise RuntimeError("native tile service not built")
    imgs_u8 = np.ascontiguousarray(imgs_u8, np.uint8)
    n, s = imgs_u8.shape[0], imgs_u8.shape[1]
    out = np.zeros((n,), np.float32)
    lib.ts_edge_energy(imgs_u8.ctypes.data_as(ctypes.c_void_p), n, s,
                       out.ctypes.data_as(ctypes.c_void_p), num_threads)
    return out


def write_tiled_pyramid(path: str, img: np.ndarray, tile: int = 256,
                        levels: int = 3, quality: int = 75,
                        description: str = "") -> None:
    """Write a tiled JPEG-compressed pyramidal TIFF (the layout of real
    scanner files like Aperio .svs) from a full-resolution RGB uint8 image.
    Synthesizes realistic slides for benches/tests without scanner data."""
    lib = _load()
    if not lib or not hasattr(lib, "ts_write_tiled_pyramid"):
        raise RuntimeError("native tile service not built (make -C native)")
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    rc = lib.ts_write_tiled_pyramid(path.encode(),
                                    img.ctypes.data_as(ctypes.c_void_p),
                                    w, h, tile, levels, quality,
                                    description.encode())
    if rc != 0:
        raise IOError(f"tiled pyramid write failed ({rc}): {path}")


class NativeTiff:
    """Pyramidal TIFF reader backed by libtiff (tiled reads, no full-page
    decode)."""

    def __init__(self, path: str):
        lib = _load()
        if not lib:
            raise RuntimeError("native tile service not built")
        self._lib = lib
        # libtiff handles are NOT thread-safe (TIFFSetDirectory + reads race
        # to heap corruption); all calls on this handle are serialized.
        self._rlock = threading.Lock()
        self._h = lib.ts_tiff_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open TIFF {path}")
        self.level_count = lib.ts_tiff_levels(self._h)
        self.level_dimensions = []
        for lv in range(self.level_count):
            w = ctypes.c_int()
            hh = ctypes.c_int()
            lib.ts_tiff_dims(self._h, lv, ctypes.byref(w), ctypes.byref(hh))
            self.level_dimensions.append((w.value, hh.value))
        buf = ctypes.create_string_buffer(4096)
        n = lib.ts_tiff_description(self._h, buf, 4096)
        self.description = buf.value.decode(errors="replace") if n else ""
        self.is_tiled = bool(lib.ts_tiff_is_tiled(self._h, 0)) \
            if hasattr(lib, "ts_tiff_is_tiled") else True

    def read_region(self, level: int, x: int, y: int, w: int, h: int) -> np.ndarray:
        out = np.empty((h, w, 3), np.uint8)  # ts_tiff_read_region memsets it
        with self._rlock:
            if not self._h:
                raise IOError("TIFF handle closed")
            rc = self._lib.ts_tiff_read_region(
                self._h, level, x, y, w, h, out.ctypes.data_as(ctypes.c_void_p))
        if rc != 0:
            raise IOError(f"tiff read failed ({rc})")
        return out

    def close(self):
        with self._rlock:
            if self._h:
                self._lib.ts_tiff_close(self._h)
                self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
