"""ctypes bindings for the C++ decode pipeline (decode.cc).

Builds ``libedt_decode.so`` with g++ on first use (cached beside the
package under ``_build/``; rebuilt when decode.cc is newer) and exposes:

  available() -> bool
  decode_rgb(path) -> uint8 [H, W, 3]
  decode_rgb_batch(paths, threads) -> uint8 [N, H, W, 3]  (uniform size)
  decode_tiff_f32(path, rows=None) -> f32 [rows or H, W]
  decode_tiff_f32_batch(paths, rows, threads) -> f32 [N, rows, W]

Every call goes through ctypes, which releases the GIL for the duration
of the C call — the data Loader's worker threads therefore decode in
true parallel.  All callers fall back to PIL/cv2 when the toolchain or
codec libraries are unavailable (``available()`` is False).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np
from endodav_tpu.utils.envflags import env_on

__all__ = [
    "available", "decode_rgb", "decode_rgb_batch",
    "decode_tiff_f32", "decode_tiff_f32_batch",
]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "decode.cc")
_SO = os.path.join(_DIR, "_build", "libedt_decode.so")

_lib = None
_lock = threading.Lock()
_failed = False


def _build() -> bool:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    # build to a pid-unique temp and rename: atomic on POSIX, so two
    # processes building concurrently can't hand dlopen a half-written .so
    tmp = f"{_SO}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
           "-o", tmp, "-lpng", "-ljpeg", "-ltiff", "-lpthread"]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if r.returncode != 0:
            return False
        os.replace(tmp, _SO)
    except (OSError, subprocess.TimeoutExpired):
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass
    return True


def _load():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if env_on("ENDODAV_NO_NATIVE"):
            _failed = True
            return None
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                if not _build():
                    _failed = True
                    return None
            lib = ctypes.CDLL(_SO)
        except OSError:
            _failed = True
            return None
        lib.edt_image_size.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                                       ctypes.POINTER(ctypes.c_int)]
        lib.edt_decode_rgb.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                       ctypes.c_int, ctypes.c_int]
        lib.edt_decode_rgb_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        lib.edt_tiff_size.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
                                      ctypes.POINTER(ctypes.c_int)]
        lib.edt_decode_tiff_f32.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                            ctypes.c_int, ctypes.c_int]
        lib.edt_decode_tiff_f32_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int]
        for fn in (lib.edt_image_size, lib.edt_decode_rgb, lib.edt_decode_rgb_batch,
                   lib.edt_tiff_size, lib.edt_decode_tiff_f32,
                   lib.edt_decode_tiff_f32_batch):
            fn.restype = ctypes.c_int
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _size(path: str, probe) -> tuple[int, int]:
    h, w = ctypes.c_int(), ctypes.c_int()
    if probe(path.encode(), ctypes.byref(h), ctypes.byref(w)) != 0:
        raise IOError(f"native probe failed for {path}")
    return h.value, w.value


def decode_rgb(path: str) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    h, w = _size(path, lib.edt_image_size)
    out = np.empty((h, w, 3), np.uint8)
    if lib.edt_decode_rgb(path.encode(), out.ctypes.data_as(ctypes.c_void_p), h, w) != 0:
        raise IOError(f"native decode failed for {path}")
    return out


def decode_rgb_batch(paths: list[str], threads: int = 4) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    if not paths:
        return np.empty((0, 0, 0, 3), np.uint8)
    h, w = _size(paths[0], lib.edt_image_size)
    out = np.empty((len(paths), h, w, 3), np.uint8)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    rc = lib.edt_decode_rgb_batch(arr, len(paths),
                                  out.ctypes.data_as(ctypes.c_void_p), h, w, threads)
    if rc != 0:
        raise IOError(f"native batch decode failed at {paths[-rc - 1]}")
    return out


def decode_tiff_f32(path: str, rows: int | None = None) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    h, w = _size(path, lib.edt_tiff_size)
    if rows is not None:
        h = min(h, rows)
    out = np.empty((h, w), np.float32)
    if lib.edt_decode_tiff_f32(path.encode(), out.ctypes.data_as(ctypes.c_void_p), h, w) != 0:
        raise IOError(f"native tiff decode failed for {path}")
    return out


def decode_tiff_f32_batch(paths: list[str], rows: int, threads: int = 4) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    if not paths:
        return np.empty((0, rows, 0), np.float32)
    h, w = _size(paths[0], lib.edt_tiff_size)
    h = min(h, rows)
    out = np.empty((len(paths), h, w), np.float32)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    rc = lib.edt_decode_tiff_f32_batch(arr, len(paths),
                                       out.ctypes.data_as(ctypes.c_void_p), h, w, threads)
    if rc != 0:
        raise IOError(f"native tiff batch decode failed at {paths[-rc - 1]}")
    return out
