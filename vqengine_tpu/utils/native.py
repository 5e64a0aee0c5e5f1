"""ctypes binding for the native asset kernels (native/vq_native.cpp) —
the counterpart of the reference's C++ asset path (stb_image decode, mip
workers). Auto-builds with make on first use; every entry point has a pure-
python fallback so the framework runs without a toolchain.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

from .log import info, warning

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libvq_native.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.is_file() and (_NATIVE_DIR / "Makefile").is_file():
        try:
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True, timeout=120)
            info("built native/libvq_native.so")
        except Exception as e:  # noqa: BLE001
            warning(f"native build failed ({e}); using python fallbacks")
            return None
    if not _LIB_PATH.is_file():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.vq_png_info.restype = ctypes.c_int
        lib.vq_png_info.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.vq_png_decode.restype = ctypes.c_int
        lib.vq_png_decode.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
                                      ctypes.c_void_p]
        lib.vq_mip_box.restype = None
        lib.vq_mip_box.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_void_p]
        lib.vq_resize_box.restype = None
        lib.vq_resize_box.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_int,
                                      ctypes.c_void_p, ctypes.c_int,
                                      ctypes.c_int]
        _lib = lib
    except Exception as e:  # noqa: BLE001
        warning(f"native load failed ({e}); using python fallbacks")
    return _lib


def available() -> bool:
    return _load() is not None


def png_decode(data: bytes) -> np.ndarray | None:
    """Fast-path PNG decode -> uint8 [H, W, C]; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    if lib.vq_png_info(data, len(data), ctypes.byref(w), ctypes.byref(h),
                       ctypes.byref(c)) != 0:
        return None
    out = np.empty((h.value, w.value, c.value), dtype=np.uint8)
    if lib.vq_png_decode(data, len(data),
                         out.ctypes.data_as(ctypes.c_void_p)) != 0:
        return None
    return out


def mip_box(src: np.ndarray) -> np.ndarray | None:
    """One box-filtered mip level for f32 [H, W, C]; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.float32)
    h, w = src.shape[:2]
    c = src.shape[2] if src.ndim == 3 else 1
    dst = np.empty((max(h // 2, 1), max(w // 2, 1), c), dtype=np.float32)
    lib.vq_mip_box(src.ctypes.data_as(ctypes.c_void_p), h, w, c,
                   dst.ctypes.data_as(ctypes.c_void_p))
    return dst if src.ndim == 3 else dst[:, :, 0]
