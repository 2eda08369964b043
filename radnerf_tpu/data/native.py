"""ctypes bindings for the native IO runtime (native/radnerf_io.cpp).

Auto-builds libradnerf_io.so on first use (g++ + libpng/libjpeg, no
pybind11 needed); every consumer has a pure-Python fallback, so missing
toolchains degrade gracefully.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libradnerf_io.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.radnerf_load_images.restype = ctypes.c_int
        lib.radnerf_load_images.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.radnerf_morton3d.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def load_images(
    paths: list[str],
    img_wh: tuple[int, int],
    blend_a: bool = True,
    unpad: int = 0,
    n_threads: int = 0,
) -> np.ndarray | None:
    """Threaded native decode of a batch of images.

    Returns (n, W*H, 3) float32 in [0, 1] (the ray-store layout of
    color_utils.read_image), or None when the native library is
    unavailable or any image fails to decode (caller falls back to the
    Python loader)."""
    lib = _load()
    if lib is None or not paths:
        return None
    if any(
        not p.lower().endswith((".png", ".jpg", ".jpeg")) for p in paths
    ):
        return None
    w, h = img_wh
    out = np.empty((len(paths), h * w * 3), np.float32)
    blob = b"\x00".join(p.encode() for p in paths) + b"\x00"
    ok = lib.radnerf_load_images(
        blob, len(paths), w, h, int(blend_a), int(unpad), n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if ok != len(paths):
        return None
    return out.reshape(len(paths), h * w, 3)


def morton3d_cpu(coords: np.ndarray) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    coords = np.ascontiguousarray(coords, np.int32)
    out = np.empty(len(coords), np.int32)
    lib.radnerf_morton3d(
        coords.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(coords),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out
