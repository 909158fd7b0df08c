"""ctypes bindings for the native JPEG -> packed-yuv420 decoder.

Compile-on-first-import like hostops (native/__init__.py), but a separate
shared object because it links -ljpeg (libjpeg-turbo). Every entry point
degrades gracefully: callers check HAVE_JPEGDEC / None returns and fall
back to the cv2 decode + BGR->I420 path in engine/vos.py.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "jpegdec.cpp")
_LIB: Optional[ctypes.CDLL] = None
HAVE_JPEGDEC = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    cache = os.environ.get(
        "VOSDETECTRON_NATIVE_CACHE",
        os.path.expanduser("~/.cache/vosdetectron_native"))
    os.makedirs(cache, exist_ok=True)
    with open(_SRC, "rb") as f:
        tag = hashlib.sha1(f.read()).hexdigest()[:16]
    so = os.path.join(cache, f"jpegdec_{tag}.so")
    if not os.path.exists(so):
        tmp = so + f".tmp{os.getpid()}"
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", _SRC, "-o", tmp, "-ljpeg"]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            os.replace(tmp, so)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    try:
        return ctypes.CDLL(so)
    except OSError:
        return None


def _init() -> None:
    global _LIB, HAVE_JPEGDEC
    if _LIB is not None:
        return
    lib = _build_and_load()
    if lib is None:
        return
    pu8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    pi = ctypes.POINTER(ctypes.c_int)
    lib.jpeg_probe.argtypes = [pu8, ctypes.c_int64, pi, pi, pi]
    lib.jpeg_probe.restype = ctypes.c_int
    lib.decode_jpeg_yuv420.argtypes = [pu8, ctypes.c_int64, pu8,
                                       ctypes.c_int64, ctypes.c_int]
    lib.decode_jpeg_yuv420.restype = ctypes.c_int
    _LIB = lib
    HAVE_JPEGDEC = True


_init()


def chroma_hw(h: int, w: int, den: int = 2) -> Tuple[int, int]:
    """Packed chroma plane dims: (h//2, w//2) for den=2; ceil halves of
    that for den=4 (odd half-dims clamp-average the trailing row/col)."""
    k = den // 2
    return ((h // 2 + k - 1) // k, (w // 2 + k - 1) // k)


def packed_size(h: int, w: int, den: int = 2) -> int:
    ch, cw = chroma_hw(h, w, den)
    return h * w + ch * cw * 2


def probe_file(path: str) -> Optional[Tuple[int, int, bool]]:
    """-> (h, w, is420) or None when the native decoder is unavailable /
    the file is not parseable JPEG."""
    if not HAVE_JPEGDEC:
        return None
    try:
        data = np.fromfile(path, np.uint8)
    except OSError:
        return None
    if data.size < 4 or data[0] != 0xFF or data[1] != 0xD8:
        return None  # not JPEG (e.g. PNG frames)
    h = ctypes.c_int()
    w = ctypes.c_int()
    is420 = ctypes.c_int()
    if _LIB.jpeg_probe(data, data.size, ctypes.byref(h), ctypes.byref(w),
                       ctypes.byref(is420)) != 0:
        return None
    return h.value, w.value, bool(is420.value)


def decode_packed_into(data: np.ndarray, out: np.ndarray,
                       den: int = 2) -> bool:
    """Decode JPEG bytes (uint8 array) into a preallocated packed yuv
    buffer (1-D uint8 view of size packed_size(h, w, den)). False ->
    caller must fall back to cv2."""
    if not HAVE_JPEGDEC:
        return False
    rc = _LIB.decode_jpeg_yuv420(data, data.size, out, out.size, den)
    return rc == 0


def read_packed_into(path: str, out: np.ndarray, den: int = 2) -> bool:
    if not HAVE_JPEGDEC:
        return False
    try:
        data = np.fromfile(path, np.uint8)
    except OSError:
        return False
    return decode_packed_into(data, out, den)
