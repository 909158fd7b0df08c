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


def exif_orientation(data: np.ndarray) -> int:
    """EXIF Orientation (tag 0x0112) from JPEG bytes; 1 when absent or
    unparseable. cv2.imread APPLIES the orientation while libjpeg's raw
    path does not — any value > 1 must force the cv2 fallback or the
    fast path silently decodes frames rotated/mirrored (real-image
    robustness, VERDICT r3 #6). Pure-Python marker walk over the header
    segments (APP1 precedes the entropy data, so 64 KiB is plenty)."""
    b = bytes(data[:65536])
    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
        return 1
    i, n = 2, len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:
            break
        marker = b[i + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD9:  # standalone markers
            i += 2
            continue
        if marker == 0xDA:  # SOS — no APP1 past this point
            break
        seglen = (b[i + 2] << 8) | b[i + 3]
        if seglen < 2:
            break
        if marker == 0xE1 and b[i + 4:i + 10] == b"Exif\x00\x00":
            t = i + 10  # TIFF header
            if t + 8 > n:
                break
            bo = b[t:t + 2]
            if bo == b"II":
                def u16(o):
                    return b[o] | (b[o + 1] << 8)

                def u32(o):
                    return (b[o] | (b[o + 1] << 8) | (b[o + 2] << 16)
                            | (b[o + 3] << 24))
            elif bo == b"MM":
                def u16(o):
                    return (b[o] << 8) | b[o + 1]

                def u32(o):
                    return ((b[o] << 24) | (b[o + 1] << 16)
                            | (b[o + 2] << 8) | b[o + 3])
            else:
                break
            ifd = t + u32(t + 4)
            if ifd + 2 > n:
                break
            for k in range(u16(ifd)):
                e = ifd + 2 + 12 * k
                if e + 12 > n:
                    break
                if u16(e) == 0x0112:
                    return u16(e + 8) or 1
            break  # EXIF present, no orientation tag
        i += 2 + seglen
    return 1


def probe_file(path: str) -> Optional[Tuple[int, int, bool]]:
    """-> (h, w, is420) or None when the native decoder is unavailable /
    the file is not parseable JPEG. is420 is False (no fast path) for
    EXIF-rotated files: the raw-plane decode would skip the rotation
    cv2.imread applies."""
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
    ok = bool(is420.value) and exif_orientation(data) == 1
    return h.value, w.value, ok


def decode_packed_into(data: np.ndarray, out: np.ndarray,
                       den: int = 2) -> bool:
    """Decode JPEG bytes (uint8 array) into a preallocated packed yuv
    buffer (1-D uint8 view of size packed_size(h, w, den)). False ->
    caller must fall back to cv2 (non-4:2:0 layout, grayscale, odd
    dimensions, EXIF rotation, or decode error)."""
    if not HAVE_JPEGDEC:
        return False
    if exif_orientation(data) != 1:
        return False  # cv2 rotates per EXIF; the raw path cannot
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
