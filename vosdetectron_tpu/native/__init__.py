"""Native host-ops: compile-on-first-import C++ library + ctypes bindings.

Replaces the reference's Cython build (lib/make.sh + setup.py cython_bbox /
cython_nms — SURVEY.md §2.1) and the pycocotools mask utilities (RLE,
polygon rasterization, mask IoU) which are unavailable in this image.

The .so is built once with g++ -O3 into a cache dir and memoized; every
entry point has a pure-numpy fallback (`HAVE_NATIVE` False) so the
framework degrades gracefully on machines without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "hostops.cpp")
_LIB: Optional[ctypes.CDLL] = None
HAVE_NATIVE = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    cache = os.environ.get(
        "VOSDETECTRON_NATIVE_CACHE",
        os.path.expanduser("~/.cache/vosdetectron_native"))
    os.makedirs(cache, exist_ok=True)
    import hashlib

    with open(_SRC, "rb") as f:
        tag = hashlib.sha1(f.read()).hexdigest()[:16]
    so = os.path.join(cache, f"hostops_{tag}.so")
    if not os.path.exists(so):
        tmp = so + f".tmp{os.getpid()}"
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", _SRC, "-o", tmp]
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
    global _LIB, HAVE_NATIVE
    if _LIB is not None:
        return
    lib = _build_and_load()
    if lib is None:
        HAVE_NATIVE = False
        return
    c_i64 = ctypes.c_int64
    c_f = ctypes.c_float
    c_int = ctypes.c_int
    pf = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    pd = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    pu8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    pi32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    pi64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")

    lib.bbox_overlaps.argtypes = [pf, c_i64, pf, c_i64, pf, c_int]
    lib.nms_greedy.argtypes = [pf, pf, c_i64, c_f, pi64, c_int]
    lib.nms_greedy.restype = c_i64
    lib.soft_nms.argtypes = [pf, pf, c_i64, c_f, c_f, c_f, c_int, pi64]
    lib.soft_nms.restype = c_i64
    lib.rle_encode.argtypes = [pu8, c_i64, c_i64, pi32, c_i64]
    lib.rle_encode.restype = c_i64
    lib.rle_decode.argtypes = [pi32, c_i64, c_i64, c_i64, pu8]
    lib.mask_iou.argtypes = [pu8, c_i64, pu8, c_i64, c_i64, pf, c_int]
    lib.fill_poly.argtypes = [pd, c_i64, c_i64, c_i64, pu8]
    _LIB = lib
    HAVE_NATIVE = True


_init()


# ---------------------------------------------------------------------------
# Public API (native with numpy fallback)
# ---------------------------------------------------------------------------


def bbox_overlaps(b1: np.ndarray, b2: np.ndarray,
                  legacy_plus1: bool = False) -> np.ndarray:
    b1 = np.ascontiguousarray(b1, np.float32)
    b2 = np.ascontiguousarray(b2, np.float32)
    if HAVE_NATIVE:
        out = np.empty((len(b1), len(b2)), np.float32)
        _LIB.bbox_overlaps(b1, len(b1), b2, len(b2), out,
                           int(legacy_plus1))
        return out
    off = 1.0 if legacy_plus1 else 0.0
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt + off, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    a1 = np.clip(b1[:, 2] - b1[:, 0] + off, 0, None) * \
        np.clip(b1[:, 3] - b1[:, 1] + off, 0, None)
    a2 = np.clip(b2[:, 2] - b2[:, 0] + off, 0, None) * \
        np.clip(b2[:, 3] - b2[:, 1] + off, 0, None)
    union = a1[:, None] + a2[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0
                    ).astype(np.float32)


def nms(boxes: np.ndarray, scores: np.ndarray, thresh: float,
        legacy_plus1: bool = False) -> np.ndarray:
    """Greedy NMS -> kept indices, score-descending (cython_nms.nms)."""
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    n = len(boxes)
    if HAVE_NATIVE:
        keep = np.empty((n,), np.int64)
        k = _LIB.nms_greedy(boxes, scores, n, float(thresh), keep,
                            int(legacy_plus1))
        return keep[:k]
    order = np.argsort(-scores, kind="stable")
    iou = bbox_overlaps(boxes, boxes, legacy_plus1)
    suppressed = np.zeros(n, bool)
    keep = []
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        suppressed |= iou[i] > thresh
        suppressed[i] = True
    return np.asarray(keep, np.int64)


def soft_nms(boxes: np.ndarray, scores: np.ndarray,
             iou_thresh: float = 0.3, sigma: float = 0.5,
             score_thresh: float = 0.001, method: str = "linear"
             ) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (kept indices, decayed scores) (cython_nms.soft_nms)."""
    boxes = np.ascontiguousarray(boxes, np.float32)
    s = np.array(scores, np.float32)
    n = len(boxes)
    m = 1 if method == "gaussian" else 0
    if HAVE_NATIVE:
        keep = np.empty((n,), np.int64)
        k = _LIB.soft_nms(boxes, s, n, float(iou_thresh), float(sigma),
                          float(score_thresh), m, keep)
        return keep[:k], s
    # numpy fallback
    taken = np.zeros(n, bool)
    keep = []
    area = np.clip(boxes[:, 2] - boxes[:, 0], 0, None) * \
        np.clip(boxes[:, 3] - boxes[:, 1], 0, None)
    for _ in range(n):
        cand = np.where(~taken & (s > score_thresh))[0]
        if not len(cand):
            break
        i = cand[np.argmax(s[cand])]
        taken[i] = True
        keep.append(i)
        iw = np.minimum(boxes[i, 2], boxes[:, 2]) - \
            np.maximum(boxes[i, 0], boxes[:, 0])
        ih = np.minimum(boxes[i, 3], boxes[:, 3]) - \
            np.maximum(boxes[i, 1], boxes[:, 1])
        inter = np.clip(iw, 0, None) * np.clip(ih, 0, None)
        ov = np.where(area + area[i] - inter > 0,
                      inter / np.maximum(area + area[i] - inter, 1e-12), 0)
        if method == "gaussian":
            decay = np.exp(-(ov ** 2) / sigma)
        else:
            decay = np.where(ov > iou_thresh, 1.0 - ov, 1.0)
        s[~taken] *= decay[~taken]
    return np.asarray(keep, np.int64), s


def rle_encode(mask: np.ndarray) -> dict:
    """Binary mask -> COCO-style RLE dict (column-major counts)."""
    mask = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = mask.shape
    if HAVE_NATIVE:
        buf = np.empty((h * w + 2,), np.int32)
        k = _LIB.rle_encode(mask, h, w, buf, len(buf))
        counts = buf[:k].tolist()
    else:
        flat = mask.T.reshape(-1)
        change = np.nonzero(np.diff(flat))[0] + 1
        runs = np.diff(np.r_[0, change, len(flat)])
        counts = runs.tolist()
        if flat[0]:  # RLE starts with a zero-run by convention
            counts = [0] + counts
    return {"size": [int(h), int(w)], "counts": counts}


def rle_decode(rle: dict) -> np.ndarray:
    h, w = rle["size"]
    counts = np.asarray(rle["counts"], np.int32)
    if HAVE_NATIVE:
        out = np.empty((h, w), np.uint8)
        _LIB.rle_decode(np.ascontiguousarray(counts), len(counts), h, w,
                        out)
        return out
    flat = np.zeros(h * w, np.uint8)
    pos = 0
    val = 0
    for c in counts:
        if val:
            flat[pos:pos + c] = 1
        pos += c
        val ^= 1
    return flat.reshape(w, h).T


def mask_iou(a: np.ndarray, b: np.ndarray,
             iscrowd: bool = False) -> np.ndarray:
    """(N, H, W) x (M, H, W) binary masks -> (N, M) IoU."""
    a = np.ascontiguousarray(a.astype(np.uint8))
    b = np.ascontiguousarray(b.astype(np.uint8))
    n, h, w = a.shape
    m = b.shape[0]
    if HAVE_NATIVE:
        out = np.empty((n, m), np.float32)
        _LIB.mask_iou(a.reshape(n, -1), n, b.reshape(m, -1), m, h * w, out,
                      int(iscrowd))
        return out
    af = a.reshape(n, -1).astype(bool)
    bf = b.reshape(m, -1).astype(bool)
    inter = (af[:, None] & bf[None, :]).sum(-1)
    if iscrowd:
        union = af.sum(-1)[:, None]
    else:
        union = af.sum(-1)[:, None] + bf.sum(-1)[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 0.0
                    ).astype(np.float32)


def polys_to_mask(polys, h: int, w: int) -> np.ndarray:
    """COCO polygon list [[x0,y0,x1,y1,...], ...] -> (h, w) uint8 mask."""
    out = np.zeros((h, w), np.uint8)
    for poly in polys:
        pts = np.ascontiguousarray(np.asarray(poly, np.float64))
        npts = len(pts) // 2
        if npts < 3:
            continue
        if HAVE_NATIVE:
            part = np.zeros((h, w), np.uint8)
            _LIB.fill_poly(pts, npts, h, w, part)
        else:
            import cv2

            part = np.zeros((h, w), np.uint8)
            cv2.fillPoly(part, [pts.reshape(-1, 2).astype(np.int32)], 1)
        out |= part
    return out
