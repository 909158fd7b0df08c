"""Detectron-style anchor generation (reference: lib/modeling/generate_anchors.py).

Anchors are generated once at trace time with numpy (static shapes — feature
map sizes are compile-time constants under jit) and closed over as constants,
so there is zero per-step anchor cost on device.

Semantics match the Caffe/Detectron generator: a base (stride x stride) box
centered at (stride-1)/2 is enumerated over aspect ratios (round(sqrt) trick)
then scales, and shifted over the feature grid.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def generate_cell_anchors(stride: int,
                          sizes: Sequence[float],
                          aspect_ratios: Sequence[float]) -> np.ndarray:
    """(len(sizes)*len(aspect_ratios), 4) xyxy anchors for one cell."""
    base = np.array([1, 1, stride, stride], dtype=np.float64) - 1

    def _whctrs(anchor):
        w = anchor[2] - anchor[0] + 1
        h = anchor[3] - anchor[1] + 1
        return w, h, anchor[0] + 0.5 * (w - 1), anchor[1] + 0.5 * (h - 1)

    def _mkanchors(ws, hs, x_ctr, y_ctr):
        ws, hs = ws[:, None], hs[:, None]
        return np.hstack([
            x_ctr - 0.5 * (ws - 1), y_ctr - 0.5 * (hs - 1),
            x_ctr + 0.5 * (ws - 1), y_ctr + 0.5 * (hs - 1),
        ])

    w, h, x_ctr, y_ctr = _whctrs(base)
    size = w * h
    ws = np.round(np.sqrt(size / np.asarray(aspect_ratios)))
    hs = np.round(ws * np.asarray(aspect_ratios))
    ratio_anchors = _mkanchors(ws, hs, x_ctr, y_ctr)

    out = []
    for ra in ratio_anchors:
        w, h, x_ctr, y_ctr = _whctrs(ra)
        scales = np.asarray(sizes, dtype=np.float64) / stride
        out.append(_mkanchors(w * scales, h * scales, x_ctr, y_ctr))
    # Order: for each aspect ratio, all scales — then reshape so the layout is
    # (ratio, scale). Detectron iterates ratios outer, scales inner.
    return np.vstack(out).astype(np.float32)


def shifted_anchors(feat_h: int, feat_w: int, stride: int,
                    cell_anchors: np.ndarray) -> np.ndarray:
    """All anchors over an (feat_h, feat_w) grid: (H*W*A, 4) float32.

    Row-major over (y, x, anchor) — this ordering must match how per-location
    RPN predictions are flattened in models/rpn.py.
    """
    shift_x = np.arange(feat_w, dtype=np.float32) * stride
    shift_y = np.arange(feat_h, dtype=np.float32) * stride
    sx, sy = np.meshgrid(shift_x, shift_y)
    shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=1)
    all_anchors = (cell_anchors[None, :, :] + shifts[:, None, :])
    return all_anchors.reshape(-1, 4).astype(np.float32)


def fpn_anchors(feat_shapes: Sequence[Tuple[int, int]],
                min_level: int,
                anchor_start_size: int,
                aspect_ratios: Sequence[float]) -> list:
    """Per-FPN-level anchors. Level l has stride 2**l and a single size
    anchor_start_size * 2**(l - min_level) (Detectron FPN convention)."""
    out = []
    for i, (fh, fw) in enumerate(feat_shapes):
        level = min_level + i
        stride = 2 ** level
        size = anchor_start_size * (2 ** i)
        cell = generate_cell_anchors(stride, [size], aspect_ratios)
        out.append(shifted_anchors(fh, fw, stride, cell))
    return out
