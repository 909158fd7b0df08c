"""Detection / mask visualization (reference: lib/utils/vis.py ~600 LoC).

cv2-based overlay rendering: colored instance masks, boxes, class+score
labels — the infer_simple.py output format, without matplotlib.
"""

from __future__ import annotations

import numpy as np

_COLORS = np.array([
    (31, 119, 180), (255, 127, 14), (44, 160, 44), (214, 39, 40),
    (148, 103, 189), (140, 86, 75), (227, 119, 194), (127, 127, 127),
    (188, 189, 34), (23, 190, 207),
], np.float32)


def draw_detections(im_bgr: np.ndarray, boxes: np.ndarray,
                    scores: np.ndarray, classes: np.ndarray,
                    valid: np.ndarray,
                    masks: np.ndarray | None = None,
                    class_names: list | None = None,
                    alpha: float = 0.45) -> np.ndarray:
    """Render detections on a BGR image. masks: (N, H, W) bool, optional."""
    import cv2

    out = im_bgr.astype(np.float32).copy()
    order = np.argsort(scores)  # draw high scores last (on top)
    for i in order:
        if not valid[i]:
            continue
        color = _COLORS[int(classes[i]) % len(_COLORS)]
        if masks is not None:
            m = masks[i].astype(bool)
            out[m] = out[m] * (1 - alpha) + color[::-1] * alpha
        x1, y1, x2, y2 = (int(v) for v in boxes[i])
        cv2.rectangle(out, (x1, y1), (x2, y2), tuple(map(int, color[::-1])),
                      2)
        name = (class_names[int(classes[i])] if class_names
                else f"cls{int(classes[i])}")
        label = f"{name} {scores[i]:.2f}"
        cv2.putText(out, label, (x1, max(y1 - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                    tuple(map(int, color[::-1])), 1, cv2.LINE_AA)
    return np.clip(out, 0, 255).astype(np.uint8)


def draw_indexed_map(im_bgr: np.ndarray, idmap: np.ndarray,
                     alpha: float = 0.5) -> np.ndarray:
    """Overlay a VOS indexed id map on a frame."""
    from ..data.davis import davis_palette

    pal = davis_palette()
    out = im_bgr.astype(np.float32).copy()
    for oid in np.unique(idmap):
        if oid == 0:
            continue
        m = idmap == oid
        out[m] = out[m] * (1 - alpha) + pal[oid][::-1].astype(np.float32) \
            * alpha
    return np.clip(out, 0, 255).astype(np.uint8)
