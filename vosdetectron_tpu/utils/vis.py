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
        if not valid[i] or masks is None:
            continue
        color = _COLORS[int(classes[i]) % len(_COLORS)]
        m = masks[i].astype(bool)
        out[m] = out[m] * (1 - alpha) + color[::-1] * alpha
    # shapes/text on the uint8 canvas (cv2 5.x putText requires CV_8U)
    out = np.clip(out, 0, 255).astype(np.uint8)
    for i in order:
        if not valid[i]:
            continue
        color = _COLORS[int(classes[i]) % len(_COLORS)]
        x1, y1, x2, y2 = (int(v) for v in boxes[i])
        cv2.rectangle(out, (x1, y1), (x2, y2), tuple(map(int, color[::-1])),
                      2)
        name = (class_names[int(classes[i])] if class_names
                else f"cls{int(classes[i])}")
        label = f"{name} {scores[i]:.2f}"
        cv2.putText(out, label, (x1, max(y1 - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                    tuple(map(int, color[::-1])), 1, cv2.LINE_AA)
    return out


def draw_indexed_map(im_bgr: np.ndarray, idmap: np.ndarray,
                     alpha: float = 0.5,
                     contours: bool = True) -> np.ndarray:
    """Overlay a VOS indexed id map on a frame (+object boundaries)."""
    import cv2

    from ..data.davis import davis_palette

    pal = davis_palette()
    out = im_bgr.astype(np.float32).copy()
    ids = [oid for oid in np.unique(idmap) if oid != 0]
    for oid in ids:
        m = idmap == oid
        color = pal[oid][::-1].astype(np.float32)
        out[m] = out[m] * (1 - alpha) + color * alpha
    out = np.clip(out, 0, 255).astype(np.uint8)
    if contours:
        for oid in ids:
            m = idmap == oid
            color = pal[oid][::-1]
            cs, _ = cv2.findContours(m.astype(np.uint8),
                                     cv2.RETR_EXTERNAL,
                                     cv2.CHAIN_APPROX_SIMPLE)
            cv2.drawContours(out, cs, -1, tuple(map(int, color)), 2)
    return out


def draw_masks_contours(im_bgr: np.ndarray, masks: np.ndarray,
                        valid: np.ndarray | None = None,
                        alpha: float = 0.45,
                        thickness: int = 2) -> np.ndarray:
    """Soft-blend instance masks + crisp boundary contours
    (reference: vis.py::vis_mask + the boundary drawing in vis_one_image).
    masks: (N, H, W) bool/float."""
    import cv2

    out = im_bgr.astype(np.float32).copy()
    n = len(masks)
    v = np.ones(n, bool) if valid is None else valid
    for i in range(n):
        if not v[i]:
            continue
        m = masks[i] > 0.5
        color = _COLORS[i % len(_COLORS)][::-1]
        out[m] = out[m] * (1 - alpha) + color * alpha
    out = np.clip(out, 0, 255).astype(np.uint8)
    for i in range(n):
        if not v[i]:
            continue
        m = masks[i] > 0.5
        color = _COLORS[i % len(_COLORS)][::-1]
        cs, _ = cv2.findContours(m.astype(np.uint8), cv2.RETR_EXTERNAL,
                                 cv2.CHAIN_APPROX_SIMPLE)
        cv2.drawContours(out, cs, -1, tuple(map(int, color)), thickness)
    return out


# COCO person skeleton edges over the 17 keypoints
# (reference: vis.py::vis_keypoints kp_lines from the dataset skeleton).
COCO_SKELETON = (
    (15, 13), (13, 11), (16, 14), (14, 12), (11, 12), (5, 11), (6, 12),
    (5, 6), (5, 7), (6, 8), (7, 9), (8, 10), (1, 2), (0, 1), (0, 2),
    (1, 3), (2, 4), (3, 5), (4, 6))


def draw_keypoints(im_bgr: np.ndarray, keypoints: np.ndarray,
                   valid: np.ndarray | None = None,
                   kp_thresh: float = 0.05,
                   radius: int = 3,
                   skeleton=COCO_SKELETON) -> np.ndarray:
    """Render per-instance keypoints + skeleton edges
    (reference: lib/utils/vis.py::vis_keypoints).

    keypoints: (N, K, 3) x, y, score; an edge draws only when both of its
    endpoints clear kp_thresh."""
    import cv2

    out = im_bgr.astype(np.uint8).copy()
    n, k = keypoints.shape[:2]
    v = np.ones(n, bool) if valid is None else valid
    for i in range(n):
        if not v[i]:
            continue
        color = tuple(int(c) for c in _COLORS[i % len(_COLORS)][::-1])
        kp = keypoints[i]
        ok = kp[:, 2] >= kp_thresh
        for a, b in skeleton or ():
            if a < k and b < k and ok[a] and ok[b]:
                cv2.line(out, (int(kp[a, 0]), int(kp[a, 1])),
                         (int(kp[b, 0]), int(kp[b, 1])), color, 2,
                         cv2.LINE_AA)
        for j in range(k):
            if ok[j]:
                cv2.circle(out, (int(kp[j, 0]), int(kp[j, 1])), radius,
                           color, -1, cv2.LINE_AA)
    return out


def side_by_side(ims: list, labels: list | None = None,
                 pad: int = 4) -> np.ndarray:
    """Horizontal composition of same-height BGR frames (pred vs GT
    debugging panels; reference vis.py builds similar comparison plates).
    """
    import cv2

    ims = [im.astype(np.uint8) for im in ims]
    h = max(im.shape[0] for im in ims)
    cols = []
    for i, im in enumerate(ims):
        if im.shape[0] != h:
            s = h / im.shape[0]
            im = cv2.resize(im, (int(im.shape[1] * s), h))
        if labels:
            im = im.copy()
            cv2.putText(im, str(labels[i]), (8, 22),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.7, (255, 255, 255), 2,
                        cv2.LINE_AA)
        cols.append(im)
        if i + 1 < len(ims):
            cols.append(np.full((h, pad, 3), 255, np.uint8))
    return np.concatenate(cols, axis=1)


def vis_one_image(im_bgr: np.ndarray, boxes: np.ndarray,
                  scores: np.ndarray, classes: np.ndarray,
                  valid: np.ndarray,
                  masks: np.ndarray | None = None,
                  class_names: list | None = None,
                  score_thresh: float = 0.5,
                  keypoints: np.ndarray | None = None,
                  out_path: str | None = None) -> np.ndarray:
    """The infer_simple.py-style single-image panel: thresholded
    detections with masks, contours, keypoint skeletons, and labels;
    optionally written to disk (reference: vis.py::vis_one_image)."""
    import cv2

    keep = valid & (scores >= score_thresh)
    out = im_bgr
    if masks is not None:
        out = draw_masks_contours(out, masks[keep])
        masks_arg = None  # already blended
    else:
        masks_arg = None
    out = draw_detections(out, boxes[keep], scores[keep], classes[keep],
                          np.ones(int(keep.sum()), bool), masks_arg,
                          class_names)
    if keypoints is not None:
        out = draw_keypoints(out, keypoints[keep])
    if out_path:
        cv2.imwrite(out_path, out)
    return out


def vis_sequence_strip(frames: np.ndarray, idmaps: list,
                       every: int = 8, max_panels: int = 6) -> np.ndarray:
    """Filmstrip of a VOS sequence: every k-th frame with its id-map
    overlay — the quick-look debugging artifact for tracking drift."""
    picks = list(range(0, len(frames), max(every, 1)))[:max_panels]
    panels = [draw_indexed_map(frames[i], idmaps[i]) for i in picks]
    return side_by_side(panels, labels=[f"t={i}" for i in picks])
