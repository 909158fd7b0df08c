"""Box geometry ops — pure jnp, fully traced, fixed-shape.

TPU-native replacement for the reference's host-side box utilities
(reference: lib/utils/boxes.py ~450 LoC + lib/utils/cython_bbox.pyx).
Everything here runs on device inside jit; pairwise IoU is a broadcasted
vector op instead of a Cython double loop.

Conventions:
  * boxes are float32 ``(..., 4)`` in xyxy order, *inclusive-exclusive*
    continuous coordinates (Detectron legacy "+1" box area semantics are
    preserved behind ``legacy_plus1`` where parity requires it).
  * invalid/padded boxes are all-zeros and callers carry a validity mask.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# Detectron clamps dw/dh before exp to avoid overflow:
# log(1000/16), reference lib/utils/boxes.py::bbox_transform.
# (math, not jnp: a jnp op here runs ON DEVICE AT IMPORT TIME — with a
# stalled device link, `import vosdetectron_tpu.ops.boxes` hung forever
# before the program printed anything.)
BBOX_XFORM_CLIP = math.log(1000.0 / 16.0)


def box_area(boxes: jnp.ndarray, legacy_plus1: bool = False) -> jnp.ndarray:
    off = 1.0 if legacy_plus1 else 0.0
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0] + off, 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1] + off, 0.0)
    return w * h


def pairwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
                 legacy_plus1: bool = False) -> jnp.ndarray:
    """(N,4),(M,4) -> (N,M) IoU. Replaces cython_bbox.bbox_overlaps."""
    off = 1.0 if legacy_plus1 else 0.0
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.maximum(rb - lt + off, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    a1 = box_area(boxes1, legacy_plus1)[:, None]
    a2 = box_area(boxes2, legacy_plus1)[None, :]
    union = a1 + a2 - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def bbox_transform_inv(boxes: jnp.ndarray, deltas: jnp.ndarray,
                       weights=(10.0, 10.0, 5.0, 5.0),
                       legacy_plus1: bool = False) -> jnp.ndarray:
    """Apply regression deltas to boxes (reference: boxes.py::bbox_transform).

    boxes: (..., 4) xyxy; deltas: (..., 4) (dx, dy, dw, dh) scaled by weights.
    legacy_plus1 reproduces original Detectron integer-box semantics
    (width = x2 - x1 + 1, predicted x2 = ctr + 0.5w - 1).
    """
    off = 1.0 if legacy_plus1 else 0.0
    wx, wy, ww, wh = weights
    widths = boxes[..., 2] - boxes[..., 0] + off
    heights = boxes[..., 3] - boxes[..., 1] + off
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, BBOX_XFORM_CLIP)
    dh = jnp.minimum(deltas[..., 3] / wh, BBOX_XFORM_CLIP)

    pred_ctr_x = dx * widths + ctr_x
    pred_ctr_y = dy * heights + ctr_y
    pred_w = jnp.exp(dw) * widths
    pred_h = jnp.exp(dh) * heights

    return jnp.stack([
        pred_ctr_x - 0.5 * pred_w,
        pred_ctr_y - 0.5 * pred_h,
        pred_ctr_x + 0.5 * pred_w - off,
        pred_ctr_y + 0.5 * pred_h - off,
    ], axis=-1)


def bbox_transform(boxes: jnp.ndarray, gt_boxes: jnp.ndarray,
                   weights=(10.0, 10.0, 5.0, 5.0),
                   legacy_plus1: bool = False) -> jnp.ndarray:
    """Regression targets from boxes to gt (reference: bbox_transform_inv)."""
    off = 1.0 if legacy_plus1 else 0.0
    wx, wy, ww, wh = weights
    ex_w = jnp.maximum(boxes[..., 2] - boxes[..., 0] + off, 1e-6)
    ex_h = jnp.maximum(boxes[..., 3] - boxes[..., 1] + off, 1e-6)
    ex_cx = boxes[..., 0] + 0.5 * ex_w
    ex_cy = boxes[..., 1] + 0.5 * ex_h

    gt_w = jnp.maximum(gt_boxes[..., 2] - gt_boxes[..., 0] + off, 1e-6)
    gt_h = jnp.maximum(gt_boxes[..., 3] - gt_boxes[..., 1] + off, 1e-6)
    gt_cx = gt_boxes[..., 0] + 0.5 * gt_w
    gt_cy = gt_boxes[..., 1] + 0.5 * gt_h

    return jnp.stack([
        wx * (gt_cx - ex_cx) / ex_w,
        wy * (gt_cy - ex_cy) / ex_h,
        ww * jnp.log(gt_w / ex_w),
        wh * jnp.log(gt_h / ex_h),
    ], axis=-1)


def clip_boxes(boxes: jnp.ndarray, im_hw,
               legacy_plus1: bool = False) -> jnp.ndarray:
    """Clip xyxy boxes to the image (reference: clip_tiled_boxes —
    legacy clips to w-1/h-1, the integer-box convention)."""
    off = 1.0 if legacy_plus1 else 0.0
    h, w = im_hw[0] - off, im_hw[1] - off
    x1 = jnp.clip(boxes[..., 0], 0.0, w)
    y1 = jnp.clip(boxes[..., 1], 0.0, h)
    x2 = jnp.clip(boxes[..., 2], 0.0, w)
    y2 = jnp.clip(boxes[..., 3], 0.0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def filter_small_boxes(boxes: jnp.ndarray, min_size: float,
                       legacy_plus1: bool = False) -> jnp.ndarray:
    """Validity mask for boxes with both sides >= min_size."""
    off = 1.0 if legacy_plus1 else 0.0
    w = boxes[..., 2] - boxes[..., 0] + off
    h = boxes[..., 3] - boxes[..., 1] + off
    return (w >= min_size) & (h >= min_size)


def xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    x, y, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return jnp.stack([x, y, x + w, y + h], axis=-1)


def xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = (boxes[..., 0], boxes[..., 1],
                      boxes[..., 2], boxes[..., 3])
    return jnp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1)
