"""On-device training target assignment — anchors, RoI sampling, mask targets.

TPU-native replacement for the reference's host-side numpy target code
(reference: lib/roi_data/rpn.py ~280 LoC `add_rpn_blobs`;
lib/roi_data/fast_rcnn.py ~350 LoC fg/bg sampling;
lib/roi_data/mask_rcnn.py ~150 LoC `polys_to_mask_wrt_box`).

The reference computes these in DataLoader workers and *mid-forward* on the
host (SURVEY.md §3.1 note) — impossible under jit. Here everything is traced
device code with fixed shapes:

  * random subsampling uses `jax.random` with the "random-rank top-k" trick:
    candidates get uniform random keys, invalid ones get -inf, and top-k of
    the keys picks a uniform random subset of exactly-k slots (padded with
    invalid slots when fewer candidates exist);
  * ground truth arrives as fixed-size padded arrays (max_gt_instances) with
    a validity mask;
  * mask targets are produced by bilinearly sampling the GT instance mask
    (stored at a fixed reduced resolution) inside each sampled RoI — the
    traced equivalent of polys_to_mask_wrt_box + cv2.resize.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import Config
from ..ops import boxes as box_ops


class GroundTruth(NamedTuple):
    boxes: jnp.ndarray    # (B, G, 4) xyxy in padded-image coords
    classes: jnp.ndarray  # (B, G) int32 (>=1)
    masks: jnp.ndarray    # (B, G, mh, mw) float in [0,1], full padded frame
    valid: jnp.ndarray    # (B, G) bool
    # Optional COCO-style keypoints (B, G, K, 3) = (x, y, visibility) in
    # padded-image coords; None when the dataset has no keypoints
    # (reference: roidb 'gt_keypoints' entries, lib/utils/keypoints.py).
    keypoints: jnp.ndarray = None


class RPNTargets(NamedTuple):
    labels: jnp.ndarray        # (N,) {1, 0, -1}
    bbox_targets: jnp.ndarray  # (N, 4)


class SampledRoIs(NamedTuple):
    rois: jnp.ndarray          # (S, 4)
    labels: jnp.ndarray        # (S,) int32 class (0 = bg)
    bbox_targets: jnp.ndarray  # (S, 4) for the fg class
    valid: jnp.ndarray         # (S,) bool
    fg: jnp.ndarray            # (S,) bool
    gt_idx: jnp.ndarray        # (S,) int32 matched gt (for mask targets)


def _random_subset_mask(key, candidates: jnp.ndarray, k: int) -> jnp.ndarray:
    """Uniformly keep at most k True entries of `candidates` (N,) bool."""
    n = candidates.shape[0]
    r = jax.random.uniform(key, (n,))
    scores = jnp.where(candidates, r, -jnp.inf)
    _, idx = jax.lax.top_k(scores, min(k, n))
    mask = jnp.zeros((n,), bool).at[idx].set(True)
    return mask & candidates


def rpn_targets(key, anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
                gt_valid: jnp.ndarray, im_hw, cfg: Config) -> RPNTargets:
    """Anchor classification/regression targets (add_rpn_blobs semantics).

    anchors: (N, 4) all levels concatenated; gt_boxes: (G, 4).
    Labels: 1 fg (IoU >= pos_thresh OR best anchor per gt), 0 bg
    (IoU < neg_thresh), -1 ignore; subsampled to `batch_size_per_im` with
    <= fg_fraction positives. Anchors straddling the image are ignored.
    """
    r = cfg.rpn
    n = anchors.shape[0]
    iou = box_ops.pairwise_iou(anchors, gt_boxes,
                               legacy_plus1=cfg.model.legacy_plus1)  # (N, G)
    iou = jnp.where(gt_valid[None, :], iou, 0.0)

    max_iou = iou.max(axis=1)
    argmax_gt = iou.argmax(axis=1)

    # best anchor for each gt is positive (Detectron's "force match")
    best_per_gt = iou.max(axis=0)  # (G,)
    is_best = jnp.any((iou == best_per_gt[None, :]) & (best_per_gt[None, :]
                      > 1e-5) & gt_valid[None, :], axis=1)

    inside = ((anchors[:, 0] >= -r.straddle_thresh)
              & (anchors[:, 1] >= -r.straddle_thresh)
              & (anchors[:, 2] < im_hw[1] + r.straddle_thresh)
              & (anchors[:, 3] < im_hw[0] + r.straddle_thresh))

    fg_cand = inside & ((max_iou >= r.positive_overlap) | is_best)
    bg_cand = inside & (max_iou < r.negative_overlap) & ~fg_cand

    k1, k2 = jax.random.split(key)
    num_fg = int(r.fg_fraction * r.batch_size_per_im)
    fg = _random_subset_mask(k1, fg_cand, num_fg)
    num_bg = r.batch_size_per_im - num_fg  # fixed split (fg short => fewer)
    bg = _random_subset_mask(k2, bg_cand, num_bg)

    labels = jnp.where(fg, 1, jnp.where(bg, 0, -1))
    matched = gt_boxes[argmax_gt]
    tgts = box_ops.bbox_transform(anchors, matched, (1.0, 1.0, 1.0, 1.0),
                                  legacy_plus1=cfg.model.legacy_plus1)
    tgts = jnp.where(fg[:, None], tgts, 0.0)
    return RPNTargets(labels.astype(jnp.int32), tgts)


def sample_rois(key, proposals: jnp.ndarray, prop_valid: jnp.ndarray,
                gt: GroundTruth, image_idx: int, cfg: Config) -> SampledRoIs:
    """fg/bg RoI sampling for one image (fast_rcnn.py semantics).

    GT boxes are appended to the proposal set (Detectron behavior), fg are
    proposals with IoU >= fg_thresh, bg in [bg_lo, bg_hi); output is a
    fixed (batch_size_per_im,) sample with validity mask.
    """
    f = cfg.fast_rcnn
    gt_boxes = gt.boxes[image_idx]
    gt_classes = gt.classes[image_idx]
    gt_valid = gt.valid[image_idx]

    all_boxes = jnp.concatenate([proposals, gt_boxes], axis=0)
    all_valid = jnp.concatenate([prop_valid, gt_valid], axis=0)

    iou = box_ops.pairwise_iou(all_boxes, gt_boxes,
                               legacy_plus1=cfg.model.legacy_plus1)
    iou = jnp.where(gt_valid[None, :], iou, 0.0)
    max_iou = jnp.where(all_valid, iou.max(axis=1), 0.0)
    argmax_gt = iou.argmax(axis=1)

    fg_cand = max_iou >= f.fg_thresh
    bg_cand = (max_iou < f.bg_thresh_hi) & (max_iou >= f.bg_thresh_lo) \
        & all_valid

    k1, k2 = jax.random.split(key)
    num_fg = int(f.fg_fraction * f.batch_size_per_im)
    fg = _random_subset_mask(k1, fg_cand, num_fg)
    bg = _random_subset_mask(k2, bg_cand, f.batch_size_per_im - num_fg)
    chosen = fg | bg

    # Pack chosen rois into a fixed (S,) block: fg first (stable ordering
    # helps the mask branch take a fg prefix), then bg.
    s = f.batch_size_per_im
    rank = jnp.where(fg, 0, jnp.where(bg, 1, 2)) * (all_boxes.shape[0] + 1) \
        + jnp.arange(all_boxes.shape[0])
    order = jnp.argsort(rank)
    take = order[:s]

    rois = all_boxes[take]
    sel_fg = fg[take]
    sel_valid = chosen[take]
    midx = argmax_gt[take]
    labels = jnp.where(sel_fg, gt_classes[midx], 0)
    tgts = box_ops.bbox_transform(rois, gt_boxes[midx],
                                  cfg.model.bbox_reg_weights,
                                  legacy_plus1=cfg.model.legacy_plus1)
    tgts = jnp.where(sel_fg[:, None], tgts, 0.0)
    return SampledRoIs(rois, labels.astype(jnp.int32), tgts, sel_valid,
                       sel_fg, midx.astype(jnp.int32))


def mask_targets(gt_masks: jnp.ndarray, rois: jnp.ndarray,
                 gt_idx: jnp.ndarray, padded_hw: Tuple[int, int],
                 resolution: int) -> jnp.ndarray:
    """Crop GT instance masks to RoIs, resample to (res, res), binarize.

    gt_masks: (G, mh, mw) over the padded frame; rois: (S, 4) padded-image
    coords. Traced equivalent of polys_to_mask_wrt_box.
    """
    g, mh, mw = gt_masks.shape
    ph, pw = padded_hw
    sel = gt_masks[gt_idx]  # (S, mh, mw)

    # Sample grid: res x res points inside each roi, mapped to mask coords.
    x1, y1, x2, y2 = rois[:, 0], rois[:, 1], rois[:, 2], rois[:, 3]
    ys = (y1[:, None] + (jnp.arange(resolution) + 0.5) / resolution
          * jnp.maximum(y2 - y1, 1e-6)[:, None]) * (mh / ph)
    xs = (x1[:, None] + (jnp.arange(resolution) + 0.5) / resolution
          * jnp.maximum(x2 - x1, 1e-6)[:, None]) * (mw / pw)

    yi = jnp.clip(ys - 0.5, 0, mh - 1)
    xi = jnp.clip(xs - 0.5, 0, mw - 1)
    y0 = jnp.floor(yi).astype(jnp.int32)
    x0 = jnp.floor(xi).astype(jnp.int32)
    y1i = jnp.minimum(y0 + 1, mh - 1)
    x1i = jnp.minimum(x0 + 1, mw - 1)
    wy = yi - y0
    wx = xi - x0

    def bilin(m, y0_, y1_, x0_, x1_, wy_, wx_):
        # m: (mh, mw); indices (res,) each axis -> (res, res)
        v00 = m[y0_][:, x0_]
        v01 = m[y0_][:, x1_]
        v10 = m[y1_][:, x0_]
        v11 = m[y1_][:, x1_]
        return (v00 * (1 - wy_)[:, None] * (1 - wx_)[None, :]
                + v01 * (1 - wy_)[:, None] * wx_[None, :]
                + v10 * wy_[:, None] * (1 - wx_)[None, :]
                + v11 * wy_[:, None] * wx_[None, :])

    out = jax.vmap(bilin)(sel, y0, y1i, x0, x1i, wy, wx)
    return (out >= 0.5).astype(jnp.float32)


def keypoint_targets(gt_kps: jnp.ndarray, rois: jnp.ndarray,
                     gt_idx: jnp.ndarray, fg_valid: jnp.ndarray,
                     heatmap_size: int
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Map GT keypoints into per-RoI heatmap cells
    (reference: lib/utils/keypoints.py::keypoints_to_heatmap_labels +
    lib/roi_data/keypoint_rcnn.py::add_keypoint_rcnn_blobs).

    gt_kps: (G, K, 3) (x, y, vis) padded-image coords; rois: (S, 4);
    gt_idx: (S,) matched gt per roi; fg_valid: (S,) bool.
    Returns (targets (S, K) int32 flattened heatmap index,
             valid (S, K) bool — visible AND inside the roi AND fg roi).
    """
    sel = gt_kps[gt_idx]                       # (S, K, 3)
    x, y, vis = sel[..., 0], sel[..., 1], sel[..., 2]
    x1, y1 = rois[:, 0:1], rois[:, 1:2]
    x2, y2 = rois[:, 2:3], rois[:, 3:4]
    sx = heatmap_size / jnp.maximum(x2 - x1, 1e-6)
    sy = heatmap_size / jnp.maximum(y2 - y1, 1e-6)
    hx = jnp.floor((x - x1) * sx)
    hy = jnp.floor((y - y1) * sy)
    # Detectron edge rule: a keypoint exactly on the far roi edge lands in
    # the last cell rather than falling out.
    hx = jnp.where((x == x2) & (hx == heatmap_size), heatmap_size - 1, hx)
    hy = jnp.where((y == y2) & (hy == heatmap_size), heatmap_size - 1, hy)
    inside = (hx >= 0) & (hx < heatmap_size) & (hy >= 0) & (hy < heatmap_size)
    valid = inside & (vis > 0) & fg_valid[:, None]
    tgt = (hy * heatmap_size + hx).astype(jnp.int32)
    return jnp.where(valid, tgt, 0), valid
