"""Single/batched-frame inference engine — the `im_detect_all` equivalent.

TPU-native re-design of the reference's inference path
(reference: lib/core/test.py ~900 LoC: im_detect_all -> im_detect_bbox ->
box_results_with_nms_and_limit -> im_detect_mask -> segm_results).

The reference runs per-image Python with host NMS and cv2 mask paste; here
the whole chain — softmax, per-class delta decode, score threshold,
class-offset NMS, top-K limiting, mask head, on-device paste — is one jitted
program over a fixed batch, with validity masks instead of dynamic shapes.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models.generalized_rcnn import GeneralizedRCNN, RCNNOutputs
from ..ops import boxes as box_ops
from ..ops.nms import batched_nms
from ..ops.mask_paste import paste_masks_in_image


class Detections(NamedTuple):
    boxes: jnp.ndarray    # (B, D, 4) xyxy, image coords
    scores: jnp.ndarray   # (B, D)
    classes: jnp.ndarray  # (B, D) int32 (1..K-1)
    valid: jnp.ndarray    # (B, D) bool
    masks: Optional[jnp.ndarray] = None  # (B, D, M, M) sigmoid probs
    keypoints: Optional[jnp.ndarray] = None  # (B, D, K, 3) x, y, prob


# ---------------------------------------------------------------------------
# Post-processing (reference: box_results_with_nms_and_limit)
# ---------------------------------------------------------------------------


def postprocess_boxes(outputs: RCNNOutputs, im_hw: jnp.ndarray,
                      cfg: Config, candidate_topk: int = 1000) -> Detections:
    """Per-class decode + threshold + NMS + detections-per-image limit.

    Fixed-shape strategy: flatten (R rois x K-1 classes) score grid, take
    the top `candidate_topk` candidates, run ONE class-offset NMS over them,
    keep the top `cfg.test.detections_per_im`.
    """
    probs = jax.nn.softmax(outputs.cls_scores, axis=-1)  # (B, R, K)
    b, r, k = probs.shape
    deltas = outputs.bbox_deltas.reshape(b, r, -1, 4)
    nbox = deltas.shape[2]

    def per_image(probs_i, deltas_i, rois_i, roi_valid_i, hw):
        # per-class decoded boxes: (R, K, 4)
        if nbox == 2:  # class-agnostic
            dec = box_ops.bbox_transform_inv(
                rois_i[:, None, :], deltas_i[:, 1:2, :],
                cfg.model.bbox_reg_weights,
                legacy_plus1=cfg.model.legacy_plus1)
            dec = jnp.broadcast_to(dec, (r, k, 4))
        else:
            dec = box_ops.bbox_transform_inv(
                rois_i[:, None, :], deltas_i, cfg.model.bbox_reg_weights,
                legacy_plus1=cfg.model.legacy_plus1)
        dec = box_ops.clip_boxes(dec, hw,
                                 legacy_plus1=cfg.model.legacy_plus1)

        # drop background column; flatten (R*(K-1),)
        fg_probs = probs_i[:, 1:]
        fg_boxes = dec[:, 1:, :]
        flat_scores = fg_probs.reshape(-1)
        flat_boxes = fg_boxes.reshape(-1, 4)
        flat_cls = jnp.broadcast_to(
            jnp.arange(1, k, dtype=jnp.int32)[None, :], (r, k - 1)
        ).reshape(-1)
        flat_valid = jnp.broadcast_to(roi_valid_i[:, None], (r, k - 1)
                                      ).reshape(-1)
        score_ok = (flat_scores > cfg.test.score_thresh) & flat_valid
        masked = jnp.where(score_ok, flat_scores, -jnp.inf)

        topk = min(candidate_topk, masked.shape[0])
        cand_scores, cand_idx = jax.lax.top_k(masked, topk)
        cand_valid = jnp.isfinite(cand_scores)
        cand_boxes = flat_boxes[cand_idx]
        cand_cls = flat_cls[cand_idx]

        safe_scores = jnp.where(cand_valid, cand_scores, -1e10)
        if cfg.test.soft_nms_enabled:
            # Per-class soft-NMS via the class-offset trick
            # (reference: cython_nms.soft_nms dispatched per class).
            max_c = jnp.max(cand_boxes) + 1.0
            off = cand_cls.astype(cand_boxes.dtype)[:, None] * max_c
            from ..ops.nms import soft_nms as soft_nms_traced

            idx, keep_valid, kept_scores = soft_nms_traced(
                cand_boxes + off, safe_scores,
                cfg.test.detections_per_im,
                method=cfg.test.soft_nms_method,
                sigma=cfg.test.soft_nms_sigma,
                score_thresh=cfg.test.score_thresh, valid=cand_valid,
                legacy_plus1=cfg.model.legacy_plus1)
        else:
            idx, keep_valid, kept_scores = batched_nms(
                cand_boxes, safe_scores, cand_cls, cfg.test.nms,
                cfg.test.detections_per_im, valid=cand_valid,
                legacy_plus1=cfg.model.legacy_plus1)
        out_boxes = cand_boxes[idx]
        if cfg.test.bbox_vote_enabled:
            from ..ops.nms import box_voting

            out_boxes = box_voting(out_boxes, keep_valid, cand_boxes,
                                   jnp.maximum(safe_scores, 0.0),
                                   cand_valid, cfg.test.bbox_vote_thresh,
                                   legacy_plus1=cfg.model.legacy_plus1)
        return (out_boxes, kept_scores, cand_cls[idx],
                keep_valid & (kept_scores > cfg.test.score_thresh))

    boxes, scores, classes, valid = jax.vmap(per_image)(
        probs, deltas, outputs.proposals.boxes, outputs.proposals.valid,
        im_hw)
    return Detections(boxes, scores, classes, valid)


def select_class_masks(mask_logits: jnp.ndarray,
                       classes: jnp.ndarray) -> jnp.ndarray:
    """(B, D, M, M, K), (B, D) -> (B, D, M, M) sigmoid of the target class."""
    sel = jnp.take_along_axis(
        mask_logits, classes[:, :, None, None, None].astype(jnp.int32),
        axis=-1)[..., 0]
    return jax.nn.sigmoid(sel)


def decode_keypoints(kp_logits: jnp.ndarray,
                     boxes: jnp.ndarray) -> jnp.ndarray:
    """Heatmap logits -> image-coordinate keypoints
    (reference: lib/utils/keypoints.py::heatmaps_to_keypoints, which
    cv2-resizes each heatmap to the roi and takes the argmax; here the
    argmax runs on the fixed heatmap grid with a parabolic sub-cell
    refinement — fully on-device, fixed shapes, no per-roi host resize).

    kp_logits: (B, D, Hm, Wm, K); boxes: (B, D, 4) xyxy image coords.
    Returns (B, D, K, 3): x, y in image coords; softmax prob of the peak.
    """
    b, d, hm, wm, k = kp_logits.shape
    logits = kp_logits.reshape(b * d, hm * wm, k).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=1)
    idx = jnp.argmax(logits, axis=1)                       # (BD, K)
    peak = jnp.take_along_axis(probs, idx[:, None, :], axis=1)[:, 0, :]
    iy = idx // wm
    ix = idx % wm

    # Parabolic (3-point quadratic) refinement of the peak along each axis,
    # clamped to +-0.5 cell; recovers most of the reference's sub-cell
    # accuracy without the per-roi cubic resize.
    grid = logits.reshape(b * d, hm, wm, k)

    def axis_offset(center, lo, hi):
        denom = lo + hi - 2.0 * center
        off = jnp.where(jnp.abs(denom) > 1e-6,
                        0.5 * (lo - hi) / jnp.where(
                            jnp.abs(denom) > 1e-6, denom, 1.0), 0.0)
        return jnp.clip(off, -0.5, 0.5)

    bd = jnp.arange(b * d)[:, None]
    kk = jnp.arange(k)[None, :]
    cx = grid[bd, iy, ix, kk]
    offx = axis_offset(cx,
                       grid[bd, iy, jnp.maximum(ix - 1, 0), kk],
                       grid[bd, iy, jnp.minimum(ix + 1, wm - 1), kk])
    offy = axis_offset(cx,
                       grid[bd, jnp.maximum(iy - 1, 0), ix, kk],
                       grid[bd, jnp.minimum(iy + 1, hm - 1), ix, kk])

    bx = boxes.reshape(b * d, 4)
    x1, y1 = bx[:, 0:1], bx[:, 1:2]
    sw = (bx[:, 2:3] - bx[:, 0:1]) / wm
    sh = (bx[:, 3:4] - bx[:, 1:2]) / hm
    x = x1 + (ix.astype(jnp.float32) + 0.5 + offx) * sw
    y = y1 + (iy.astype(jnp.float32) + 0.5 + offy) * sh
    out = jnp.stack([x, y, peak], axis=-1)                  # (BD, K, 3)
    return out.reshape(b, d, k, 3)


def collect_candidates(outputs: RCNNOutputs, im_hw: jnp.ndarray,
                       cfg: Config, topk: int = 1000):
    """Pre-NMS per-class candidates (for test-time augmentation merging).

    Returns (boxes (B, K, 4), scores (B, K), classes (B, K), valid (B, K)).
    """
    probs = jax.nn.softmax(outputs.cls_scores, axis=-1)
    b, r, k = probs.shape
    deltas = outputs.bbox_deltas.reshape(b, r, -1, 4)
    nbox = deltas.shape[2]

    def per_image(probs_i, deltas_i, rois_i, roi_valid_i, hw):
        if nbox == 2:
            dec = box_ops.bbox_transform_inv(
                rois_i[:, None, :], deltas_i[:, 1:2, :],
                cfg.model.bbox_reg_weights,
                legacy_plus1=cfg.model.legacy_plus1)
            dec = jnp.broadcast_to(dec, (r, k, 4))
        else:
            dec = box_ops.bbox_transform_inv(
                rois_i[:, None, :], deltas_i, cfg.model.bbox_reg_weights,
                legacy_plus1=cfg.model.legacy_plus1)
        dec = box_ops.clip_boxes(dec, hw,
                                 legacy_plus1=cfg.model.legacy_plus1)
        fg_probs = probs_i[:, 1:].reshape(-1)
        fg_boxes = dec[:, 1:, :].reshape(-1, 4)
        fg_cls = jnp.broadcast_to(
            jnp.arange(1, k, dtype=jnp.int32)[None], (r, k - 1)).reshape(-1)
        fg_valid = jnp.broadcast_to(roi_valid_i[:, None],
                                    (r, k - 1)).reshape(-1)
        masked = jnp.where(fg_valid & (fg_probs > cfg.test.score_thresh),
                           fg_probs, -jnp.inf)
        sc, idx = jax.lax.top_k(masked, min(topk, masked.shape[0]))
        return fg_boxes[idx], sc, fg_cls[idx], jnp.isfinite(sc)

    return jax.vmap(per_image)(probs, deltas, outputs.proposals.boxes,
                               outputs.proposals.valid, im_hw)


# ---------------------------------------------------------------------------
# Preprocessing (reference: lib/utils/blob.py::prep_im_for_blob)
# ---------------------------------------------------------------------------


def preprocess_np(im_bgr: np.ndarray, target_scale: int, max_size: int,
                  padded_hw: Tuple[int, int],
                  pixel_means: Tuple[float, float, float],
                  pixel_stds: Tuple[float, float, float] = (1.0, 1.0, 1.0)
                  ) -> Tuple[np.ndarray, np.ndarray, float]:
    """Host-side: BGR uint8 HWC -> float32 padded NHWC-ready frame.

    Returns (padded image (H, W, 3), effective (h, w) after resize, scale).
    Resize: shortest side -> target_scale, capped so longest <= max_size.
    """
    import cv2

    h, w = im_bgr.shape[:2]
    scale = min(target_scale / min(h, w), max_size / max(h, w))
    nh, nw = int(round(h * scale)), int(round(w * scale))
    im = cv2.resize(im_bgr.astype(np.float32), (nw, nh),
                    interpolation=cv2.INTER_LINEAR)
    im -= np.asarray(pixel_means, np.float32)
    im /= np.asarray(pixel_stds, np.float32)
    ph, pw = padded_hw
    out = np.zeros((ph, pw, 3), np.float32)
    out[:nh, :nw] = im[:ph, :pw]
    return out, np.asarray([nh, nw], np.float32), scale


# ---------------------------------------------------------------------------
# Detector — owns params + the jitted programs
# ---------------------------------------------------------------------------


class Detector:
    """End-to-end frame detector (the `test_net` engine core).

    Wraps a GeneralizedRCNN with jitted detect / detect+mask programs.
    """

    def __init__(self, cfg: Config, params=None, rng: int = 0):
        from ..utils.jax_setup import setup

        setup()
        self.cfg = cfg
        from ..models.convs import set_conv_impl

        set_conv_impl(cfg.model.conv_impl)
        self.model = GeneralizedRCNN(cfg)
        if params is None:
            params = self.init_params(jax.random.PRNGKey(rng))
        # Commit weights to the device once — host-resident params are
        # re-uploaded on every jitted call (~150 MB/call through the
        # tunnel; see VOSEngine.__init__).
        self.params = jax.device_put(params, jax.local_devices()[0])

    def init_params(self, key):
        from ..models.generalized_rcnn import init_model_params

        return init_model_params(self.model, key,
                                 self.cfg.test.padded_image_size)

    @partial(jax.jit, static_argnums=(0,))
    def _detect(self, params, images, im_hw) -> Detections:
        out = self.model.apply({"params": params}, images, im_hw)
        dets = postprocess_boxes(out, im_hw, self.cfg)
        if self.cfg.model.mask_on:
            mask_logits = self.model.apply(
                {"params": params}, out.feats, dets.boxes,
                method=GeneralizedRCNN.mask_branch)
            dets = dets._replace(
                masks=select_class_masks(mask_logits, dets.classes))
        if self.cfg.model.keypoint_on:
            # reference: lib/core/test.py::im_detect_keypoints on the final
            # detections, then heatmaps_to_keypoints.
            kp_logits = self.model.apply(
                {"params": params}, out.feats, dets.boxes,
                method=GeneralizedRCNN.keypoint_branch)
            dets = dets._replace(
                keypoints=decode_keypoints(kp_logits, dets.boxes))
        return dets

    def detect(self, images: jnp.ndarray, im_hw: jnp.ndarray) -> Detections:
        """images: (B, H, W, 3) preprocessed; im_hw: (B, 2)."""
        return self._detect(self.params, images, im_hw)

    @partial(jax.jit, static_argnums=(0,))
    def _forward_candidates(self, params, images, im_hw):
        out = self.model.apply({"params": params}, images, im_hw)
        return out, collect_candidates(out, im_hw, self.cfg)

    @partial(jax.jit, static_argnums=(0,))
    def _merge_nms(self, boxes, scores, classes):
        return batched_nms(boxes, scores, classes, self.cfg.test.nms,
                           self.cfg.test.detections_per_im,
                           valid=scores > -1e9,
                           legacy_plus1=self.cfg.model.legacy_plus1)

    @partial(jax.jit, static_argnums=(0,))
    def _mask_on_boxes(self, params, feats, boxes, classes):
        logits = self.model.apply({"params": params}, feats, boxes,
                                  method=GeneralizedRCNN.mask_branch)
        return select_class_masks(logits, classes)

    def detect_augmented(self, im_bgr: np.ndarray) -> Detections:
        """Multi-scale / flip TTA (reference: lib/core/test.py::
        im_detect_bbox_aug): pre-NMS candidates from every augmentation are
        mapped back to original-image coordinates, unioned, and passed
        through ONE final NMS + limit; masks come from the base scale's
        features on the merged boxes (reference MASK_AUG default off).

        Returns detections in ORIGINAL image coordinates.
        """
        cfg = self.cfg
        scales = ((cfg.test.scale,) + tuple(cfg.test.bbox_aug_scales)
                  if cfg.test.bbox_aug_enabled else (cfg.test.scale,))
        flips = ((False, True) if (cfg.test.bbox_aug_enabled
                                   and cfg.test.bbox_aug_flip)
                 else (False,))
        h0, w0 = im_bgr.shape[:2]

        cand_b, cand_s, cand_c = [], [], []
        base_feats = None
        base_scale = None
        for sc in scales:
            for flip in flips:
                im = im_bgr[:, ::-1] if flip else im_bgr
                padded, hw, s = preprocess_np(
                    im, sc, cfg.test.max_size, cfg.test.padded_image_size,
                    cfg.data.pixel_means, cfg.data.pixel_stds)
                out, (bx, scs, cls, val) = self._forward_candidates(
                    self.params, jnp.asarray(padded[None]),
                    jnp.asarray(hw[None]))
                bx = np.asarray(bx[0]) / s
                if flip:
                    bx = bx[:, [2, 1, 0, 3]]
                    bx[:, 0] = w0 - bx[:, 0]
                    bx[:, 2] = w0 - bx[:, 2]
                v = np.asarray(val[0])
                cand_b.append(bx)
                cand_s.append(np.where(v, np.asarray(scs[0]), -1e10))
                cand_c.append(np.asarray(cls[0]))
                if sc == cfg.test.scale and not flip:
                    base_feats = out.feats
                    base_scale = s

        boxes = jnp.asarray(np.concatenate(cand_b))
        scores = jnp.asarray(np.concatenate(cand_s))
        classes = jnp.asarray(np.concatenate(cand_c))
        idx, valid, kept = self._merge_nms(boxes, scores, classes)
        det_boxes = boxes[idx]
        dets = Detections(det_boxes[None], kept[None],
                          classes[idx][None], valid[None])
        if cfg.model.mask_on and base_feats is not None:
            masks = self._mask_on_boxes(self.params, base_feats,
                                        det_boxes[None] * base_scale,
                                        dets.classes)
            dets = dets._replace(masks=masks)
        return dets

    def paste(self, dets: Detections, im_h: int, im_w: int,
              scale: float = 1.0) -> jnp.ndarray:
        """Paste detection masks to original-image canvas (B, D, h, w)."""
        def per_image(m, bx):
            return paste_masks_in_image(m, bx / scale, im_h, im_w,
                                        self.cfg.mrcnn.thresh_binarize)

        return jax.vmap(per_image)(dets.masks, dets.boxes)
