"""COCO-protocol detection/segmentation AP evaluation.

Rebuild of the reference's image-level eval
(reference: lib/datasets/task_evaluation.py ~350 LoC +
json_dataset_evaluator.py ~300 LoC, which defer to pycocotools.COCOeval —
unavailable here, so the COCOeval protocol core is implemented directly):

  * per (category, IoU threshold): detections sorted by score matched
    greedily to the best unmatched GT with IoU >= t; crowd GT can absorb
    any detection without consuming a slot;
  * 101-point interpolated precision averaged over recall, then over IoU
    thresholds 0.50:0.05:0.95 and categories (AP), plus AP50 / AP75;
  * maxDets=100, area=all (the headline COCO numbers).

Box IoU uses the native C++ host-ops; mask IoU runs on RLE-decoded masks.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

from .. import native

IOU_THRESHS = np.arange(0.5, 1.0, 0.05)
RECALL_POINTS = np.linspace(0, 1, 101)


def _match_category(det_scores: np.ndarray, iou: np.ndarray,
                    gt_crowd: np.ndarray, thresh: float):
    """Greedy matching for one (image, category, threshold).

    det_scores: (D,) score-sorted descending; iou: (D, G);
    gt_crowd: (G,) bool. Returns (tp (D,), fp (D,)).
    """
    d, g = iou.shape
    tp = np.zeros(d, bool)
    fp = np.zeros(d, bool)
    gt_taken = np.zeros(g, bool)
    for i in range(d):
        best, best_iou = -1, thresh
        for j in range(g):
            if gt_taken[j] and not gt_crowd[j]:
                continue
            if iou[i, j] >= best_iou:
                # prefer non-crowd matches (COCOeval: crowd only if no
                # regular GT clears the threshold)
                if best >= 0 and gt_crowd[j] and not gt_crowd[best]:
                    continue
                best, best_iou = j, iou[i, j]
        if best < 0:
            fp[i] = True
        elif gt_crowd[best]:
            pass  # ignored: neither tp nor fp
        else:
            gt_taken[best] = True
            tp[i] = True
    return tp, fp


def _ap_from_matches(scores, tps, fps, n_gt: int) -> float:
    if n_gt == 0:
        return float("nan")
    order = np.argsort(-np.asarray(scores), kind="stable")
    tp = np.asarray(tps)[order]
    fp = np.asarray(fps)[order]
    ctp = np.cumsum(tp)
    cfp = np.cumsum(fp)
    recall = ctp / n_gt
    precision = ctp / np.maximum(ctp + cfp, 1e-12)
    # monotone precision envelope + 101-point interpolation
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    out = np.zeros_like(RECALL_POINTS)
    idx = np.searchsorted(recall, RECALL_POINTS, side="left")
    ok = idx < len(precision)
    out[ok] = precision[idx[ok]]
    return float(out.mean())


class CocoEvaluator:
    """Accumulates per-image detections + GT; computes AP/AP50/AP75.

    Usage:
        ev = CocoEvaluator(iou_type="bbox")   # or "segm"
        ev.add_image(dets=..., gts=...)       # per image
        results = ev.summarize()
    """

    def __init__(self, iou_type: str = "bbox", max_dets: int = 100):
        assert iou_type in ("bbox", "segm")
        self.iou_type = iou_type
        self.max_dets = max_dets
        # per (category, thresh_idx): lists of scores/tp/fp; plus gt counts
        self._scores = defaultdict(list)
        self._tp = defaultdict(list)
        self._fp = defaultdict(list)
        self._ngt = defaultdict(int)
        self._cats = set()

    def add_image(self, det_boxes: np.ndarray, det_scores: np.ndarray,
                  det_classes: np.ndarray, gt_boxes: np.ndarray,
                  gt_classes: np.ndarray,
                  gt_crowd: Optional[np.ndarray] = None,
                  det_masks: Optional[np.ndarray] = None,
                  gt_masks: Optional[np.ndarray] = None) -> None:
        """Boxes xyxy; masks (N, H, W) binary when iou_type='segm'."""
        if gt_crowd is None:
            gt_crowd = np.zeros(len(gt_boxes), bool)
        cats = set(np.unique(gt_classes).tolist()) | \
            set(np.unique(det_classes).tolist())
        for c in cats:
            if c == 0:
                continue
            self._cats.add(int(c))
            dsel = np.nonzero(det_classes == c)[0]
            gsel = np.nonzero(gt_classes == c)[0]
            self._ngt[c] += int((~gt_crowd[gsel]).sum())
            if len(dsel) == 0:
                continue
            order = dsel[np.argsort(-det_scores[dsel], kind="stable")]
            order = order[: self.max_dets]
            scores = det_scores[order]
            if len(gsel):
                if self.iou_type == "segm":
                    iou = native.mask_iou(det_masks[order], gt_masks[gsel])
                    crowd_iou = native.mask_iou(det_masks[order],
                                                gt_masks[gsel],
                                                iscrowd=True)
                else:
                    iou = native.bbox_overlaps(det_boxes[order],
                                               gt_boxes[gsel])
                    crowd_iou = iou  # crowd boxes: plain IoU approximation
                crowd = gt_crowd[gsel]
                iou = np.where(crowd[None, :], crowd_iou, iou)
            else:
                iou = np.zeros((len(order), 0), np.float32)
                crowd = np.zeros(0, bool)
            for ti, t in enumerate(IOU_THRESHS):
                tp, fp = _match_category(scores, iou, crowd, t)
                self._scores[(c, ti)].extend(scores.tolist())
                self._tp[(c, ti)].extend(tp.tolist())
                self._fp[(c, ti)].extend(fp.tolist())

    def summarize(self) -> Dict[str, float]:
        per_thresh = np.full((len(self._cats), len(IOU_THRESHS)), np.nan)
        for ci, c in enumerate(sorted(self._cats)):
            for ti in range(len(IOU_THRESHS)):
                per_thresh[ci, ti] = _ap_from_matches(
                    self._scores[(c, ti)], self._tp[(c, ti)],
                    self._fp[(c, ti)], self._ngt[c])
        with np.errstate(invalid="ignore"):
            ap = float(np.nanmean(per_thresh))
            ap50 = float(np.nanmean(per_thresh[:, 0]))
            ap75 = float(np.nanmean(per_thresh[:, 5]))
        return {"AP": ap, "AP50": ap50, "AP75": ap75,
                "per_category": {c: float(np.nanmean(per_thresh[ci]))
                                 for ci, c in enumerate(sorted(self._cats))}}
