"""COCO-protocol detection/segmentation AP/AR evaluation.

Rebuild of the reference's image-level eval
(reference: lib/datasets/task_evaluation.py ~350 LoC +
json_dataset_evaluator.py ~300 LoC, which defer to pycocotools.COCOeval —
unavailable here, so the COCOeval protocol is implemented directly):

  * per (image, category, area range): detections sorted by score matched
    greedily to the best unmatched GT with IoU >= t, non-ignored GT
    preferred, ties to the later GT index (COCOeval tie semantics); crowd
    GT can absorb any number of detections; GT outside the area range is
    ignored (matches neither tp nor fp), unmatched detections outside the
    range are ignored too;
  * 101-point interpolated precision averaged over recall, IoU thresholds
    0.50:0.05:0.95, and categories -> AP / AP50 / AP75 / AP_{S,M,L};
  * average recall AR@{1,10,100} and AR_{S,M,L}@100 — greedy matching is
    prefix-consistent in detection rank, so every maxDets cut reuses one
    matching pass per image;
  * the per-detection matching loop is vectorized over (thresholds, GT) —
    one numpy step per detection instead of the D*G*10 interpreted loop.

Box IoU uses the native C++ host-ops (crowd boxes use intersection-over-
detection-area, the COCOeval crowd semantics); mask IoU runs on decoded
masks.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Optional, Tuple

import numpy as np

from .. import native

IOU_THRESHS = np.arange(0.5, 1.0, 0.05)
RECALL_POINTS = np.linspace(0, 1, 101)
AREA_RANGES: Dict[str, Tuple[float, float]] = {
    "all": (0.0, float("inf")),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, float("inf")),
}
MAX_DETS = (1, 10, 100)

# Per-keypoint OKS falloff constants (COCOeval.params.kpt_oks_sigmas) —
# the published human-annotator variances for the 17 COCO person kps.
KP_OKS_SIGMAS = np.asarray(
    [.26, .25, .25, .35, .35, .79, .79, .72, .72, .62, .62,
     1.07, 1.07, .87, .87, .89, .89], np.float64) / 10.0


def _oks(det_kps: np.ndarray, gt_kps: np.ndarray, gt_boxes: np.ndarray,
         gt_areas: np.ndarray,
         sigmas: Optional[np.ndarray] = None) -> np.ndarray:
    """Object-keypoint-similarity matrix (D, G)
    (reference eval protocol: pycocotools COCOeval.computeOks — rebuilt,
    pycocotools unavailable). For GT with no labeled keypoint, distances
    are taken from the gt box with a 2x tolerance margin (the COCOeval
    fallback so crowd-ish GT can still absorb detections)."""
    d, k = det_kps.shape[0], det_kps.shape[1]
    g = gt_kps.shape[0]
    if d == 0 or g == 0:
        return np.zeros((d, g), np.float32)
    if sigmas is None:
        sigmas = (KP_OKS_SIGMAS if k == len(KP_OKS_SIGMAS)
                  else np.full((k,), 0.05, np.float64))
    var = (2.0 * sigmas) ** 2                                # (K,)
    xd = det_kps[:, None, :, 0]                              # (D, 1, K)
    yd = det_kps[:, None, :, 1]
    xg = gt_kps[None, :, :, 0]                               # (1, G, K)
    yg = gt_kps[None, :, :, 1]
    vis = gt_kps[:, :, 2] > 0                                # (G, K)
    dx = xd - xg
    dy = yd - yg
    # COCOeval fallback for fully-unlabeled GT: clamp distances to the
    # box grown by one box-size in every direction.
    x1 = gt_boxes[:, 0] - (gt_boxes[:, 2] - gt_boxes[:, 0])
    x2 = gt_boxes[:, 2] + (gt_boxes[:, 2] - gt_boxes[:, 0])
    y1 = gt_boxes[:, 1] - (gt_boxes[:, 3] - gt_boxes[:, 1])
    y2 = gt_boxes[:, 3] + (gt_boxes[:, 3] - gt_boxes[:, 1])
    zx = (np.clip(x1[None, :, None] - xd, 0, None)
          + np.clip(xd - x2[None, :, None], 0, None))
    zy = (np.clip(y1[None, :, None] - yd, 0, None)
          + np.clip(yd - y2[None, :, None], 0, None))
    none_vis = ~vis.any(axis=1)                              # (G,)
    dx = np.where(none_vis[None, :, None], zx, dx)
    dy = np.where(none_vis[None, :, None], zy, dy)
    e = (dx ** 2 + dy ** 2) / var[None, None, :] \
        / (gt_areas[None, :, None] + np.spacing(1)) / 2.0
    use = np.where(none_vis[:, None], True, vis)[None]       # (1, G, K)
    n = np.maximum(use.sum(axis=2), 1)
    return (np.where(use, np.exp(-e), 0.0).sum(axis=2) / n).astype(
        np.float32)


def _match_image_category(iou: np.ndarray, gt_ig: np.ndarray,
                          gt_crowd: np.ndarray, det_oor: np.ndarray
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy COCOeval matching for one (image, category, area range).

    iou: (D, G) with detections already score-sorted descending;
    gt_ig: (G,) ignored GT (crowd or out-of-area); gt_crowd: (G,) crowd;
    det_oor: (D,) detection outside the area range.
    Returns (tp (T, D), det_ig (T, D)) over all IoU thresholds at once.
    """
    d, g = iou.shape
    t = len(IOU_THRESHS)
    tp = np.zeros((t, d), bool)
    det_ig = np.zeros((t, d), bool)
    if g == 0:
        det_ig |= det_oor[None, :]
        return tp, det_ig
    taken = np.zeros((t, g), bool)
    threshs = IOU_THRESHS[:, None]
    for i in range(d):
        row = iou[i]
        avail = ~taken | gt_crowd[None, :]
        cand = avail & (row[None, :] >= threshs)
        vals_all = np.where(cand, row[None, :], -1.0)
        vals_noig = np.where(cand & ~gt_ig[None, :], row[None, :], -1.0)
        use_noig = vals_noig.max(axis=1) > -1.0
        vals = np.where(use_noig[:, None], vals_noig, vals_all)
        # COCOeval tie semantics: equal IoU goes to the LATER GT index
        j = g - 1 - vals[:, ::-1].argmax(axis=1)
        matched = vals[np.arange(t), j] > -1.0
        ig_j = gt_ig[j]
        tp[:, i] = matched & ~ig_j
        det_ig[:, i] = matched & ig_j
        upd = matched & ~gt_crowd[j]
        taken[np.arange(t)[upd], j[upd]] = True
    unmatched = ~(tp | det_ig)
    det_ig |= unmatched & det_oor[None, :]
    return tp, det_ig


def _crowd_box_iou(det: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """Intersection over DETECTION area (COCOeval crowd box semantics)."""
    x1 = np.maximum(det[:, None, 0], gt[None, :, 0])
    y1 = np.maximum(det[:, None, 1], gt[None, :, 1])
    x2 = np.minimum(det[:, None, 2], gt[None, :, 2])
    y2 = np.minimum(det[:, None, 3], gt[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    da = ((det[:, 2] - det[:, 0]) * (det[:, 3] - det[:, 1]))[:, None]
    return np.where(da > 0, inter / np.maximum(da, 1e-12), 0.0)


def _ap_from_pr(tp: np.ndarray, ig: np.ndarray, n_gt: int) -> float:
    """tp/ig: (D,) in global score order. 101-pt interpolated AP."""
    if n_gt == 0:
        return float("nan")
    sel = ~ig
    tp = tp[sel]
    fp = ~tp
    ctp = np.cumsum(tp)
    cfp = np.cumsum(fp)
    recall = ctp / n_gt
    precision = ctp / np.maximum(ctp + cfp, 1e-12)
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    out = np.zeros_like(RECALL_POINTS)
    idx = np.searchsorted(recall, RECALL_POINTS, side="left")
    ok = idx < len(precision)
    out[ok] = precision[idx[ok]]
    return float(out.mean())


def _recall_from_pr(tp: np.ndarray, ig: np.ndarray, n_gt: int) -> float:
    if n_gt == 0:
        return float("nan")
    return float(tp[~ig].sum() / n_gt)


class CocoEvaluator:
    """Accumulates per-image detections + GT; computes the COCO metrics.

    Usage:
        ev = CocoEvaluator(iou_type="bbox")   # or "segm"
        ev.add_image(dets=..., gts=...)       # per image
        results = ev.summarize()
    """

    def __init__(self, iou_type: str = "bbox",
                 max_dets=None):
        assert iou_type in ("bbox", "segm", "keypoints")
        self.iou_type = iou_type
        if max_dets is None:
            # COCOeval defaults: 1/10/100 for bbox+segm, 20 for keypoints.
            max_dets = (20,) if iou_type == "keypoints" else MAX_DETS
        if isinstance(max_dets, int):
            max_dets = (1, 10, max_dets) if max_dets > 10 else (max_dets,)
        self.max_dets = tuple(sorted(max_dets))
        # per (cat, area): list of per-image (scores, tp (T,D), ig (T,D))
        self._per_image = defaultdict(list)
        self._ngt = defaultdict(int)
        self._cats = set()

    def add_image(self, det_boxes: np.ndarray, det_scores: np.ndarray,
                  det_classes: np.ndarray, gt_boxes: np.ndarray,
                  gt_classes: np.ndarray,
                  gt_crowd: Optional[np.ndarray] = None,
                  det_masks: Optional[np.ndarray] = None,
                  gt_masks: Optional[np.ndarray] = None,
                  gt_areas: Optional[np.ndarray] = None,
                  det_kps: Optional[np.ndarray] = None,
                  gt_kps: Optional[np.ndarray] = None) -> None:
        """Boxes xyxy; masks (N, H, W) binary when iou_type='segm';
        kps (N, K, 3) when iou_type='keypoints' (similarity = OKS; GT
        with zero labeled keypoints is ignored, COCOeval semantics);
        gt_areas defaults to mask area (segm) / box area (bbox), matching
        COCO's annotation-area convention when true areas are absent."""
        if gt_crowd is None:
            gt_crowd = np.zeros(len(gt_boxes), bool)
        gt_crowd = np.asarray(gt_crowd, bool)
        if gt_areas is None:
            if self.iou_type == "segm" and gt_masks is not None and \
                    len(gt_masks):
                gt_areas = np.asarray(
                    [m.astype(bool).sum() for m in gt_masks], np.float64)
            else:
                gt_areas = ((gt_boxes[:, 2] - gt_boxes[:, 0])
                            * (gt_boxes[:, 3] - gt_boxes[:, 1])
                            if len(gt_boxes) else np.zeros(0))
        gt_areas = np.asarray(gt_areas, np.float64)
        if self.iou_type == "segm" and det_masks is not None and \
                len(det_masks):
            det_areas = np.asarray(
                [m.astype(bool).sum() for m in det_masks], np.float64)
        else:
            det_areas = ((det_boxes[:, 2] - det_boxes[:, 0])
                         * (det_boxes[:, 3] - det_boxes[:, 1])
                         if len(det_boxes) else np.zeros(0))

        max_k = self.max_dets[-1]
        cats = set(np.unique(gt_classes).tolist()) | \
            set(np.unique(det_classes).tolist())
        for c in cats:
            if c == 0:
                continue
            self._cats.add(int(c))
            dsel = np.nonzero(det_classes == c)[0]
            gsel = np.nonzero(gt_classes == c)[0]
            order = dsel[np.argsort(-det_scores[dsel], kind="stable")]
            order = order[:max_k]
            scores = det_scores[order]
            crowd = gt_crowd[gsel]
            if len(gsel) and len(order):
                if self.iou_type == "segm":
                    iou = native.mask_iou(det_masks[order], gt_masks[gsel])
                    crowd_iou = native.mask_iou(det_masks[order],
                                                gt_masks[gsel],
                                                iscrowd=True)
                    iou = np.where(crowd[None, :], crowd_iou, iou)
                elif self.iou_type == "keypoints":
                    # OKS is already tolerance-scaled; COCOeval uses the
                    # same matrix for crowd GT.
                    iou = _oks(det_kps[order], gt_kps[gsel],
                               gt_boxes[gsel], gt_areas[gsel])
                else:
                    iou = native.bbox_overlaps(det_boxes[order],
                                               gt_boxes[gsel])
                    crowd_iou = _crowd_box_iou(det_boxes[order],
                                               gt_boxes[gsel])
                    iou = np.where(crowd[None, :], crowd_iou, iou)
            else:
                iou = np.zeros((len(order), len(gsel)), np.float32)

            ga = gt_areas[gsel]
            da = det_areas[order]
            kp_unlabeled = (np.asarray(gt_kps)[gsel, :, 2] <= 0).all(axis=1) \
                if self.iou_type == "keypoints" and len(gsel) \
                else np.zeros(len(gsel), bool)
            for area, (lo, hi) in AREA_RANGES.items():
                gt_ig = crowd | (ga < lo) | (ga > hi) | kp_unlabeled
                det_oor = (da < lo) | (da > hi)
                tp, ig = _match_image_category(iou, gt_ig, crowd, det_oor)
                self._per_image[(c, area)].append((scores, tp, ig))
                self._ngt[(c, area)] += int((~gt_ig).sum())

    def merge(self, other: "CocoEvaluator") -> "CocoEvaluator":
        """Fold another evaluator's accumulated per-image match lists into
        this one (reference: test_engine.py merges per-GPU detection
        pickles into ONE result, SURVEY.md:131). Order-insensitive for the
        final metrics: _accumulate globally re-sorts by score."""
        assert self.iou_type == other.iou_type, "cannot merge bbox w/ segm"
        assert self.max_dets == other.max_dets
        for key, entries in other._per_image.items():
            self._per_image[key].extend(entries)
        for key, n in other._ngt.items():
            self._ngt[key] += n
        self._cats |= other._cats
        return self

    def state(self) -> dict:
        """Picklable snapshot for cross-process transport."""
        return {
            "iou_type": self.iou_type,
            "max_dets": self.max_dets,
            "per_image": dict(self._per_image),
            "ngt": dict(self._ngt),
            "cats": set(self._cats),
        }

    @classmethod
    def from_state(cls, st: dict) -> "CocoEvaluator":
        ev = cls(st["iou_type"], st["max_dets"])
        ev._per_image.update(st["per_image"])
        ev._ngt.update(st["ngt"])
        ev._cats |= st["cats"]
        return ev

    def merge_across_processes(self) -> "CocoEvaluator":
        """All-gather evaluator shards over jax processes and merge; every
        process returns the SAME complete evaluator. No-op single-process."""
        import jax

        if jax.process_count() <= 1:
            return self
        from ..parallel.gather import allgather_object

        states = allgather_object(self.state())
        merged = CocoEvaluator.from_state(states[0])
        for st in states[1:]:
            merged.merge(CocoEvaluator.from_state(st))
        return merged

    def _accumulate(self, c: int, area: str, k: int):
        """Concat per-image top-k prefixes, globally score-sorted.
        Returns (tp (T, D), ig (T, D), n_gt)."""
        entries = self._per_image.get((c, area), [])
        if not entries:
            t = len(IOU_THRESHS)
            return (np.zeros((t, 0), bool), np.zeros((t, 0), bool),
                    self._ngt.get((c, area), 0))
        scores = np.concatenate([e[0][:k] for e in entries])
        tp = np.concatenate([e[1][:, :k] for e in entries], axis=1)
        ig = np.concatenate([e[2][:, :k] for e in entries], axis=1)
        order = np.argsort(-scores, kind="stable")
        return tp[:, order], ig[:, order], self._ngt.get((c, area), 0)

    def summarize(self) -> Dict[str, float]:
        cats = sorted(self._cats)
        t = len(IOU_THRESHS)

        def ap_matrix(area: str, k: int) -> np.ndarray:
            m = np.full((len(cats), t), np.nan)
            for ci, c in enumerate(cats):
                tp, ig, ngt = self._accumulate(c, area, k)
                for ti in range(t):
                    m[ci, ti] = _ap_from_pr(tp[ti], ig[ti], ngt)
            return m

        def ar_value(area: str, k: int) -> float:
            vals = []
            for c in cats:
                tp, ig, ngt = self._accumulate(c, area, k)
                vals.extend(_recall_from_pr(tp[ti], ig[ti], ngt)
                            for ti in range(t))
            with np.errstate(invalid="ignore"):
                return float(np.nanmean(vals)) if vals else float("nan")

        kmax = self.max_dets[-1]
        per_all = ap_matrix("all", kmax)
        with np.errstate(invalid="ignore"):
            out = {
                "AP": float(np.nanmean(per_all)),
                "AP50": float(np.nanmean(per_all[:, 0])),
                "AP75": float(np.nanmean(per_all[:, 5])),
                "AP_small": float(np.nanmean(ap_matrix("small", kmax))),
                "AP_medium": float(np.nanmean(ap_matrix("medium", kmax))),
                "AP_large": float(np.nanmean(ap_matrix("large", kmax))),
                "per_category": {
                    c: float(np.nanmean(per_all[ci]))
                    for ci, c in enumerate(cats)},
            }
        for k in self.max_dets:
            out[f"AR@{k}"] = ar_value("all", k)
        out["AR_small"] = ar_value("small", kmax)
        out["AR_medium"] = ar_value("medium", kmax)
        out["AR_large"] = ar_value("large", kmax)
        return out
