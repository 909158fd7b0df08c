"""COCO-json dataset support — catalog, roidb, GT mask rasterization.

TPU-native rebuild of the reference's COCO stack
(reference: lib/datasets/json_dataset.py ~400 LoC JsonDataset via
pycocotools; lib/datasets/roidb.py ~300 LoC combined_roidb_for_training;
lib/datasets/dataset_catalog.py ~150 LoC). pycocotools is unavailable in
this image: parsing is plain ``json`` and mask work binds to the native
C++ host-ops (vosdetectron_tpu/native).

Outputs the same fixed-shape padded example format as data/detection_data
so the SPMD train step is dataset-agnostic.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..config import Config
from .. import native

# name -> (image dir, annotation json), reference: dataset_catalog.py
DATASET_CATALOG: Dict[str, Tuple[str, str]] = {
    "coco_2017_train": ("coco/images/train2017",
                        "coco/annotations/instances_train2017.json"),
    "coco_2017_val": ("coco/images/val2017",
                      "coco/annotations/instances_val2017.json"),
    "keypoints_coco_2017_train": (
        "coco/images/train2017",
        "coco/annotations/person_keypoints_train2017.json"),
    "keypoints_coco_2017_val": (
        "coco/images/val2017",
        "coco/annotations/person_keypoints_val2017.json"),
}

# COCO person keypoint names + horizontal-flip pairs
# (reference: lib/utils/keypoints.py::get_keypoints).
COCO_KP_NAMES = (
    "nose", "left_eye", "right_eye", "left_ear", "right_ear",
    "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
    "left_wrist", "right_wrist", "left_hip", "right_hip",
    "left_knee", "right_knee", "left_ankle", "right_ankle")
_KP_FLIP_PERM = np.asarray(
    [COCO_KP_NAMES.index(n.replace("left_", "X_").replace(
        "right_", "left_").replace("X_", "right_"))
     for n in COCO_KP_NAMES], np.int32)


def flip_keypoints(kps: np.ndarray, width: int) -> np.ndarray:
    """Horizontal flip of (G, K, 3) COCO keypoints: mirror x, swap L/R
    (reference: lib/utils/keypoints.py::flip_keypoints)."""
    out = kps[:, _KP_FLIP_PERM].copy()
    vis = out[..., 2] > 0
    out[..., 0] = np.where(vis, width - out[..., 0] - 1, out[..., 0])
    return out


@dataclass
class CocoExample:
    image_path: str
    height: int
    width: int
    boxes: np.ndarray        # (G, 4) xyxy float32
    classes: np.ndarray      # (G,) int32 contiguous ids (1..K-1)
    segms: list              # per-instance polygon lists or RLE dicts
    iscrowd: np.ndarray      # (G,) bool
    flipped: bool = False
    # (G, K, 3) (x, y, vis) COCO keypoints, or None when the annotation
    # file has none (reference: roidb 'gt_keypoints').
    keypoints: Optional[np.ndarray] = None
    # (G,) annotation 'area' (segment area) — COCOeval buckets GT into
    # area ranges (and scales OKS) by THIS, not the box area.
    areas: Optional[np.ndarray] = None


class CocoDataset:
    """Plain-json COCO instances parser (JsonDataset equivalent)."""

    def __init__(self, ann_file: str, image_dir: str):
        with open(ann_file) as f:
            data = json.load(f)
        self.image_dir = image_dir
        cats = sorted(c["id"] for c in data.get("categories", []))
        # contiguous class ids: 0 background, 1..K
        self.cat_to_contiguous = {c: i + 1 for i, c in enumerate(cats)}
        self.contiguous_to_cat = {v: k for k, v in
                                  self.cat_to_contiguous.items()}
        self.class_names = ["__background__"] + [
            c["name"] for c in sorted(data.get("categories", []),
                                      key=lambda c: c["id"])]
        self.images = {im["id"]: im for im in data["images"]}
        self.anns_by_image: Dict[int, list] = {i: [] for i in self.images}
        for ann in data.get("annotations", []):
            if ann["image_id"] in self.anns_by_image:
                self.anns_by_image[ann["image_id"]].append(ann)

    @property
    def num_classes(self) -> int:
        return len(self.cat_to_contiguous) + 1

    def image_ids(self) -> List[int]:
        return sorted(self.images)

    def example(self, image_id: int,
                include_crowd: bool = False) -> CocoExample:
        im = self.images[image_id]
        anns = self.anns_by_image.get(image_id, [])
        boxes, classes, segms, crowd, kps, areas = [], [], [], [], [], []
        has_kps = False
        for a in anns:
            if a.get("ignore", 0):
                continue
            x, y, w, h = a["bbox"]
            if w <= 0 or h <= 0:
                continue
            is_crowd = bool(a.get("iscrowd", 0))
            if is_crowd and not include_crowd:
                continue
            boxes.append([x, y, x + w, y + h])
            classes.append(self.cat_to_contiguous[a["category_id"]])
            segms.append(a.get("segmentation", []))
            crowd.append(is_crowd)
            areas.append(float(a.get("area", w * h)))
            kp = a.get("keypoints")
            if kp:
                has_kps = True
                kps.append(np.asarray(kp, np.float32).reshape(-1, 3))
            else:
                kps.append(None)
        keypoints = None
        if has_kps:
            nk = next(k.shape[0] for k in kps if k is not None)
            keypoints = np.stack([
                k if k is not None else np.zeros((nk, 3), np.float32)
                for k in kps]) if kps else np.zeros((0, nk, 3), np.float32)
        return CocoExample(
            image_path=os.path.join(self.image_dir, im["file_name"]),
            height=im["height"], width=im["width"],
            boxes=np.asarray(boxes, np.float32).reshape(-1, 4),
            classes=np.asarray(classes, np.int32),
            segms=segms,
            iscrowd=np.asarray(crowd, bool),
            keypoints=keypoints,
            areas=np.asarray(areas, np.float64))

    def gt_mask(self, segm, h: int, w: int) -> np.ndarray:
        """Segmentation (polygons or RLE dict) -> (h, w) uint8 mask."""
        if isinstance(segm, dict):  # RLE
            return native.rle_decode(segm)
        return native.polys_to_mask(segm, h, w)


def coco_roidb(dataset: CocoDataset, use_flipped: bool = True
               ) -> List[Tuple[int, bool]]:
    """(image_id, flipped) roidb with flip duplication, empties filtered
    (reference: combined_roidb_for_training)."""
    out = []
    for iid in dataset.image_ids():
        ex = dataset.example(iid)
        if len(ex.boxes) == 0:
            continue
        out.append((iid, False))
        if use_flipped:
            out.append((iid, True))
    return out


def load_coco_example(cfg: Config, dataset: CocoDataset, image_id: int,
                      flipped: bool, scale: int
                      ) -> Tuple[np.ndarray, np.ndarray, dict]:
    """COCO example -> the fixed-shape training tuple
    (padded image, (nh, nw), gt dict) matching detection_data.load_example.
    """
    import cv2

    ex = dataset.example(image_id)
    im = cv2.imread(ex.image_path, cv2.IMREAD_COLOR)
    if im is None:
        raise FileNotFoundError(ex.image_path)
    gt_boxes = ex.boxes.copy()
    gt_kps = ex.keypoints.copy() if ex.keypoints is not None else None
    if flipped:
        im = im[:, ::-1]
        w = ex.width
        gt_boxes = gt_boxes[:, [2, 1, 0, 3]]
        gt_boxes[:, 0] = w - gt_boxes[:, 0]
        gt_boxes[:, 2] = w - gt_boxes[:, 2]
        if gt_kps is not None:
            gt_kps = flip_keypoints(gt_kps, w)

    h, w = im.shape[:2]
    s = min(scale / min(h, w), cfg.train.max_size / max(h, w))
    nh, nw = int(round(h * s)), int(round(w * s))
    from .detection_data import padded_train_shape
    ph, pw = padded_train_shape(cfg, h > w)
    im = cv2.resize(im.astype(np.float32), (nw, nh),
                    interpolation=cv2.INTER_LINEAR)
    im -= np.asarray(cfg.data.pixel_means, np.float32)
    im /= np.asarray(cfg.data.pixel_stds, np.float32)
    img = np.zeros((ph, pw, 3), np.float32)
    img[:min(nh, ph), :min(nw, pw)] = im[:ph, :pw]

    g = cfg.train.max_gt_instances
    mh, mw = ph // 4, pw // 4
    boxes = np.zeros((g, 4), np.float32)
    classes = np.zeros((g,), np.int32)
    masks = np.zeros((g, mh, mw), np.float32)
    valid = np.zeros((g,), bool)
    n = min(len(gt_boxes), g)
    boxes[:n] = np.clip(gt_boxes[:n] * s, 0,
                        [pw, ph, pw, ph]).astype(np.float32)
    classes[:n] = ex.classes[:n]
    valid[:n] = True
    for i in range(n):
        m = dataset.gt_mask(ex.segms[i], ex.height, ex.width)
        if flipped:
            m = m[:, ::-1]
        mm = cv2.resize(m.astype(np.float32), (nw, nh),
                        interpolation=cv2.INTER_LINEAR)
        canvas = np.zeros((ph, pw), np.float32)
        canvas[:min(nh, ph), :min(nw, pw)] = mm[:ph, :pw]
        masks[i] = cv2.resize(canvas, (mw, mh),
                              interpolation=cv2.INTER_LINEAR)
    gt = dict(boxes=boxes, classes=classes, masks=masks, valid=valid)
    if gt_kps is not None:
        nk = gt_kps.shape[1]
        kp = np.zeros((g, nk, 3), np.float32)
        kp[:n, :, :2] = gt_kps[:n, :, :2] * s   # padded-image coords
        kp[:n, :, 2] = gt_kps[:n, :, 2]
        gt["keypoints"] = kp
    return img, np.asarray([nh, nw], np.float32), gt
