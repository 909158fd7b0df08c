"""Dataset-level image inference + COCO-protocol evaluation.

TPU-native rebuild of the reference's test engine
(reference: lib/core/test_engine.py ~350 LoC run_inference /
test_net_on_dataset + lib/utils/subprocess.py per-GPU forks).

The reference forks one subprocess per GPU over image ranges and merges
their detection pickles into one result; here frames are batched through
the single jitted detector per process, each process evaluates a strided
image shard, and the per-process evaluators' raw match lists are
all-gathered over the jax.distributed fabric and merged
(CocoEvaluator.merge) so every process reports the full-dataset summary.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..config import Config
from ..data.coco import CocoDataset
from ..metrics.coco_eval import CocoEvaluator
from .inference import Detector, preprocess_np


def evaluate_coco(detector: Detector, dataset: CocoDataset,
                  cfg: Config, max_images: Optional[int] = None,
                  batch_size: int = 8,
                  with_masks: bool = True,
                  process_index: Optional[int] = None,
                  process_count: Optional[int] = None,
                  merge_processes: bool = True) -> Dict[str, float]:
    """Run the detector over a CocoDataset and compute bbox (+segm) AP.

    Multi-host: each process evaluates a strided image shard; with
    merge_processes (default) the per-process evaluators' match lists are
    all-gathered and merged so EVERY process returns the full-dataset
    summary (reference: test_engine.py merged per-GPU detection pickles
    into one result, SURVEY.md:131)."""
    import jax
    import jax.numpy as jnp

    ev_box = CocoEvaluator("bbox", cfg.test.detections_per_im)
    ev_segm = CocoEvaluator("segm", cfg.test.detections_per_im) \
        if (with_masks and cfg.model.mask_on) else None
    ev_kps = CocoEvaluator("keypoints") if cfg.model.keypoint_on else None

    ids = dataset.image_ids()
    if max_images:
        ids = ids[:max_images]
    # multi-host shard: strided slice per process (reference:
    # test_engine.py image-range shards per GPU subprocess)
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if pc > 1:
        ids = ids[pi::pc]

    for start in range(0, len(ids), batch_size):
        chunk = ids[start:start + batch_size]
        imgs, hws, scales, metas = [], [], [], []
        for iid in chunk:
            ex = dataset.example(iid, include_crowd=True)
            import cv2

            im = cv2.imread(ex.image_path, cv2.IMREAD_COLOR)
            padded, hw, s = preprocess_np(
                im, cfg.test.scale, cfg.test.max_size,
                cfg.test.padded_image_size, cfg.data.pixel_means,
                cfg.data.pixel_stds)
            imgs.append(padded)
            hws.append(hw)
            scales.append(s)
            metas.append(ex)
        # pad the tail batch
        while len(imgs) < batch_size:
            imgs.append(np.zeros_like(imgs[0]))
            hws.append(hws[0])
            scales.append(1.0)
            metas.append(None)

        dets = detector.detect(jnp.asarray(np.stack(imgs)),
                               jnp.asarray(np.stack(hws)))
        boxes = np.asarray(dets.boxes)
        scores = np.asarray(dets.scores)
        classes = np.asarray(dets.classes)
        valid = np.asarray(dets.valid)
        for bi, ex in enumerate(metas):
            if ex is None:
                continue
            v = valid[bi]
            det_boxes = boxes[bi][v] / scales[bi]
            det_scores = scores[bi][v]
            det_classes = classes[bi][v]
            gt_masks = None
            det_masks = None
            if ev_segm is not None:
                pasted = np.asarray(detector.paste(
                    Detections_slice(dets, bi), ex.height, ex.width,
                    scales[bi])[0])
                det_masks = pasted[v]
                gt_masks = np.stack([
                    dataset.gt_mask(sg, ex.height, ex.width)
                    for sg in ex.segms]) if len(ex.segms) else \
                    np.zeros((0, ex.height, ex.width), np.uint8)
            # COCOeval buckets GT by the annotation 'area' (and scales
            # OKS by it) — not the box area.
            ga = ex.areas
            ev_box.add_image(det_boxes, det_scores, det_classes,
                             ex.boxes, ex.classes, ex.iscrowd,
                             gt_areas=ga)
            if ev_segm is not None:
                ev_segm.add_image(det_boxes, det_scores, det_classes,
                                  ex.boxes, ex.classes, ex.iscrowd,
                                  det_masks=det_masks, gt_masks=gt_masks,
                                  gt_areas=ga)
            if ev_kps is not None and dets.keypoints is not None:
                det_kps = np.asarray(dets.keypoints[bi])[v].copy()
                det_kps[:, :, :2] /= scales[bi]   # back to original coords
                nk = det_kps.shape[1] if len(det_kps) else 17
                gt_kps = (ex.keypoints if ex.keypoints is not None
                          else np.zeros((len(ex.boxes), nk, 3), np.float32))
                ev_kps.add_image(det_boxes, det_scores, det_classes,
                                 ex.boxes, ex.classes, ex.iscrowd,
                                 det_kps=det_kps, gt_kps=gt_kps,
                                 gt_areas=ga)

    if merge_processes and pc > 1 and process_index is None:
        # (explicit process_index means the caller simulates sharding in
        # one process — gathering would deadlock or double-count)
        ev_box = ev_box.merge_across_processes()
        if ev_segm is not None:
            ev_segm = ev_segm.merge_across_processes()
        if ev_kps is not None:
            ev_kps = ev_kps.merge_across_processes()
    out = {"bbox": ev_box.summarize()}
    if ev_segm is not None:
        out["segm"] = ev_segm.summarize()
    if ev_kps is not None:
        out["keypoints"] = ev_kps.summarize()
    return out


def Detections_slice(dets, bi: int):
    """One-image view of a batched Detections (keeps batch dim of 1)."""
    from .inference import Detections

    return Detections(dets.boxes[bi:bi + 1], dets.scores[bi:bi + 1],
                      dets.classes[bi:bi + 1], dets.valid[bi:bi + 1],
                      None if dets.masks is None
                      else dets.masks[bi:bi + 1])
