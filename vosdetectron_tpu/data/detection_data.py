"""Training data pipeline: DAVIS frames -> fixed-shape detection batches.

TPU-native rebuild of the reference's loader stack
(reference: lib/roi_data/loader.py ~250 LoC RoiDataLoader +
collate_minibatch; lib/roi_data/minibatch.py ~100 LoC; lib/datasets/
roidb.py ~300 LoC combined_roidb_for_training with flip duplication).

Differences by design: the reference emits variable-shape numpy blob dicts
per GPU; here every batch is a fixed-shape pytree (padded + masked) ready
for an SPMD step: images (B, PH, PW, 3) float32, GroundTruth with
max_gt_instances slots. Target sampling happens on device (models/targets),
so the host only decodes, resizes, flips, and boxes the instance id maps.
"""

from __future__ import annotations

import itertools
import threading
import queue as queue_mod
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..config import Config
from .davis import DavisCatalog, read_image_bgr, read_indexed_png


def padded_train_shape(cfg: Config, portrait: bool) -> Tuple[int, int]:
    """Static padded shape for one orientation. Portrait images use the
    TRANSPOSED padded size — batching them into the landscape shape would
    crop them (shortest-side-800 makes a portrait image TALLER than the
    landscape pad). Aspect-grouped batches (reference: loader.py's
    MinibatchSampler groups by aspect ratio) keep each batch one shape;
    XLA compiles one train step per orientation."""
    ph, pw = cfg.train.padded_image_size
    return (pw, ph) if portrait else (ph, pw)


@dataclass
class FrameRecord:
    image_path: str
    anno_path: str
    flipped: bool = False

    # DAVIS 480p frames are landscape (854x480).
    portrait: bool = False

    def load(self, cfg: Config, scale: int):
        return load_example(cfg, self, scale)


def build_roidb(cfg: Config, split: str = "train") -> List[FrameRecord]:
    """Frame-level roidb with horizontal-flip duplication
    (reference: roidb.py::combined_roidb_for_training)."""
    cat = DavisCatalog(cfg.data.davis_root)
    records = []
    for name in cat.split_sequences(split):
        seq = cat.sequence(name)
        for img, ann in zip(seq.frame_paths, seq.anno_paths):
            records.append(FrameRecord(img, ann, False))
            if cfg.train.use_flipped:
                records.append(FrameRecord(img, ann, True))
    return records


def load_example(cfg: Config, rec: FrameRecord, scale: int
                 ) -> Tuple[np.ndarray, np.ndarray, dict]:
    """One frame -> (padded image, (nh, nw), gt dict of padded arrays).

    GT masks are stored at 1/4 of the padded resolution (fixed shape,
    bilinear-resampled on device for 28x28 targets).
    """
    import cv2

    im = read_image_bgr(rec.image_path)
    ids = read_indexed_png(rec.anno_path)
    if rec.flipped:
        im = im[:, ::-1]
        ids = ids[:, ::-1]

    h, w = im.shape[:2]
    s = min(scale / min(h, w), cfg.train.max_size / max(h, w))
    nh, nw = int(round(h * s)), int(round(w * s))
    ph, pw = padded_train_shape(cfg, h > w)
    im = cv2.resize(im.astype(np.float32), (nw, nh),
                    interpolation=cv2.INTER_LINEAR)
    im -= np.asarray(cfg.data.pixel_means, np.float32)
    im /= np.asarray(cfg.data.pixel_stds, np.float32)
    img = np.zeros((ph, pw, 3), np.float32)
    img[:nh, :nw] = im[:min(nh, ph), :min(nw, pw)]

    g = cfg.train.max_gt_instances
    mh, mw = ph // 4, pw // 4
    boxes = np.zeros((g, 4), np.float32)
    classes = np.zeros((g,), np.int32)
    masks = np.zeros((g, mh, mw), np.float32)
    valid = np.zeros((g,), bool)

    obj_ids = sorted(int(i) for i in np.unique(ids) if i != 0)[:g]
    for slot, oid in enumerate(obj_ids):
        m = (ids == oid)
        ys, xs = np.nonzero(m)
        if len(ys) < 4:
            continue
        x1, x2 = xs.min() * s, (xs.max() + 1) * s
        y1, y2 = ys.min() * s, (ys.max() + 1) * s
        boxes[slot] = (x1, y1, min(x2, pw), min(y2, ph))
        classes[slot] = 1  # DAVIS fine-tune: single "object" class
        mm = cv2.resize(m.astype(np.float32), (nw, nh),
                        interpolation=cv2.INTER_LINEAR)
        canvas = np.zeros((ph, pw), np.float32)
        canvas[:min(nh, ph), :min(nw, pw)] = mm[:ph, :pw]
        masks[slot] = cv2.resize(canvas, (mw, mh),
                                 interpolation=cv2.INTER_LINEAR)
        valid[slot] = True

    gt = dict(boxes=boxes, classes=classes, masks=masks, valid=valid)
    return img, np.asarray([nh, nw], np.float32), gt


class DetectionLoader:
    """Shuffled, batched, prefetching loader (reference: RoiDataLoader).

    Python-thread prefetch (decode is cv2/C++ so the GIL is mostly
    released); yields host numpy batches ready for shard_batch/device_put.
    """

    def __init__(self, cfg: Config, records: Sequence[FrameRecord],
                 batch_size: int, seed: int = 0,
                 num_threads: Optional[int] = None):
        self.cfg = cfg
        self.records = list(records)
        self.batch = batch_size
        self.rng = np.random.RandomState(seed)
        self.num_threads = num_threads or cfg.data.num_workers

    def _example_stream(self) -> Iterator[tuple]:
        while True:
            order = self.rng.permutation(len(self.records))
            for i in order:
                scale = int(self.rng.choice(self.cfg.train.scales))
                yield self.records[i], scale

    def __iter__(self):
        cfg = self.cfg
        # train.double_buffer=False disables read-ahead: one worker, queue
        # of one — each example is produced only when consumed (useful when
        # the host is memory- or core-starved; default keeps a
        # prefetch_depth*batch buffer ahead of the device).
        depth = cfg.data.prefetch_depth * self.batch \
            if cfg.train.double_buffer else 1
        q: queue_mod.Queue = queue_mod.Queue(maxsize=depth)
        stream = self._example_stream()
        lock = threading.Lock()

        def worker():
            while True:
                with lock:
                    rec, scale = next(stream)
                # records carry their own loader (DAVIS frames, COCO
                # examples, ... — data/catalog.py) but all produce the
                # same fixed-shape tuple
                item = rec.load(cfg, scale)
                # Group by the padded shape the loader ACTUALLY produced
                # (not record metadata — ADVICE r2 #4: EXIF-rotated or
                # corrupt files can decode with the opposite orientation,
                # and a metadata key would then mix shapes in one buffer).
                q.put((item[0].shape, item))

        n_workers = self.num_threads if cfg.train.double_buffer else 1
        for _ in range(n_workers):
            threading.Thread(target=worker, daemon=True).start()

        # Aspect-grouped batching (reference: MinibatchSampler): each
        # yielded batch is orientation-homogeneous so its pytree has ONE
        # static shape; whichever orientation buffer fills first ships.
        buffers: dict = {}
        while True:
            shape, item = q.get()
            buf = buffers.setdefault(shape, [])
            buf.append(item)
            if len(buf) < self.batch:
                continue
            items, buffers[shape] = buf, []
            images = np.stack([it[0] for it in items])
            im_hw = np.stack([it[1] for it in items])
            gt = {k: np.stack([it[2][k] for it in items])
                  for k in items[0][2]}
            yield images, im_hw, gt
