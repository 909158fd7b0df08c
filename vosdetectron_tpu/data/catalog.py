"""Unified dataset catalog + multi-dataset roidb assembly.

TPU-native rebuild of the reference's dataset dispatch
(reference: lib/datasets/dataset_catalog.py ~150 LoC name -> {img dir, ann
file}, and lib/datasets/roidb.py::combined_roidb_for_training ~300 LoC
multi-dataset concat + flip duplication + empty filtering).

``cfg.train.datasets`` / ``cfg.test.datasets`` names resolve here to
records that all load into the SAME fixed-shape training tuple (padded
image, (nh, nw), gt dict), so the SPMD train step is dataset-agnostic and
datasets mix freely in one roidb — e.g.
``train.datasets=('coco_2017_train','davis_2017_train')``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import numpy as np

from ..config import Config

# name -> (image dir, annotation json), joined onto cfg.data.datasets_root
# (reference: dataset_catalog.py COCO entries).
COCO_CATALOG: Dict[str, Tuple[str, str]] = {
    "coco_2014_train": ("coco/images/train2014",
                        "coco/annotations/instances_train2014.json"),
    "coco_2014_val": ("coco/images/val2014",
                      "coco/annotations/instances_val2014.json"),
    "coco_2017_train": ("coco/images/train2017",
                        "coco/annotations/instances_train2017.json"),
    "coco_2017_val": ("coco/images/val2017",
                      "coco/annotations/instances_val2017.json"),
}

# name -> DAVIS split (image root comes from cfg.data.davis_root;
# fork-added DAVIS entries, SURVEY.md §2.2 dataset catalog row).
DAVIS_CATALOG: Dict[str, str] = {
    "davis_2017_train": "train",
    "davis_2017_val": "val",
    "davis_2016_train": "train",
    "davis_2016_val": "val",
}


@dataclass
class CocoRecord:
    """One COCO roidb entry; loads via data/coco.load_coco_example."""
    dataset: object  # CocoDataset (shared across records)
    image_id: int
    flipped: bool

    @property
    def portrait(self) -> bool:
        """Aspect-group key (reference: MinibatchSampler groups by
        aspect); portrait batches pad to the transposed static shape."""
        ex = self.dataset.example(self.image_id)
        return ex.height > ex.width

    def load(self, cfg: Config, scale: int):
        from .coco import load_coco_example

        return load_coco_example(cfg, self.dataset, self.image_id,
                                 self.flipped, scale)


def records_for_dataset(cfg: Config, name: str) -> List:
    """Resolve one catalog name to its roidb records."""
    if name in DAVIS_CATALOG:
        from .detection_data import build_roidb

        return build_roidb(cfg, DAVIS_CATALOG[name])
    if name in COCO_CATALOG:
        from .coco import CocoDataset, coco_roidb

        img_dir, ann = COCO_CATALOG[name]
        root = cfg.data.datasets_root
        ds = CocoDataset(os.path.join(root, ann),
                         os.path.join(root, img_dir))
        return [CocoRecord(ds, iid, fl)
                for iid, fl in coco_roidb(ds, cfg.train.use_flipped)]
    raise KeyError(
        f"unknown dataset {name!r}; known: "
        f"{sorted(DAVIS_CATALOG) + sorted(COCO_CATALOG)}")


def build_combined_roidb(cfg: Config,
                         names: Sequence[str] | None = None) -> List:
    """Multi-dataset roidb concat
    (reference: roidb.py::combined_roidb_for_training)."""
    names = tuple(names) if names is not None else cfg.train.datasets
    records: List = []
    for name in names:
        rs = records_for_dataset(cfg, name)
        if not rs:
            raise ValueError(f"dataset {name!r} produced an empty roidb")
        records.extend(rs)
    return records
