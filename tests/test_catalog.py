"""Dataset catalog -> loader dispatch + multi-dataset roidb
(reference: dataset_catalog.py + roidb.py::combined_roidb_for_training;
VERDICT r1 missing #4)."""

import json
import os

import numpy as np
import pytest

from vosdetectron_tpu.config import Config, apply_overrides
from vosdetectron_tpu.data.catalog import (CocoRecord, build_combined_roidb,
                                           records_for_dataset)
from vosdetectron_tpu.data.davis import materialize_synthetic_davis
from vosdetectron_tpu.data.detection_data import DetectionLoader, FrameRecord

from test_coco import make_tiny_coco


def setup_roots(tmp_path, rng):
    """A datasets_root with a coco_2017_train layout + a synthetic DAVIS."""
    root = tmp_path / "data"
    coco_img = root / "coco" / "images" / "train2017"
    coco_ann = root / "coco" / "annotations"
    coco_img.mkdir(parents=True)
    coco_ann.mkdir(parents=True)
    ann_file, img_dir = make_tiny_coco(tmp_path, rng)
    os.rename(ann_file, coco_ann / "instances_train2017.json")
    for f in os.listdir(img_dir):
        os.rename(os.path.join(img_dir, f), coco_img / f)

    davis_root = root / "DAVIS"
    materialize_synthetic_davis(str(davis_root), {"seq_a": 0},
                                num_frames=3, size=(64, 96), num_objects=2)
    return str(root), str(davis_root)


def cfg_for(root, davis_root, **extra):
    over = [
        ("data.datasets_root", root),
        ("data.davis_root", davis_root),
        ("train.padded_image_size", (64, 128)),
        ("train.scales", (48,)),
        ("train.max_size", 96),
        ("train.max_gt_instances", 4),
    ] + list(extra.items())
    return apply_overrides(Config(), over).validate()


def test_records_for_each_kind(tmp_path, rng):
    root, davis_root = setup_roots(tmp_path, rng)
    cfg = cfg_for(root, davis_root)
    davis = records_for_dataset(cfg, "davis_2017_train")
    coco = records_for_dataset(cfg, "coco_2017_train")
    assert davis and all(isinstance(r, FrameRecord) for r in davis)
    assert coco and all(isinstance(r, CocoRecord) for r in coco)
    # flip duplication in both
    assert len(davis) == 2 * 3  # 3 frames x flip
    assert len(coco) == 2 * 2   # 2 images x flip


def test_unknown_dataset_raises(tmp_path, rng):
    root, davis_root = setup_roots(tmp_path, rng)
    cfg = cfg_for(root, davis_root)
    with pytest.raises(KeyError, match="unknown dataset"):
        records_for_dataset(cfg, "imagenet_2012")


def test_combined_roidb_concat_and_loader(tmp_path, rng):
    """cfg.train.datasets drives a mixed COCO+DAVIS roidb whose records all
    load into the same fixed-shape batch through one DetectionLoader."""
    root, davis_root = setup_roots(tmp_path, rng)
    cfg = cfg_for(root, davis_root,
                  **{"train.datasets": ("coco_2017_train",
                                        "davis_2017_train")})
    records = build_combined_roidb(cfg)
    assert len(records) == 4 + 6

    loader = DetectionLoader(cfg, records, batch_size=4, seed=0)
    images, im_hw, gt = next(iter(loader))
    assert images.shape == (4, 64, 128, 3)
    assert gt["boxes"].shape == (4, 4, 4)
    assert gt["masks"].shape == (4, 4, 16, 32)
    assert gt["valid"].any()
    assert np.isfinite(images).all()


def test_combined_roidb_rejects_empty(tmp_path, rng):
    root, davis_root = setup_roots(tmp_path, rng)
    # point DAVIS at an empty dir -> loud failure, not a silent empty roidb
    cfg = cfg_for(root, str(tmp_path / "nowhere"))
    with pytest.raises(Exception):
        build_combined_roidb(cfg, ["davis_2017_train"])


def test_davis_to_coco_json_roundtrip(tmp_path):
    """DAVIS -> COCO-detection export: images resolve, boxes tight, RLE
    masks decode to the id-map objects (reference: json_dataset lineage
    evaluation bridge, SURVEY.md §2.2)."""
    import os

    import numpy as np

    from vosdetectron_tpu.data.coco import CocoDataset
    from vosdetectron_tpu.data.davis import (davis_to_coco_json,
                                             materialize_synthetic_davis,
                                             read_indexed_png)

    root = str(tmp_path / "davis")
    materialize_synthetic_davis(root, {"a": 3}, num_frames=2,
                                size=(96, 160), num_objects=2)
    j = davis_to_coco_json(root, "val", str(tmp_path / "coco.json"))
    ds = CocoDataset(j, root)
    ids = ds.image_ids()
    assert len(ids) == 2 and ds.num_classes == 2
    ex = ds.example(ids[0])
    assert os.path.exists(ex.image_path)
    idmap = read_indexed_png(
        os.path.join(root, "Annotations", "480p", "a", "00000.png"))
    oids = [o for o in np.unique(idmap) if o]
    assert len(ex.boxes) == len(oids)
    # each RLE mask must equal one id-map object exactly
    for segm in ex.segms:
        m = ds.gt_mask(segm, ex.height, ex.width).astype(bool)
        best = max(((m & (idmap == o)).sum() / max((m | (idmap == o)).sum(), 1))
                   for o in oids)
        assert best == 1.0
