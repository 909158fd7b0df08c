"""Visualization smoke tests (reference: lib/utils/vis.py overlays)."""

import numpy as np

from vosdetectron_tpu.data.davis import make_synthetic_sequence
from vosdetectron_tpu.utils import vis


def _fixture():
    frames, idmaps = make_synthetic_sequence(0, 8, (96, 160), 2)
    boxes = np.array([[10, 10, 60, 60], [80, 20, 140, 90]], np.float32)
    scores = np.array([0.9, 0.4], np.float32)
    classes = np.array([1, 2], np.int32)
    valid = np.ones(2, bool)
    masks = np.zeros((2, 96, 160), np.float32)
    masks[0, 12:58, 12:58] = 1
    return frames, idmaps, boxes, scores, classes, valid, masks


def test_draw_detections_and_masks():
    frames, _, boxes, scores, classes, valid, masks = _fixture()
    out = vis.draw_detections(frames[0], boxes, scores, classes, valid,
                              masks > 0.5, ["bg", "cat", "dog"])
    assert out.shape == frames[0].shape and out.dtype == np.uint8
    assert not np.array_equal(out, frames[0])  # something was drawn


def test_vis_one_image_thresholds_and_writes(tmp_path):
    frames, _, boxes, scores, classes, valid, masks = _fixture()
    p = str(tmp_path / "panel.jpg")
    out = vis.vis_one_image(frames[0], boxes, scores, classes, valid,
                            masks, score_thresh=0.5, out_path=p)
    assert out.dtype == np.uint8
    import os
    assert os.path.getsize(p) > 0


def test_indexed_map_and_strip():
    frames, idmaps, *_ = _fixture()
    ov = vis.draw_indexed_map(frames[0], idmaps[0])
    assert ov.shape == frames[0].shape
    strip = vis.vis_sequence_strip(frames, list(idmaps), every=4)
    assert strip.shape[0] == 96 and strip.shape[1] > 160


def test_side_by_side_mixed_heights():
    a = np.zeros((96, 160, 3), np.uint8)
    b = np.zeros((48, 80, 3), np.uint8)
    out = vis.side_by_side([a, b], labels=["pred", "gt"])
    assert out.shape[0] == 96
