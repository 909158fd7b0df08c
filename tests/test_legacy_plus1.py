"""Detectron integer-box (+1) semantics: one flag flips the whole traced
path (SURVEY §7 hard-part 3; VERDICT r1 weak #9)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from vosdetectron_tpu.config import Config, apply_overrides, load_config
from vosdetectron_tpu.ops import boxes as box_ops


def test_bbox_transform_inv_legacy_matches_detectron_formula():
    """Hand-computed original-Detectron decode: widths = x2-x1+1,
    pred x2 = ctr + 0.5w - 1."""
    box = np.array([[10.0, 20.0, 29.0, 49.0]], np.float32)  # w=20, h=30 (+1)
    deltas = np.array([[0.1, -0.2, np.log(1.5), np.log(0.5)]], np.float32)
    got = np.asarray(box_ops.bbox_transform_inv(
        jnp.asarray(box), jnp.asarray(deltas), weights=(1, 1, 1, 1),
        legacy_plus1=True))[0]
    w, h = 20.0, 30.0
    cx, cy = 10.0 + 0.5 * w, 20.0 + 0.5 * h
    pcx, pcy = cx + 0.1 * w, cy - 0.2 * h
    pw, ph = 1.5 * w, 0.5 * h
    exp = [pcx - 0.5 * pw, pcy - 0.5 * ph,
           pcx + 0.5 * pw - 1.0, pcy + 0.5 * ph - 1.0]
    np.testing.assert_allclose(got, exp, rtol=1e-5)


def test_transform_roundtrip_both_semantics():
    rng = np.random.RandomState(0)
    src = rng.uniform(0, 200, (8, 4)).astype(np.float32)
    src[:, 2:] = src[:, :2] + rng.uniform(5, 80, (8, 2))
    gt = rng.uniform(0, 200, (8, 4)).astype(np.float32)
    gt[:, 2:] = gt[:, :2] + rng.uniform(5, 80, (8, 2))
    for legacy in (False, True):
        d = box_ops.bbox_transform(jnp.asarray(src), jnp.asarray(gt),
                                   legacy_plus1=legacy)
        back = box_ops.bbox_transform_inv(jnp.asarray(src), d,
                                          legacy_plus1=legacy)
        np.testing.assert_allclose(np.asarray(back), gt, atol=1e-3)


def test_clip_boxes_legacy_clips_to_wm1():
    b = jnp.asarray([[-5.0, -5.0, 500.0, 400.0]])
    got = np.asarray(box_ops.clip_boxes(b, (100.0, 200.0),
                                        legacy_plus1=True))[0]
    np.testing.assert_allclose(got, [0, 0, 199.0, 99.0])
    got2 = np.asarray(box_ops.clip_boxes(b, (100.0, 200.0)))[0]
    np.testing.assert_allclose(got2, [0, 0, 200.0, 100.0])


def test_pairwise_iou_legacy_differs():
    a = jnp.asarray([[0.0, 0.0, 9.0, 9.0]])
    b = jnp.asarray([[0.0, 0.0, 9.0, 9.0]])
    # legacy: area 10x10; modern: 9x9 — identical boxes IoU 1 either way,
    # but partial overlap differs
    c = jnp.asarray([[5.0, 0.0, 14.0, 9.0]])
    iou_m = float(box_ops.pairwise_iou(a, c)[0, 0])
    iou_l = float(box_ops.pairwise_iou(a, c, legacy_plus1=True)[0, 0])
    # modern: inter 4*9=36, union 81+81-36=126
    assert iou_m == pytest.approx(36 / 126, rel=1e-5)
    # legacy: inter 5*10=50, union 100+100-50=150
    assert iou_l == pytest.approx(50 / 150, rel=1e-5)


def test_reference_parity_config_loads():
    path = os.path.join(os.path.dirname(__file__), "..", "configs",
                        "reference_parity.yaml")
    cfg = load_config(path)
    assert cfg.model.legacy_plus1 is True
    assert cfg.test.scale == 800


@pytest.mark.slow
def test_flag_flips_whole_traced_path():
    """The same weights produce different (legacy vs modern) detections —
    proof the flag reaches proposals + postprocess inside jit."""
    import jax

    from vosdetectron_tpu.engine.inference import Detector

    def build(legacy):
        cfg = apply_overrides(Config(), [
            ("model.num_classes", 5),
            ("model.legacy_plus1", legacy),
            ("rpn.pre_nms_top_n_test", 64),
            ("rpn.post_nms_top_n_test", 32),
            ("test.padded_image_size", (128, 192)),
            ("test.detections_per_im", 10),
            ("test.max_proposals", 32),
            ("test.score_thresh", 0.0),
        ]).validate()
        return Detector(cfg, rng=0)

    img = jnp.asarray(np.random.RandomState(0)
                      .randn(1, 128, 192, 3).astype(np.float32))
    hw = jnp.asarray([[128.0, 192.0]])
    d_modern = build(False).detect(img, hw)
    d_legacy = build(True).detect(img, hw)
    bm = np.asarray(d_modern.boxes)[np.asarray(d_modern.valid)]
    bl = np.asarray(d_legacy.boxes)[np.asarray(d_legacy.valid)]
    assert bm.shape != bl.shape or not np.allclose(bm, bl, atol=1e-3)
