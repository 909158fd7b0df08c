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


def test_class_specific_decode_honors_legacy_plus1():
    """Regression (VERDICT r2 #2): the class-SPECIFIC branch of
    `postprocess_boxes` must pass legacy_plus1 into the delta decode —
    Detectron's default path is class-specific regression, so the flag
    must reach the final box decode, not only the class-agnostic branch.

    Asserts the decoded box of the winning detection equals the native
    legacy formula applied per class (fails with the pre-fix code)."""
    from vosdetectron_tpu.engine.inference import postprocess_boxes
    from vosdetectron_tpu.models.generalized_rcnn import RCNNOutputs
    from vosdetectron_tpu.models.rpn import Proposals

    k = 3  # background + 2 classes
    roi = np.array([[10.0, 20.0, 29.0, 49.0]], np.float32)
    # class-specific deltas (R, 4K): class-2 column carries the signal
    deltas = np.zeros((1, 4 * k), np.float32)
    deltas[0, 8:12] = [0.1 * 10, -0.2 * 10, np.log(1.5) * 5, np.log(0.5) * 5]
    cls_scores = np.full((1, 1, k), -10.0, np.float32)
    cls_scores[0, 0, 2] = 10.0  # class 2 wins softmax

    cfg = apply_overrides(Config(), [
        ("model.num_classes", k),
        ("model.legacy_plus1", True),
        ("test.score_thresh", 0.05),
        ("test.detections_per_im", 2),
        ("test.nms", 0.5),
    ]).validate()

    out = RCNNOutputs(
        proposals=Proposals(jnp.asarray(roi[None]),
                            jnp.ones((1, 1), jnp.float32),
                            jnp.ones((1, 1), bool)),
        cls_scores=jnp.asarray(cls_scores),
        bbox_deltas=jnp.asarray(deltas[None]),
        feats=(), rpn_logits=(), rpn_deltas=())
    dets = postprocess_boxes(out, jnp.asarray([[480.0, 854.0]]), cfg)
    got = np.asarray(dets.boxes)[0, 0]
    assert bool(dets.valid[0, 0]) and int(dets.classes[0, 0]) == 2

    # legacy ground truth (widths +1, x2 = ctr + 0.5w - 1)
    w, h = 20.0, 30.0
    cx, cy = 10.0 + 0.5 * w, 20.0 + 0.5 * h
    pcx, pcy = cx + 0.1 * w, cy - 0.2 * h
    pw, ph = 1.5 * w, 0.5 * h
    exp = [pcx - 0.5 * pw, pcy - 0.5 * ph,
           pcx + 0.5 * pw - 1.0, pcy + 0.5 * ph - 1.0]
    np.testing.assert_allclose(got, exp, rtol=1e-4)


def test_collect_candidates_honors_legacy_plus1():
    """Same regression for the TTA candidate path (inference.py
    `collect_candidates` class-specific branch)."""
    from vosdetectron_tpu.engine.inference import collect_candidates
    from vosdetectron_tpu.models.generalized_rcnn import RCNNOutputs
    from vosdetectron_tpu.models.rpn import Proposals

    k = 3
    roi = np.array([[10.0, 20.0, 29.0, 49.0]], np.float32)
    deltas = np.zeros((1, 4 * k), np.float32)
    deltas[0, 8:12] = [0.1 * 10, -0.2 * 10, np.log(1.5) * 5, np.log(0.5) * 5]
    cls_scores = np.full((1, 1, k), -10.0, np.float32)
    cls_scores[0, 0, 2] = 10.0

    cfg = apply_overrides(Config(), [
        ("model.num_classes", k),
        ("model.legacy_plus1", True),
        ("test.score_thresh", 0.05),
    ]).validate()
    out = RCNNOutputs(
        proposals=Proposals(jnp.asarray(roi[None]),
                            jnp.ones((1, 1), jnp.float32),
                            jnp.ones((1, 1), bool)),
        cls_scores=jnp.asarray(cls_scores),
        bbox_deltas=jnp.asarray(deltas[None]),
        feats=(), rpn_logits=(), rpn_deltas=())
    bx, sc, cls, val = collect_candidates(out, jnp.asarray([[480.0, 854.0]]),
                                          cfg, topk=2)
    got = np.asarray(bx)[0, 0]
    assert bool(val[0, 0]) and int(cls[0, 0]) == 2
    w, h = 20.0, 30.0
    cx, cy = 10.0 + 0.5 * w, 20.0 + 0.5 * h
    pcx, pcy = cx + 0.1 * w, cy - 0.2 * h
    pw, ph = 1.5 * w, 0.5 * h
    exp = [pcx - 0.5 * pw, pcy - 0.5 * ph,
           pcx + 0.5 * pw - 1.0, pcy + 0.5 * ph - 1.0]
    np.testing.assert_allclose(got, exp, rtol=1e-4)


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
