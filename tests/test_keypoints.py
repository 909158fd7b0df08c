"""Tests: Keypoint R-CNN branch — head, targets, loss, decode, OKS eval.

Reference behaviors covered: lib/modeling/keypoint_rcnn_heads.py (head +
loss), lib/utils/keypoints.py (heatmap labels, flip, decode), pycocotools
COCOeval.computeOks (OKS matching).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vosdetectron_tpu.config import Config, apply_overrides
from vosdetectron_tpu.models.heads import KeypointHead, keypoint_loss
from vosdetectron_tpu.models.targets import GroundTruth, keypoint_targets


def kp_cfg(num_kps=4):
    return apply_overrides(Config(), [
        ("model.num_classes", 3),
        ("model.keypoint_on", True),
        ("krcnn.num_keypoints", num_kps),
        ("krcnn.conv_layers", 2),
        ("krcnn.dim", 32),
        ("rpn.pre_nms_top_n_train", 64),
        ("rpn.post_nms_top_n_train", 32),
        ("rpn.batch_size_per_im", 64),
        ("fast_rcnn.batch_size_per_im", 32),
        ("train.padded_image_size", (128, 192)),
        ("train.max_gt_instances", 4),
    ]).validate()


def test_keypoint_head_shapes():
    head = KeypointHead(num_keypoints=17, dim=32, num_convs=2, up_scale=2)
    x = jnp.zeros((3, 14, 14, 8))
    params = head.init(jax.random.PRNGKey(0), x)
    y = head.apply(params, x)
    # 14 -> deconv 28 -> 2x bilinear 56
    assert y.shape == (3, 56, 56, 17)
    assert y.dtype == jnp.float32


def test_keypoint_targets_mapping():
    hm = 56
    # one gt with 4 kps: inside, far-edge, invisible, outside
    gt_kps = jnp.asarray(np.array([[
        [10.9, 20.2, 2.0],    # cell (10, 20)
        [56.0, 56.0, 2.0],    # exactly on the far corner -> last cell
        [30.0, 30.0, 0.0],    # unlabeled
        [70.0, 10.0, 2.0],    # right of the roi -> invalid
    ]], np.float32))
    rois = jnp.asarray(np.array([[0.0, 0.0, 56.0, 56.0]], np.float32))
    gi = jnp.asarray([0], jnp.int32)
    fg = jnp.asarray([True])
    tgt, valid = keypoint_targets(gt_kps, rois, gi, fg, hm)
    tgt, valid = np.asarray(tgt), np.asarray(valid)
    assert valid.tolist() == [[True, True, False, False]]
    assert tgt[0, 0] == 20 * hm + 10
    assert tgt[0, 1] == (hm - 1) * hm + (hm - 1)
    # background roi invalidates everything
    _, v2 = keypoint_targets(gt_kps, rois, gi, jnp.asarray([False]), hm)
    assert not np.asarray(v2).any()


def test_keypoint_loss_perfect_vs_uniform():
    r, hm, k = 2, 8, 3
    tgt = jnp.asarray(np.array([[5, 9, 0], [3, 3, 3]], np.int32))
    valid = jnp.asarray(np.array([[True, True, False],
                                  [True, False, False]]))
    # near-one-hot logits at the target cell
    logits = np.zeros((r, hm, hm, k), np.float32)
    for i in range(r):
        for j in range(k):
            t = int(tgt[i, j])
            logits[i, t // hm, t % hm, j] = 20.0
    lo = float(keypoint_loss(jnp.asarray(logits), tgt, valid))
    assert lo < 1e-3
    uni = float(keypoint_loss(jnp.zeros((r, hm, hm, k)), tgt, valid))
    np.testing.assert_allclose(uni, np.log(hm * hm), rtol=1e-5)
    # all-invalid -> exactly zero
    assert float(keypoint_loss(jnp.asarray(logits), tgt,
                               jnp.zeros_like(valid))) == 0.0


def test_decode_keypoints_roundtrip():
    from vosdetectron_tpu.engine.inference import decode_keypoints

    hm, k = 16, 3
    boxes = jnp.asarray(np.array([[[8.0, 4.0, 40.0, 68.0]]], np.float32))
    cells = [(2, 3), (15, 0), (7, 7)]  # (iy, ix)
    logits = np.zeros((1, 1, hm, hm, k), np.float32)
    for j, (iy, ix) in enumerate(cells):
        logits[0, 0, iy, ix, j] = 10.0
    out = np.asarray(decode_keypoints(jnp.asarray(logits), boxes))[0, 0]
    sw, sh = (40.0 - 8.0) / hm, (68.0 - 4.0) / hm
    for j, (iy, ix) in enumerate(cells):
        assert abs(out[j, 0] - (8.0 + (ix + 0.5) * sw)) <= 0.51 * sw
        assert abs(out[j, 1] - (4.0 + (iy + 0.5) * sh)) <= 0.51 * sh
        assert 0.0 < out[j, 2] <= 1.0


def test_flip_keypoints_swaps_lr():
    from vosdetectron_tpu.data.coco import COCO_KP_NAMES, flip_keypoints

    k = len(COCO_KP_NAMES)
    kps = np.zeros((1, k, 3), np.float32)
    kps[0, :, 0] = np.arange(k)            # distinct x per kp
    kps[0, :, 1] = 7.0
    kps[0, :, 2] = 2.0
    kps[0, 3, 2] = 0.0                     # left_ear unlabeled
    out = flip_keypoints(kps, width=100)
    le, re = COCO_KP_NAMES.index("left_eye"), COCO_KP_NAMES.index(
        "right_eye")
    # left_eye slot now carries the (mirrored) right_eye point
    assert out[0, le, 0] == 100 - kps[0, re, 0] - 1
    assert out[0, re, 0] == 100 - kps[0, le, 0] - 1
    # nose maps to itself
    assert out[0, 0, 0] == 100 - kps[0, 0, 0] - 1
    # unlabeled x untouched; visibility travels with the swap
    rear = COCO_KP_NAMES.index("right_ear")
    assert out[0, rear, 2] == 0.0
    assert out[0, rear, 0] == kps[0, 3, 0]


def test_oks_evaluator_perfect_and_off():
    from vosdetectron_tpu.metrics.coco_eval import CocoEvaluator

    rng = np.random.RandomState(0)
    ev = CocoEvaluator(iou_type="keypoints")
    assert ev.max_dets == (20,)
    for _ in range(4):
        g = 3
        boxes = np.stack([
            rng.uniform(0, 100, g), rng.uniform(0, 100, g),
            rng.uniform(150, 250, g), rng.uniform(150, 250, g)], 1)
        kps = np.zeros((g, 17, 3), np.float32)
        for i in range(g):
            kps[i, :, 0] = rng.uniform(boxes[i, 0], boxes[i, 2], 17)
            kps[i, :, 1] = rng.uniform(boxes[i, 1], boxes[i, 3], 17)
        kps[:, :, 2] = 2.0
        cls = np.ones(g, np.int32)
        ev.add_image(det_boxes=boxes, det_scores=rng.uniform(0.5, 1, g),
                     det_classes=cls, gt_boxes=boxes, gt_classes=cls,
                     det_kps=kps, gt_kps=kps)
    s = ev.summarize()
    assert s["AP"] == pytest.approx(1.0)
    assert s["AR@20"] == pytest.approx(1.0)

    # grossly displaced detections -> AP 0
    ev2 = CocoEvaluator(iou_type="keypoints")
    boxes = np.array([[0, 0, 50, 50]], np.float32)
    gt_kps = np.zeros((1, 17, 3), np.float32)
    gt_kps[:, :, :2] = 25.0
    gt_kps[:, :, 2] = 2.0
    det_kps = gt_kps.copy()
    det_kps[:, :, :2] = 500.0
    ev2.add_image(det_boxes=boxes, det_scores=np.array([0.9]),
                  det_classes=np.array([1]), gt_boxes=boxes,
                  gt_classes=np.array([1]), det_kps=det_kps,
                  gt_kps=gt_kps)
    assert ev2.summarize()["AP"] == pytest.approx(0.0)

    # GT with zero labeled kps is ignored, not counted as missed
    ev3 = CocoEvaluator(iou_type="keypoints")
    ev3.add_image(det_boxes=np.zeros((0, 4)), det_scores=np.zeros(0),
                  det_classes=np.zeros(0, np.int32), gt_boxes=boxes,
                  gt_classes=np.array([1]), det_kps=np.zeros((0, 17, 3)),
                  gt_kps=np.zeros((1, 17, 3)))
    assert np.isnan(ev3.summarize()["AP"])


def _kp_gt(cfg, b=1):
    g = cfg.train.max_gt_instances
    nk = cfg.krcnn.num_keypoints
    ph, pw = cfg.train.padded_image_size
    boxes = np.zeros((b, g, 4), np.float32)
    classes = np.zeros((b, g), np.int32)
    masks = np.zeros((b, g, ph // 4, pw // 4), np.float32)
    valid = np.zeros((b, g), bool)
    kps = np.zeros((b, g, nk, 3), np.float32)
    boxes[:, 0] = (20, 30, 80, 90)
    boxes[:, 1] = (100, 40, 170, 110)
    classes[:, :2] = 1
    valid[:, :2] = True
    masks[:, 0, 8:22, 6:19] = 1.0
    masks[:, 1, 11:27, 26:42] = 1.0
    rng = np.random.RandomState(1)
    for i in range(2):
        x1, y1, x2, y2 = boxes[0, i]
        kps[:, i, :, 0] = rng.uniform(x1, x2, nk)
        kps[:, i, :, 1] = rng.uniform(y1, y2, nk)
        kps[:, i, :, 2] = 2.0
    return GroundTruth(jnp.asarray(boxes), jnp.asarray(classes),
                       jnp.asarray(masks), jnp.asarray(valid),
                       jnp.asarray(kps))


@pytest.mark.slow
def test_train_step_with_keypoint_branch():
    from vosdetectron_tpu.engine.train import Trainer

    cfg = kp_cfg()
    trainer = Trainer(cfg, rng=0)
    ph, pw = cfg.train.padded_image_size
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(1, ph, pw, 3).astype(np.float32))
    im_hw = jnp.asarray([[ph, pw]], np.float32)
    gt = _kp_gt(cfg)
    p0 = jax.tree_util.tree_map(
        np.asarray, trainer.state.params["keypoint_head"])
    losses = trainer.train_step(jax.random.PRNGKey(0), images, im_hw, gt)
    vals = {k: float(v) for k, v in losses.items()}
    assert "keypoint" in vals and np.isfinite(vals["keypoint"]), vals
    assert all(np.isfinite(v) for v in vals.values()), vals
    p1 = jax.tree_util.tree_map(
        np.asarray, trainer.state.params["keypoint_head"])
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(a - b).max()), p0, p1)
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0


@pytest.mark.slow
def test_detector_emits_keypoints():
    from vosdetectron_tpu.engine.inference import Detector

    cfg = apply_overrides(kp_cfg(), [
        ("test.padded_image_size", (128, 192)),
        ("rpn.pre_nms_top_n_test", 64),
        ("rpn.post_nms_top_n_test", 32),
        ("test.detections_per_im", 8),
    ]).validate()
    det = Detector(cfg, rng=0)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(1, 128, 192, 3).astype(np.float32))
    out = det.detect(images, jnp.asarray([[128.0, 192.0]], np.float32))
    assert out.keypoints is not None
    assert out.keypoints.shape == (1, 8, cfg.krcnn.num_keypoints, 3)
    assert np.isfinite(np.asarray(out.keypoints)).all()


def test_bilinear_upsample_matches_torch_fixed_deconv():
    """bilinear_upsample_x2 == torch ConvTranspose2d(k4, s2, p1, groups=C)
    with the FCN bilinear kernel (reference: BilinearInterpolation2d)."""
    torch = pytest.importorskip("torch")
    from vosdetectron_tpu.models.heads import bilinear_upsample_x2

    rng = np.random.RandomState(0)
    x = rng.randn(2, 7, 9, 4).astype(np.float32)
    # reference kernel construction (lib/nn/modules/upsample.py)
    f, c = 2, 0.75
    og = np.ogrid[:4, :4]
    k = ((1 - abs(og[0] / f - c)) * (1 - abs(og[1] / f - c))).astype(
        np.float32)
    w = np.zeros((4, 1, 4, 4), np.float32)  # (C_out, C_in/groups, kh, kw)
    w[:, 0] = k
    yt = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(
            w.transpose(1, 0, 2, 3).reshape(4, 1, 4, 4)),
        stride=2, padding=1, groups=4).numpy().transpose(0, 2, 3, 1)
    import jax

    with jax.default_matmul_precision("float32"):
        yj = np.asarray(bilinear_upsample_x2(jnp.asarray(x)))
    assert yj.shape == (2, 14, 18, 4)
    np.testing.assert_allclose(yj, yt, atol=1e-5)
