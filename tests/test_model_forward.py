"""Model forward smoke + invariants on tiny shapes (CPU-mesh friendly)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vosdetectron_tpu.config import Config, apply_overrides
from vosdetectron_tpu.engine.inference import Detector, postprocess_boxes


def tiny_cfg(conv_body="fpn_resnet50", **extra):
    over = [
        ("model.conv_body", conv_body),
        ("model.num_classes", 5),
        ("fpn.enabled", conv_body.startswith("fpn")),
        ("rpn.pre_nms_top_n_test", 64),
        ("rpn.post_nms_top_n_test", 32),
        ("test.padded_image_size", (128, 192)),
        ("test.detections_per_im", 10),
        ("test.max_proposals", 32),
    ] + list(extra.items())
    return apply_overrides(Config(), over).validate()


@pytest.mark.parametrize("body", ["fpn_resnet50", "resnet50_c4"])
def test_forward_shapes(body):
    cfg = tiny_cfg(body)
    det = Detector(cfg, rng=0)
    ph, pw = cfg.test.padded_image_size
    img = jnp.asarray(np.random.RandomState(0)
                      .randn(1, ph, pw, 3).astype(np.float32))
    hw = jnp.asarray([[ph, pw]], jnp.float32)
    out = det.detect(img, hw)
    d = cfg.test.detections_per_im
    assert out.boxes.shape == (1, d, 4)
    assert out.scores.shape == (1, d)
    assert out.classes.shape == (1, d)
    assert out.masks.shape == (1, d, 28, 28)
    # all finite where valid
    v = np.asarray(out.valid[0])
    assert np.isfinite(np.asarray(out.boxes[0])[v]).all()
    assert np.isfinite(np.asarray(out.masks[0])[v]).all()
    # classes in range, no background
    cls = np.asarray(out.classes[0])[v]
    assert ((cls >= 1) & (cls < cfg.model.num_classes)).all()
    # boxes clipped to image
    bx = np.asarray(out.boxes[0])[v]
    if len(bx):
        assert bx.min() >= 0 and bx[:, 2].max() <= pw and bx[:, 3].max() <= ph


def test_forward_shapes_resnext():
    """ResNeXt trunk (resnets.num_groups/width_per_group — reference:
    cfg.RESNETS.NUM_GROUPS, lib/modeling/ResNet.py bottleneck_transformation
    group conv): grouped 3x3 kernels and a working detect path."""
    cfg = tiny_cfg("fpn_resnet50",
                   **{"resnets.num_groups": 8, "resnets.width_per_group": 8})
    det = Detector(cfg, rng=0)
    # stage-2 inner width = num_groups * width_per_group = 64; grouped 3x3
    # kernel has in-dim inner/groups = 8.
    k = det.params["body"]["res2"]["block0"]["conv2"]["kernel"]
    assert k.shape == (3, 3, 8, 64), k.shape
    # stage-5 inner doubles per stage: 64 -> 128 -> 256 -> 512
    k5 = det.params["body"]["res5"]["block0"]["conv2"]["kernel"]
    assert k5.shape == (3, 3, 64, 512), k5.shape
    ph, pw = cfg.test.padded_image_size
    img = jnp.asarray(np.random.RandomState(0)
                      .randn(1, ph, pw, 3).astype(np.float32))
    hw = jnp.asarray([[ph, pw]], jnp.float32)
    out = det.detect(img, hw)
    assert out.boxes.shape == (1, cfg.test.detections_per_im, 4)
    v = np.asarray(out.valid[0])
    assert np.isfinite(np.asarray(out.boxes[0])[v]).all()


def test_forward_shapes_resnext_c4():
    """C4 ResNeXt: the Res5RoIHead must use the grouped transform too."""
    cfg = tiny_cfg("resnet50_c4",
                   **{"resnets.num_groups": 8, "resnets.width_per_group": 8})
    det = Detector(cfg, rng=0)
    k5 = det.params["box_head"]["res5"]["block0"]["conv2"]["kernel"]
    assert k5.shape == (3, 3, 64, 512), k5.shape
    ph, pw = cfg.test.padded_image_size
    img = jnp.asarray(np.random.RandomState(1)
                      .randn(1, ph, pw, 3).astype(np.float32))
    hw = jnp.asarray([[ph, pw]], jnp.float32)
    out = det.detect(img, hw)
    assert out.boxes.shape == (1, cfg.test.detections_per_im, 4)


def test_forward_shapes_gn():
    """Full GroupNorm stack (reference gn_baselines: RESNETS.USE_GN +
    FPN.USE_GN + roi_xconv1fc_gn_head + mask_rcnn_fcn_head_v1up4convs_gn):
    GN params appear where expected and the detect path runs."""
    cfg = tiny_cfg("fpn_resnet50", **{
        "resnets.use_gn": True, "fpn.use_gn": True,
        "fast_rcnn.roi_box_head": "roi_xconv1fc_gn_head",
        "mrcnn.roi_mask_head": "mask_rcnn_fcn_head_v1up4convs_gn"})
    det = Detector(cfg, rng=0)
    p = det.params
    # trunk norms are GroupNorm now (same scale/bias names as AffineChannel)
    assert "scale" in p["body"]["res2"]["block0"]["bn1"]
    assert "lateral_gn_c2" in p["fpn"] and "output_gn_p2" in p["fpn"]
    assert "conv1" in p["box_head"] and "gn1" in p["box_head"]
    assert "fc2" not in p["box_head"]  # xconv1fc head: one FC only
    assert "gn1" in p["mask_head"]
    assert "bias" not in p["mask_head"]["fcn1"]  # conv bias dropped with GN
    ph, pw = cfg.test.padded_image_size
    img = jnp.asarray(np.random.RandomState(2)
                      .randn(1, ph, pw, 3).astype(np.float32))
    hw = jnp.asarray([[ph, pw]], jnp.float32)
    out = det.detect(img, hw)
    assert out.boxes.shape == (1, cfg.test.detections_per_im, 4)
    v = np.asarray(out.valid[0])
    assert np.isfinite(np.asarray(out.boxes[0])[v]).all()
    assert np.isfinite(np.asarray(out.masks[0])[v]).all()


def test_forward_batched_consistent():
    """Batch of identical frames must give identical detections."""
    cfg = tiny_cfg()
    det = Detector(cfg, rng=1)
    ph, pw = cfg.test.padded_image_size
    img = np.random.RandomState(1).randn(1, ph, pw, 3).astype(np.float32)
    imgs = jnp.asarray(np.repeat(img, 2, axis=0))
    hw = jnp.asarray([[ph, pw]] * 2, jnp.float32)
    out = det.detect(imgs, hw)
    np.testing.assert_allclose(np.asarray(out.scores[0]),
                               np.asarray(out.scores[1]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.boxes[0]),
                               np.asarray(out.boxes[1]), atol=1e-3)


def test_params_structure():
    cfg = tiny_cfg()
    det = Detector(cfg, rng=0)
    flat = jax.tree_util.tree_leaves(det.params)
    n = sum(int(np.prod(p.shape)) for p in flat)
    # R50-FPN Mask R-CNN ~ 44M params (ImageNet head removed, 5 classes)
    assert 30e6 < n < 60e6, f"param count {n/1e6:.1f}M out of range"
