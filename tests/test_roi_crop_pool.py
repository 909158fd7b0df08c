"""RoICrop / RoIPool legacy paths + model dispatch."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vosdetectron_tpu.config import Config, apply_overrides
from vosdetectron_tpu.ops.roi_crop import grid_sample, roi_crop


def test_grid_sample_identity(rng):
    feat = rng.randn(8, 8, 4).astype(np.float32)
    yy, xx = np.mgrid[0:8, 0:8].astype(np.float32)
    out = np.asarray(grid_sample(jnp.asarray(feat), jnp.asarray(yy),
                                 jnp.asarray(xx)))
    np.testing.assert_allclose(out, feat, atol=1e-6)


def test_grid_sample_zero_outside(rng):
    feat = rng.randn(8, 8, 2).astype(np.float32)
    out = np.asarray(grid_sample(jnp.asarray(feat),
                                 jnp.asarray(np.array([-5.0, 20.0])),
                                 jnp.asarray(np.array([1.0, 1.0]))))
    assert (out == 0).all()


def test_roi_crop_constant_region():
    feat = np.zeros((16, 16, 1), np.float32)
    feat[4:12, 4:12] = 7.0
    rois = jnp.asarray(np.array([[4, 4, 12, 12]], np.float32))
    out = np.asarray(roi_crop(jnp.asarray(feat), rois, 1.0, 4))
    assert out.shape == (1, 4, 4, 1)
    # interior bins fully inside the constant region
    np.testing.assert_allclose(out[0, 1:3, 1:3, 0], 7.0, atol=1e-5)


@pytest.mark.parametrize("method", ["roi_pool", "roi_crop"])
def test_model_dispatch_legacy_methods(method):
    from vosdetectron_tpu.engine.inference import Detector

    cfg = apply_overrides(Config(), [
        ("model.conv_body", "fpn_resnet50"),
        ("model.num_classes", 3),
        ("fast_rcnn.roi_xform_method", method),
        ("rpn.pre_nms_top_n_test", 32),
        ("rpn.post_nms_top_n_test", 16),
        ("test.padded_image_size", (128, 192)),
        ("test.detections_per_im", 5),
    ]).validate()
    det = Detector(cfg, rng=0)
    img = jnp.asarray(np.random.RandomState(0)
                      .randn(1, 128, 192, 3).astype(np.float32))
    hw = jnp.asarray([[128.0, 192.0]])
    out = det.detect(img, hw)
    assert out.boxes.shape == (1, 5, 4)
    assert np.isfinite(np.asarray(out.scores)).all()
