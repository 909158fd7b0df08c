"""Serving export (zoo/export.py): roundtrip + numerical identity.

The exported program must (a) serialize/deserialize, (b) reproduce the
in-process Detector bit-for-bit on the same platform, (c) record accurate
metadata, both with params-as-argument and baked-in."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vosdetectron_tpu.config import Config, apply_overrides
from vosdetectron_tpu.engine.inference import Detector
from vosdetectron_tpu.zoo.export import (export_detector, load_artifact,
                                         save_artifact)


def _small_cfg():
    return apply_overrides(Config(), [
        ("model.num_classes", 4),
        ("test.padded_image_size", (64, 64)),
        ("test.scale", 64), ("test.max_size", 64),
        ("rpn.post_nms_top_n_test", 16),
        ("test.detections_per_im", 8),
        ("compute_dtype", "float32"),
    ]).validate()


@pytest.fixture(scope="module")
def det_and_inputs():
    cfg = _small_cfg()
    det = Detector(cfg, rng=0)
    img = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3)) * 2 - 1,
        np.float32)
    hw = np.asarray([[64.0, 64.0]], np.float32)
    return cfg, det, img, hw


def test_export_roundtrip_params_as_argument(det_and_inputs, tmp_path):
    cfg, det, img, hw = det_and_inputs
    exp, with_params, _ = export_detector(cfg, det.params, batch=1)
    assert with_params
    out_dir = str(tmp_path / "artifact")
    save_artifact(out_dir, exp, with_params, cfg, params=det.params)
    loaded, meta = load_artifact(out_dir)
    assert meta["call_with_params"] and meta["program_bytes"] > 0
    assert meta["padded_image_size"] == [64, 64]

    ref = det.detect(jnp.asarray(img), jnp.asarray(hw))
    got = loaded.call(det.params, img, hw)
    np.testing.assert_array_equal(np.asarray(got.scores),
                                  np.asarray(ref.scores))
    np.testing.assert_array_equal(np.asarray(got.boxes),
                                  np.asarray(ref.boxes))
    np.testing.assert_array_equal(np.asarray(got.masks),
                                  np.asarray(ref.masks))

    # the shipped checkpoint reloads and feeds the program
    from vosdetectron_tpu.utils.checkpoint import load_params

    params2 = load_params(str(tmp_path / "artifact" / "params"))
    got2 = loaded.call(params2, img, hw)
    np.testing.assert_array_equal(np.asarray(got2.scores),
                                  np.asarray(ref.scores))


def test_export_baked_params(det_and_inputs, tmp_path):
    cfg, det, img, hw = det_and_inputs
    exp, with_params, _ = export_detector(cfg, det.params, batch=1,
                                          bake_params=True)
    assert not with_params
    out_dir = str(tmp_path / "baked")
    save_artifact(out_dir, exp, with_params, cfg)
    loaded, meta = load_artifact(out_dir)
    assert not meta["call_with_params"]
    ref = det.detect(jnp.asarray(img), jnp.asarray(hw))
    got = loaded.call(img, hw)
    np.testing.assert_array_equal(np.asarray(got.scores),
                                  np.asarray(ref.scores))


def test_exported_callable_is_jittable(det_and_inputs, tmp_path):
    cfg, det, img, hw = det_and_inputs
    exp, _, _ = export_detector(cfg, det.params, batch=1)
    f = jax.jit(lambda p, a, b: exp.call(p, a, b))
    got = f(det.params, img, hw)
    ref = det.detect(jnp.asarray(img), jnp.asarray(hw))
    np.testing.assert_array_equal(np.asarray(got.scores),
                                  np.asarray(ref.scores))
