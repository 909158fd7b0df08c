"""Parity tests for the switchable conv lowering (models/convs.py).

The "dots" implementation (shifted strided slices + dot_general) must be
numerically equivalent to the native lax.conv lowering for every conv
geometry the framework uses: ResNet stems (7x7/2 pad 3), bottlenecks
(1x1 strided, 3x3 dilated, grouped ResNeXt), FPN/RPN/head 3x3 pad 1,
SAME-padding propagation convs, and the two transposed convs (mask-head
k2/s2, keypoint-head k4/s2 SAME). Param trees must be identical to
flax.linen's so checkpoints are lowering-agnostic.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vosdetectron_tpu.models import convs
from vosdetectron_tpu.models.convs import (Conv, ConvTranspose,
                                           set_conv_impl)


@pytest.fixture(autouse=True)
def _restore_impl():
    yield
    set_conv_impl("native")


def _run_both(mod, x):
    set_conv_impl("native")
    params = mod.init(jax.random.PRNGKey(0), x)
    y_native = mod.apply(params, x)
    set_conv_impl("dots")
    y_dots = mod.apply(params, x)
    set_conv_impl("native")
    return params, y_native, y_dots


CASES = [
    dict(features=8, kernel_size=(3, 3), padding=[(1, 1), (1, 1)]),
    dict(features=8, kernel_size=(1, 1)),
    dict(features=8, kernel_size=(1, 1), strides=(2, 2), use_bias=False),
    dict(features=8, kernel_size=(7, 7), strides=(2, 2),
         padding=[(3, 3), (3, 3)], use_bias=False),
    dict(features=8, kernel_size=(3, 3), strides=(2, 2),
         padding=[(1, 1), (1, 1)]),
    dict(features=8, kernel_size=(3, 3), kernel_dilation=(2, 2),
         padding=[(2, 2), (2, 2)], use_bias=False),
    dict(features=16, kernel_size=(3, 3), padding=[(1, 1), (1, 1)],
         feature_group_count=4, use_bias=False),
    dict(features=8, kernel_size=(3, 3)),                # SAME default
    dict(features=8, kernel_size=(3, 3), strides=(2, 2)),  # SAME strided
]


@pytest.mark.parametrize("kw", CASES,
                         ids=[f"case{i}" for i in range(len(CASES))])
def test_conv_dots_matches_native(kw):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 13, 17, 8), jnp.float32)
    _, y_native, y_dots = _run_both(Conv(**kw), x)
    assert y_native.shape == y_dots.shape
    np.testing.assert_allclose(y_dots, y_native, atol=2e-5, rtol=2e-5)


def test_conv_matches_flax_param_tree_and_values():
    """Param-compatibility: same tree, same output as flax.linen.Conv."""
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 9, 11, 6), jnp.float32)
    kw = dict(features=10, kernel_size=(3, 3), strides=(2, 2),
              padding=[(1, 1), (1, 1)])
    ours = Conv(**kw)
    ref = nn.Conv(**kw)
    p_ours = ours.init(jax.random.PRNGKey(3), x)
    p_ref = ref.init(jax.random.PRNGKey(3), x)
    assert (jax.tree_util.tree_structure(p_ours)
            == jax.tree_util.tree_structure(p_ref))
    for a, b in zip(jax.tree_util.tree_leaves(p_ours),
                    jax.tree_util.tree_leaves(p_ref)):
        assert a.shape == b.shape
    y_ours = ours.apply(p_ref, x)
    y_ref = ref.apply(p_ref, x)
    np.testing.assert_allclose(y_ours, y_ref, atol=1e-6)
    set_conv_impl("dots")
    y_dots = ours.apply(p_ref, x)
    np.testing.assert_allclose(y_dots, y_ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("kw", [
    dict(features=8, kernel_size=(2, 2), strides=(2, 2)),   # mask upconv
    dict(features=5, kernel_size=(4, 4), strides=(2, 2),
         padding="SAME"),                                   # keypoint deconv
])
def test_conv_transpose_dots_matches_native_and_flax(kw):
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 7, 9, 6), jnp.float32)
    mod = ConvTranspose(**kw)
    ref = nn.ConvTranspose(**kw)
    params = mod.init(jax.random.PRNGKey(5), x)
    y_native = mod.apply(params, x)
    y_ref = ref.apply(params, x)
    np.testing.assert_allclose(y_native, y_ref, atol=1e-6)
    set_conv_impl("dots")
    y_dots = mod.apply(params, x)
    assert y_dots.shape == y_ref.shape
    np.testing.assert_allclose(y_dots, y_ref, atol=2e-5, rtol=2e-5)


def test_bilinear_x2_dots_matches_conv_version():
    from vosdetectron_tpu.models.heads import bilinear_upsample_x2

    x = jax.random.normal(jax.random.PRNGKey(6), (2, 6, 5, 4), jnp.float32)
    y_native = bilinear_upsample_x2(x)
    y_dots = convs.bilinear_x2_dots(x)
    assert y_dots.shape == y_native.shape == (2, 12, 10, 4)
    np.testing.assert_allclose(y_dots, y_native, atol=1e-6)


def test_conv_grads_match_across_lowerings():
    """Training runs through these modules: d(loss)/d(kernel, bias, input)
    must agree between lowerings (dots uses plain dot_general, so VJPs are
    automatic — this guards the decomposition's adjoint)."""
    x = jax.random.normal(jax.random.PRNGKey(20), (2, 9, 11, 6), jnp.float32)
    mod = Conv(features=5, kernel_size=(3, 3), strides=(2, 2),
               padding=[(1, 1), (1, 1)])
    set_conv_impl("native")
    params = mod.init(jax.random.PRNGKey(21), x)

    def loss(p, v):
        return jnp.sum(mod.apply(p, v) ** 2)

    set_conv_impl("native")
    gp_n, gx_n = jax.grad(loss, argnums=(0, 1))(params, x)
    set_conv_impl("dots")
    gp_d, gx_d = jax.grad(loss, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(gp_n),
                    jax.tree_util.tree_leaves(gp_d)):
        np.testing.assert_allclose(b, a, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(gx_d, gx_n, atol=1e-4, rtol=1e-4)

    # transposed conv adjoint too (mask-head upconv trains)
    tmod = ConvTranspose(features=4, kernel_size=(2, 2), strides=(2, 2))
    set_conv_impl("native")
    tparams = tmod.init(jax.random.PRNGKey(22), x)

    def tloss(p, v):
        return jnp.sum(tmod.apply(p, v) ** 2)

    gp_n, gx_n = jax.grad(tloss, argnums=(0, 1))(tparams, x)
    set_conv_impl("dots")
    gp_d, gx_d = jax.grad(tloss, argnums=(0, 1))(tparams, x)
    for a, b in zip(jax.tree_util.tree_leaves(gp_n),
                    jax.tree_util.tree_leaves(gp_d)):
        np.testing.assert_allclose(b, a, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(gx_d, gx_n, atol=1e-4, rtol=1e-4)


def test_engine_applies_cfg_conv_impl():
    """Engines must apply cfg.model.conv_impl before tracing programs."""
    from vosdetectron_tpu.config import Config, apply_overrides
    from vosdetectron_tpu.engine.inference import Detector

    cfg = apply_overrides(Config(), [
        ("model.num_classes", 2),
        ("model.conv_impl", "dots"),
        ("test.padded_image_size", (64, 64)),
        ("rpn.post_nms_top_n_test", 8),
        ("test.detections_per_im", 4),
    ]).validate()
    Detector(cfg, rng=0)
    assert convs.get_conv_impl() == "dots"


def test_env_var_overrides(monkeypatch):
    monkeypatch.setenv("VOSDETECTRON_CONV_IMPL", "dots")
    assert convs.get_conv_impl() == "dots"
    monkeypatch.setenv("VOSDETECTRON_CONV_IMPL", "bogus")
    with pytest.raises(ValueError):
        convs.get_conv_impl()
    monkeypatch.delenv("VOSDETECTRON_CONV_IMPL")
    assert convs.get_conv_impl() == "native"


def test_config_validates_conv_impl():
    from vosdetectron_tpu.config import Config, apply_overrides

    cfg = apply_overrides(Config(), [("model.conv_impl", "dots")]).validate()
    assert cfg.model.conv_impl == "dots"
    with pytest.raises(ValueError):
        apply_overrides(Config(), [("model.conv_impl", "im2col")]).validate()


def test_model_forward_parity_dots_vs_native():
    """Whole-detector forward: identical params, both lowerings agree."""
    from vosdetectron_tpu.config import Config, apply_overrides
    from vosdetectron_tpu.models.generalized_rcnn import GeneralizedRCNN

    cfg = apply_overrides(Config(), [
        ("model.num_classes", 4),
        ("model.conv_body", "fpn_resnet50"),
        ("test.padded_image_size", (64, 64)),
        ("rpn.post_nms_top_n_test", 16),
        ("test.detections_per_im", 8),
        ("compute_dtype", "float32"),
    ]).validate()
    model = GeneralizedRCNN(cfg)
    img = jax.random.uniform(jax.random.PRNGKey(7), (1, 64, 64, 3)) * 2 - 1
    hw = jnp.asarray([[64.0, 64.0]], jnp.float32)
    set_conv_impl("native")
    params = model.init(jax.random.PRNGKey(8), img, hw)["params"]
    out_native = model.apply({"params": params}, img, hw)
    set_conv_impl("dots")
    out_dots = model.apply({"params": params}, img, hw)
    np.testing.assert_allclose(out_dots.cls_scores, out_native.cls_scores,
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(out_dots.proposals.boxes,
                               out_native.proposals.boxes,
                               atol=1e-2, rtol=1e-3)
    np.testing.assert_allclose(out_dots.bbox_deltas, out_native.bbox_deltas,
                               atol=1e-3, rtol=1e-3)


def test_propagation_head_parity_dots_vs_native():
    from vosdetectron_tpu.models.propagation import PropagationHead

    head = PropagationHead()
    img = jax.random.uniform(jax.random.PRNGKey(9), (24, 40, 3)) * 255
    feat = jax.random.normal(jax.random.PRNGKey(10), (24, 40, 32))
    masks = (jax.random.uniform(jax.random.PRNGKey(11), (3, 24, 40)) > 0.7
             ).astype(jnp.float32)
    set_conv_impl("native")
    params = head.init(jax.random.PRNGKey(12), img, feat, masks,
                       method=PropagationHead.init_all)["params"]
    inp = head.apply({"params": params}, img, feat,
                     method=PropagationHead.frame_input)
    y_native = head.apply({"params": params}, inp, inp, masks)
    set_conv_impl("dots")
    inp_d = head.apply({"params": params}, img, feat,
                       method=PropagationHead.frame_input)
    y_dots = head.apply({"params": params}, inp_d, inp_d, masks)
    np.testing.assert_allclose(y_dots, y_native, atol=1e-4, rtol=1e-4)
