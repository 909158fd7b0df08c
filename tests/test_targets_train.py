"""Tests: on-device target assignment + one sharded train step on CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vosdetectron_tpu.config import Config, apply_overrides
from vosdetectron_tpu.models.targets import (GroundTruth, mask_targets,
                                             rpn_targets, sample_rois)
from vosdetectron_tpu.ops import boxes as B


def small_cfg():
    return apply_overrides(Config(), [
        ("model.num_classes", 3),
        ("rpn.pre_nms_top_n_train", 64),
        ("rpn.post_nms_top_n_train", 32),
        ("rpn.batch_size_per_im", 64),
        ("fast_rcnn.batch_size_per_im", 32),
        ("train.padded_image_size", (128, 192)),
        ("train.max_gt_instances", 4),
    ]).validate()


def make_gt(cfg, b=1):
    g = cfg.train.max_gt_instances
    ph, pw = cfg.train.padded_image_size
    boxes = np.zeros((b, g, 4), np.float32)
    classes = np.zeros((b, g), np.int32)
    masks = np.zeros((b, g, ph // 4, pw // 4), np.float32)
    valid = np.zeros((b, g), bool)
    boxes[:, 0] = (20, 30, 80, 90)
    boxes[:, 1] = (100, 40, 170, 110)
    classes[:, 0] = 1
    classes[:, 1] = 2
    valid[:, :2] = True
    masks[:, 0, 8:22, 6:19] = 1.0
    masks[:, 1, 11:27, 26:42] = 1.0
    return GroundTruth(jnp.asarray(boxes), jnp.asarray(classes),
                       jnp.asarray(masks), jnp.asarray(valid))


def test_rpn_targets_basics():
    cfg = small_cfg()
    gt = make_gt(cfg)
    anchors = jnp.asarray(np.array(
        [[18, 28, 82, 92],     # ~gt0 -> fg
         [99, 41, 171, 109],   # ~gt1 -> fg
         [0, 0, 10, 10],       # far -> bg
         [-50, -50, 400, 400]  # straddles -> ignore
         ], np.float32))
    t = rpn_targets(jax.random.PRNGKey(0), anchors, gt.boxes[0], gt.valid[0],
                    jnp.asarray([128.0, 192.0]), cfg)
    lab = np.asarray(t.labels)
    assert lab[0] == 1 and lab[1] == 1
    assert lab[2] == 0
    assert lab[3] == -1
    # fg bbox targets decode back to the matched gt
    dec = B.bbox_transform_inv(anchors[:2], t.bbox_targets[:2],
                               (1.0, 1.0, 1.0, 1.0))
    np.testing.assert_allclose(np.asarray(dec), np.asarray(gt.boxes[0, :2]),
                               atol=0.5)


def test_rpn_targets_subsample_budget(rng):
    cfg = small_cfg()
    gt = make_gt(cfg)
    n = 2000
    anchors = jnp.asarray(np.stack([
        rng.uniform(0, 150, n), rng.uniform(0, 100, n),
        rng.uniform(0, 150, n) + 30, rng.uniform(0, 100, n) + 30], 1)
        .astype(np.float32))
    t = rpn_targets(jax.random.PRNGKey(1), anchors, gt.boxes[0], gt.valid[0],
                    jnp.asarray([128.0, 192.0]), cfg)
    lab = np.asarray(t.labels)
    assert (lab == 1).sum() <= 32          # fg_fraction * 64
    assert (lab == 0).sum() <= 32
    assert (lab >= 0).sum() <= 64


def test_sample_rois_includes_gt_and_labels():
    cfg = small_cfg()
    gt = make_gt(cfg)
    props = jnp.asarray(np.array(
        [[22, 32, 78, 88],    # IoU ~gt0 high -> fg cls 1
         [0, 0, 15, 15],      # bg
         [98, 42, 168, 108],  # fg cls 2
         ] + [[0, 0, 5, 5]] * 29, np.float32))
    valid = jnp.asarray(np.array([True] * 3 + [False] * 29))
    s = sample_rois(jax.random.PRNGKey(0), props, valid, gt, 0, cfg)
    lab = np.asarray(s.labels)
    fg = np.asarray(s.fg)
    v = np.asarray(s.valid)
    # fg packed first
    assert fg[: fg.sum()].all()
    # gt boxes appended as proposals -> at least the 2 gt + 2 close props fg
    assert fg.sum() >= 4
    assert set(lab[fg & v]) <= {1, 2}
    # bbox targets decode to matched gt for fg
    rois = np.asarray(s.rois)
    dec = B.bbox_transform_inv(jnp.asarray(rois), s.bbox_targets,
                               cfg.model.bbox_reg_weights)
    gtb = np.asarray(gt.boxes[0])[np.asarray(s.gt_idx)]
    np.testing.assert_allclose(np.asarray(dec)[fg & v], gtb[fg & v],
                               atol=1.0)


def test_mask_targets_crop():
    cfg = small_cfg()
    gt = make_gt(cfg)
    # roi exactly the gt0 box -> target should be mostly 1 in the interior
    rois = jnp.asarray(np.array([[20, 30, 80, 90]], np.float32))
    mt = mask_targets(gt.masks[0], rois, jnp.asarray([0], jnp.int32),
                      cfg.train.padded_image_size, 28)
    m = np.asarray(mt[0])
    assert m.shape == (28, 28)
    assert m[10:18, 10:18].mean() > 0.9  # interior on
    assert m[0, 0] <= 1.0


@pytest.mark.slow
def test_lr_schedule_policies():
    """SOLVER.LR_POLICY / WARM_UP_METHOD (reference: lib/utils/net.py
    update_learning_rate): steps_with_decay boundaries, cosine_decay,
    constant warmup."""
    from vosdetectron_tpu.engine.train import lr_schedule

    cfg = apply_overrides(Config(), [
        ("solver.base_lr", 0.02), ("solver.warm_up_iters", 100),
        ("solver.warm_up_factor", 0.25),
        ("solver.steps", (0, 1000, 2000)), ("solver.max_iter", 3000),
    ]).validate()
    f = lr_schedule(cfg)
    assert np.isclose(float(f(0)), 0.02 * 0.25)
    assert np.isclose(float(f(100)), 0.02)
    assert np.isclose(float(f(1500)), 0.002)
    assert np.isclose(float(f(2500)), 0.0002)

    c = apply_overrides(cfg, [("solver.lr_policy", "cosine_decay"),
                              ("solver.warm_up_method", "constant")])
    g = lr_schedule(c)
    # constant warmup factor, cosine decay active from step 0
    exp50 = 0.02 * 0.25 * 0.5 * (1 + np.cos(np.pi * 50 / 3000))
    assert np.isclose(float(g(50)), exp50, rtol=1e-4)
    assert np.isclose(float(g(1500)), 0.01)        # cos(pi/2) midpoint
    assert float(g(3000)) < 1e-8                   # decayed to ~0

    with pytest.raises(ValueError):
        apply_overrides(cfg, [("solver.lr_policy", "nope")]).validate()
    with pytest.raises(ValueError):
        apply_overrides(cfg, [("solver.warm_up_method", "nope")]).validate()


def test_freeze_conv_body():
    """TRAIN.FREEZE_CONV_BODY: body+fpn params bit-identical after steps
    while head params move."""
    from vosdetectron_tpu.engine.train import Trainer

    cfg = apply_overrides(small_cfg(), [("train.freeze_conv_body", True)])
    trainer = Trainer(cfg, rng=0)
    before = jax.device_get(trainer.state.params)
    ph, pw = cfg.train.padded_image_size
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(1, ph, pw, 3).astype(np.float32))
    im_hw = jnp.asarray([[ph, pw]], jnp.float32)
    gt = make_gt(cfg, b=1)
    for i in range(2):
        trainer.train_step(jax.random.PRNGKey(i), images, im_hw, gt)
    after = jax.device_get(trainer.state.params)
    for sub in ("body", "fpn"):
        b, a = before[sub], after[sub]
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_array_equal(x, y), b, a)
    moved = jax.tree_util.tree_reduce(
        lambda acc, d: acc + float(d),
        jax.tree_util.tree_map(lambda x, y: np.abs(x - y).sum(),
                               before["box_outs"], after["box_outs"]), 0.0)
    assert moved > 0.0


def test_train_step_runs_and_descends():
    from vosdetectron_tpu.engine.train import Trainer
    from vosdetectron_tpu.parallel.mesh import make_mesh, shard_batch

    cfg = small_cfg()
    mesh = make_mesh(num_devices=2)
    trainer = Trainer(cfg, rng=0, mesh=mesh)
    ph, pw = cfg.train.padded_image_size
    rng = np.random.RandomState(0)
    images = rng.randn(2, ph, pw, 3).astype(np.float32)
    im_hw = np.asarray([[ph, pw]] * 2, np.float32)
    gt = make_gt(cfg, b=2)
    with mesh:
        imgs, hw = shard_batch(mesh, (jnp.asarray(images),
                                      jnp.asarray(im_hw)))
        gt_s = GroundTruth(*shard_batch(mesh, tuple(gt)))
        l0 = trainer.train_step(jax.random.PRNGKey(0), imgs, hw, gt_s)
        losses = {k: float(v) for k, v in l0.items()}
        assert all(np.isfinite(v) for v in losses.values()), losses
        assert set(losses) == {"rpn_cls", "rpn_box", "cls", "box", "mask",
                               "total"}
        for i in range(4):
            li = trainer.train_step(jax.random.PRNGKey(i + 1), imgs, hw,
                                    gt_s)
        assert np.isfinite(float(li["total"]))
        assert int(trainer.state.step) == 5
