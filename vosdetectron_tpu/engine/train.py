"""Training engine: losses, SGD schedule, pjit train step, checkpointing.

TPU-native rebuild of the reference's training loop
(reference: tools/train_net_step.py ~470 LoC inline loop +
lib/utils/net.py::update_learning_rate/save_ckpt + mynn.DataParallel).

Redesign:
  * ONE jitted SPMD train step: forward (backbone->RPN->proposals), on-device
    target sampling (models/targets.py), RoI heads, losses, grads, SGD —
    batch sharded over the `data` mesh axis; GSPMD inserts the gradient
    psum (replacing DataParallel's gather-to-GPU0).
  * optax chain implements Detectron's schedule exactly: linear warmup then
    step decay, SGD momentum 0.9, weight decay excluding biases (which get
    2x LR — SOLVER.BIAS_DOUBLE_LR) — see `make_optimizer`.
  * Orbax checkpointing of {step, params, opt_state} (reference: .pth
    save_ckpt/load_ckpt with --resume).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models.generalized_rcnn import GeneralizedRCNN
from ..models.heads import box_losses, keypoint_loss, mask_loss
from ..models.rpn import rpn_losses
from ..models.targets import (GroundTruth, keypoint_targets, mask_targets,
                              rpn_targets, sample_rois)
from ..ops.anchors import fpn_anchors, generate_cell_anchors, shifted_anchors


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


# ---------------------------------------------------------------------------
# Optimizer (reference: lib/utils/net.py + cfg.SOLVER)
# ---------------------------------------------------------------------------


def lr_schedule(cfg: Config):
    """Reference: lib/utils/net.py::update_learning_rate +
    SOLVER.LR_POLICY / WARM_UP_METHOD (lib/core/config.py). Policies:
    steps_with_decay (gamma^k after each boundary) and cosine_decay;
    warmup: linear ramp or constant factor over warm_up_iters."""
    s = cfg.solver

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        if s.warm_up_method == "constant":
            warm = jnp.where(step < s.warm_up_iters, s.warm_up_factor, 1.0)
        else:  # linear
            warm = s.warm_up_factor + (1.0 - s.warm_up_factor) * \
                jnp.minimum(step / max(s.warm_up_iters, 1), 1.0)
        if s.lr_policy == "cosine_decay":
            frac = jnp.clip(step / max(s.max_iter, 1), 0.0, 1.0)
            decay = 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
        else:  # steps_with_decay
            decay = jnp.ones(())
            for boundary in s.steps[1:]:
                decay = decay * jnp.where(step >= boundary, s.gamma, 1.0)
        return s.base_lr * warm * decay

    return fn


def _is_bias(path) -> bool:
    last = path[-1]
    key = getattr(last, "key", getattr(last, "name", str(last)))
    return key in ("bias", "scale")  # frozen-BN affine treated like bias


def make_optimizer(cfg: Config):
    """SGD + momentum with Detectron's bias rules.

    Weights: lr(t), weight decay. Biases: 2x lr, no weight decay
    (SOLVER.BIAS_DOUBLE_LR / BIAS_WEIGHT_DECAY).
    """
    s = cfg.solver
    sched = lr_schedule(cfg)

    def base(lr_mult: float, wd: float):
        chain = [optax.trace(decay=s.momentum)]
        if wd > 0:
            chain.insert(0, optax.add_decayed_weights(wd))
        chain.append(optax.scale_by_schedule(
            lambda t: -lr_mult * sched(t)))
        return optax.chain(*chain)

    bias_mult = 2.0 if s.bias_double_lr else 1.0
    bias_wd = s.weight_decay if s.bias_weight_decay else 0.0
    tx = optax.multi_transform(
        {"w": base(1.0, s.weight_decay), "b": base(bias_mult, bias_wd)},
        lambda params: jax.tree_util.tree_map_with_path(
            lambda path, _: "b" if _is_bias(path) else "w", params))
    if s.clip_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(s.clip_grad_norm), tx)
    return tx


# ---------------------------------------------------------------------------
# Loss computation
# ---------------------------------------------------------------------------


def _flat_anchors(model: GeneralizedRCNN, feat_shapes) -> jnp.ndarray:
    cfg = model.cfg
    if cfg.fpn.enabled:
        ans = fpn_anchors(feat_shapes, cfg.fpn.rpn_min_level,
                          cfg.rpn.anchor_start_size, cfg.rpn.aspect_ratios)
    else:
        cell = generate_cell_anchors(cfg.rpn.stride, cfg.rpn.sizes,
                                     cfg.rpn.aspect_ratios)
        (fh, fw), = feat_shapes
        ans = [shifted_anchors(fh, fw, cfg.rpn.stride, cell)]
    return jnp.concatenate([jnp.asarray(a) for a in ans], axis=0)


def compute_losses(model: GeneralizedRCNN, params, key, images, im_hw,
                   gt: GroundTruth, cfg: Config) -> Tuple[jnp.ndarray, Dict]:
    """Full Mask R-CNN loss dict for a sharded batch (one SPMD program)."""
    feats, logits, deltas, proposals = model.apply(
        {"params": params}, images, im_hw, True,
        method=GeneralizedRCNN.rpn_proposals)

    b = images.shape[0]
    anchors = _flat_anchors(model, [f.shape[1:3] for f in feats])
    flat_logits = jnp.concatenate(
        [l.astype(jnp.float32).reshape(b, -1) for l in logits], axis=1)
    flat_deltas = jnp.concatenate(
        [d.astype(jnp.float32).reshape(b, -1, 4) for d in deltas], axis=1)

    keys = jax.random.split(key, b * 2).reshape(b, 2, 2)

    def per_image(i, k_rpn, k_roi, hw, prop_boxes, prop_valid):
        rt = rpn_targets(k_rpn, anchors, gt.boxes[i], gt.valid[i], hw, cfg)
        sr = sample_rois(k_roi, prop_boxes, prop_valid, gt, i, cfg)
        return rt, sr

    rts, srs = [], []
    for i in range(b):  # static unroll over small batch (B<=8 per device)
        rt, sr = per_image(i, keys[i, 0], keys[i, 1], im_hw[i],
                           proposals.boxes[i], proposals.valid[i])
        rts.append(rt)
        srs.append(sr)
    rpn_labels = jnp.stack([r.labels for r in rts])
    rpn_tgts = jnp.stack([r.bbox_targets for r in rts])
    rois = jnp.stack([s.rois for s in srs])            # (B, S, 4)
    roi_labels = jnp.stack([s.labels for s in srs])
    roi_tgts = jnp.stack([s.bbox_targets for s in srs])
    roi_valid = jnp.stack([s.valid for s in srs])
    roi_fg = jnp.stack([s.fg for s in srs])
    roi_gtidx = jnp.stack([s.gt_idx for s in srs])

    # RPN losses over the whole batch.
    fg_mask = rpn_labels == 1
    rpn_cls, rpn_box = rpn_losses(
        flat_logits.reshape(-1), flat_deltas.reshape(-1, 4),
        rpn_labels.reshape(-1), rpn_tgts.reshape(-1, 4),
        jnp.ones((1,), jnp.float32),
        normalizer=float(cfg.rpn.batch_size_per_im) * b)

    # Box head on sampled rois.
    cls_scores, bbox_deltas = model.apply(
        {"params": params}, feats, rois, method=GeneralizedRCNN.box_forward)
    s = rois.shape[1]
    cls_loss, box_loss = box_losses(
        cls_scores.reshape(b * s, -1), bbox_deltas.reshape(b * s, -1),
        roi_labels.reshape(-1), roi_tgts.reshape(-1, 4),
        roi_valid.reshape(-1), cfg.model.cls_agnostic_bbox_reg)

    losses = {"rpn_cls": rpn_cls, "rpn_box": rpn_box,
              "cls": cls_loss, "box": box_loss}

    # fg prefix size (sample_rois packs fg first) — shared by mask/keypoint.
    mf = int(cfg.fast_rcnn.fg_fraction * cfg.fast_rcnn.batch_size_per_im)
    fg_rois = rois[:, :mf]

    if cfg.model.mask_on:
        mask_logits = model.apply(
            {"params": params}, feats, fg_rois,
            method=GeneralizedRCNN.mask_branch)  # (B, mf, M, M, K)
        mh, mw = gt.masks.shape[2:]
        ph, pw = cfg.train.padded_image_size
        mts = jax.vmap(lambda gm, r, gi: mask_targets(
            gm, r, gi, (ph, pw), cfg.mrcnn.resolution))(
                gt.masks, fg_rois, roi_gtidx[:, :mf])
        m = cfg.mrcnn.resolution
        losses["mask"] = mask_loss(
            mask_logits.reshape(b * mf, m, m, -1),
            mts.reshape(b * mf, m, m),
            roi_labels[:, :mf].reshape(-1),
            (roi_fg[:, :mf] & roi_valid[:, :mf]).reshape(-1))

    if cfg.model.keypoint_on and gt.keypoints is not None:
        # Keypoint branch on the same fg prefix (reference:
        # lib/roi_data/keypoint_rcnn.py samples fg rois with visible kps).
        kp_logits = model.apply(
            {"params": params}, feats, fg_rois,
            method=GeneralizedRCNN.keypoint_branch)  # (B, mf, Hm, Hm, K)
        hm = kp_logits.shape[2]
        fgv = roi_fg[:, :mf] & roi_valid[:, :mf]
        kts, kvs = jax.vmap(lambda gk, r, gi, fv: keypoint_targets(
            gk, r, gi, fv, hm))(
                gt.keypoints, fg_rois, roi_gtidx[:, :mf], fgv)
        nk = kp_logits.shape[-1]
        losses["keypoint"] = keypoint_loss(
            kp_logits.reshape(b * mf, hm, hm, nk),
            kts.reshape(b * mf, nk), kvs.reshape(b * mf, nk),
            cfg.krcnn.normalize_by_visible, cfg.krcnn.loss_weight)

    total = sum(losses.values())
    return total, losses


# ---------------------------------------------------------------------------
# Train step + Trainer
# ---------------------------------------------------------------------------


def make_train_step(model: GeneralizedRCNN, tx, cfg: Config):
    """Returns the jittable SPMD train step (donated state)."""

    # TRAIN.FREEZE_CONV_BODY (reference: lib/modeling/model_builder.py
    # _init_modules): the whole conv body — FPN included for FPN models —
    # receives no update. Grads are zeroed BEFORE tx.update (no momentum
    # accumulation) and updates zeroed after (no weight-decay drift).
    frozen = ()
    if cfg.train.freeze_conv_body:
        frozen = ("body", "fpn") if cfg.fpn.enabled else ("body",)

    def _mask_frozen(tree):
        return {k: (jax.tree_util.tree_map(jnp.zeros_like, v)
                    if k in frozen else v) for k, v in tree.items()}

    def step_fn(state: TrainState, key, images, im_hw, gt: GroundTruth):
        def loss_fn(params):
            return compute_losses(model, params, key, images, im_hw, gt, cfg)

        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if frozen:
            grads = _mask_frozen(grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        if frozen:
            updates = _mask_frozen(updates)
        new_params = optax.apply_updates(state.params, updates)
        losses["total"] = total
        return TrainState(state.step + 1, new_params, new_opt), losses

    return step_fn


class Trainer:
    """Owns model, optimizer, jitted step, and checkpoints."""

    def __init__(self, cfg: Config, params=None, rng: int = 0,
                 mesh=None):
        from ..models.generalized_rcnn import init_model_params
        from ..utils.jax_setup import setup

        setup()
        self.cfg = cfg
        from ..models.convs import set_conv_impl

        set_conv_impl(cfg.model.conv_impl)
        self.model = GeneralizedRCNN(cfg)
        self.mesh = mesh
        if params is None:
            params = init_model_params(self.model, jax.random.PRNGKey(rng),
                                       cfg.train.padded_image_size)
        self.tx = make_optimizer(cfg)
        self.state = TrainState(jnp.zeros((), jnp.int32), params,
                                self.tx.init(params))
        step = make_train_step(self.model, self.tx, cfg)
        if mesh is not None:
            # Replicate state over the mesh; batches must arrive sharded on
            # their leading axis (parallel.mesh.shard_batch). GSPMD then
            # propagates shardings and inserts the gradient psum.
            from ..parallel.mesh import replicate

            self.state = replicate(mesh, self.state)
        self._step = jax.jit(step, donate_argnums=(0,))

    def train_step(self, key, images, im_hw, gt: GroundTruth) -> Dict:
        self.state, losses = self._step(self.state, key, images, im_hw, gt)
        return losses

    # -- checkpointing (reference: lib/utils/net.py save_ckpt/load_ckpt) --
    def save(self, ckpt_dir: str) -> None:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        step = int(self.state.step)
        ckptr.save(f"{ckpt_dir}/step_{step:08d}",
                   {"step": step, "params": self.state.params,
                    "opt_state": self.state.opt_state},
                   force=True)
        ckptr.wait_until_finished()

    def load(self, path: str) -> None:
        """Restore {step, params, opt_state} — or, for params-only
        checkpoints (committed bf16 copies, tools/convert_weights.py
        imports), restore params alone (cast to the model's param dtype)
        with a fresh optimizer at step 0 (reference: load_ckpt
        restores model-only when the .pth has no optimizer entry)."""
        import os

        import orbax.checkpoint as ocp

        from ..utils.checkpoint import latest_checkpoint

        path = os.path.abspath(path)
        if os.path.isdir(path) and not os.path.basename(path).startswith(
                "step_"):
            found = latest_checkpoint(path)
            if found is not None:
                path = found
        ckptr = ocp.StandardCheckpointer()
        try:
            target = {"step": 0, "params": self.state.params,
                      "opt_state": self.state.opt_state}
            restored = ckptr.restore(path, target)
            self.state = TrainState(
                jnp.asarray(restored["step"], jnp.int32),
                restored["params"], restored["opt_state"])
            return
        except Exception:
            pass
        raw = ckptr.restore(path)
        params = raw["params"] if isinstance(raw, dict) and "params" in raw \
            else raw
        params = jax.tree_util.tree_map(
            lambda t, x: jnp.asarray(x, t.dtype), self.state.params, params)
        state = TrainState(jnp.zeros((), jnp.int32), params,
                           self.tx.init(params))
        if self.mesh is not None:
            from ..parallel.mesh import replicate

            state = replicate(self.mesh, state)
        self.state = state
