"""RoI heads: box classification/regression + mask FCN.

TPU-native re-design of the reference's heads
(reference: lib/modeling/fast_rcnn_heads.py ~130 LoC — roi_2mlp_head +
fast_rcnn_outputs + losses; lib/modeling/mask_rcnn_heads.py ~220 LoC —
mask_rcnn_fcn_head_v1up4convs + mask_rcnn_outputs + loss).

All heads take fixed-size RoI batches (padded + masked); losses are
computed with validity weights so padding contributes zero.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from .convs import Conv, ConvTranspose


class BoxMLPHead(nn.Module):
    """Two-FC head on pooled features (reference: roi_2mlp_head)."""

    dim: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (N, P, P, C)
        n = x.shape[0]
        x = x.reshape(n, -1)
        x = nn.relu(nn.Dense(self.dim, dtype=self.dtype, name="fc1")(x))
        x = nn.relu(nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x))
        return x


class BoxXConv1FCHead(nn.Module):
    """X conv3x3 (+ optional GroupNorm) then one FC head on pooled
    features (reference: fast_rcnn_heads.py::roi_Xconv1fc_head /
    roi_Xconv1fc_gn_head, selected by FAST_RCNN.ROI_BOX_HEAD in the
    gn_baselines configs)."""

    dim: int = 1024
    conv_dim: int = 256
    num_convs: int = 4
    use_gn: bool = False
    gn_groups: int = 32
    gn_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (N, P, P, C)
        for i in range(self.num_convs):
            x = Conv(self.conv_dim, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=not self.use_gn, dtype=self.dtype,
                        name=f"conv{i + 1}")(x)
            if self.use_gn:
                x = nn.GroupNorm(num_groups=self.gn_groups, epsilon=self.gn_eps,
                                 name=f"gn{i + 1}")(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        return nn.relu(nn.Dense(self.dim, dtype=self.dtype, name="fc1")(x))


class BoxOutputs(nn.Module):
    """Class scores + per-class box deltas (reference: fast_rcnn_outputs)."""

    num_classes: int
    cls_agnostic: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        scores = nn.Dense(self.num_classes, dtype=self.dtype,
                          name="cls_score")(x)
        nbox = 2 if self.cls_agnostic else self.num_classes
        deltas = nn.Dense(4 * nbox, dtype=self.dtype, name="bbox_pred")(x)
        return scores, deltas


class MaskHead(nn.Module):
    """4x conv3x3 + 2x deconv + 1x1 per-class mask logits
    (reference: mask_rcnn_fcn_head_v1up4convs + mask_rcnn_outputs).
    Input (N, 14, 14, C) -> logits (N, 28, 28, num_classes)."""

    num_classes: int
    dim: int = 256
    num_convs: int = 4
    # GroupNorm variant (reference: mask_rcnn_fcn_head_v1upXconvs_gn).
    use_gn: bool = False
    gn_groups: int = 32
    gn_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_convs):
            x = Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=not self.use_gn,
                        dtype=self.dtype, name=f"fcn{i + 1}")(x)
            if self.use_gn:
                x = nn.GroupNorm(num_groups=self.gn_groups, epsilon=self.gn_eps,
                                 name=f"gn{i + 1}")(x)
            x = nn.relu(x)
        x = nn.relu(ConvTranspose(self.dim, (2, 2), strides=(2, 2),
                                     dtype=self.dtype, name="upconv")(x))
        return Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       name="mask_logits")(x)


def bilinear_upsample_x2(x: jnp.ndarray) -> jnp.ndarray:
    """Exact-2x fixed-bilinear-kernel transposed conv, depthwise
    (reference: lib/nn/modules/upsample.py::BilinearInterpolation2d — a
    frozen ConvTranspose2d(k=4, s=2, p=1) with the FCN bilinear kernel;
    NOT jax.image.resize, whose border handling differs at the 1-px edge).
    (N, H, W, C) -> (N, 2H, 2W, C)."""
    from .convs import bilinear_x2_dots, get_conv_impl

    if get_conv_impl() == "dots":
        return bilinear_x2_dots(x)
    c = x.shape[-1]
    k1 = jnp.asarray([0.25, 0.75, 0.75, 0.25], x.dtype)
    kern = (k1[:, None] * k1[None, :])[:, :, None, None]      # (4, 4, 1, 1)
    kern = jnp.broadcast_to(kern, (4, 4, 1, c))
    # lhs_dilation=2 == transposed conv; its padding in the dilated-conv
    # view is k-1-p = 2 per side for torch's p=1. The bilinear kernel is
    # symmetric so no spatial flip is needed.
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding=[(2, 2), (2, 2)],
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


class KeypointHead(nn.Module):
    """Keypoint R-CNN head (reference: keypoint_rcnn_heads.py
    add_roi_pose_head_v1convX + keypoint_outputs): 8x conv3x3(512) on the
    14x14 RoI features, ConvTranspose 4x4 stride 2 to 28x28, then fixed
    bilinear 2x upsample to a (56, 56, K) per-keypoint heatmap logit grid.

    Input (N, P, P, C) -> logits (N, 2*P*up_scale, 2*P*up_scale, K)."""

    num_keypoints: int = 17
    dim: int = 512
    num_convs: int = 8
    up_scale: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_convs):
            x = nn.relu(Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)],
                                dtype=self.dtype, name=f"conv{i + 1}")(x))
        # Deconv doubles resolution and emits the per-keypoint logits
        # (reference: kps_score_lowres ConvTranspose2d(kernel 4, stride 2,
        # pad 1) straight to NUM_KEYPOINTS channels). Flax "SAME" padding
        # with stride 2 reproduces torch's k4/s2/p1 exact-2x output size.
        x = ConvTranspose(self.num_keypoints, (4, 4), strides=(2, 2),
                             padding="SAME", dtype=self.dtype,
                             name="score_lowres")(x)
        x = x.astype(jnp.float32)
        for _ in range(self.up_scale // 2):
            x = bilinear_upsample_x2(x)
        return x


# ---------------------------------------------------------------------------
# Losses (reference: fast_rcnn_heads.py / mask_rcnn_heads.py loss fns)
# ---------------------------------------------------------------------------


def smooth_l1(diff: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    ad = jnp.abs(diff)
    return jnp.where(ad < beta, 0.5 * ad * ad / beta, ad - 0.5 * beta)


def box_losses(cls_scores: jnp.ndarray, bbox_deltas: jnp.ndarray,
               labels: jnp.ndarray, bbox_targets: jnp.ndarray,
               valid: jnp.ndarray,
               cls_agnostic: bool = False
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Softmax CE over classes + smooth-L1 on the target class's deltas.

    cls_scores: (R, K); bbox_deltas: (R, 4K); labels: (R,) int (0 = bg);
    bbox_targets: (R, 4); valid: (R,) bool over sampled rois.
    """
    r, k = cls_scores.shape
    logp = jax.nn.log_softmax(cls_scores.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    n_valid = jnp.maximum(valid.sum(), 1)
    cls_loss = jnp.where(valid, ce, 0.0).sum() / n_valid

    nbox = 2 if cls_agnostic else k
    deltas = bbox_deltas.reshape(r, nbox, 4)
    sel = jnp.where(cls_agnostic, jnp.minimum(labels, 1), labels)
    d = jnp.take_along_axis(deltas, sel[:, None, None].repeat(4, -1),
                            axis=1)[:, 0]
    fg = valid & (labels > 0)
    l1 = smooth_l1(d - bbox_targets).sum(-1)
    bbox_loss = jnp.where(fg, l1, 0.0).sum() / n_valid
    return cls_loss, bbox_loss


def mask_loss(mask_logits: jnp.ndarray, mask_targets: jnp.ndarray,
              labels: jnp.ndarray, fg_valid: jnp.ndarray) -> jnp.ndarray:
    """Per-fg-RoI BCE on the target class's 28x28 mask
    (reference: mask_rcnn_heads.py::mask_rcnn_losses).

    mask_logits: (R, M, M, K); mask_targets: (R, M, M) in {0,1};
    labels: (R,) target class per roi; fg_valid: (R,) bool.
    """
    r, m, _, k = mask_logits.shape
    sel = jnp.take_along_axis(
        mask_logits, labels[:, None, None, None].astype(jnp.int32),
        axis=-1)[..., 0].astype(jnp.float32)
    t = mask_targets.astype(jnp.float32)
    bce = (jnp.maximum(sel, 0) - sel * t + jnp.log1p(jnp.exp(-jnp.abs(sel))))
    per_roi = bce.mean(axis=(1, 2))
    n = jnp.maximum(fg_valid.sum(), 1)
    return jnp.where(fg_valid, per_roi, 0.0).sum() / n


def keypoint_loss(kp_logits: jnp.ndarray, kp_targets: jnp.ndarray,
                  kp_valid: jnp.ndarray,
                  normalize_by_visible: bool = True,
                  loss_weight: float = 1.0) -> jnp.ndarray:
    """Spatial-softmax cross-entropy per visible keypoint
    (reference: keypoint_rcnn_heads.py::keypoint_losses — SoftmaxWithLoss
    over the flattened heatmap, one one-hot target cell per keypoint,
    normalized by the number of visible keypoints in the batch).

    kp_logits: (R, Hm, Wm, K); kp_targets: (R, K) int32 flattened heatmap
    index of each gt keypoint; kp_valid: (R, K) bool (visible & inside roi
    & roi is fg+valid).
    """
    r, hm, wm, k = kp_logits.shape
    flat = kp_logits.reshape(r, hm * wm, k).transpose(0, 2, 1)  # (R, K, S)
    logp = jax.nn.log_softmax(flat.astype(jnp.float32), axis=-1)
    tgt = jnp.clip(kp_targets, 0, hm * wm - 1).astype(jnp.int32)
    ce = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    n_vis = kp_valid.sum()
    denom = jnp.maximum(n_vis, 1.0) if normalize_by_visible \
        else jnp.asarray(float(r * k))
    return loss_weight * jnp.where(kp_valid, ce, 0.0).sum() / denom
