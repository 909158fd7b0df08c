"""Region Proposal Network + fully-traced proposal generation.

TPU-native re-design of the reference's RPN stack
(reference: lib/modeling/rpn_heads.py ~180 LoC,
generate_proposals.py::GenerateProposalsOp ~200 LoC,
collect_and_distribute_fpn_rpn_proposals.py ~180 LoC).

The reference runs proposal generation as host numpy + a CUDA NMS call in
the middle of the forward pass. Here the whole path — per-level top-k,
delta decode, clipping, min-size filtering, NMS, cross-level collection —
is traced XLA with static shapes: every stage produces fixed-size arrays
plus validity masks, so the entire detector compiles to one program.

RPN head weights are shared across FPN levels (Detectron convention).
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import boxes as box_ops
from ..ops.nms import nms
from .convs import Conv


class RPNHead(nn.Module):
    """3x3 conv + 1x1 objectness / 1x1 box-delta heads (shared per level)."""

    dim: int = 256
    num_anchors: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        t = nn.relu(Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)],
                            dtype=self.dtype, name="conv")(x))
        logits = Conv(self.num_anchors, (1, 1), dtype=self.dtype,
                         name="cls_logits")(t)
        deltas = Conv(4 * self.num_anchors, (1, 1), dtype=self.dtype,
                         name="bbox_pred")(t)
        return logits, deltas


class Proposals(NamedTuple):
    boxes: jnp.ndarray   # (R, 4) xyxy, zero-padded
    scores: jnp.ndarray  # (R,) objectness probs, -inf padded
    valid: jnp.ndarray   # (R,) bool


def _level_proposals(logits: jnp.ndarray, deltas: jnp.ndarray,
                     anchors: jnp.ndarray, im_hw, pre_nms: int,
                     post_nms: int, nms_thresh: float,
                     min_size: float,
                     legacy_plus1: bool = False) -> Proposals:
    """Single-level proposal generation (GenerateProposalsOp semantics).

    logits: (H, W, A); deltas: (H, W, 4A); anchors: (H*W*A, 4).
    """
    h, w, a = logits.shape
    n = h * w * a
    scores = logits.reshape(n)
    deltas = deltas.reshape(h, w, a, 4).reshape(n, 4)

    k = min(pre_nms, n)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    top_deltas = deltas[top_idx]
    top_anchors = anchors[top_idx]

    boxes = box_ops.bbox_transform_inv(top_anchors, top_deltas,
                                       weights=(1.0, 1.0, 1.0, 1.0),
                                       legacy_plus1=legacy_plus1)
    boxes = box_ops.clip_boxes(boxes, im_hw, legacy_plus1=legacy_plus1)
    valid = box_ops.filter_small_boxes(boxes, min_size, legacy_plus1) \
        if min_size > 0 else jnp.ones((k,), bool)

    keep_idx, keep_valid, keep_scores = nms(
        boxes, top_scores, nms_thresh, min(post_nms, k), valid=valid,
        legacy_plus1=legacy_plus1)
    keep_boxes = jnp.where(keep_valid[:, None], boxes[keep_idx], 0.0)
    return Proposals(keep_boxes, keep_scores, keep_valid)


def fpn_proposals(per_level_logits: Sequence[jnp.ndarray],
                  per_level_deltas: Sequence[jnp.ndarray],
                  per_level_anchors: Sequence[jnp.ndarray],
                  im_hw, pre_nms: int, post_nms: int, nms_thresh: float,
                  min_size: float = 0.0,
                  legacy_plus1: bool = False) -> Proposals:
    """FPN proposal collection (reference: collect_and_distribute_*).

    Per level: top-`pre_nms` -> decode -> clip -> NMS -> top-`post_nms`.
    Union of levels -> overall top-`post_nms` by objectness score.
    All sizes static; padded slots carry valid=False and -inf score.
    """
    parts: List[Proposals] = []
    for lg, dl, an in zip(per_level_logits, per_level_deltas,
                          per_level_anchors):
        parts.append(_level_proposals(lg, dl, an, im_hw, pre_nms, post_nms,
                                      nms_thresh, min_size, legacy_plus1))
    boxes = jnp.concatenate([p.boxes for p in parts])
    scores = jnp.concatenate([p.scores for p in parts])
    valid = jnp.concatenate([p.valid for p in parts])

    masked = jnp.where(valid, scores, -jnp.inf)
    top_scores, idx = jax.lax.top_k(masked, post_nms)
    keep_valid = jnp.isfinite(top_scores)
    # zero the padded slots' boxes: they are excluded from sampling and
    # scoring anyway, and garbage coords (e.g. filtered slivers) would
    # otherwise still cost RoIAlign work downstream
    keep_boxes = jnp.where(keep_valid[:, None], boxes[idx], 0.0)
    return Proposals(keep_boxes, top_scores, keep_valid)


def single_scale_proposals(logits: jnp.ndarray, deltas: jnp.ndarray,
                           anchors: jnp.ndarray, im_hw, pre_nms: int,
                           post_nms: int, nms_thresh: float,
                           min_size: float = 0.0,
                           legacy_plus1: bool = False) -> Proposals:
    """C4 path: one feature level (reference: generic_rpn_outputs)."""
    return _level_proposals(logits, deltas, anchors, im_hw, pre_nms,
                            post_nms, nms_thresh, min_size, legacy_plus1)


def rpn_losses(logits: jnp.ndarray, deltas: jnp.ndarray,
               labels: jnp.ndarray, bbox_targets: jnp.ndarray,
               bbox_inside: jnp.ndarray,
               normalizer: float | jnp.ndarray = 256.0
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RPN losses (reference: rpn_heads.py::single_scale_rpn_losses).

    labels: (N,) in {1 fg, 0 bg, -1 ignore}; logits/deltas flattened to
    (N,), (N, 4) matching anchor order. Smooth-L1 with beta=1/9 (Detectron).
    """
    fg = labels == 1
    use = labels >= 0
    cls = jnp.where(
        use,
        # sigmoid BCE
        jnp.maximum(logits, 0) - logits * labels.astype(logits.dtype)
        + jnp.log1p(jnp.exp(-jnp.abs(logits))),
        0.0)
    cls_loss = cls.sum() / jnp.maximum(use.sum(), 1)

    beta = 1.0 / 9.0
    diff = jnp.abs(deltas - bbox_targets) * bbox_inside
    l1 = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    bbox_loss = jnp.where(fg[:, None], l1, 0.0).sum() / normalizer
    return cls_loss, bbox_loss
