"""Fixed-shape, fully-traced NMS for XLA/TPU.

TPU-native replacement for the reference's CUDA bitmask kernel
(reference: lib/model/nms/src/nms_cuda_kernel.cu + nms_gpu.py, ~300 LoC)
and the Cython CPU path (lib/utils/cython_nms.pyx, incl. soft_nms).

Design: greedy NMS is the unique fixpoint of

    keep[i] = valid[i] and not any_{j<i} (keep[j] and iou[j,i] > t)

over score-sorted boxes — a well-founded (strictly lower-triangular)
recursion.  Instead of the reference's sequential O(N) loop, we iterate the
fixpoint map ``K <- valid & ~(S^T @ K)`` with ``lax.while_loop``; each sweep
is a single (N,N) masked matvec on the VPU and the loop terminates in
"suppression chain depth" sweeps (typically < 10 on real detections), giving
*exact* greedy semantics in a handful of vector steps instead of N scalar
ones.  The same construction is exposed as a Pallas kernel in
``ops/pallas/nms_pallas.py`` for large N.

All functions return fixed-size outputs + validity masks (XLA static shapes).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .boxes import pairwise_iou

NEG_INF = -1e10


def _sort_by_score(boxes: jnp.ndarray, scores: jnp.ndarray):
    order = jnp.argsort(-scores)
    return boxes[order], scores[order], order


def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray,
             iou_thresh: float,
             valid: jnp.ndarray | None = None,
             legacy_plus1: bool = False) -> jnp.ndarray:
    """Exact greedy-NMS keep mask over *score-sorted-internally* boxes.

    Args:
      boxes: (N, 4) xyxy.
      scores: (N,). Padded entries should carry -inf / tiny scores.
      valid: optional (N,) bool; invalid boxes never kept, never suppress.
    Returns:
      keep: (N,) bool mask aligned with the INPUT order.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    b, s, order = _sort_by_score(boxes, scores)
    v = valid[order]

    iou = pairwise_iou(b, b, legacy_plus1=legacy_plus1)
    tri = jnp.tril(jnp.ones((n, n), dtype=bool), k=-1)  # j < i (rows j)
    # S[j, i]: box j (higher score) suppresses box i when kept.
    suppress = (iou > iou_thresh) & tri.T & v[:, None] & v[None, :]

    def body(state):
        keep, _ = state
        new_keep = v & ~jnp.any(suppress & keep[:, None], axis=0)
        return new_keep, jnp.any(new_keep != keep)

    def cond(state):
        return state[1]

    keep0 = v
    keep, _ = jax.lax.while_loop(cond, body, (keep0, jnp.array(True)))

    # Un-sort back to input order.
    inv = jnp.zeros_like(order).at[order].set(jnp.arange(n))
    return keep[inv]


@partial(jax.jit, static_argnames=("max_out", "iou_thresh", "legacy_plus1"))
def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thresh: float,
        max_out: int, valid: jnp.ndarray | None = None,
        legacy_plus1: bool = False
        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy NMS with fixed-size output (reference: utils/boxes.py::nms).

    Returns:
      idx: (max_out,) int32 indices into the input, score-descending.
      keep_valid: (max_out,) bool — True for real detections.
      kept_scores: (max_out,) scores of kept boxes (NEG_INF where invalid).
    """
    keep = nms_mask(boxes, scores, iou_thresh, valid=valid,
                    legacy_plus1=legacy_plus1)
    masked = jnp.where(keep, scores, NEG_INF)
    kept_scores, idx = jax.lax.top_k(masked, max_out)
    return idx.astype(jnp.int32), kept_scores > NEG_INF / 2, kept_scores


def soft_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
             max_out: int, method: str = "linear",
             iou_thresh: float = 0.3, sigma: float = 0.5,
             score_thresh: float = 0.001,
             valid: jnp.ndarray | None = None,
             legacy_plus1: bool = False
             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Soft-NMS (reference: cython_nms.pyx::soft_nms).

    Sequentially selects the max-score box and decays the scores of its
    overlaps (linear or gaussian). ``max_out`` selection steps, each a
    vector op — fine for detection-stage budgets (~100).

    Returns (idx, valid_mask, decayed_scores) with shape (max_out,).
    """
    n = boxes.shape[0]
    v = jnp.ones((n,), bool) if valid is None else valid
    s = jnp.where(v, scores, NEG_INF)
    iou = pairwise_iou(boxes, boxes, legacy_plus1=legacy_plus1)

    def body(carry, _):
        s_live, taken = carry
        i = jnp.argmax(s_live)
        score_i = s_live[i]
        ok = score_i > score_thresh
        ov = iou[i]
        if method == "gaussian":
            decay = jnp.exp(-(ov * ov) / sigma)
        else:  # linear
            decay = jnp.where(ov > iou_thresh, 1.0 - ov, 1.0)
        s_new = jnp.where(ok, s_live * decay, s_live)
        s_new = s_new.at[i].set(NEG_INF)
        taken_new = taken.at[i].set(ok)
        return (s_new, taken_new), (i.astype(jnp.int32), ok, score_i)

    (_, _), (idx, ok, out_scores) = jax.lax.scan(
        body, (s, jnp.zeros((n,), bool)), None, length=max_out)
    return idx, ok, out_scores


def box_voting(kept_boxes: jnp.ndarray, kept_valid: jnp.ndarray,
               pool_boxes: jnp.ndarray, pool_scores: jnp.ndarray,
               pool_valid: jnp.ndarray, thresh: float,
               scoring: str = "id",
               legacy_plus1: bool = False) -> jnp.ndarray:
    """Box voting (reference: utils/boxes.py::box_voting): each kept box is
    replaced by the score-weighted average of pool boxes with IoU >= thresh.
    Fully traced, fixed shape."""
    iou = pairwise_iou(kept_boxes, pool_boxes,
                       legacy_plus1=legacy_plus1)  # (K, P)
    w = jnp.where((iou >= thresh) & pool_valid[None, :],
                  jnp.maximum(pool_scores, 1e-6)[None, :], 0.0)
    num = w @ pool_boxes  # (K, 4)
    den = jnp.maximum(w.sum(axis=1, keepdims=True), 1e-12)
    voted = num / den
    return jnp.where(kept_valid[:, None], voted, kept_boxes)


def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray,
                class_ids: jnp.ndarray, iou_thresh: float,
                max_out: int, valid: jnp.ndarray | None = None,
                legacy_plus1: bool = False
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-class NMS via the coordinate-offset trick (boxes of different
    classes never overlap), replacing the reference's per-class Python loop
    in box_results_with_nms_and_limit with ONE traced NMS call."""
    max_coord = jnp.max(boxes) + 1.0
    offsets = class_ids.astype(boxes.dtype)[:, None] * max_coord
    return nms(boxes + offsets, scores, iou_thresh, max_out, valid=valid,
               legacy_plus1=legacy_plus1)
