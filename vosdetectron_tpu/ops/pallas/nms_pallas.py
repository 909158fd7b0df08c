"""Pallas TPU greedy-NMS kernel — tiled IoU fixpoint sweeps in VMEM.

TPU-native replacement for the reference's CUDA bitmask NMS
(reference: lib/model/nms/src/nms_cuda_kernel.cu — 64-bit suppression
bitmask blocks + host-side sequential resolve).

Same fixpoint formulation as ops/nms.py (keep[i] = valid[i] & no kept
higher-scored box overlaps it), but computed entirely inside one kernel:
boxes live in VMEM (N*4*4B — tiny), each sweep recomputes IoU tiles on the
VPU instead of materializing the (N, N) matrix in HBM (the jnp path's main
memory cost), and the while-loop runs in-kernel until the keep vector is
stationary. Boxes must be sorted by descending score by the caller (a
single XLA top_k), padded with zeros + valid=False.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(boxes_ref, valid_ref, keep_ref, sup_ref, *, iou_thresh: float,
            legacy_plus1: bool):
    n = boxes_ref.shape[0]
    off = 1.0 if legacy_plus1 else 0.0

    x1 = boxes_ref[:, 0]
    y1 = boxes_ref[:, 1]
    x2 = boxes_ref[:, 2]
    y2 = boxes_ref[:, 3]
    area = jnp.maximum(x2 - x1 + off, 0.0) * jnp.maximum(y2 - y1 + off, 0.0)
    valid_f = (valid_ref[:, 0] > 0).astype(jnp.float32)

    # Index vectors for the triangular (higher-score suppresses lower) mask.
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

    # Build the 0/1 suppression matrix ONCE into VMEM scratch (the sweeps
    # then are single MXU matvecs instead of re-deriving n^2 IoUs). Row-
    # blocked to bound the live n^2 temporaries on the vector stack.
    rb = 256
    assert n % rb == 0, "caller pads N to a multiple of 256"

    def build_block(b, _):
        # Row blocks re-read from the refs (in-register dynamic_slice is
        # not lowerable on TPU Pallas; ref slicing with pl.ds is).
        rows = boxes_ref[pl.ds(b * rb, rb), :]
        bx1 = rows[:, 0][:, None]
        by1 = rows[:, 1][:, None]
        bx2 = rows[:, 2][:, None]
        by2 = rows[:, 3][:, None]
        barea = (jnp.maximum(bx2 - bx1 + off, 0.0)
                 * jnp.maximum(by2 - by1 + off, 0.0))
        bvalid = (valid_ref[pl.ds(b * rb, rb), 0] > 0).astype(
            jnp.float32)[:, None]
        bidx = (jax.lax.broadcasted_iota(jnp.int32, (rb, 1), 0)
                + b * rb)
        iw = jnp.maximum(jnp.minimum(bx2, x2[None, :])
                         - jnp.maximum(bx1, x1[None, :]) + off, 0.0)
        ih = jnp.maximum(jnp.minimum(by2, y2[None, :])
                         - jnp.maximum(by1, y1[None, :]) + off, 0.0)
        inter = iw * ih
        union = barea + area[None, :] - inter
        iou = inter / jnp.maximum(union, 1e-12)
        sup = jnp.where(
            (iou > iou_thresh)
            & (bidx < idx[None, :])
            & (bvalid * valid_f[None, :] > 0),
            1.0, 0.0)
        sup_ref[pl.ds(b * rb, rb), :] = sup
        return 0

    jax.lax.fori_loop(0, n // rb, build_block, 0)

    def sweep(keep_f):
        # keep[i] = valid[i] & not any_j kept[j] suppresses i:
        # one (1, n) @ (n, n) matvec on the MXU per sweep.
        hit = jnp.dot(keep_f[None, :], sup_ref[:, :],
                      preferred_element_type=jnp.float32)[0]
        return valid_f * (1.0 - jnp.sign(hit))

    def cond(state):
        _, prev_changed = state
        return prev_changed > 0

    def body(state):
        keep_f, _ = state
        new = sweep(keep_f)
        return new, jnp.max(jnp.abs(new - keep_f))

    keep0 = sweep(valid_f)
    keep_f, _ = jax.lax.while_loop(cond, body, (keep0, jnp.float32(1.0)))
    keep_ref[:, 0] = keep_f.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("iou_thresh", "legacy_plus1",
                                             "interpret"))
def nms_keep_pallas(boxes_sorted: jnp.ndarray, valid: jnp.ndarray,
                    iou_thresh: float, legacy_plus1: bool = False,
                    interpret: bool = False) -> jnp.ndarray:
    """Keep mask over score-DESCENDING-sorted boxes (N, 4). N <= ~2048."""
    n = boxes_sorted.shape[0]
    kernel = functools.partial(_kernel, iou_thresh=iou_thresh,
                               legacy_plus1=legacy_plus1)
    keep = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n, n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(n * n * 4 + 256 * n * 4 * 8 + 2 * 2**20,
                                 14 * 2**20)),
        cost_estimate=pl.CostEstimate(
            flops=n * n * 40, bytes_accessed=n * 4 * 4,
            transcendentals=0),
        interpret=interpret,
    )(boxes_sorted, valid.astype(jnp.int32)[:, None])
    return keep[:, 0] > 0


@functools.partial(jax.jit, static_argnames=("iou_thresh", "max_out",
                                             "interpret"))
def nms_pallas(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thresh: float,
               max_out: int, valid: jnp.ndarray | None = None,
               interpret: bool = False):
    """Drop-in for ops.nms.nms: returns (idx, keep_valid, kept_scores)."""
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    masked = jnp.where(valid, scores, -jnp.inf)
    s_sorted, order = jax.lax.top_k(masked, n)
    b_sorted = boxes[order]
    pad = (-n) % 256  # kernel processes row blocks of 256
    bp = jnp.pad(b_sorted, ((0, pad), (0, 0)))
    vp = jnp.pad(jnp.isfinite(s_sorted), (0, pad))
    keep = nms_keep_pallas(bp, vp, iou_thresh, interpret=interpret)[:n]
    kept_scores, kidx = jax.lax.top_k(jnp.where(keep, s_sorted, -1e10),
                                      max_out)
    idx = order[kidx]
    return idx.astype(jnp.int32), kept_scores > -1e9, kept_scores
