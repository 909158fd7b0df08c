"""Pallas TPU fused mask-paste + indexed-map flatten.

TPU-native replacement for the reference's CPU mask paste
(reference: lib/core/test.py::segm_results — cv2.resize + threshold per
instance, then host-side composition when writing DAVIS PNGs). Mandated as
a Pallas kernel by BASELINE.json north_star ("paste_masks_in_image").

Fusion is the point: the XLA path (ops/mask_paste.py) materializes the
(N, H, W) pasted stack in HBM (58 MB for 32 dets at 480p) and then argmaxes
it. This kernel keeps ONE (H, W) score/id accumulator pair in VMEM and
streams detections through it:

    for each instance i (grid):
        pasted_i = (Ay_i @ mask_i) @ Ax_i^T          # two MXU matmuls
        win      = pasted_i > thresh  &  score_i > best
        best     = select(win, score_i, best)
        ids      = select(win, obj_id_i, ids)

Ay/Ax are the same thin bilinear operators as the XLA path (semantics
live in ops/mask_paste.py::_interp_matrix — reused here), so parity is
exact up to MXU precision. Zero (N, H, W) traffic to HBM.

Also serves VOS track rendering (propagation.render_indexed): a track mask
is just an instance whose box is the full frame.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..mask_paste import _interp_matrix


def _kernel(meta_ref, ay_ref, ax_ref, mask_ref, best_ref, ids_ref, *,
            threshold: float):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        best_ref[:, :] = jnp.full_like(best_ref, -1e10)
        ids_ref[:, :] = jnp.zeros_like(ids_ref)

    score = meta_ref[0, i]
    obj_id = meta_ref[1, i]
    valid = meta_ref[2, i]

    @pl.when(valid > 0)
    def _():
        ay = ay_ref[0]          # (H, M)
        ax = ax_ref[0]          # (W, M)
        mask = mask_ref[0]      # (M, M)
        t = jnp.dot(ay, mask, preferred_element_type=jnp.float32)  # (H, M)
        pasted = jax.lax.dot_general(
            t, ax, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (H, W)
        sc = score.astype(jnp.float32) * 1e-4  # meta is int32-scaled
        win = (pasted > threshold) & (sc > best_ref[:, :])
        best_ref[:, :] = jnp.where(win, sc, best_ref[:, :])
        ids_ref[:, :] = jnp.where(win, obj_id, ids_ref[:, :])


@functools.partial(jax.jit, static_argnames=("im_h", "im_w", "threshold",
                                             "interpret"))
def paste_flatten_pallas(masks: jnp.ndarray, boxes: jnp.ndarray,
                         scores: jnp.ndarray, obj_ids: jnp.ndarray,
                         valid: jnp.ndarray, im_h: int, im_w: int,
                         threshold: float = 0.5,
                         interpret: bool = False) -> jnp.ndarray:
    """Fused paste + score-priority flatten.

    masks: (N, M, M) probabilities; boxes: (N, 4) xyxy image coords;
    scores: (N,); obj_ids: (N,) int32 palette ids; valid: (N,) bool.
    Returns (im_h, im_w) int32 indexed map (0 = background).
    """
    n, mh, mw = masks.shape
    ys = jnp.arange(im_h, dtype=jnp.float32)
    xs = jnp.arange(im_w, dtype=jnp.float32)
    ay = jax.vmap(lambda b: _interp_matrix(ys, mh, b[1], b[3]))(boxes)
    ax = jax.vmap(lambda b: _interp_matrix(xs, mw, b[0], b[2]))(boxes)

    # SMEM meta: scores quantized to int32 (1e-4 steps preserve ordering
    # well past float32 score resolution in [0, 1]).
    meta = jnp.stack([
        jnp.round(scores * 1e4).astype(jnp.int32),
        obj_ids.astype(jnp.int32),
        valid.astype(jnp.int32),
    ], axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, im_h, mh), lambda i, mt: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, im_w, mw), lambda i, mt: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mh, mw), lambda i, mt: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((im_h, im_w), lambda i, mt: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((im_h, im_w), lambda i, mt: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    kernel = functools.partial(_kernel, threshold=threshold)
    best, ids = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((im_h, im_w), jnp.float32),
                   jax.ShapeDtypeStruct((im_h, im_w), jnp.int32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(3.5 * im_h * im_w * 4
                                 + (im_h * mh + im_w * mw + mh * mw) * 8
                                 + 2**21),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * im_h * mh * (mw + im_w),
            bytes_accessed=n * (im_h * mh + im_w * mw) * 4
            + im_h * im_w * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(meta, ay, ax, masks.astype(jnp.float32))
    return ids
