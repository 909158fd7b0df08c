"""On-device mask pasting (paste_masks_in_image) — separable-matmul design.

TPU-native replacement for the reference's CPU/cv2 mask paste
(reference: lib/core/test.py::segm_results, ~80 LoC: cv2.resize each 28x28
soft mask to its box, threshold at 0.5, write into a full-image canvas,
RLE-encode). That host round-trip is the reference's inference hot spot
(SURVEY.md §3.2); here the whole paste stays on device.

Key idea: pasting one mask is bilinear resampling of a (M, M) grid onto the
image raster restricted to the box — and bilinear resampling on an axis-
aligned grid is SEPARABLE. For each detection we build two thin interpolation
operators

    Ay: (H, M)   Ax: (W, M)

(2 nonzeros per row, built with pure vector arithmetic — no gathers) and
paste via two small matmuls:

    pasted = Ay @ mask @ Ax^T        # (H, M)@(M, M)@(M, W)

vmapped over detections this is a batched (H,M)x(M,M)x(M,W) einsum that maps
straight onto the MXU — zero gather/scatter traffic, compared with the CUDA
approach of one thread per output pixel. ~1.3 GFLOP for 100 dets at 480p,
i.e. microseconds on a v5e chip.

Matches cv2.INTER_LINEAR + threshold semantics used by Detectron
(GRID_SAMPLE-style half-pixel centers).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _interp_matrix(out_coords: jnp.ndarray, m: int, lo: jnp.ndarray,
                   hi: jnp.ndarray) -> jnp.ndarray:
    """Rows: output pixels (length P); cols: mask samples (m).

    Maps image-axis pixel centers into mask coordinates for a box spanning
    [lo, hi) and emits bilinear weights. Pixels outside the box get all-zero
    rows (so pasting is implicitly box-clipped).
    """
    size = jnp.maximum(hi - lo, 1e-6)
    # cv2.resize INTER_LINEAR half-pixel convention:
    # mask_coord = (pix + 0.5 - lo) / size * m - 0.5
    mc = (out_coords + 0.5 - lo) / size * m - 0.5
    inside = (out_coords + 0.5 > lo) & (out_coords + 0.5 < hi)
    mc = jnp.clip(mc, 0.0, m - 1.0)
    i0 = jnp.floor(mc)
    w1 = mc - i0
    i0 = i0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, m - 1)
    cols = jnp.arange(m)[None, :]
    a = (jnp.where(cols == i0[:, None], (1.0 - w1)[:, None], 0.0)
         + jnp.where(cols == i1[:, None], w1[:, None], 0.0))
    return jnp.where(inside[:, None], a, 0.0)


def paste_mask(mask: jnp.ndarray, box: jnp.ndarray, im_h: int,
               im_w: int) -> jnp.ndarray:
    """Paste one (M, M) soft mask into an (im_h, im_w) canvas (soft output)."""
    m = mask.shape[0]
    ys = jnp.arange(im_h, dtype=jnp.float32)
    xs = jnp.arange(im_w, dtype=jnp.float32)
    ay = _interp_matrix(ys, m, box[1], box[3])  # (H, M)
    ax = _interp_matrix(xs, m, box[0], box[2])  # (W, M)
    return jnp.einsum("hm,mn,wn->hw", ay, mask, ax,
                      preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("im_h", "im_w", "threshold"))
def paste_masks_in_image(masks: jnp.ndarray, boxes: jnp.ndarray,
                         im_h: int, im_w: int,
                         threshold: float = 0.5) -> jnp.ndarray:
    """Batched paste (reference parity: lib/core/test.py::segm_results).

    Args:
      masks: (N, M, M) sigmoid mask probabilities.
      boxes: (N, 4) xyxy image-coordinate boxes.
      threshold: binarization threshold; < 0 returns soft masks.
    Returns:
      (N, im_h, im_w) bool (threshold >= 0) or float32 (soft).
    """
    soft = jax.vmap(lambda mk, bx: paste_mask(mk, bx, im_h, im_w))(
        masks, boxes)
    if threshold >= 0:
        return soft > threshold
    return soft


def flatten_instance_masks(pasted: jnp.ndarray, scores: jnp.ndarray,
                           valid: jnp.ndarray,
                           object_ids: jnp.ndarray) -> jnp.ndarray:
    """Combine per-instance binary masks into a DAVIS-style indexed map.

    Overlaps are resolved by score (higher wins), matching the per-pixel
    argmax the reference applies when writing indexed PNGs.

    Args:
      pasted: (N, H, W) bool instance masks.
      scores: (N,) float.
      valid: (N,) bool.
      object_ids: (N,) int32 palette ids (>= 1).
    Returns:
      (H, W) int32 indexed segmentation (0 = background).
    """
    neg = jnp.asarray(-1e10, jnp.float32)
    s = jnp.where(valid, scores, neg)
    # Per-pixel candidate score: score where the instance covers the pixel.
    pix = jnp.where(pasted, s[:, None, None], neg)  # (N, H, W)
    best = jnp.argmax(pix, axis=0)  # (H, W)
    covered = jnp.any(pasted & valid[:, None, None], axis=0)
    ids = object_ids[best]
    return jnp.where(covered, ids, 0).astype(jnp.int32)
