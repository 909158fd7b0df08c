"""RoIAlign for TPU — traced jnp gather formulation + FPN pyramid dispatch.

TPU-native replacement for the reference's CUDA kernels
(reference: lib/model/roi_align/src/roi_align_kernel.cu ~450 LoC, with
Python wrappers functions/roi_align.py, modules/roi_align.py) and the
FPN level-assignment logic in lib/modeling/model_builder.py::
roi_feature_transform.

Semantics follow Caffe2/Detectron RoIAlign: RoI coordinates are scaled by
``spatial_scale`` with NO half-pixel offset (``aligned=False``), bins are
sampled on an (sampling_ratio x sampling_ratio) sub-grid of bin-interior
points, bilinear-interpolated with zero-padding outside the feature map,
and averaged.

Design notes (why this shape):
  * The bilinear gather is expressed through ``jnp.take`` on a flattened
    (H*W, C) feature map — XLA lowers this to a row-gather whose VJP is a
    scatter-add, so the backward pass (workload 4: RoIAlign backprop) is
    derived automatically and is exactly the CUDA backward's atomic-add
    semantics, without hand-written code.
  * FPN dispatch concatenates all levels into ONE flat (sum_l H_l*W_l, C)
    "pyramid atlas"; each RoI's sample indices are offset by its assigned
    level's base offset. One gather serves all levels — versus the naive
    fixed-shape alternative of running RoIAlign per level and masking
    (4x compute).
  * A Pallas kernel (ops/pallas/roi_align_pallas.py) implements the same
    contract for the single-level hot path; parity is tested against this
    file.

Everything is fixed-shape: rois are padded to a static N; padded rois should
be all-zeros (they sample index 0 harmlessly — callers mask downstream).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _sample_coords_1d(lo: jnp.ndarray, size: jnp.ndarray, pooled: int,
                      sampling_ratio: int) -> jnp.ndarray:
    """Sample coordinates along one axis.

    lo: (N,) roi start (feature coords); size: (N,) roi extent.
    Returns (N, pooled * sampling_ratio) sample positions.
    """
    n = lo.shape[0]
    bin_size = size / pooled  # (N,)
    s = sampling_ratio
    # position of sample k within bin p: (p + (k + 0.5)/s) * bin_size
    p = jnp.arange(pooled, dtype=lo.dtype)  # (pooled,)
    k = (jnp.arange(s, dtype=lo.dtype) + 0.5) / s  # (s,)
    offs = (p[:, None] + k[None, :]).reshape(-1)  # (pooled*s,)
    return lo[:, None] + offs[None, :] * bin_size[:, None]


def _bilinear_1d(coords: jnp.ndarray, dim: jnp.ndarray | int):
    """Clamped bilinear index/weight pairs along one axis.

    Caffe2 semantics: samples with y in (-1, dim) are clamped into the map;
    anything further outside contributes zero.
    Returns (i0, i1, w0, w1, inside) each shaped like coords.
    """
    inside = (coords > -1.0) & (coords < dim)
    c = jnp.clip(coords, 0.0, jnp.asarray(dim, coords.dtype) - 1.0)
    i0 = jnp.floor(c)
    i1 = jnp.minimum(i0 + 1.0, jnp.asarray(dim, coords.dtype) - 1.0)
    w1 = c - i0
    w0 = 1.0 - w1
    return (i0.astype(jnp.int32), i1.astype(jnp.int32), w0, w1, inside)


def roi_align(feat: jnp.ndarray, rois: jnp.ndarray, spatial_scale: float,
              pooled: int, sampling_ratio: int = 2,
              aligned: bool = False) -> jnp.ndarray:
    """Single-level RoIAlign.

    Args:
      feat: (H, W, C) feature map (NHWC single image).
      rois: (N, 4) xyxy boxes in IMAGE coordinates.
      spatial_scale: 1/stride of this feature level.
      pooled: output spatial resolution (square).
      sampling_ratio: sub-samples per bin axis (static, > 0).
      aligned: if True use the half-pixel-corrected variant.
    Returns:
      (N, pooled, pooled, C) float32.
    """
    h, w, c = feat.shape
    offset = 0.5 if aligned else 0.0
    x1 = rois[:, 0] * spatial_scale - offset
    y1 = rois[:, 1] * spatial_scale - offset
    x2 = rois[:, 2] * spatial_scale - offset
    y2 = rois[:, 3] * spatial_scale - offset
    # Caffe2: force malformed rois to size >= 1 (no "aligned" shrink).
    rw = jnp.maximum(x2 - x1, 1.0) if not aligned else jnp.maximum(x2 - x1, 1e-6)
    rh = jnp.maximum(y2 - y1, 1.0) if not aligned else jnp.maximum(y2 - y1, 1e-6)

    ys = _sample_coords_1d(y1, rh, pooled, sampling_ratio)  # (N, P*s)
    xs = _sample_coords_1d(x1, rw, pooled, sampling_ratio)  # (N, P*s)

    y0, y1i, wy0, wy1, in_y = _bilinear_1d(ys, h)
    x0, x1i, wx0, wx1, in_x = _bilinear_1d(xs, w)

    flat = feat.reshape(h * w, c)

    def gather(yi, xi):
        # (N, P*s) x (N, P*s) -> (N, P*s, P*s, C)
        idx = yi[:, :, None] * w + xi[:, None, :]
        return jnp.take(flat, idx.reshape(-1), axis=0).reshape(
            idx.shape + (c,))

    wy0 = jnp.where(in_y, wy0, 0.0)
    wy1 = jnp.where(in_y, wy1, 0.0)
    wx0 = jnp.where(in_x, wx0, 0.0)
    wx1 = jnp.where(in_x, wx1, 0.0)

    out = (gather(y0, x0) * (wy0[:, :, None] * wx0[:, None, :])[..., None]
           + gather(y0, x1i) * (wy0[:, :, None] * wx1[:, None, :])[..., None]
           + gather(y1i, x0) * (wy1[:, :, None] * wx0[:, None, :])[..., None]
           + gather(y1i, x1i) * (wy1[:, :, None] * wx1[:, None, :])[..., None])

    n = rois.shape[0]
    s = sampling_ratio
    out = out.reshape(n, pooled, s, pooled, s, c)
    return out.mean(axis=(2, 4))


def fpn_level_assignment(rois: jnp.ndarray, k_min: int, k_max: int,
                         canonical_scale: int = 224,
                         canonical_level: int = 4) -> jnp.ndarray:
    """FPN RoI-to-level: k = floor(k0 + log2(sqrt(wh)/224)), clamped.

    Reference: lib/modeling/model_builder.py (roi_feature_transform) /
    collect_and_distribute_fpn_rpn_proposals.py::map_rois_to_fpn_levels.
    """
    w = rois[:, 2] - rois[:, 0]
    h = rois[:, 3] - rois[:, 1]
    scale = jnp.sqrt(jnp.maximum(w * h, 1e-12))
    k = jnp.floor(canonical_level +
                  jnp.log2(scale / canonical_scale + 1e-8))
    return jnp.clip(k, k_min, k_max).astype(jnp.int32)


def roi_align_pyramid(feats: Sequence[jnp.ndarray], rois: jnp.ndarray,
                      strides: Sequence[int], k_min: int, k_max: int,
                      pooled: int, sampling_ratio: int = 2,
                      canonical_scale: int = 224, canonical_level: int = 4,
                      aligned: bool = False) -> jnp.ndarray:
    """Multi-level RoIAlign over an FPN pyramid with one fused gather.

    feats: list of (H_l, W_l, C) maps for levels k_min..k_max (same C).
    rois: (N, 4) xyxy image coords.
    Returns (N, pooled, pooled, C).
    """
    c = feats[0].shape[-1]
    hs = jnp.asarray([f.shape[0] for f in feats])
    ws = jnp.asarray([f.shape[1] for f in feats])
    sizes = [f.shape[0] * f.shape[1] for f in feats]
    bases = jnp.asarray([0] + list(jnp.cumsum(jnp.asarray(sizes))[:-1]))
    atlas = jnp.concatenate([f.reshape(-1, c) for f in feats], axis=0)

    levels = fpn_level_assignment(rois, k_min, k_max,
                                  canonical_scale, canonical_level)
    li = levels - k_min  # (N,) index into feats
    scale = 1.0 / jnp.asarray(strides, jnp.float32)[li]  # (N,)
    lh = hs[li]
    lw = ws[li]
    lbase = bases[li]

    offset = 0.5 if aligned else 0.0
    x1 = rois[:, 0] * scale - offset
    y1 = rois[:, 1] * scale - offset
    x2 = rois[:, 2] * scale - offset
    y2 = rois[:, 3] * scale - offset
    rw = jnp.maximum(x2 - x1, 1e-6 if aligned else 1.0)
    rh = jnp.maximum(y2 - y1, 1e-6 if aligned else 1.0)

    ys = _sample_coords_1d(y1, rh, pooled, sampling_ratio)
    xs = _sample_coords_1d(x1, rw, pooled, sampling_ratio)

    y0, y1i, wy0, wy1, in_y = _bilinear_1d(ys, lh[:, None].astype(ys.dtype))
    x0, x1i, wx0, wx1, in_x = _bilinear_1d(xs, lw[:, None].astype(xs.dtype))

    wy0 = jnp.where(in_y, wy0, 0.0)
    wy1 = jnp.where(in_y, wy1, 0.0)
    wx0 = jnp.where(in_x, wx0, 0.0)
    wx1 = jnp.where(in_x, wx1, 0.0)

    def gather(yi, xi):
        idx = lbase[:, None, None] + yi[:, :, None] * lw[:, None, None] + \
            xi[:, None, :]
        return jnp.take(atlas, idx.reshape(-1), axis=0).reshape(
            idx.shape + (c,))

    out = (gather(y0, x0) * (wy0[:, :, None] * wx0[:, None, :])[..., None]
           + gather(y0, x1i) * (wy0[:, :, None] * wx1[:, None, :])[..., None]
           + gather(y1i, x0) * (wy1[:, :, None] * wx0[:, None, :])[..., None]
           + gather(y1i, x1i) * (wy1[:, :, None] * wx1[:, None, :])[..., None])

    n = rois.shape[0]
    s = sampling_ratio
    out = out.reshape(n, pooled, s, pooled, s, c)
    return out.mean(axis=(2, 4))


def roi_pool(feat: jnp.ndarray, rois: jnp.ndarray, spatial_scale: float,
             pooled: int) -> jnp.ndarray:
    """Legacy RoI max-pool (reference: lib/model/roi_pooling/src/*.cu).

    Fixed-shape trick: every bin max-pools over a static (max_bin_h x
    max_bin_w) window with validity masking; implemented via dense sampling
    at integer offsets. Low-traffic path kept for API parity.
    """
    h, w, c = feat.shape
    x1 = jnp.round(rois[:, 0] * spatial_scale)
    y1 = jnp.round(rois[:, 1] * spatial_scale)
    x2 = jnp.round(rois[:, 2] * spatial_scale)
    y2 = jnp.round(rois[:, 3] * spatial_scale)
    rw = jnp.maximum(x2 - x1 + 1, 1.0)
    rh = jnp.maximum(y2 - y1 + 1, 1.0)

    # Static per-bin sampling grid (oversample then max) — K samples/axis.
    K = 4
    py = (jnp.arange(pooled)[:, None] + (jnp.arange(K) + 0.5)[None, :] / K)
    px = py  # same construction
    ys = y1[:, None, None] + py[None] * (rh / pooled)[:, None, None]
    xs = x1[:, None, None] + px[None] * (rw / pooled)[:, None, None]
    yi = jnp.clip(jnp.floor(ys), 0, h - 1).astype(jnp.int32)  # (N,P,K)
    xi = jnp.clip(jnp.floor(xs), 0, w - 1).astype(jnp.int32)

    flat = feat.reshape(h * w, c)
    idx = (yi[:, :, :, None, None] * w + xi[:, None, None, :, :])
    vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(idx.shape + (c,))
    return vals.max(axis=(2, 4))  # max over both K axes -> (N,P,P,C)
