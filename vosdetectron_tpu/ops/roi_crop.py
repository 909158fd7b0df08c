"""RoICrop — spatial-transformer bilinear crop (legacy RoI method).

TPU-native replacement for the reference's CUDA RoICrop
(reference: lib/model/roi_crop/src/roi_crop_cuda_kernel.cu ~350 LoC:
affine-grid generation + bilinear grid sampler, used when
cfg.FAST_RCNN.ROI_XFORM_METHOD == 'RoICrop').

Composition of two traced primitives:
  * affine_grid: the RoI defines a scale+translate theta; sample points are
    a (res, res) normalized grid mapped into feature coordinates (matching
    the reference's _affine_grid_gen with the CROP_RESOLUTION = 2x pooled
    then 2x2 max-pool convention);
  * grid_sample: bilinear gather with zero padding (same gather/VJP
    machinery as ops/roi_align.py — scatter-add backward for free).
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample(feat: jnp.ndarray, ys: jnp.ndarray,
                xs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample feat (H, W, C) at (ys, xs) points of any shape.

    Zero padding outside the map. Returns points.shape + (C,).
    """
    h, w, c = feat.shape
    shape = ys.shape
    ys = ys.reshape(-1)
    xs = xs.reshape(-1)
    inside = (ys > -1.0) & (ys < h) & (xs > -1.0) & (xs < w)
    yc = jnp.clip(ys, 0.0, h - 1.0)
    xc = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(yc)
    x0 = jnp.floor(xc)
    y1 = jnp.minimum(y0 + 1, h - 1.0)
    x1 = jnp.minimum(x0 + 1, w - 1.0)
    wy = yc - y0
    wx = xc - x0

    flat = feat.reshape(-1, c)

    def g(yi, xi):
        return jnp.take(flat, (yi.astype(jnp.int32) * w
                               + xi.astype(jnp.int32)), axis=0)

    out = (g(y0, x0) * ((1 - wy) * (1 - wx))[:, None]
           + g(y0, x1) * ((1 - wy) * wx)[:, None]
           + g(y1, x0) * (wy * (1 - wx))[:, None]
           + g(y1, x1) * (wy * wx)[:, None])
    out = jnp.where(inside[:, None], out, 0.0)
    return out.reshape(shape + (c,))


def roi_crop(feat: jnp.ndarray, rois: jnp.ndarray, spatial_scale: float,
             resolution: int) -> jnp.ndarray:
    """RoICrop: affine-grid + bilinear sampler + 2x2 max-pool.

    feat: (H, W, C); rois: (N, 4) image-coord xyxy.
    Returns (N, resolution, resolution, C).
    """
    n = rois.shape[0]
    r2 = resolution * 2  # reference: PRE_POOL crop at 2x then max-pool
    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    x2 = rois[:, 2] * spatial_scale
    y2 = rois[:, 3] * spatial_scale

    # normalized grid in [-1, 1] (torch affine_grid convention),
    # mapped into the roi span
    t = (jnp.arange(r2, dtype=jnp.float32) + 0.5) / r2  # (r2,)
    ys = y1[:, None] + t[None, :] * jnp.maximum(y2 - y1, 1e-6)[:, None]
    xs = x1[:, None] + t[None, :] * jnp.maximum(x2 - x1, 1e-6)[:, None]
    yy = jnp.broadcast_to(ys[:, :, None], (n, r2, r2))
    xx = jnp.broadcast_to(xs[:, None, :], (n, r2, r2))
    sampled = grid_sample(feat, yy - 0.5, xx - 0.5)  # pixel centers
    # 2x2 max-pool to the output resolution
    c = feat.shape[-1]
    return sampled.reshape(n, resolution, 2, resolution, 2, c
                           ).max(axis=(2, 4))
