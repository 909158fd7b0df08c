"""Pallas TPU RoIAlign — windowed DMA + separable MXU matmuls.

The TPU-native replacement for the reference's CUDA RoIAlign kernels
(reference: lib/model/roi_align/src/roi_align_kernel.cu ~450 LoC,
one-thread-per-output-element bilinear gather). Mandated as a Pallas kernel
by BASELINE.json north_star.

Design (why this is NOT a gather kernel):
  * FPN level assignment bounds every RoI's *feature-space* footprint:
    level k gets sqrt(wh)/2^k in [14, 28), so even extreme aspect ratios
    fit inside a fixed WINDOW x WINDOW (default 64) feature patch.
  * RoIAlign is bilinear resampling on an axis-aligned grid => SEPARABLE.
    For each RoI we precompute thin interpolation operators
    Ay, Ax: (P*s, WINDOW) — 2 nonzeros per row, bilinear weights, with
    zero rows for out-of-image samples — in plain jnp (same math as
    ops/roi_align.py, so semantics stay testable outside the kernel).
  * The kernel then is: double-buffered async DMA of each RoI's window
    (HBM -> VMEM) overlapped with two small matmuls on the MXU:

        out_n = avgpool_s( Ay_n @ window_n @ Ax_n^T )

    No gathers, no scatter, no scalar loops — the irregular memory access
    is reduced to ONE strided DMA per RoI.
  * Multi-level: per-level kernels invoked on level-partitioned RoIs
    (partitioning is a cheap argsort outside).

The backward pass reuses the same structure via jax.custom_vjp: dWindow =
Ay^T @ g @ Ax is scattered back with one DMA-accumulate per RoI — but since
XLA's scatter-add VJP of the jnp path is only used in training (workload 4,
batch-bound), we default the VJP to the jnp reference implementation for
exactness and keep the Pallas path for the inference hot loop.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..roi_align import _bilinear_1d, _sample_coords_1d, roi_align

WINDOW = 64


def _interp_operator(lo: jnp.ndarray, size: jnp.ndarray, dim: int,
                     origin: jnp.ndarray, pooled: int,
                     sampling_ratio: int) -> jnp.ndarray:
    """Per-roi thin interpolation matrix A: (P*s, WINDOW), window-relative.

    lo/size: (N,) roi start/extent in feature coords; origin: (N,) int32
    window start. Rows are bilinear weight pairs; samples outside the real
    feature map contribute 0 (Caffe2 zero-pad semantics).
    """
    coords = _sample_coords_1d(lo, size, pooled, sampling_ratio)  # (N, Ps)
    i0, i1, w0, w1, inside = _bilinear_1d(coords, dim)
    w0 = jnp.where(inside, w0, 0.0)
    w1 = jnp.where(inside, w1, 0.0)
    # window-relative columns; clamp into window. Correct for in-spec rois;
    # rois whose samples would clamp are detected by _window_exceeded and
    # routed to the exact XLA path by the kernel wrappers.
    c0 = jnp.clip(i0 - origin[:, None], 0, WINDOW - 1)
    c1 = jnp.clip(i1 - origin[:, None], 0, WINDOW - 1)
    cols = jnp.arange(WINDOW)[None, None, :]
    a = (jnp.where(cols == c0[:, :, None], w0[:, :, None], 0.0)
         + jnp.where(cols == c1[:, :, None], w1[:, :, None], 0.0))
    return a  # (N, P*s, WINDOW)


def _window_exceeded(lo: jnp.ndarray, size: jnp.ndarray, dim,
                     origin: jnp.ndarray, pooled: int,
                     sampling_ratio: int) -> jnp.ndarray:
    """(N,) bool: does any in-image sample of this RoI fall outside its
    WINDOW? Mirrors _interp_operator's clamp condition exactly — True
    means the clamped kernel output would be silently wrong for this RoI
    and the caller must route it to the exact XLA path."""
    coords = _sample_coords_1d(lo, size, pooled, sampling_ratio)
    i0, i1, w0, w1, inside = _bilinear_1d(coords, dim)
    c0 = i0 - origin[:, None]
    c1 = i1 - origin[:, None]
    bad0 = inside & (w0 > 0) & ((c0 < 0) | (c0 > WINDOW - 1))
    bad1 = inside & (w1 > 0) & ((c1 < 0) | (c1 > WINDOW - 1))
    return (bad0 | bad1).any(axis=1)


CBLOCK = 128


def _kernel(origins_ref, ay_ref, ax_ref, feat_hbm, out_ref, win_buf, sems,
            *, pooled: int, sampling_ratio: int, h: int, w: int):
    i = pl.program_id(0)          # roi index
    ci = pl.program_id(1)         # channel block
    nc = pl.num_programs(1)
    ni = pl.num_programs(0)
    flat = i * nc + ci
    total = ni * nc
    slot = jax.lax.rem(flat, 2)
    nxt = jax.lax.rem(flat + 1, 2)

    def dma(fl, s):
        ri = fl // nc
        rc = jax.lax.rem(fl, nc)
        y0 = origins_ref[0, ri]
        # x (sublane dim of the HBM tiling) starts are pre-aligned to 8 by
        # the caller; the hint lets Mosaic prove slice validity.
        x0 = pl.multiple_of(origins_ref[1, ri], 8)
        c0 = pl.multiple_of(rc * CBLOCK, CBLOCK)
        return pltpu.make_async_copy(
            feat_hbm.at[pl.ds(y0, WINDOW), pl.ds(x0, WINDOW),
                        pl.ds(c0, CBLOCK)],
            win_buf.at[s],
            sems.at[s],
        )

    @pl.when(flat == 0)
    def _():
        dma(0, 0).start()

    @pl.when(flat + 1 < total)
    def _():
        dma(flat + 1, nxt).start()

    dma(flat, slot).wait()

    ps = pooled * sampling_ratio
    win2d = win_buf[slot].reshape(WINDOW, WINDOW * CBLOCK)
    ay = ay_ref[0]  # (ps, WINDOW)
    ax = ax_ref[0]
    t1 = jnp.dot(ay, win2d, preferred_element_type=jnp.float32)
    t1 = t1.reshape(ps, WINDOW, CBLOCK)
    # contract over the window-x axis: (ps_j, W) x (ps_i, W, c) -> (j, i, c)
    t2 = jax.lax.dot_general(ax, t1, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    t2 = t2.transpose(1, 0, 2)  # (i, j, c)
    s = sampling_ratio
    out = t2.reshape(pooled, s, pooled, s, CBLOCK).mean(axis=(1, 3))
    out_ref[0] = out


@functools.partial(jax.jit,
                   static_argnames=("spatial_scale", "pooled",
                                    "sampling_ratio", "interpret"))
def roi_align_pallas(feat: jnp.ndarray, rois: jnp.ndarray,
                     spatial_scale: float, pooled: int,
                     sampling_ratio: int = 2,
                     interpret: bool = False) -> jnp.ndarray:
    """Single-level Pallas RoIAlign, Caffe2 semantics (aligned=False).

    feat: (H, W, C) — C a multiple of 128 (bf16 or f32); rois: (N, 4)
    image-coord xyxy. Returns (N, pooled, pooled, C) float32.
    """
    h, w, c = feat.shape
    n = rois.shape[0]
    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    x2 = rois[:, 2] * spatial_scale
    y2 = rois[:, 3] * spatial_scale
    rw = jnp.maximum(x2 - x1, 1.0)
    rh = jnp.maximum(y2 - y1, 1.0)

    # Window origin: floor(start) - 1, clamped so the window stays in-map
    # (feature maps are padded-image /stride, always >= WINDOW for the
    # levels we target; callers pad smaller maps).
    oy = jnp.clip(jnp.floor(y1).astype(jnp.int32) - 1, 0,
                  max(h - WINDOW, 0))
    ox = jnp.clip(jnp.floor(x1).astype(jnp.int32) - 1, 0,
                  max(w - WINDOW, 0))
    # The W axis is the sublane dim of the (8, 128)-tiled HBM layout: DMA
    # slice starts must be 8-aligned. Floor-align (window retains >= 57px
    # of right coverage — in-spec FPN rois span < 50 feature px).
    ox = (ox // 8) * 8
    origins = jnp.stack([oy, ox], axis=0)

    ay = _interp_operator(y1, rh, h, oy, pooled, sampling_ratio)
    ax = _interp_operator(x1, rw, w, ox, pooled, sampling_ratio)
    ay = ay.astype(feat.dtype)
    ax = ax.astype(feat.dtype)

    ps = pooled * sampling_ratio
    assert c % CBLOCK == 0, f"C={c} must be a multiple of {CBLOCK}"
    nc = c // CBLOCK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, nc),
        in_specs=[
            pl.BlockSpec((1, ps, WINDOW), lambda i, ci, o: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ps, WINDOW), lambda i, ci, o: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # feat stays in HBM
        ],
        out_specs=pl.BlockSpec((1, pooled, pooled, CBLOCK),
                               lambda i, ci, o: (i, 0, 0, ci),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, WINDOW, WINDOW, CBLOCK), feat.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel, pooled=pooled,
                               sampling_ratio=sampling_ratio, h=h, w=w)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, pooled, pooled, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1.5 * (2 * WINDOW * WINDOW * CBLOCK
                                        * feat.dtype.itemsize
                                        + 2 * ps * WINDOW * 4
                                        + pooled * pooled * CBLOCK * 4)
                                 + 2 * 2**20),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * ps * WINDOW * c * (WINDOW + ps),
            bytes_accessed=n * WINDOW * WINDOW * c * feat.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(origins, ay, ax, feat)

    # Oversize guard (single-level C4 rois can span > WINDOW feature px,
    # e.g. stride-16 rois on 800-scale images): route such rois to the
    # exact XLA gather path. lax.cond keeps the fallback off the hot path
    # when every roi is in-spec (the overwhelmingly common case).
    oversize = (_window_exceeded(y1, rh, h, oy, pooled, sampling_ratio)
                | _window_exceeded(x1, rw, w, ox, pooled, sampling_ratio))

    def _fix(o):
        exact = roi_align(feat.astype(jnp.float32), rois, spatial_scale,
                          pooled, sampling_ratio)
        return jnp.where(oversize[:, None, None, None], exact, o)

    return jax.lax.cond(jnp.any(oversize), _fix, lambda o: o, out)


def _pyramid_kernel(meta_ref, ay_ref, ax_ref, f0, f1, f2, f3, out_ref,
                    win_buf, sems, *, pooled: int, sampling_ratio: int):
    """Multi-level kernel: per-roi level id selects which HBM ref to DMA.

    meta_ref (SMEM): (N, 3) int32 = (level_idx, y0, x0).
    """
    i = pl.program_id(0)
    ci = pl.program_id(1)
    nc = pl.num_programs(1)
    ni = pl.num_programs(0)
    flat = i * nc + ci
    total = ni * nc
    slot = jax.lax.rem(flat, 2)
    nxt = jax.lax.rem(flat + 1, 2)
    feats = (f0, f1, f2, f3)

    def start_dma(fl, s):
        ri = fl // nc
        rc = jax.lax.rem(fl, nc)
        lv = meta_ref[0, ri]
        y0 = meta_ref[1, ri]
        x0 = pl.multiple_of(meta_ref[2, ri], 8)
        c0 = pl.multiple_of(rc * CBLOCK, CBLOCK)
        for l, fref in enumerate(feats):
            @pl.when(lv == l)
            def _(fref=fref):
                pltpu.make_async_copy(
                    fref.at[pl.ds(y0, WINDOW), pl.ds(x0, WINDOW),
                            pl.ds(c0, CBLOCK)],
                    win_buf.at[s], sems.at[s]).start()

    def wait_dma(fl, s):
        ri = fl // nc
        rc = jax.lax.rem(fl, nc)
        lv = meta_ref[0, ri]
        y0 = meta_ref[1, ri]
        x0 = pl.multiple_of(meta_ref[2, ri], 8)
        c0 = pl.multiple_of(rc * CBLOCK, CBLOCK)
        for l, fref in enumerate(feats):
            @pl.when(lv == l)
            def _(fref=fref):
                pltpu.make_async_copy(
                    fref.at[pl.ds(y0, WINDOW), pl.ds(x0, WINDOW),
                            pl.ds(c0, CBLOCK)],
                    win_buf.at[s], sems.at[s]).wait()

    @pl.when(flat == 0)
    def _():
        start_dma(0, 0)

    @pl.when(flat + 1 < total)
    def _():
        start_dma(flat + 1, nxt)

    wait_dma(flat, slot)

    ps = pooled * sampling_ratio
    win2d = win_buf[slot].reshape(WINDOW, WINDOW * CBLOCK)
    t1 = jnp.dot(ay_ref[0], win2d, preferred_element_type=jnp.float32)
    t1 = t1.reshape(ps, WINDOW, CBLOCK)
    t2 = jax.lax.dot_general(ax_ref[0], t1, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    t2 = t2.transpose(1, 0, 2)
    s = sampling_ratio
    out_ref[0] = t2.reshape(pooled, s, pooled, s, CBLOCK).mean(axis=(1, 3))


def roi_align_pyramid_pallas(feats, rois: jnp.ndarray, strides,
                             k_min: int, k_max: int, pooled: int,
                             sampling_ratio: int = 2,
                             canonical_scale: int = 224,
                             canonical_level: int = 4,
                             interpret: bool = False) -> jnp.ndarray:
    """FPN RoIAlign: ONE kernel, one window DMA per roi from its assigned
    level (predicated DMA source selection — the reference's host-side
    level distribution, collect_and_distribute_fpn_rpn_proposals.py,
    becomes a per-roi branch in the kernel).

    feats: exactly 4 levels (pad the list if fewer), same C (mult of 128).
    BATCHED mode: pass feats as (B, h_l, w_l, C) and rois as (B, R, 4) —
    each level is viewed as a vertically-stacked (B*h_l, w_l, C) atlas and
    per-roi window origins get a +i*h_l image offset, so the whole batch is
    ONE kernel launch.
    """
    from ..roi_align import fpn_level_assignment, roi_align_pyramid

    assert len(feats) == 4, "pyramid kernel expects 4 levels"
    orig_feats = list(feats)  # pre-padding, for the oversize fallback
    batched = rois.ndim == 3
    if batched:
        b, r = rois.shape[:2]
        img_idx = jnp.repeat(jnp.arange(b), r)
        rois = rois.reshape(b * r, 4)
    else:
        img_idx = None
    c = feats[0].shape[-1]
    n = rois.shape[0]
    levels = fpn_level_assignment(rois, k_min, k_max, canonical_scale,
                                  canonical_level)
    li = levels - k_min
    scales = jnp.asarray([1.0 / s for s in strides], jnp.float32)[li]
    # True dims drive the interpolation weights (zero-pad semantics)...
    hdim = 1 if batched else 0
    hs = jnp.asarray([f.shape[hdim] for f in feats])[li]
    ws = jnp.asarray([f.shape[hdim + 1] for f in feats])[li]
    # ...while small top levels are zero-padded so the fixed window DMA
    # stays in bounds (padded texels carry zero interp weight).
    pad_cfg = (lambda f: ((0, 0), (0, max(WINDOW - f.shape[1], 0)),
                          (0, max(WINDOW - f.shape[2], 0)), (0, 0))) \
        if batched else \
        (lambda f: ((0, max(WINDOW - f.shape[0], 0)),
                    (0, max(WINDOW - f.shape[1], 0)), (0, 0)))
    feats = [jnp.pad(f, pad_cfg(f))
             if (f.shape[hdim] < WINDOW or f.shape[hdim + 1] < WINDOW)
             else f for f in feats]
    hs_img = jnp.asarray([f.shape[hdim] for f in feats])  # per level
    hs_pad = hs_img[li]
    ws_pad = jnp.asarray([f.shape[hdim + 1] for f in feats])[li]
    if batched:
        # Flatten batch into the vertical axis of each level.
        feats = [f.reshape(-1, f.shape[2], f.shape[3]) for f in feats]

    x1 = rois[:, 0] * scales
    y1 = rois[:, 1] * scales
    x2 = rois[:, 2] * scales
    y2 = rois[:, 3] * scales
    rw = jnp.maximum(x2 - x1, 1.0)
    rh = jnp.maximum(y2 - y1, 1.0)

    oy = jnp.clip(jnp.floor(y1).astype(jnp.int32) - 1, 0,
                  jnp.maximum(hs_pad - WINDOW, 0))
    ox = jnp.clip(jnp.floor(x1).astype(jnp.int32) - 1, 0,
                  jnp.maximum(ws_pad - WINDOW, 0))
    ox = (ox // 8) * 8
    oy_dma = oy if not batched else oy + img_idx * hs_img[li]
    meta = jnp.stack([li, oy_dma, ox], axis=0).astype(jnp.int32)

    ay = _interp_operator(y1, rh, hs[:, None].astype(jnp.float32), oy,
                          pooled, sampling_ratio).astype(feats[0].dtype)
    ax = _interp_operator(x1, rw, ws[:, None].astype(jnp.float32), ox,
                          pooled, sampling_ratio).astype(feats[0].dtype)

    ps = pooled * sampling_ratio
    assert c % CBLOCK == 0
    nc = c // CBLOCK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, nc),
        in_specs=[
            pl.BlockSpec((1, ps, WINDOW), lambda i, ci, m: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ps, WINDOW), lambda i, ci, m: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, pooled, pooled, CBLOCK),
                               lambda i, ci, m: (i, 0, 0, ci),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, WINDOW, WINDOW, CBLOCK), feats[0].dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_pyramid_kernel, pooled=pooled,
                               sampling_ratio=sampling_ratio)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, pooled, pooled, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1.5 * (2 * WINDOW * WINDOW * CBLOCK
                                        * feats[0].dtype.itemsize
                                        + 2 * ps * WINDOW * 4
                                        + pooled * pooled * CBLOCK * 4)
                                 + 2 * 2**20),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * ps * WINDOW * c * (WINDOW + ps),
            bytes_accessed=n * WINDOW * WINDOW * c
            * feats[0].dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(meta, ay, ax, *feats)

    # Oversize guard: FPN level assignment bounds sqrt(wh)/2^k to < 28, but
    # extreme aspect ratios can still push one axis past WINDOW — detect
    # with the same condition the clamp uses and fall back to the exact
    # XLA pyramid for those rois only.
    hs_f = hs[:, None].astype(jnp.float32)
    ws_f = ws[:, None].astype(jnp.float32)
    oversize = (_window_exceeded(y1, rh, hs_f, oy, pooled, sampling_ratio)
                | _window_exceeded(x1, rw, ws_f, ox, pooled,
                                   sampling_ratio))

    def _fix(o):
        if batched:
            exact = jax.vmap(lambda fs, bx: roi_align_pyramid(
                [f.astype(jnp.float32) for f in fs], bx, strides, k_min,
                k_max, pooled, sampling_ratio, canonical_scale,
                canonical_level))(tuple(orig_feats), rois.reshape(b, r, 4))
            exact = exact.reshape(n, pooled, pooled, c)
        else:
            exact = roi_align_pyramid(
                [f.astype(jnp.float32) for f in orig_feats], rois, strides,
                k_min, k_max, pooled, sampling_ratio, canonical_scale,
                canonical_level)
        return jnp.where(oversize[:, None, None, None], exact, o)

    out = jax.lax.cond(jnp.any(oversize), _fix, lambda o: o, out)
    if batched:
        return out.reshape(b, r, pooled, pooled, c)
    return out
