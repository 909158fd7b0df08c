"""Pallas TPU RoIAlign — windowed DMA + separable MXU matmuls.

The TPU-native replacement for the reference's CUDA RoIAlign kernels
(reference: lib/model/roi_align/src/roi_align_kernel.cu ~450 LoC,
one-thread-per-output-element bilinear gather). Mandated as a Pallas kernel
by BASELINE.json north_star.

Design (why this is NOT a gather kernel):
  * FPN level assignment bounds every RoI's *feature-space* footprint:
    level k gets sqrt(wh)/2^k in [14, 28), so typical RoIs fit inside a
    fixed (WY x WX) feature window at their assigned level.
  * RoIAlign is bilinear resampling on an axis-aligned grid => SEPARABLE.
    For each RoI we precompute thin interpolation operators
    Ay: (P, WY), Ax: (P, WX) — bilinear weight pairs, zero rows for
    out-of-image samples — in plain jnp (same math as ops/roi_align.py, so
    semantics stay testable outside the kernel). The sampling-ratio
    average pool is LINEAR and separable, so it is folded into the
    operators (Ay' = Pool @ Ay), which shrinks the in-kernel matmuls and
    removes all pooling reshapes.
  * The kernel is: pipelined async DMA of each RoI's window (HBM -> VMEM,
    4 deep) overlapped with two small matmuls on the MXU:

        out_n = Ay'_n @ window_n @ Ax'_n^T

    expressed as dot_generals whose contraction axis is the rhs SUBLANE
    dim at every step — the natural MXU layout — so Mosaic emits zero
    vector relayouts. No gathers, no scatter, no scalar loops — the
    irregular memory access is reduced to ONE strided DMA per RoI.
  * Multi-level: all pyramid levels are concatenated row-wise into ONE
    x-padded HBM atlas, and each RoI's window origin is a GLOBAL atlas
    row (level offset + image offset + local row). The kernel therefore
    has a single unpredicated DMA source — an earlier draft selected one
    of 4 level refs with @pl.when branches, which cost ~9 us/roi in
    scalar-core predication; the atlas removes that entirely (measured
    2.6 us/roi end-to-end, ~8x over the predicated kernel).
  * Out-of-window RoIs (extreme aspect ratios): the rw*rh < 28^2 level-
    assignment invariant means a roi exceeding the main window on one
    axis is SHORT on the other, so outliers are compacted into fixed-cap
    buckets and recomputed by the SAME kernel with class-shaped windows —
    wide rois get (24, full-atlas-width), tall rois (tallest-band, 32) —
    each pass gated by lax.cond on its count. Only bucket overflow or an
    invariant-violating exotic config reaches the exact-gather fallback.

The backward pass: XLA's scatter-add VJP of the jnp path is only used in
training (workload 4, batch-bound), so the VJP defaults to the jnp
reference implementation for exactness; the Pallas path serves the
inference hot loop.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..roi_align import (_bilinear_1d, _sample_coords_1d,
                         fpn_level_assignment, roi_align, roi_align_pyramid)

WINDOW = 64           # single-level (C4) window: stride-16 rois span more
PYRAMID_WY = 40       # rh + ~3 slack  <= 40 covers aspect <= ~1.75 at max
PYRAMID_WX = 48       # rw + ~11 slack <= 48 (8-aligned origin) likewise
CBLOCK = 128          # lane-dim block; doubled to 256 when C allows
DEPTH = 4             # DMA pipeline depth


def _interp_operator(lo: jnp.ndarray, size: jnp.ndarray, dim: int,
                     origin: jnp.ndarray, pooled: int,
                     sampling_ratio: int, window: int) -> jnp.ndarray:
    """Per-roi thin interpolation matrix A: (P, window), window-relative,
    with the sampling-ratio average pool already folded in (the pool is
    linear and separable, so out = (P@Ay) win (P@Ax)^T exactly).

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
    c0 = jnp.clip(i0 - origin[:, None], 0, window - 1)
    c1 = jnp.clip(i1 - origin[:, None], 0, window - 1)
    cols = jnp.arange(window)[None, None, :]
    a = (jnp.where(cols == c0[:, :, None], w0[:, :, None], 0.0)
         + jnp.where(cols == c1[:, :, None], w1[:, :, None], 0.0))
    n = a.shape[0]
    # fold avg pool over each pooled cell's s samples: (N, P*s, W)->(N, P, W)
    return a.reshape(n, pooled, sampling_ratio, window).mean(axis=2)


def _window_exceeded(lo: jnp.ndarray, size: jnp.ndarray, dim,
                     origin: jnp.ndarray, pooled: int,
                     sampling_ratio: int, window: int) -> jnp.ndarray:
    """(N,) bool: does any in-image sample of this RoI fall outside its
    window? Mirrors _interp_operator's clamp condition exactly — True
    means the clamped kernel output would be silently wrong for this RoI
    and the caller must route it to the exact XLA path."""
    coords = _sample_coords_1d(lo, size, pooled, sampling_ratio)
    i0, i1, w0, w1, inside = _bilinear_1d(coords, dim)
    c0 = i0 - origin[:, None]
    c1 = i1 - origin[:, None]
    bad0 = inside & (w0 > 0) & ((c0 < 0) | (c0 > window - 1))
    bad1 = inside & (w1 > 0) & ((c1 < 0) | (c1 > window - 1))
    return (bad0 | bad1).any(axis=1)


def _ychunk_pad(wy: int, itemsize: int) -> int:
    """Rows the kernel may DMA for a window of wy rows: tall windows are
    y-chunked (see _kernel_ychunk) and read up to nyc*chunk rows — callers
    must pad their HBM source to cover this overscan."""
    if wy * itemsize > 352:
        ch = 112 if itemsize == 2 else 56
        return -(-wy // ch) * ch
    return wy


def _pick_cblock(c: int, dtype, cap: int = 256) -> int:
    """Lane-dim block: 256 lanes only when 2-byte features keep the window
    scratch at 512 B/texel — for 4-byte dtypes 128 lanes hold the same byte
    budget, so VMEM sizing (and the window-growth guard) is dtype-invariant
    (ADVICE r2: the old 256-lane pick undersized VMEM 2x for float32).
    `cap` lets wide-window passes halve the block: the aspect-outlier
    passes DMA (24, atlas_width) windows, whose Mosaic scoped-vmem demand
    at 800-scale geometry (aw=352) exceeds the 16 MB stack limit at 256
    lanes (measured 20.3 MB on-chip) but fits at 128."""
    if cap >= 256 and c % 256 == 0 and jnp.dtype(dtype).itemsize == 2:
        return 256
    return CBLOCK


def _kernel(origins_ref, ay_ref, ax_ref, feat_hbm, out_ref, win_buf, sems,
            *, wy: int, wx: int, cblock: int, depth: int):
    """One RoI per grid step: pipelined window DMA + two dot_generals.

    out = ay @ win @ ax^T with contractions over the rhs sublane dim
    (batch dim outer) — the layouts Mosaic lowers without relayouts.
    """
    i = pl.program_id(0)          # roi index
    ci = pl.program_id(1)         # channel block
    nc = pl.num_programs(1)
    ni = pl.num_programs(0)
    flat = i * nc + ci
    total = ni * nc
    slot = jax.lax.rem(flat, depth)

    def dma(fl, s):
        ri = fl // nc
        rc = jax.lax.rem(fl, nc)
        y0 = origins_ref[0, ri]
        # x (sublane dim of the HBM tiling) starts are pre-aligned to 8 by
        # the caller; the hint lets Mosaic prove slice validity.
        x0 = pl.multiple_of(origins_ref[1, ri], 8)
        c0 = pl.multiple_of(rc * cblock, cblock)
        return pltpu.make_async_copy(
            feat_hbm.at[pl.ds(y0, wy), pl.ds(x0, wx), pl.ds(c0, cblock)],
            win_buf.at[s],
            sems.at[s],
        )

    @pl.when(flat == 0)
    def _():
        for d in range(depth - 1):
            @pl.when(d < total)
            def _(d=d):
                dma(d, d).start()

    @pl.when(flat + depth - 1 < total)
    def _():
        dma(flat + depth - 1, jax.lax.rem(flat + depth - 1, depth)).start()

    dma(flat, slot).wait()

    win = win_buf[slot]           # (wy, wx, cblock)
    # (P_j, wx) x (wy, wx, C) -> (P_j, wy, C): contraction over sublane dim
    s1 = jax.lax.dot_general(ax_ref[0], win, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # (P_i, wy) x (P_j, wy, C) -> (P_i, P_j, C)
    t2 = jax.lax.dot_general(ay_ref[0], s1.astype(ax_ref.dtype),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    out_ref[0] = t2.astype(out_ref.dtype)


def _kernel_ychunk(origins_ref, ay_ref, ax_ref, feat_hbm, out_ref, win_buf,
                   acc, sems, *, wy_chunk: int, wx: int, cblock: int,
                   depth: int, nyc: int):
    """Y-chunked variant: out = sum_yc Ay[:, yc] @ win[yc] @ Ax^T.

    Very tall windows (a full 208-row P2 band at 800 scale) exceed
    Mosaic's ~16 MB scoped-vmem stack even at depth 1 (measured 16.16 MB
    for (208, 32); (176, 32) fits) — the separable interp is linear in
    the window rows, so the window is streamed in row chunks with an f32
    accumulator. Grid (n, nc, nyc), yc fastest => the accumulator and
    out block stay resident across a roi's chunks."""
    i = pl.program_id(0)
    ci = pl.program_id(1)
    yc = pl.program_id(2)
    ni, nc = pl.num_programs(0), pl.num_programs(1)
    flat = (i * nc + ci) * nyc + yc
    total = ni * nc * nyc
    slot = jax.lax.rem(flat, depth)

    def dma(fl, s):
        ri = fl // (nc * nyc)
        rest = jax.lax.rem(fl, nc * nyc)
        rc = rest // nyc
        ryc = jax.lax.rem(rest, nyc)
        y0 = origins_ref[0, ri] + ryc * wy_chunk
        x0 = pl.multiple_of(origins_ref[1, ri], 8)
        c0 = pl.multiple_of(rc * cblock, cblock)
        return pltpu.make_async_copy(
            feat_hbm.at[pl.ds(y0, wy_chunk), pl.ds(x0, wx),
                        pl.ds(c0, cblock)],
            win_buf.at[s],
            sems.at[s],
        )

    @pl.when(flat == 0)
    def _():
        for d in range(depth - 1):
            @pl.when(d < total)
            def _(d=d):
                dma(d, d).start()

    @pl.when(flat + depth - 1 < total)
    def _():
        dma(flat + depth - 1, jax.lax.rem(flat + depth - 1, depth)).start()

    dma(flat, slot).wait()

    win = win_buf[slot]           # (wy_chunk, wx, cblock)
    s1 = jax.lax.dot_general(ax_ref[0], win, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # ay arrives TRANSPOSED per chunk — (chunk, P) — because a (P, chunk)
    # lane-dim block would need chunk % 128 == 0; as the sublane dim the
    # chunk only needs % 8. Contraction stays on sublane dims throughout.
    t2 = jax.lax.dot_general(ay_ref[0, 0], s1.astype(ax_ref.dtype),
                             (((0,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)

    @pl.when(yc == 0)
    def _():
        acc[...] = t2

    @pl.when(yc > 0)
    def _():
        acc[...] += t2

    @pl.when(yc == nyc - 1)
    def _():
        out_ref[0] = acc[...].astype(out_ref.dtype)


def _run_ychunk_kernel(origins, ay, ax, atlas, pooled: int, wy: int,
                       wx: int, interpret: bool, out_dtype, depth: int,
                       cblock: int, wy_chunk: int) -> jnp.ndarray:
    """Chunked launcher: pads Ay to nyc*wy_chunk zero columns (zero rows
    of the window read past the band get zero weight — the caller's atlas
    end pad must cover wy_pad rows past any origin)."""
    n = ay.shape[0]
    c = atlas.shape[-1]
    nc = c // cblock
    nyc = -(-wy // wy_chunk)
    wy_pad = nyc * wy_chunk
    if wy_pad != wy:
        ay = jnp.pad(ay, ((0, 0), (0, 0), (0, wy_pad - wy)))
    # (N, P, nyc*chunk) -> (N, nyc, chunk, P): chunk as SUBLANE dim (a
    # lane-dim block of `chunk` would need chunk % 128 == 0 on TPU).
    ay_t = ay.reshape(n, pooled, nyc, wy_chunk).transpose(0, 2, 3, 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, nc, nyc),
        in_specs=[
            pl.BlockSpec((1, 1, wy_chunk, pooled),
                         lambda i, ci, yc, o: (i, yc, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pooled, wx), lambda i, ci, yc, o: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, pooled, pooled, cblock),
                               lambda i, ci, yc, o: (i, 0, 0, ci),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((depth, wy_chunk, wx, cblock), atlas.dtype),
            pltpu.VMEM((pooled, pooled, cblock), jnp.float32),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
    )
    kernel = functools.partial(_kernel_ychunk, wy_chunk=wy_chunk, wx=wx,
                               cblock=cblock, depth=depth, nyc=nyc)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, pooled, pooled, c), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=16 * 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * pooled * c * wy_pad * (wx + pooled),
            bytes_accessed=n * wy_pad * wx * c * atlas.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(origins, ay_t, ax, atlas)


def _run_window_kernel(origins, ay, ax, atlas, pooled: int, wy: int,
                       wx: int, interpret: bool,
                       out_dtype=jnp.float32,
                       depth: int = DEPTH,
                       cblock_cap: int = 256) -> jnp.ndarray:
    """Invoke the window kernel: origins (2, N) int32 global (row, col);
    ay (N, P, wy), ax (N, P, wx) in atlas dtype; atlas (H, W, C).

    out_dtype: the aspect-outlier passes emit bf16 — XLA stack-allocates
    cond-branch pallas outputs in scoped vmem (~18 MB), and the compute
    dtype downstream is bf16 anyway."""
    n = ay.shape[0]
    c = atlas.shape[-1]
    cblock = _pick_cblock(c, atlas.dtype, cblock_cap)
    assert c % cblock == 0, f"C={c} must be a multiple of {cblock}"
    nc = c // cblock
    # Very tall windows blow Mosaic's scoped-vmem stack (measured: a
    # (208, 32) bf16 window demands 16.16 MB at depth 1; (176, 32) fits)
    # — stream them in row chunks with f32 accumulation instead.
    itemsize = jnp.dtype(atlas.dtype).itemsize
    if wy * itemsize > 352:
        wy_chunk = 112 if itemsize == 2 else 56
        return _run_ychunk_kernel(origins, ay, ax, atlas, pooled, wy, wx,
                                  interpret, out_dtype, min(depth, 2),
                                  cblock, wy_chunk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, nc),
        in_specs=[
            pl.BlockSpec((1, pooled, wy), lambda i, ci, o: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pooled, wx), lambda i, ci, o: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # atlas stays in HBM
        ],
        out_specs=pl.BlockSpec((1, pooled, pooled, cblock),
                               lambda i, ci, o: (i, 0, 0, ci),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((depth, wy, wx, cblock), atlas.dtype),
            pltpu.SemaphoreType.DMA((depth,)),
        ],
    )
    kernel = functools.partial(_kernel, wy=wy, wx=wx, cblock=cblock,
                               depth=depth)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, pooled, pooled, c), out_dtype),
        compiler_params=pltpu.CompilerParams(
            # 16 MB flat: must cover Mosaic's real demand (~13 MB for the
            # widest pass windows) while staying under the ~17.8 MB
            # scoped-vmem stack cap XLA applies to pallas calls inside
            # lax.cond branches.
            vmem_limit_bytes=16 * 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * pooled * c * wy * (wx + pooled),
            bytes_accessed=n * wy * wx * c * atlas.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(origins, ay, ax, atlas)


@functools.partial(jax.jit,
                   static_argnames=("spatial_scale", "pooled",
                                    "sampling_ratio", "interpret", "window"))
def roi_align_pallas(feat: jnp.ndarray, rois: jnp.ndarray,
                     spatial_scale: float, pooled: int,
                     sampling_ratio: int = 2,
                     interpret: bool = False,
                     window: int = WINDOW) -> jnp.ndarray:
    """Single-level Pallas RoIAlign, Caffe2 semantics (aligned=False).

    feat: (H, W, C) — C a multiple of 128 (bf16 or f32); rois: (N, 4)
    image-coord xyxy. Returns (N, pooled, pooled, C) float32.
    """
    h, w, c = feat.shape
    # Grow the window to cover the whole map when that stays cheap: a
    # whole-image roi (the most common large box) then never triggers the
    # fallback — at 800 scale the C4 map is 52x88, past the default 64.
    need = -(-max(h, w) // 8) * 8
    cb = _pick_cblock(c, feat.dtype)
    if (need > window
            and 2 * need * need * cb * feat.dtype.itemsize <= 14 * 2**20):
        window = need
    depth = 2 if window > 64 else DEPTH
    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    x2 = rois[:, 2] * spatial_scale
    y2 = rois[:, 3] * spatial_scale
    rw = jnp.maximum(x2 - x1, 1.0)
    rh = jnp.maximum(y2 - y1, 1.0)

    # Window origin: floor(start) - 1, clamped so the window stays in-map;
    # callers' maps smaller than the window are padded below. Tall grown
    # windows run y-chunked, whose DMA overscans past the window — pad
    # extra zero rows to cover it.
    pady = max(window - h, 0)
    padx = max(window - w, 0)
    oy_max = max(h + pady - window, 0)
    ox_max = max(w + padx - window, 0)
    overscan = max(oy_max + _ychunk_pad(window, feat.dtype.itemsize)
                   - (h + pady), 0)
    if pady or padx or overscan:
        feat = jnp.pad(feat, ((0, pady + overscan), (0, padx), (0, 0)))
    oy = jnp.clip(jnp.floor(y1).astype(jnp.int32) - 1, 0, oy_max)
    ox = jnp.clip(jnp.floor(x1).astype(jnp.int32) - 1, 0, ox_max)
    # The W axis is the sublane dim of the (8, 128)-tiled HBM layout: DMA
    # slice starts must be 8-aligned; floor-align costs <= 7 px of window.
    ox = (ox // 8) * 8
    origins = jnp.stack([oy, ox], axis=0)

    ay = _interp_operator(y1, rh, h, oy, pooled, sampling_ratio, window)
    ax = _interp_operator(x1, rw, w, ox, pooled, sampling_ratio, window)

    out = _run_window_kernel(origins, ay.astype(feat.dtype),
                             ax.astype(feat.dtype), feat, pooled,
                             window, window, interpret, depth=depth)

    # Oversize guard (single-level C4 rois can span > window feature px,
    # e.g. stride-16 rois on 800-scale images): route such rois to the
    # exact XLA gather path. lax.cond keeps the fallback off the hot path
    # when every roi is in-spec (the overwhelmingly common case).
    oversize = (_window_exceeded(y1, rh, h, oy, pooled, sampling_ratio,
                                 window)
                | _window_exceeded(x1, rw, w, ox, pooled, sampling_ratio,
                                   window))

    feat_t = feat[:h, :w]

    def _fix(o):
        exact = roi_align(feat_t.astype(jnp.float32), rois, spatial_scale,
                          pooled, sampling_ratio)
        return jnp.where(oversize[:, None, None, None], exact, o)

    return jax.lax.cond(jnp.any(oversize), _fix, lambda o: o, out)


def roi_align_pyramid_pallas(feats, rois: jnp.ndarray, strides,
                             k_min: int, k_max: int, pooled: int,
                             sampling_ratio: int = 2,
                             canonical_scale: int = 224,
                             canonical_level: int = 4,
                             interpret: bool = False,
                             wy: int = PYRAMID_WY,
                             wx: int = PYRAMID_WX) -> jnp.ndarray:
    """FPN RoIAlign: ONE kernel over ONE row-concatenated level atlas —
    the reference's host-side level distribution
    (collect_and_distribute_fpn_rpn_proposals.py) becomes per-roi window
    origins into the atlas; the kernel itself is level-oblivious.

    feats: exactly 4 levels, same C (mult of 128). BATCHED mode: pass
    feats as (B, h_l, w_l, C) and rois as (B, R, 4) — per-roi origins get
    level + image row offsets, so the whole batch is ONE kernel launch.
    """
    assert len(feats) == 4, "pyramid kernel expects 4 levels"
    batched = rois.ndim == 3
    if batched:
        b, r = rois.shape[:2]
        img_idx = jnp.repeat(jnp.arange(b), r)
        rois_flat = rois.reshape(b * r, 4)
    else:
        b = 1
        img_idx = jnp.zeros((rois.shape[0],), jnp.int32)
        rois_flat = rois
        feats = [f[None] for f in feats]

    c = feats[0].shape[-1]
    n = rois_flat.shape[0]
    levels = fpn_level_assignment(rois_flat, k_min, k_max, canonical_scale,
                                  canonical_level)
    li = levels - k_min
    scales = jnp.asarray([1.0 / s for s in strides], jnp.float32)[li]
    # True per-level dims drive interpolation weights (zero-pad semantics).
    hs_lvl = np.asarray([f.shape[1] for f in feats])
    ws_lvl = np.asarray([f.shape[2] for f in feats])
    hs = jnp.asarray(hs_lvl)[li]
    ws = jnp.asarray(ws_lvl)[li]

    def _rup8(v: int) -> int:
        return -(-int(v) // 8) * 8

    # The main window must cover the k_max band: rois CLAMPED to the top
    # level escape the rw*rh < 28^2 invariant, but their span is bounded
    # by the band itself (a whole-image box at 800 scale spans 26x44 at
    # P5) — so grow the main window to band + origin slack when needed.
    wy = max(wy, _rup8(hs_lvl[-1] + 4))
    wx = max(wx, _rup8(ws_lvl[-1] + 12))
    # Atlas width AFTER growing wx (ADVICE r2: pre-growth aw could leave
    # the atlas narrower than the main window for exotic pyramids, letting
    # window DMAs run past the x extent).
    aw = _rup8(max(int(ws_lvl.max()), wx))
    # Window shapes for the aspect-outlier passes (see below). At interior
    # levels the invariant holds, so a roi exceeding the main window on
    # one axis is SHORT on the other: wide rois (rw > wx-11) have
    # rh < 22 and fit (24, full-atlas-width); tall rois have rw < 22 and
    # fit (finest-band-height, 32) — a 1-px-wide image-height sliver at
    # level 2 spans the full P2 band, so no fixed cap on wy_tall.
    wy_wide, wx_wide = 24, aw
    wy_tall = _rup8(int(hs_lvl.max()))
    wx_tall = 32

    # End pad covers the y-chunk-padded window height (chunked tall
    # windows DMA up to nyc*wy_chunk rows past their origin).
    isz = jnp.dtype(feats[0].dtype).itemsize
    end_pad = max(_ychunk_pad(wy, isz), _ychunk_pad(wy_tall, isz))
    atlas_parts = [
        jnp.pad(f, ((0, 0), (0, 0), (0, aw - f.shape[2]), (0, 0)))
        .reshape(-1, aw, f.shape[3]) for f in feats
    ]
    atlas = jnp.concatenate(
        atlas_parts + [jnp.zeros((end_pad, aw, c), feats[0].dtype)], axis=0)
    # global row offset of (level, image) band: levels stacked in order,
    # each level contributing b * h_l rows.
    lvl_row0 = np.concatenate([[0], np.cumsum(b * hs_lvl)[:-1]])
    band0 = jnp.asarray(lvl_row0)[li] + img_idx * hs

    x1 = rois_flat[:, 0] * scales
    y1 = rois_flat[:, 1] * scales
    x2 = rois_flat[:, 2] * scales
    y2 = rois_flat[:, 3] * scales
    rw = jnp.maximum(x2 - x1, 1.0)
    rh = jnp.maximum(y2 - y1, 1.0)

    # local origins (image-band relative), clamped into the band where the
    # band is tall/wide enough; shorter bands start at 0 and the window
    # reads into the next band — harmless, those texels get zero weight.
    oy = jnp.clip(jnp.floor(y1).astype(jnp.int32) - 1, 0,
                  jnp.maximum(hs - wy, 0))
    ox = jnp.clip(jnp.floor(x1).astype(jnp.int32) - 1, 0,
                  jnp.maximum(ws - wx, 0))
    ox = (ox // 8) * 8
    origins = jnp.stack([band0 + oy, ox], axis=0).astype(jnp.int32)

    hs_f = hs[:, None].astype(jnp.float32)
    ws_f = ws[:, None].astype(jnp.float32)
    ay = _interp_operator(y1, rh, hs_f, oy, pooled, sampling_ratio,
                          wy).astype(atlas.dtype)
    ax = _interp_operator(x1, rw, ws_f, ox, pooled, sampling_ratio,
                          wx).astype(atlas.dtype)

    out = _run_window_kernel(origins, ay, ax, atlas, pooled, wy, wx,
                             interpret)

    # --- aspect outliers. The main window covers every roi whose span+
    # slack fits (wy, wx); rois past the window on one axis are compacted
    # into fixed-cap buckets and recomputed by the SAME kernel with a
    # window shaped for that class (wide: short + full atlas width; tall:
    # tallest band + narrow). An earlier draft rerouted them through the
    # exact XLA gather path, which cost ~76 ms whenever any outlier
    # existed — real detectors emit wide boxes (trains, skis) every batch.
    x_bad = _window_exceeded(x1, rw, ws_f, ox, pooled, sampling_ratio, wx)
    y_bad = _window_exceeded(y1, rh, hs_f, oy, pooled, sampling_ratio, wy)
    wide = x_bad
    tall = y_bad & ~x_bad  # disjoint: rw*rh bound => never both huge

    def _pass_local_origins(idx, wy_p, wx_p):
        oy_p = jnp.clip(jnp.floor(y1[idx]).astype(jnp.int32) - 1, 0,
                        jnp.maximum(hs[idx] - wy_p, 0))
        ox_p = jnp.clip(jnp.floor(x1[idx]).astype(jnp.int32) - 1, 0,
                        jnp.maximum(ws[idx] - wx_p, 0))
        return oy_p, (ox_p // 8) * 8

    def _make_pass(flag, cap, wy_p, wx_p):
        def fix(o):
            idx = jnp.argsort(~flag)[:cap]
            sel = flag[idx]
            oy_p, ox_p = _pass_local_origins(idx, wy_p, wx_p)
            org = jnp.stack([band0[idx] + oy_p, ox_p], 0).astype(jnp.int32)
            hf = hs[idx][:, None].astype(jnp.float32)
            wf = ws[idx][:, None].astype(jnp.float32)
            ay_p = _interp_operator(y1[idx], rh[idx], hf, oy_p, pooled,
                                    sampling_ratio,
                                    wy_p).astype(atlas.dtype)
            ax_p = _interp_operator(x1[idx], rw[idx], wf, ox_p, pooled,
                                    sampling_ratio,
                                    wx_p).astype(atlas.dtype)
            op = _run_window_kernel(org, ay_p, ax_p, atlas, pooled, wy_p,
                                    wx_p, interpret,
                                    out_dtype=atlas.dtype, depth=2,
                                    cblock_cap=128)
            return o.at[idx].set(
                jnp.where(sel[:, None, None, None],
                          op.astype(o.dtype), o[idx]))
        return fix

    cnt_w = jnp.sum(wide)
    cnt_t = jnp.sum(tall)
    # two wide tiers: a small one for the common few-outliers case, a big
    # one so even untrained-RPN floods (30%+ wide boxes) never hit the
    # full fallback. One flat lax.switch — nesting conds compounds XLA's
    # scoped-vmem stack accounting for the branch pallas outputs.
    capw1, capw2 = min(256, n), min(1536, n)
    cap_t = min(384, n)
    tier_w = jnp.where(
        cnt_w == 0, 0,
        jnp.where(cnt_w <= capw1, 1, jnp.where(cnt_w <= capw2, 2, 0)))
    out = jax.lax.switch(
        tier_w,
        [lambda o: o,
         _make_pass(wide, capw1, wy_wide, wx_wide),
         _make_pass(wide, capw2, wy_wide, wx_wide)],
        out)
    out = jax.lax.cond((cnt_t > 0) & (cnt_t <= cap_t),
                       _make_pass(tall, cap_t, wy_tall, wx_tall),
                       lambda o: o, out)

    # --- guaranteed-exact fallback for anything the passes could not
    # cover (bucket overflow, or exotic configs violating the rw*rh
    # bound): per-image vmap of the exact XLA gather path. (ADVICE r2: an
    # earlier draft stacked images into bands and y-shifted the rois, but
    # the gather clamps against the STACKED height, so bottom-edge rois of
    # non-last images blended the next image's first row — vmap keeps each
    # image's clamp exact.)
    def _exceeds(flag, wy_p, wx_p):
        oy_p, ox_p = _pass_local_origins(jnp.arange(n), wy_p, wx_p)
        bad = (_window_exceeded(y1, rh, hs_f, oy_p, pooled,
                                sampling_ratio, wy_p)
               | _window_exceeded(x1, rw, ws_f, ox_p, pooled,
                                  sampling_ratio, wx_p))
        return flag & bad

    oversize = x_bad | y_bad
    residual = ((cnt_w > capw2) | (cnt_t > cap_t)
                | jnp.any(_exceeds(wide, wy_wide, wx_wide))
                | jnp.any(_exceeds(tall, wy_tall, wx_tall)))
    feats_f32 = tuple(f.astype(jnp.float32) for f in feats)

    def _fix_all(o):
        def per_image(fs, rr):
            return roi_align_pyramid(
                list(fs), rr, strides, k_min, k_max, pooled,
                sampling_ratio, canonical_scale, canonical_level)

        exact = jax.vmap(per_image)(
            feats_f32, rois_flat.reshape(b, -1, 4)
        ).reshape(n, pooled, pooled, c)
        return jnp.where(oversize[:, None, None, None], exact, o)

    out = jax.lax.cond(residual, _fix_all, lambda o: o, out)
    if batched:
        return out.reshape(b, r, pooled, pooled, c)
    return out


# ------------------------------------------------------------------ autodiff
#
# The window kernels are forward-only (pallas_call has no JVP rule), but
# workload 4 trains THROUGH RoIAlign (reference: roi_align_kernel.cu has a
# dedicated backward kernel, SURVEY.md §2.1). Instead of a hand-written
# scatter-add backward kernel, the custom_vjp below differentiates the
# exact jnp implementation (ops/roi_align.py) in the backward pass: the
# Pallas forward and the exact forward agree to float tolerance, so the
# exact VJP *is* the right cotangent, and XLA's gather transpose becomes
# the scatter-add the CUDA backward hand-rolled. RoIs get zero gradient
# (reference semantics: boxes are inputs, never differentiated).

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def roi_align_pyramid_pallas_ad(feats, rois, strides, k_min, k_max,
                                pooled, sampling_ratio, canonical_scale,
                                canonical_level, interpret):
    """Differentiable batched pyramid RoIAlign: Pallas forward, exact-jnp
    backward. feats: tuple of 4 (B, h_l, w_l, C) maps; rois: (B, R, 4)."""
    return roi_align_pyramid_pallas(
        list(feats), rois, list(strides), k_min, k_max, pooled,
        sampling_ratio, canonical_scale, canonical_level,
        interpret=interpret)


def _pyr_ad_fwd(feats, rois, strides, k_min, k_max, pooled, sampling_ratio,
                canonical_scale, canonical_level, interpret):
    out = roi_align_pyramid_pallas_ad(
        feats, rois, strides, k_min, k_max, pooled, sampling_ratio,
        canonical_scale, canonical_level, interpret)
    return out, (feats, rois)


def _pyr_ad_bwd(strides, k_min, k_max, pooled, sampling_ratio,
                canonical_scale, canonical_level, interpret, res, g):
    feats, rois = res

    def exact(fs):
        def per_image(f_list, bx):
            return roi_align_pyramid(
                [f.astype(jnp.float32) for f in f_list], bx, list(strides),
                k_min, k_max, pooled, sampling_ratio, canonical_scale,
                canonical_level)

        return jax.vmap(per_image)(fs, rois)

    _, vjp = jax.vjp(exact, feats)
    (gf,) = vjp(g.astype(jnp.float32))
    gf = tuple(gi.astype(f.dtype) for gi, f in zip(gf, feats))
    return gf, jnp.zeros_like(rois)


roi_align_pyramid_pallas_ad.defvjp(_pyr_ad_fwd, _pyr_ad_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def roi_align_pallas_ad(feat, rois, spatial_scale, pooled, sampling_ratio,
                        interpret):
    """Differentiable single-level RoIAlign: Pallas forward, exact-jnp
    backward. feat: (H, W, C); rois: (N, 4)."""
    return roi_align_pallas(feat, rois, spatial_scale, pooled,
                            sampling_ratio, interpret=interpret)


def _sl_ad_fwd(feat, rois, spatial_scale, pooled, sampling_ratio,
               interpret):
    out = roi_align_pallas_ad(feat, rois, spatial_scale, pooled,
                              sampling_ratio, interpret)
    return out, (feat, rois)


def _sl_ad_bwd(spatial_scale, pooled, sampling_ratio, interpret, res, g):
    feat, rois = res

    def exact(f):
        return roi_align(f.astype(jnp.float32), rois, spatial_scale,
                         pooled, sampling_ratio)

    _, vjp = jax.vjp(exact, feat)
    (gf,) = vjp(g.astype(jnp.float32))
    return gf.astype(feat.dtype), jnp.zeros_like(rois)


roi_align_pallas_ad.defvjp(_sl_ad_fwd, _sl_ad_bwd)
