"""Unit tests: RoIAlign (vs. brute-force numpy Caffe2 reference), mask paste."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vosdetectron_tpu.ops import roi_align as R
from vosdetectron_tpu.ops import mask_paste as MP


# --------------------------------------------------- numpy Caffe2 RoIAlign ref

def np_bilinear(feat, y, x):
    h, w = feat.shape[:2]
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(feat.shape[-1], feat.dtype)
    y = min(max(y, 0.0), h - 1)
    x = min(max(x, 0.0), w - 1)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
    ly, lx = y - y0, x - x0
    return (feat[y0, x0] * (1 - ly) * (1 - lx) + feat[y0, x1] * (1 - ly) * lx
            + feat[y1, x0] * ly * (1 - lx) + feat[y1, x1] * ly * lx)


def np_roi_align(feat, rois, scale, pooled, ratio):
    n = rois.shape[0]
    c = feat.shape[-1]
    out = np.zeros((n, pooled, pooled, c), np.float32)
    for r in range(n):
        x1, y1, x2, y2 = rois[r] * scale
        rw = max(x2 - x1, 1.0)
        rh = max(y2 - y1, 1.0)
        bh, bw = rh / pooled, rw / pooled
        for py in range(pooled):
            for px in range(pooled):
                acc = np.zeros(c, np.float32)
                for iy in range(ratio):
                    for ix in range(ratio):
                        sy = y1 + (py + (iy + 0.5) / ratio) * bh
                        sx = x1 + (px + (ix + 0.5) / ratio) * bw
                        acc += np_bilinear(feat, sy, sx)
                out[r, py, px] = acc / (ratio * ratio)
    return out


def test_roi_align_matches_numpy(rng):
    feat = rng.randn(24, 32, 8).astype(np.float32)
    rois = np.array([
        [0, 0, 64, 48],      # whole map at scale 1/2... image coords
        [10, 10, 40, 30],
        [5, 20, 12, 28],     # small
        [-10, -10, 100, 100],  # out of bounds (clipped sampling)
        [0, 0, 0, 0],        # degenerate / padding roi
    ], np.float32)
    got = np.asarray(R.roi_align(jnp.asarray(feat), jnp.asarray(rois),
                                 0.5, 7, 2))
    want = np_roi_align(feat, rois, 0.5, 7, 2)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_roi_align_grad_is_scatter_add(rng):
    """VJP flows to exactly the sampled locations and sums to n_points."""
    feat = jnp.asarray(rng.randn(16, 16, 4).astype(np.float32))
    rois = jnp.asarray(np.array([[2, 2, 10, 10]], np.float32))

    def f(fm):
        return R.roi_align(fm, rois, 1.0, 7, 2).sum()

    g = np.asarray(jax.grad(f)(feat))
    # each of the 7*7*2*2 samples distributes weight 1/4 (mean over 4
    # subsamples) and bilinear weights sum to 1 per sample.
    np.testing.assert_allclose(g.sum(), 7 * 7 * 4, rtol=1e-4)
    assert (g != 0).any()


def test_fpn_level_assignment():
    rois = jnp.asarray(np.array([
        [0, 0, 32, 32],      # tiny -> min level
        [0, 0, 224, 224],    # canonical -> level 4
        [0, 0, 1000, 1000],  # huge -> max level
    ], np.float32))
    lv = np.asarray(R.fpn_level_assignment(rois, 2, 5))
    assert list(lv) == [2, 4, 5]


def test_roi_align_pyramid_matches_single_level(rng):
    """A roi assigned to level k must equal single-level roi_align on k."""
    feats = [jnp.asarray(rng.randn(32 // (2 ** i), 48 // (2 ** i), 8)
                         .astype(np.float32)) for i in range(4)]
    strides = [4, 8, 16, 32]  # levels 2..5
    rois = np.array([
        [0, 0, 40, 40],     # level 2
        [0, 0, 220, 230],   # level 4
        [0, 0, 500, 500],   # level 5
    ], np.float32)
    got = np.asarray(R.roi_align_pyramid(feats, jnp.asarray(rois), strides,
                                         2, 5, 7, 2))
    lv = np.asarray(R.fpn_level_assignment(jnp.asarray(rois), 2, 5))
    for i, k in enumerate(lv):
        li = int(k) - 2
        want = np.asarray(R.roi_align(feats[li],
                                      jnp.asarray(rois[i:i + 1]),
                                      1.0 / strides[li], 7, 2))[0]
        np.testing.assert_allclose(got[i], want, atol=1e-4)


def test_roi_pool_basic(rng):
    feat = rng.randn(16, 16, 4).astype(np.float32)
    rois = np.array([[0, 0, 16, 16]], np.float32)
    out = np.asarray(R.roi_pool(jnp.asarray(feat), jnp.asarray(rois), 1.0, 2))
    # 2x2 max-pool over quadrants (approximately — sampled max)
    assert out.shape == (1, 2, 2, 4)
    assert out.max() <= feat.max() + 1e-6


# ------------------------------------------------------------------ mask paste

def np_paste(mask, box, im_h, im_w, thresh):
    """cv2-free numpy paste reference with the same half-pixel sampling."""
    m = mask.shape[0]
    x1, y1, x2, y2 = box
    out = np.zeros((im_h, im_w), np.float32)
    for yy in range(im_h):
        for xx in range(im_w):
            cy, cx = yy + 0.5, xx + 0.5
            if not (y1 < cy < y2 and x1 < cx < x2):
                continue
            my = (cy - y1) / max(y2 - y1, 1e-6) * m - 0.5
            mx = (cx - x1) / max(x2 - x1, 1e-6) * m - 0.5
            my = min(max(my, 0), m - 1)
            mx = min(max(mx, 0), m - 1)
            y0, x0 = int(np.floor(my)), int(np.floor(mx))
            y1i, x1i = min(y0 + 1, m - 1), min(x0 + 1, m - 1)
            ly, lx = my - y0, mx - x0
            out[yy, xx] = (mask[y0, x0] * (1 - ly) * (1 - lx)
                           + mask[y0, x1i] * (1 - ly) * lx
                           + mask[y1i, x0] * ly * (1 - lx)
                           + mask[y1i, x1i] * ly * lx)
    return out > thresh


def test_paste_matches_numpy(rng):
    mask = rng.uniform(0, 1, (28, 28)).astype(np.float32)
    box = np.array([10.3, 5.7, 50.9, 40.2], np.float32)
    got = np.asarray(MP.paste_masks_in_image(
        jnp.asarray(mask[None]), jnp.asarray(box[None]), 64, 80))[0]
    want = np_paste(mask, box, 64, 80, 0.5)
    assert (got == want).mean() > 0.995  # boundary-pixel float ties allowed


def test_paste_clips_to_box():
    mask = np.ones((28, 28), np.float32)
    box = np.array([20, 20, 40, 40], np.float32)
    got = np.asarray(MP.paste_masks_in_image(
        jnp.asarray(mask[None]), jnp.asarray(box[None]), 64, 64))[0]
    assert got[25, 25] and not got[10, 10] and not got[50, 50]


def test_flatten_instance_masks_score_priority():
    a = np.zeros((2, 8, 8), bool)
    a[0, :4] = True   # id 1, score .5
    a[1, 2:6] = True  # id 2, score .9 — wins the overlap rows 2:4
    out = np.asarray(MP.flatten_instance_masks(
        jnp.asarray(a), jnp.asarray(np.array([.5, .9], np.float32)),
        jnp.asarray(np.array([True, True])),
        jnp.asarray(np.array([1, 2], np.int32))))
    assert out[0, 0] == 1 and out[3, 0] == 2 and out[5, 0] == 2
    assert out[7, 0] == 0
