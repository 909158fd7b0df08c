"""Pallas kernel tests.

The jnp-side operator construction (interp matrices, window origins, level
routing) is tested on CPU — that is where the RoIAlign semantics live; the
kernels themselves are DMA+matmul executors. Full kernel parity runs only
on TPU (guarded), mirroring the drives in the verification logs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

ON_TPU = jax.default_backend() == "tpu"


def test_interp_operator_reproduces_bilinear_sampling(rng):
    """Ay @ window == direct bilinear row sampling for in-window rois."""
    from vosdetectron_tpu.ops.pallas.roi_align_pallas import (
        WINDOW, _interp_operator)
    from vosdetectron_tpu.ops.roi_align import roi_align

    h = w = 96
    feat = rng.randn(h, w, 4).astype(np.float32)
    # roi within a window at origin (16, 16)
    rois = np.array([[80, 70, 170, 160]], np.float32)  # scale .25 -> 20..42
    scale = 0.25
    x1 = rois[:, 0] * scale
    y1 = rois[:, 1] * scale
    rw = rois[:, 2] * scale - x1
    rh = rois[:, 3] * scale - y1
    oy = np.array([16], np.int32)
    ox = np.array([16], np.int32)
    ay = np.asarray(_interp_operator(jnp.asarray(y1), jnp.asarray(rh), h,
                                     jnp.asarray(oy), 7, 2, WINDOW))[0]
    ax = np.asarray(_interp_operator(jnp.asarray(x1), jnp.asarray(rw), w,
                                     jnp.asarray(ox), 7, 2, WINDOW))[0]
    win = feat[16:16 + WINDOW, 16:16 + WINDOW]
    # operators have the sampling-ratio pool folded in: out = Ay win Ax^T
    out = np.einsum("iy,yxc->ixc", ay, win)
    out = np.einsum("jx,ixc->ijc", ax, out)
    want = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois),
                                scale, 7, 2))[0]
    np.testing.assert_allclose(out, want, atol=1e-4)


def test_interp_operator_rows_sum_to_one_inside(rng):
    from vosdetectron_tpu.ops.pallas.roi_align_pallas import _interp_operator

    lo = jnp.asarray(np.array([10.0], np.float32))
    size = jnp.asarray(np.array([20.0], np.float32))
    a = np.asarray(_interp_operator(lo, size, 128,
                                    jnp.asarray(np.array([8], np.int32)),
                                    7, 2, 64))[0]
    np.testing.assert_allclose(a.sum(axis=1), 1.0, atol=1e-5)


class TestInterpretMode:
    """True numeric parity of the kernel logic on CPU via interpret=True —
    CI coverage of the kernel bodies without a TPU (VERDICT r1 weak #8)."""

    def test_roi_align_single_parity(self, rng):
        from vosdetectron_tpu.ops.pallas.roi_align_pallas import \
            roi_align_pallas
        from vosdetectron_tpu.ops.roi_align import roi_align

        feat = rng.randn(64, 96, 128).astype(np.float32)
        rois = np.array([[10, 10, 120, 100], [0, 0, 60, 60],
                         [40, 20, 200, 90]], np.float32)
        got = np.asarray(roi_align_pallas(
            jnp.asarray(feat), jnp.asarray(rois), 0.25, 7, 2,
            interpret=True))
        want = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois),
                                    0.25, 7, 2))
        assert np.abs(got - want).max() < 0.05

    def test_roi_align_pyramid_parity(self, rng):
        from vosdetectron_tpu.ops.pallas.roi_align_pallas import \
            roi_align_pyramid_pallas
        from vosdetectron_tpu.ops.roi_align import roi_align_pyramid

        strides = [4, 8, 16, 32]
        h, w = 64, 96
        feats = [jnp.asarray(rng.randn(h // (s // 4), w // (s // 4), 128)
                             .astype(np.float32)) for s in strides]
        # rois spanning multiple pyramid levels
        rois = np.array([[8, 8, 60, 48], [0, 0, 200, 150],
                         [16, 16, 350, 220]], np.float32)
        got = np.asarray(roi_align_pyramid_pallas(
            feats, jnp.asarray(rois), strides, 2, 5, 7, 2,
            interpret=True))
        want = np.asarray(roi_align_pyramid(
            [f for f in feats], jnp.asarray(rois), strides, 2, 5, 7, 2))
        assert np.abs(got - want).max() < 0.05

    def test_roi_align_oversized_roi_routes_to_exact_path(self, rng):
        """A RoI spanning more feature px than WINDOW must produce
        XLA-parity output (not silently-clamped garbage)."""
        from vosdetectron_tpu.ops.pallas.roi_align_pallas import (
            WINDOW, roi_align_pallas)
        from vosdetectron_tpu.ops.roi_align import roi_align

        h = w = 96  # > WINDOW=64
        feat = rng.randn(h, w, 128).astype(np.float32)
        # spans ~95 feature px at scale .25 — well past the window
        rois = np.array([[0, 0, 380, 380], [10, 10, 120, 100]], np.float32)
        assert 380 * 0.25 > WINDOW
        got = np.asarray(roi_align_pallas(
            jnp.asarray(feat), jnp.asarray(rois), 0.25, 7, 2,
            interpret=True))
        want = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois),
                                    0.25, 7, 2))
        assert np.abs(got - want).max() < 0.05

    def test_roi_align_pyramid_oversized_roi_exact(self, rng):
        from vosdetectron_tpu.ops.pallas.roi_align_pallas import \
            roi_align_pyramid_pallas
        from vosdetectron_tpu.ops.roi_align import roi_align_pyramid

        strides = [4, 8, 16, 32]
        h, w = 96, 128
        feats = [jnp.asarray(rng.randn(h // (s // 4), w // (s // 4), 128)
                             .astype(np.float32)) for s in strides]
        # extreme aspect ratio: level assignment keeps it at a fine level
        # while one axis exceeds the window
        rois = np.array([[0, 40, 500, 52], [8, 8, 60, 48]], np.float32)
        got = np.asarray(roi_align_pyramid_pallas(
            feats, jnp.asarray(rois), strides, 2, 5, 7, 2,
            interpret=True))
        want = np.asarray(roi_align_pyramid(
            [f for f in feats], jnp.asarray(rois), strides, 2, 5, 7, 2))
        assert np.abs(got - want).max() < 0.05

    def test_roi_align_single_whole_map_roi_800_scale(self, rng):
        """C4 at 800 scale: a whole-image roi spans the full 52x88 map —
        the window must grow to the map so the kernel (not the fallback)
        stays exact."""
        from vosdetectron_tpu.ops.pallas.roi_align_pallas import \
            roi_align_pallas
        from vosdetectron_tpu.ops.roi_align import roi_align

        feat = rng.randn(52, 88, 128).astype(np.float32)
        rois = np.array([[0, 0, 1408, 832], [100, 100, 400, 300]],
                        np.float32)
        got = np.asarray(roi_align_pallas(
            jnp.asarray(feat), jnp.asarray(rois), 1.0 / 16.0, 14, 2,
            interpret=True))
        want = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois),
                                    1.0 / 16.0, 14, 2))
        assert np.abs(got - want).max() < 0.05

    def test_roi_align_pyramid_clamped_top_level_and_tall_sliver(self, rng):
        """800-scale geometry: a whole-image roi lands on the CLAMPED top
        level (escaping the rw*rh invariant) and a 1-px-wide image-height
        sliver spans the full finest band — both must stay exact (the
        main window adapts to the k_max band; the tall pass to the P2
        band)."""
        from vosdetectron_tpu.ops.pallas.roi_align_pallas import \
            roi_align_pyramid_pallas
        from vosdetectron_tpu.ops.roi_align import roi_align_pyramid

        strides = [4, 8, 16, 32]
        h, w = 208, 352  # 832x1408 /4 — the 800-scale P2 shape
        feats = [jnp.asarray(rng.randn(h // (s // 4), w // (s // 4), 128)
                             .astype(np.float32)) for s in strides]
        rois = np.array([
            [0, 0, 1407, 831],     # whole image -> clamped k_max
            [100, 0, 104, 831],    # tall sliver -> full P2 band height
            [0, 400, 1407, 404],   # wide sliver -> full-width window
            [50, 50, 200, 180],    # ordinary roi
        ], np.float32)
        got = np.asarray(roi_align_pyramid_pallas(
            feats, jnp.asarray(rois), strides, 2, 5, 7, 2,
            interpret=True))
        want = np.asarray(roi_align_pyramid(
            [f for f in feats], jnp.asarray(rois), strides, 2, 5, 7, 2))
        assert np.abs(got - want).max() < 0.05

    def test_pyramid_batched_fallback_no_cross_image_bleed(self, rng):
        """Regression (ADVICE r2 #1): the batched guaranteed-exact fallback
        must not blend a neighbouring image's rows into bottom-edge rois.
        canonical_scale=2240 forces every roi to the finest level with
        rw,rh ~ 55 — too big for every kernel window class — so the
        residual `_fix_all` path runs; the old stacked-band fallback read
        image i+1's first row for image i's bottom-edge samples."""
        from vosdetectron_tpu.ops.pallas.roi_align_pallas import \
            roi_align_pyramid_pallas
        from vosdetectron_tpu.ops.roi_align import roi_align_pyramid

        strides = [4, 8, 16, 32]
        h, w = 64, 64  # 256x256 image at P2
        feats = [jnp.asarray(rng.randn(2, h // (s // 4), w // (s // 4), 128)
                             .astype(np.float32)) for s in strides]
        # image 0: a huge roi (fails every window class -> residual fires)
        # plus a WIDE bottom-edge roi short enough in y (rh ~ 21) that its
        # last bilinear sample crosses the band boundary (row 64 = image
        # 1's first row in the old stacked layout).
        rois = np.array([
            [[10, 30, 230, 255], [10, 171, 230, 255.9]],  # image 0
            [[10, 30, 230, 255], [5, 120, 250, 250]],     # image 1
        ], np.float32)
        got = np.asarray(roi_align_pyramid_pallas(
            feats, jnp.asarray(rois), strides, 2, 5, 7, 2,
            canonical_scale=2240, interpret=True))
        for i in range(2):
            want = np.asarray(roi_align_pyramid(
                [f[i] for f in feats], jnp.asarray(rois[i]), strides,
                2, 5, 7, 2, canonical_scale=2240))
            assert np.abs(got[i] - want).max() < 0.05, f"image {i}"

    def test_pyramid_float32_c256_parity(self, rng):
        """Regression (ADVICE r2 #2): float32 features with C%256==0 must
        pick a 128-lane channel block so VMEM scratch stays within the
        2-byte budget; parity must hold either way."""
        from vosdetectron_tpu.ops.pallas.roi_align_pallas import (
            _pick_cblock, roi_align_pyramid_pallas)
        from vosdetectron_tpu.ops.roi_align import roi_align_pyramid

        assert _pick_cblock(256, jnp.float32) == 128
        assert _pick_cblock(256, jnp.bfloat16) == 256
        assert _pick_cblock(384, jnp.bfloat16) == 128

        strides = [4, 8, 16, 32]
        h, w = 64, 96
        feats = [jnp.asarray(rng.randn(h // (s // 4), w // (s // 4), 256)
                             .astype(np.float32)) for s in strides]
        rois = np.array([[8, 8, 60, 48], [0, 0, 200, 150]], np.float32)
        got = np.asarray(roi_align_pyramid_pallas(
            feats, jnp.asarray(rois), strides, 2, 5, 7, 2,
            interpret=True))
        want = np.asarray(roi_align_pyramid(
            [f for f in feats], jnp.asarray(rois), strides, 2, 5, 7, 2))
        assert np.abs(got - want).max() < 0.05

    def test_nms_parity(self, rng):
        from vosdetectron_tpu.ops.nms import nms
        from vosdetectron_tpu.ops.pallas.nms_pallas import nms_pallas

        n = 200
        x1 = rng.uniform(0, 800, n)
        y1 = rng.uniform(0, 400, n)
        w = rng.uniform(5, 200, n)
        h = rng.uniform(5, 150, n)
        boxes = jnp.asarray(np.stack([x1, y1, x1 + w, y1 + h], 1)
                            .astype(np.float32))
        scores = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
        i1, v1, _ = nms_pallas(boxes, scores, 0.5, 50, interpret=True)
        i2, v2, _ = nms(boxes, scores, 0.5, 50)
        assert np.array_equal(np.asarray(i1), np.asarray(i2))
        assert np.array_equal(np.asarray(v1), np.asarray(v2))

    def test_paste_flatten_parity(self, rng):
        from vosdetectron_tpu.ops.mask_paste import (
            flatten_instance_masks, paste_masks_in_image)
        from vosdetectron_tpu.ops.pallas.mask_paste_pallas import \
            paste_flatten_pallas

        n = 6
        masks = jnp.asarray(rng.uniform(0, 1, (n, 28, 28))
                            .astype(np.float32))
        x1 = rng.uniform(0, 150, n)
        y1 = rng.uniform(0, 100, n)
        boxes = jnp.asarray(np.stack(
            [x1, y1, x1 + 80, y1 + 60], 1).astype(np.float32))
        scores = jnp.asarray(rng.uniform(0.1, 1, n).astype(np.float32))
        ids = jnp.asarray(np.arange(1, n + 1, dtype=np.int32))
        valid = jnp.asarray(np.ones(n, bool))
        got = np.asarray(paste_flatten_pallas(masks, boxes, scores, ids,
                                              valid, 128, 256,
                                              interpret=True))
        want = np.asarray(flatten_instance_masks(
            paste_masks_in_image(masks, boxes, 128, 256), scores, valid,
            ids))
        assert (got == want).mean() > 0.999


@pytest.mark.skipif(not ON_TPU, reason="Pallas TPU kernels need a TPU")
class TestOnTPU:
    def test_roi_align_pallas_parity(self, rng):
        from vosdetectron_tpu.ops.pallas.roi_align_pallas import \
            roi_align_pallas
        from vosdetectron_tpu.ops.roi_align import roi_align

        feat = rng.randn(128, 224, 256).astype(np.float32)
        rois = np.array([[10, 10, 120, 100], [0, 0, 60, 60]], np.float32)
        got = np.asarray(roi_align_pallas(jnp.asarray(feat),
                                          jnp.asarray(rois), 0.25, 7, 2))
        want = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois),
                                    0.25, 7, 2))
        assert np.abs(got - want).max() < 0.05  # MXU bf16-class precision

    def test_nms_pallas_parity(self, rng):
        from vosdetectron_tpu.ops.nms import nms
        from vosdetectron_tpu.ops.pallas.nms_pallas import nms_pallas

        n = 500
        x1 = rng.uniform(0, 800, n)
        y1 = rng.uniform(0, 400, n)
        w = rng.uniform(5, 200, n)
        h = rng.uniform(5, 150, n)
        boxes = jnp.asarray(np.stack([x1, y1, x1 + w, y1 + h], 1)
                            .astype(np.float32))
        scores = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
        i1, v1, _ = nms_pallas(boxes, scores, 0.5, 100)
        i2, v2, _ = nms(boxes, scores, 0.5, 100)
        assert np.array_equal(np.asarray(i1), np.asarray(i2))

    def test_paste_flatten_pallas_parity(self, rng):
        from vosdetectron_tpu.ops.mask_paste import (
            flatten_instance_masks, paste_masks_in_image)
        from vosdetectron_tpu.ops.pallas.mask_paste_pallas import \
            paste_flatten_pallas

        n = 8
        masks = jnp.asarray(rng.uniform(0, 1, (n, 28, 28))
                            .astype(np.float32))
        x1 = rng.uniform(0, 300, n)
        y1 = rng.uniform(0, 200, n)
        boxes = jnp.asarray(np.stack(
            [x1, y1, x1 + 80, y1 + 60], 1).astype(np.float32))
        scores = jnp.asarray(rng.uniform(0.1, 1, n).astype(np.float32))
        ids = jnp.asarray(np.arange(1, n + 1, dtype=np.int32))
        valid = jnp.asarray(np.ones(n, bool))
        got = np.asarray(paste_flatten_pallas(masks, boxes, scores, ids,
                                              valid, 256, 448))
        want = np.asarray(flatten_instance_masks(
            paste_masks_in_image(masks, boxes, 256, 448), scores, valid,
            ids))
        assert (got == want).mean() > 0.999


class TestRoiAlignAutodiff:
    """The _ad wrappers train through the Pallas forward: grads must be
    the exact-jnp VJP (workload 4 trains through RoIAlign; reference
    ships a dedicated backward kernel, SURVEY.md §2.1)."""

    def test_pyramid_ad_value_and_grad(self, rng):
        from vosdetectron_tpu.ops.pallas.roi_align_pallas import \
            roi_align_pyramid_pallas_ad
        from vosdetectron_tpu.ops.roi_align import roi_align_pyramid

        strides = (4, 8, 16, 32)
        h, w = 64, 96
        feats = tuple(
            jnp.asarray(rng.randn(1, h // (s // 4), w // (s // 4), 128)
                        .astype(np.float32)) for s in strides)
        rois = jnp.asarray(np.array(
            [[[8, 8, 60, 48], [0, 0, 200, 150], [16, 16, 350, 220]]],
            np.float32))

        def loss_pallas(fs):
            out = roi_align_pyramid_pallas_ad(fs, rois, strides, 2, 5, 7,
                                              2, 224, 4, True)
            return jnp.sum(out * out), out

        def loss_exact(fs):
            def per_image(f_list, bx):
                return roi_align_pyramid(list(f_list), bx, list(strides),
                                         2, 5, 7, 2, 224, 4)

            out = jax.vmap(per_image)(fs, rois)
            return jnp.sum(out * out), out

        (lp, outp), gp = jax.value_and_grad(loss_pallas, has_aux=True)(
            feats)
        (le, oute), ge = jax.value_and_grad(loss_exact, has_aux=True)(
            feats)
        assert np.abs(np.asarray(outp) - np.asarray(oute)).max() < 0.05
        for a, b in zip(gp, ge):
            # backward IS the exact VJP evaluated at the pallas output's
            # cotangent; outputs agree to kernel tolerance, so grads agree
            # to the same order
            assert np.abs(np.asarray(a) - np.asarray(b)).max() < 0.2
        # rois must receive zero gradient (reference semantics)
        gro = jax.grad(lambda r: jnp.sum(roi_align_pyramid_pallas_ad(
            feats, r, strides, 2, 5, 7, 2, 224, 4, True)))(rois)
        assert float(jnp.abs(gro).max()) == 0.0

    def test_single_level_ad_grad(self, rng):
        from vosdetectron_tpu.ops.pallas.roi_align_pallas import \
            roi_align_pallas_ad
        from vosdetectron_tpu.ops.roi_align import roi_align

        feat = jnp.asarray(rng.randn(32, 48, 128).astype(np.float32))
        rois = jnp.asarray(np.array([[10, 10, 120, 100], [0, 0, 60, 60]],
                                    np.float32))

        gp = jax.grad(lambda f: jnp.sum(roi_align_pallas_ad(
            f, rois, 0.25, 7, 2, True) ** 2))(feat)
        ge = jax.grad(lambda f: jnp.sum(roi_align(
            f, rois, 0.25, 7, 2) ** 2))(feat)
        assert np.abs(np.asarray(gp) - np.asarray(ge)).max() < 0.2
