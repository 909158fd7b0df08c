"""Native C++ host-ops: build check + parity vs numpy/jnp references."""

import numpy as np
import pytest

from vosdetectron_tpu import native as N


def random_boxes(rng, n):
    x1 = rng.uniform(0, 200, n)
    y1 = rng.uniform(0, 200, n)
    w = rng.uniform(1, 80, n)
    h = rng.uniform(1, 80, n)
    return np.stack([x1, y1, x1 + w, y1 + h], 1).astype(np.float32)


def test_native_compiled():
    assert N.HAVE_NATIVE, "g++ present in image — native build must succeed"


def test_bbox_overlaps_matches_jnp(rng):
    import jax.numpy as jnp

    from vosdetectron_tpu.ops.boxes import pairwise_iou

    b1 = random_boxes(rng, 31)
    b2 = random_boxes(rng, 17)
    got = N.bbox_overlaps(b1, b2)
    want = np.asarray(pairwise_iou(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_nms_matches_traced(rng):
    import jax.numpy as jnp

    from vosdetectron_tpu.ops.nms import nms_mask

    boxes = random_boxes(rng, 150)
    scores = rng.uniform(0, 1, 150).astype(np.float32)
    keep_native = set(N.nms(boxes, scores, 0.5).tolist())
    keep_traced = set(np.nonzero(np.asarray(
        nms_mask(jnp.asarray(boxes), jnp.asarray(scores), 0.5)))[0].tolist())
    assert keep_native == keep_traced


def test_nms_output_is_score_sorted(rng):
    boxes = random_boxes(rng, 60)
    scores = rng.uniform(0, 1, 60).astype(np.float32)
    keep = N.nms(boxes, scores, 0.4)
    assert np.all(np.diff(scores[keep]) <= 1e-7)


def test_soft_nms_decays():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep, out = N.soft_nms(boxes, scores, method="gaussian")
    assert keep[0] == 0
    assert out[1] < 0.8 and abs(out[2] - 0.7) < 1e-5


def test_rle_roundtrip(rng):
    mask = (rng.uniform(0, 1, (37, 53)) > 0.6).astype(np.uint8)
    rle = N.rle_encode(mask)
    assert sum(rle["counts"]) == 37 * 53
    back = N.rle_decode(rle)
    np.testing.assert_array_equal(back, mask)


def test_rle_empty_and_full():
    z = np.zeros((8, 8), np.uint8)
    f = np.ones((8, 8), np.uint8)
    assert N.rle_decode(N.rle_encode(z)).sum() == 0
    assert N.rle_decode(N.rle_encode(f)).sum() == 64
    assert N.rle_encode(f)["counts"][0] == 0  # starts with zero-run


def test_mask_iou(rng):
    a = np.zeros((2, 16, 16), np.uint8)
    b = np.zeros((2, 16, 16), np.uint8)
    a[0, :8] = 1
    b[0, 4:12] = 1   # IoU = 4/12
    a[1, :, :8] = 1
    b[1, :, :8] = 1  # IoU = 1
    iou = N.mask_iou(a, b)
    np.testing.assert_allclose(iou[0, 0], 4 / 12, atol=1e-6)
    np.testing.assert_allclose(iou[1, 1], 1.0, atol=1e-6)
    # iscrowd: union = area of a only
    crowd = N.mask_iou(a, b, iscrowd=True)
    np.testing.assert_allclose(crowd[0, 0], 4 / 8, atol=1e-6)


def test_fill_poly_square():
    # 10x10 square from (2,2) to (8,8)
    poly = [2, 2, 8, 2, 8, 8, 2, 8]
    m = N.polys_to_mask([poly], 12, 12)
    assert m[5, 5] == 1
    assert m[1, 1] == 0 and m[10, 10] == 0
    assert 25 <= m.sum() <= 49  # ~6x6 interior


def test_fill_poly_matches_cv2(rng):
    import cv2

    pts = rng.uniform(2, 30, (7, 2))
    poly = pts.reshape(-1).tolist()
    got = N.polys_to_mask([poly], 32, 32)
    want = np.zeros((32, 32), np.uint8)
    cv2.fillPoly(want, [pts.astype(np.int32)], 1)
    # Polygon fill conventions differ at edges; interiors must agree.
    agree = (got == want).mean()
    assert agree > 0.93, agree
