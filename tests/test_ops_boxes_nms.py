"""Unit tests: box geometry, NMS (vs. brute-force numpy greedy), config."""

import numpy as np
import jax.numpy as jnp
import pytest

from vosdetectron_tpu.ops import boxes as B
from vosdetectron_tpu.ops import nms as N
from vosdetectron_tpu.config import Config, load_config, apply_overrides


# ---------------------------------------------------------------- numpy refs

def np_iou(b1, b2):
    lt = np.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = np.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (b1[:, 2] - b1[:, 0]) * (b1[:, 3] - b1[:, 1])
    a2 = (b2[:, 2] - b2[:, 0]) * (b2[:, 3] - b2[:, 1])
    union = a1[:, None] + a2[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def np_greedy_nms(boxes, scores, thresh):
    """Textbook sequential greedy NMS — the semantics the CUDA kernel had."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    iou = np_iou(boxes, boxes)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if scores[j] < scores[i] or (scores[j] == scores[i] and j > i):
                if iou[i, j] > thresh:
                    suppressed[j] = True
    return keep


def random_boxes(rng, n, lo=0, hi=200):
    x1 = rng.uniform(lo, hi, n)
    y1 = rng.uniform(lo, hi, n)
    w = rng.uniform(1, 80, n)
    h = rng.uniform(1, 80, n)
    return np.stack([x1, y1, x1 + w, y1 + h], 1).astype(np.float32)


# ---------------------------------------------------------------------- boxes

def test_pairwise_iou_matches_numpy(rng):
    b1 = random_boxes(rng, 23)
    b2 = random_boxes(rng, 17)
    got = np.asarray(B.pairwise_iou(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, np_iou(b1, b2), atol=1e-5)


def test_bbox_transform_roundtrip(rng):
    src = random_boxes(rng, 40)
    dst = random_boxes(rng, 40)
    deltas = B.bbox_transform(jnp.asarray(src), jnp.asarray(dst))
    rec = B.bbox_transform_inv(jnp.asarray(src), deltas)
    np.testing.assert_allclose(np.asarray(rec), dst, atol=1e-2)


def test_clip_and_filter(rng):
    b = np.array([[-5, -5, 10, 10], [0, 0, 300, 300], [5, 5, 6, 6]],
                 np.float32)
    clipped = np.asarray(B.clip_boxes(jnp.asarray(b), (100, 120)))
    assert clipped.min() >= 0
    assert clipped[:, 2].max() <= 120 and clipped[:, 3].max() <= 100
    m = np.asarray(B.filter_small_boxes(jnp.asarray(b), 3.0))
    assert list(m) == [True, True, False]


# ------------------------------------------------------------------------ NMS

@pytest.mark.parametrize("n,thresh", [(64, 0.5), (200, 0.3), (128, 0.7)])
def test_nms_matches_greedy(rng, n, thresh):
    boxes = random_boxes(rng, n)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    want = set(np_greedy_nms(boxes, scores, thresh))
    keep = np.asarray(N.nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                 thresh))
    got = set(np.nonzero(keep)[0].tolist())
    assert got == want


def test_nms_fixed_output_order(rng):
    boxes = random_boxes(rng, 100)
    scores = rng.uniform(0, 1, 100).astype(np.float32)
    idx, valid, ks = N.nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 20)
    idx, valid, ks = map(np.asarray, (idx, valid, ks))
    kept = idx[valid]
    # score-descending
    assert np.all(np.diff(scores[kept]) <= 1e-6)
    want = np_greedy_nms(boxes, scores, 0.5)[:20]
    assert list(kept) == want


def test_nms_respects_validity(rng):
    boxes = random_boxes(rng, 32)
    scores = rng.uniform(0.5, 1, 32).astype(np.float32)
    valid = np.zeros(32, bool)
    valid[:5] = True
    keep = np.asarray(N.nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                 0.5, valid=jnp.asarray(valid)))
    assert not keep[5:].any()


def test_batched_nms_classes_do_not_suppress(rng):
    # identical boxes, different classes -> both kept
    b = np.tile(np.array([[10, 10, 50, 50]], np.float32), (2, 1))
    s = np.array([0.9, 0.8], np.float32)
    cls = np.array([1, 2], np.int32)
    idx, valid, _ = N.batched_nms(jnp.asarray(b), jnp.asarray(s),
                                  jnp.asarray(cls), 0.5, 2)
    assert np.asarray(valid).sum() == 2


def test_soft_nms_decays_overlaps():
    b = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                 np.float32)
    s = np.array([0.9, 0.8, 0.7], np.float32)
    idx, ok, out = N.soft_nms(jnp.asarray(b), jnp.asarray(s), 3,
                              method="gaussian")
    idx, ok, out = map(np.asarray, (idx, ok, out))
    assert idx[0] == 0 and ok.all()
    # overlapping box decayed below the disjoint one
    assert out[list(idx).index(1)] < out[list(idx).index(2)]


# --------------------------------------------------------------------- config

def test_config_defaults_validate():
    Config().validate()


def test_config_overrides():
    cfg = apply_overrides(Config(), [("rpn.nms_thresh", 0.6),
                                     ("model.num_classes", 2),
                                     ("train.scales", [480])])
    assert cfg.rpn.nms_thresh == 0.6
    assert cfg.model.num_classes == 2
    assert cfg.train.scales == (480,)


def test_config_yaml_roundtrip(tmp_path):
    p = tmp_path / "exp.yaml"
    p.write_text("model:\n  conv_body: resnet50_c4\nfpn:\n  enabled: false\n"
                 "rpn:\n  nms_thresh: 0.65\n")
    cfg = load_config(str(p))
    assert cfg.model.conv_body == "resnet50_c4"
    assert not cfg.fpn.enabled
    assert cfg.rpn.nms_thresh == 0.65


def test_config_bad_key_raises():
    with pytest.raises(KeyError):
        apply_overrides(Config(), [("rpn.not_a_key", 1)])
