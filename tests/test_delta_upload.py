"""Temporal delta-coded frame uploads (vos.upload_format="yuv420_delta").

The tunnel upload link is the binding constraint on end-to-end VOS
throughput (tools/bench_pipeline.py); delta coding uploads only the
blocks that changed between consecutive frames. The contract under test:
reconstruction is BIT-EXACT (lossless), the encoder falls back to full
upload on dense change, and the engine produces pixel-identical id maps
under either format."""

import numpy as np
import jax
import pytest

from vosdetectron_tpu.config import Config, apply_overrides
from vosdetectron_tpu.engine.vos import (DeltaChunk, VOSEngine,
                                         _delta_encode_chunk,
                                         _to_yuv420_packed)


def _chunk_with_sparse_motion(c=6, p=5000, seed=0, touched=3):
    """Packed chunk where each frame changes a few small byte spans."""
    rng = np.random.default_rng(seed)
    buf = np.empty((c, p), np.uint8)
    buf[0] = rng.integers(0, 256, p, np.uint8)
    for j in range(1, c):
        buf[j] = buf[j - 1]
        for _ in range(touched):
            at = int(rng.integers(0, p - 40))
            buf[j, at:at + 40] = rng.integers(0, 256, 40, np.uint8)
    return buf


def _numpy_decode(enc, c, p, block, base=None):
    """Host reference for the device reconstruction. For a CHAINED
    encoding (full0 is None) pass `base`, the previous chunk's (p,) last
    packed frame."""
    full0, idx, payload = enc
    nb = -(-p // block)
    if full0 is None:
        cur = np.zeros(nb * block, np.uint8)
        cur[:p] = base
        cur = cur.reshape(nb, block)
    else:
        cur = full0.copy().reshape(nb, block)
    out = np.empty((c, p), np.uint8)
    for j in range(c):
        for slot in range(idx.shape[1]):
            if idx[j, slot] < nb:
                cur[idx[j, slot]] = payload[j, slot]
        out[j] = cur.reshape(-1)[:p]
    return out


def test_encode_decode_roundtrip_bitexact():
    buf = _chunk_with_sparse_motion()
    enc = _delta_encode_chunk(buf, block=64)
    assert enc is not None
    np.testing.assert_array_equal(
        _numpy_decode(enc, *buf.shape, block=64), buf)
    # frame 0 rides exclusively on full0 (row 0 is all-drop)
    assert (enc[1][0] == enc[0].shape[0] // 64).all()


def test_chained_encode_decode_roundtrip_bitexact():
    """Chunk 2 chained off chunk 1's last frame: full0 is None, row 0
    carries real deltas, reconstruction from the base is bit-exact."""
    both = _chunk_with_sparse_motion(c=12)
    prev, cur = both[:6], both[6:]
    enc = _delta_encode_chunk(cur, block=64, base=prev[-1])
    assert enc is not None
    assert enc[0] is None
    # row 0 must carry at least one real (in-range) index: cur[0] differs
    # from the base
    nb = -(-cur.shape[1] // 64)
    assert (enc[1][0] < nb).any()
    np.testing.assert_array_equal(
        _numpy_decode(enc, *cur.shape, block=64, base=prev[-1]), cur)


def test_chained_resolve_on_device():
    """Engine-level: chained DeltaChunk reconstructs bit-exactly from the
    device-resident base, and resolving one without a base raises."""
    cfg = apply_overrides(Config(), [
        ("model.num_classes", 2),
        ("test.padded_image_size", (128, 192)),
        ("test.scale", 96), ("test.max_size", 192),
        ("vos.max_tracks", 4), ("vos.track_mask_size", (32, 48)),
        ("vos.upload_format", "yuv420_delta"), ("vos.delta_block", 64),
    ]).validate()
    eng = VOSEngine(cfg, rng=0, chunk=6)
    dev = jax.devices()[0]
    both = _chunk_with_sparse_motion(c=12, p=5003)  # non-multiple psize
    prev, cur = both[:6], both[6:]
    enc = eng._upload_packed(cur, dev, base=prev[-1])
    assert isinstance(enc, DeltaChunk) and enc.full0 is None
    base_dev = jax.device_put(prev, dev)[-1]
    np.testing.assert_array_equal(
        np.asarray(eng._resolve_chunk(enc, base_dev)), cur)
    with pytest.raises(ValueError):
        eng._resolve_chunk(enc)


def test_chained_fail_retries_self_contained():
    """When the CHAINED encode blows the budget (dense change across the
    chunk boundary) but the chunk itself has sparse motion, _upload_packed
    must retry self-contained: a non-chained DeltaChunk (full0 present)
    that still round-trips bit-exactly."""
    cfg = apply_overrides(Config(), [
        ("model.num_classes", 2),
        ("test.padded_image_size", (128, 192)),
        ("test.scale", 96), ("test.max_size", 192),
        ("vos.max_tracks", 4), ("vos.track_mask_size", (32, 48)),
        ("vos.upload_format", "yuv420_delta"), ("vos.delta_block", 64),
    ]).validate()
    eng = VOSEngine(cfg, rng=0, chunk=6)
    dev = jax.devices()[0]
    cur = _chunk_with_sparse_motion(c=6, p=30000)
    base = np.random.default_rng(3).integers(0, 256, 30000, np.uint8)
    # the chained encode really must fail for this test to mean anything
    assert _delta_encode_chunk(cur, block=64, base=base) is None
    enc = eng._upload_packed(cur, dev, base=base)
    assert isinstance(enc, DeltaChunk) and enc.full0 is not None
    np.testing.assert_array_equal(np.asarray(eng._resolve_chunk(enc)), cur)


def test_encoder_falls_back_on_dense_change():
    rng = np.random.default_rng(1)
    buf = rng.integers(0, 256, (6, 5000), np.uint8)  # every block changes
    assert _delta_encode_chunk(buf, block=64) is None


def test_encoder_handles_nonmultiple_psize():
    # p not a multiple of block exercises the zero-padding path
    buf = _chunk_with_sparse_motion(p=5003)
    enc = _delta_encode_chunk(buf, block=64)
    assert enc is not None
    np.testing.assert_array_equal(
        _numpy_decode(enc, *buf.shape, block=64), buf)


def test_device_expand_matches_host():
    buf = _chunk_with_sparse_motion(c=5, p=4096)
    enc = _delta_encode_chunk(buf, block=64)
    assert enc is not None

    cfg = apply_overrides(Config(), [
        ("model.num_classes", 2),
        ("test.padded_image_size", (128, 192)),
        ("test.scale", 96), ("test.max_size", 192),
        ("vos.max_tracks", 4), ("vos.track_mask_size", (32, 48)),
    ]).validate()
    eng = VOSEngine(cfg, rng=0, chunk=5)
    out = np.asarray(eng._expand_delta(*map(jax.numpy.asarray, enc),
                                       buf.shape[1]))
    np.testing.assert_array_equal(out, buf)


def test_upload_packed_dispatch():
    """_upload_packed returns a DeltaChunk for sparse motion under the
    delta format, a plain array otherwise / on dense change."""
    cfg_over = [
        ("model.num_classes", 2),
        ("test.padded_image_size", (128, 192)),
        ("test.scale", 96), ("test.max_size", 192),
        ("vos.max_tracks", 4), ("vos.track_mask_size", (32, 48)),
        ("vos.delta_block", 64),
    ]
    dev = jax.devices()[0]
    sparse = _chunk_with_sparse_motion(c=6, p=30000)
    dense = np.random.default_rng(2).integers(0, 256, (6, 30000), np.uint8)

    cfg = apply_overrides(Config(), cfg_over + [
        ("vos.upload_format", "yuv420_delta")]).validate()
    eng = VOSEngine(cfg, rng=0, chunk=6)
    enc = eng._upload_packed(sparse, dev)
    assert isinstance(enc, DeltaChunk)
    np.testing.assert_array_equal(np.asarray(eng._resolve_chunk(enc)),
                                  sparse)
    assert not isinstance(eng._upload_packed(dense, dev), DeltaChunk)

    cfg2 = apply_overrides(Config(), cfg_over).validate()
    eng2 = VOSEngine(cfg2, rng=0, chunk=6)
    assert not isinstance(eng2._upload_packed(sparse, dev), DeltaChunk)


@pytest.mark.slow
def test_engine_pixel_parity_delta_vs_full():
    """run_sequence under yuv420_delta must equal yuv420 exactly — the
    reconstruction is lossless, so the scan sees identical bytes."""
    from vosdetectron_tpu.data.davis import make_synthetic_sequence

    over = [
        ("model.num_classes", 2),
        ("test.padded_image_size", (128, 192)),
        ("test.scale", 96), ("test.max_size", 192),
        ("vos.max_tracks", 4), ("vos.track_mask_size", (32, 48)),
        ("rpn.pre_nms_top_n_test", 64),
        ("rpn.post_nms_top_n_test", 16),
        ("test.detections_per_im", 8),
        ("vos.delta_block", 64),
    ]
    frames, idmaps = make_synthetic_sequence(
        0, num_frames=6, size=(96, 160), num_objects=2)
    # small motion on a static background — the regime delta coding is
    # for (the generator's full-frame object motion at this tiny
    # resolution changes too much per frame, and the encoder correctly
    # falls back to full upload there)
    frames = np.repeat(frames[:1], 6, axis=0).copy()
    idmaps = np.repeat(idmaps[:1], 6, axis=0)
    for t in range(1, 6):
        frames[t, 40 + t:50 + t, 60 + t:70 + t] = (255, 255, 255)

    cfg_full = apply_overrides(Config(), over).validate()
    cfg_delta = apply_overrides(Config(), over + [
        ("vos.upload_format", "yuv420_delta")]).validate()

    eng_full = VOSEngine(cfg_full, rng=0, chunk=3)
    preds_full = eng_full.run_sequence(frames, idmaps[0])
    eng_delta = VOSEngine(cfg_delta, rng=0, chunk=3)
    # the synthetic content must actually take the delta path for this
    # test to mean anything
    packed = _to_yuv420_packed(frames[:3], cfg_delta.vos.chroma_den)
    assert _delta_encode_chunk(packed, cfg_delta.vos.delta_block) \
        is not None
    preds_delta = eng_delta.run_sequence(frames, idmaps[0])
    assert len(preds_full) == len(preds_delta)
    for a, b in zip(preds_full, preds_delta):
        np.testing.assert_array_equal(a, b)
