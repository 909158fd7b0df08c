"""Native JPEG -> packed-yuv420 decoder (native/jpegdec.cpp): parity with
the cv2 decode + BGR->I420 path and integration through the VOS engine's
file-direct prepare path (reference: the decode stage of the per-frame
loop, SURVEY.md §3.3; our host pipeline uploads 4:2:0)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vosdetectron_tpu.native import jpegdec


def _write_test_jpeg(path, seed=0, size=(96, 160)):
    rng = np.random.RandomState(seed)
    h, w = size
    im = np.zeros((h, w, 3), np.uint8)
    # smooth content so JPEG error stays small
    for _ in range(6):
        cy, cx = rng.randint(0, h), rng.randint(0, w)
        color = rng.randint(0, 255, 3).tolist()
        cv2.circle(im, (cx, cy), rng.randint(8, 30), color, -1)
    im = cv2.GaussianBlur(im, (0, 0), 2)
    cv2.imwrite(path, im, [cv2.IMWRITE_JPEG_QUALITY, 95])
    return im


def _cv2_packed(path):
    from vosdetectron_tpu.engine.vos import _to_yuv420_packed

    bgr = cv2.imread(path)
    return _to_yuv420_packed(bgr[None])[0]


@pytest.mark.skipif(not jpegdec.HAVE_JPEGDEC, reason="no native decoder")
def test_probe_and_decode_match_cv2(tmp_path):
    p = str(tmp_path / "f.jpg")
    _write_test_jpeg(p)
    h, w, is420 = jpegdec.probe_file(p)
    assert (h, w) == (96, 160) and is420  # cv2 writes 4:2:0 by default
    buf = np.empty(jpegdec.packed_size(h, w), np.uint8)
    assert jpegdec.read_packed_into(p, buf)
    ref = _cv2_packed(p)
    # native gives the encoder's true planes; the cv2 path round-trips
    # YCbCr->RGB->YCbCr, so small LSB differences are expected (both are
    # FULL-RANGE JFIF — this assertion is what exposed the studio-swing
    # _to_yuv420_packed bug)
    diff = np.abs(buf.astype(np.int16) - ref.astype(np.int16))
    assert diff.max() <= 4 and diff.mean() < 1.0


@pytest.mark.skipif(not jpegdec.HAVE_JPEGDEC, reason="no native decoder")
def test_odd_width_falls_back(tmp_path):
    p = str(tmp_path / "odd.jpg")
    im = np.random.RandomState(0).randint(0, 255, (33, 51, 3)).astype(
        np.uint8)
    cv2.imwrite(p, im)
    pr = jpegdec.probe_file(p)
    assert pr is not None and not pr[2]  # odd dims -> no fast path


@pytest.mark.skipif(not jpegdec.HAVE_JPEGDEC, reason="no native decoder")
def test_png_probe_returns_none(tmp_path):
    p = str(tmp_path / "x.png")
    cv2.imwrite(p, np.zeros((8, 8, 3), np.uint8))
    assert jpegdec.probe_file(p) is None


def test_yuv420_roundtrip_is_full_range():
    """Pack (host) -> unpack (device math) must be ~identity on solid
    colors. Regression for the studio-swing bug: with the old
    COLOR_BGR2YUV_I420 packer, black decoded to 16 and white to 235."""
    import jax.numpy as jnp

    from vosdetectron_tpu.config import Config
    from vosdetectron_tpu.engine.vos import VOSEngine, _to_yuv420_packed

    eng = VOSEngine.__new__(VOSEngine)  # only _frames_to_bgr is needed
    for col in [(0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 0, 255)]:
        im = np.full((16, 16, 3), col, np.uint8)
        pk = jnp.asarray(_to_yuv420_packed(im[None]))
        rec = np.asarray(eng._frames_to_bgr(pk, src_hw=(16, 16)))
        assert np.abs(rec[0, 4, 4] - np.asarray(col, np.float32)).max() \
            <= 2.0, (col, rec[0, 4, 4])


def test_prepare_sequence_from_files_matches_array_path(tmp_path):
    """File-direct prepare must produce the same id maps as the decoded-
    array path (the yuv planes differ by JPEG-roundtrip LSBs only)."""
    from vosdetectron_tpu.config import Config, apply_overrides
    from vosdetectron_tpu.data.davis import materialize_synthetic_davis
    from vosdetectron_tpu.engine.vos import VOSEngine

    root = str(tmp_path / "davis")
    materialize_synthetic_davis(root, {"seq_a": 0}, num_frames=4,
                                size=(96, 160), num_objects=2)
    over = [
        ("model.num_classes", 2),
        ("test.padded_image_size", (128, 192)),
        ("test.scale", 96), ("test.max_size", 192),
        ("vos.max_tracks", 4), ("vos.track_mask_size", (32, 48)),
        ("data.davis_root", root),
    ]
    cfg = apply_overrides(Config(), over).validate()
    eng = VOSEngine(cfg, rng=0, chunk=2)

    from vosdetectron_tpu.data.davis import (DavisCatalog, read_indexed_png,
                                             read_sequence_frames)

    cat = DavisCatalog(root)
    seq = cat.sequence(cat.split_sequences("val")[0])
    frames = read_sequence_frames(seq)
    gt0 = read_indexed_png(seq.anno_paths[0])

    ref = eng.run_sequence(frames, gt0)
    out = eng.run_sequence(None, prepared=eng.prepare_sequence_from_files(
        seq.frame_paths, gt0))
    assert len(ref) == len(out)
    for a, b in zip(ref, out):
        # identical shapes; id maps may differ on a handful of boundary
        # pixels from the LSB-level yuv difference
        assert a.shape == b.shape
        assert (a != b).mean() < 0.02


@pytest.mark.skipif(not jpegdec.HAVE_JPEGDEC, reason="no native decoder")
@pytest.mark.parametrize("size", [(96, 160), (96, 170)])
def test_den4_native_matches_cv2_packer(tmp_path, size):
    """chroma_den=4 (extra 2x2 chroma box filter, 1.125 B/px): the native
    decoder's averaged planes must match the cv2 packer's INTER_AREA
    downscale, including odd half-width clamp columns (170/2=85)."""
    from vosdetectron_tpu.engine.vos import _to_yuv420_packed

    p = str(tmp_path / "f.jpg")
    _write_test_jpeg(p, size=size)
    h, w = size
    ch, cw = jpegdec.chroma_hw(h, w, 4)
    assert (ch, cw) == ((h // 2 + 1) // 2, (w // 2 + 1) // 2)
    buf = np.empty(jpegdec.packed_size(h, w, 4), np.uint8)
    assert jpegdec.read_packed_into(p, buf, 4)
    ref = _to_yuv420_packed(cv2.imread(p)[None], 4)[0]
    assert buf.shape == ref.shape
    diff = np.abs(buf.astype(np.int16) - ref.astype(np.int16))
    # native averages the encoder's own 4:2:0 planes; cv2 re-derives them
    # from the upsampled BGR, so edges differ a little more than den=2
    assert diff.max() <= 8 and diff.mean() < 1.5, (diff.max(), diff.mean())


def test_den4_roundtrip_solid_colors():
    """Pack at chroma_den=4 -> device unpack must still be ~identity on
    solid colors (chroma is constant, so the extra subsample is exact)."""
    import jax.numpy as jnp

    from vosdetectron_tpu.config import Config, apply_overrides
    from vosdetectron_tpu.engine.vos import VOSEngine, _to_yuv420_packed

    eng = VOSEngine.__new__(VOSEngine)
    eng.cfg = apply_overrides(Config(), [("vos.chroma_den", 4)])
    for col in [(0, 0, 0), (255, 255, 255), (255, 0, 0), (0, 128, 255)]:
        im = np.full((16, 24, 3), col, np.uint8)
        pk = jnp.asarray(_to_yuv420_packed(im[None], 4))
        rec = np.asarray(eng._frames_to_bgr(pk, src_hw=(16, 24)))
        assert np.abs(rec[0, 4, 4] - np.asarray(col, np.float32)).max() \
            <= 2.0, (col, rec[0, 4, 4])


def test_den4_unpack_odd_halfwidth():
    """(h, w)=(16, 26): w/2=13 odd -> cw4=7 ceil; unpack must crop the
    overshoot and reconstruct every column."""
    import jax.numpy as jnp

    from vosdetectron_tpu.config import Config, apply_overrides
    from vosdetectron_tpu.engine.vos import VOSEngine, _to_yuv420_packed

    eng = VOSEngine.__new__(VOSEngine)
    eng.cfg = apply_overrides(Config(), [("vos.chroma_den", 4)])
    rng = np.random.RandomState(3)
    im = cv2.GaussianBlur(
        rng.randint(0, 255, (16, 26, 3)).astype(np.uint8), (0, 0), 3)
    pk = jnp.asarray(_to_yuv420_packed(im[None], 4))
    rec = np.asarray(eng._frames_to_bgr(pk, src_hw=(16, 26)))
    assert rec.shape == (1, 16, 26, 3)
    # luma is carried at full resolution -> reconstruction stays close
    err = np.abs(rec[0] - im.astype(np.float32)).mean()
    assert err < 12.0, err
