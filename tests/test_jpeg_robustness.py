"""Real-image JPEG robustness (VERDICT r3 #6): EXIF-rotated, grayscale,
4:4:4-subsampled, and odd-dimension JPEGs must route around the native
raw-plane fast path — per frame — and produce the same results as the
cv2 decode route (reference: the reference's loaders digested arbitrary
real COCO/DAVIS JPEGs through cv2.imread, SURVEY.md:121,127)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vosdetectron_tpu.config import Config, apply_overrides
from vosdetectron_tpu.data.davis import (make_synthetic_sequence,
                                         read_image_bgr,
                                         read_sequence_frames_paths,
                                         write_indexed_png)
from vosdetectron_tpu.engine.vos import VOSEngine
from vosdetectron_tpu.native import jpegdec


def _save_exif_jpeg(path, bgr, orientation):
    from PIL import Image

    im = Image.fromarray(bgr[..., ::-1])  # PIL wants RGB
    ex = Image.Exif()
    ex[0x0112] = orientation
    im.save(path, format="JPEG", quality=95, exif=ex)


def _save_444_jpeg(path, bgr):
    from PIL import Image

    Image.fromarray(bgr[..., ::-1]).save(path, format="JPEG", quality=95,
                                         subsampling=0)  # 4:4:4


def _engine(chunk=2):
    cfg = apply_overrides(Config(), [
        ("model.num_classes", 2),
        ("test.padded_image_size", (128, 192)),
        ("test.scale", 96), ("test.max_size", 192),
        ("vos.max_tracks", 4), ("vos.track_mask_size", (32, 48)),
        ("rpn.pre_nms_top_n_test", 64),
        ("rpn.post_nms_top_n_test", 16),
        ("test.detections_per_im", 8),
    ]).validate()
    return VOSEngine(cfg, rng=0, chunk=chunk)


def _write_seq(dirpath, frames, writer=None):
    os.makedirs(dirpath, exist_ok=True)
    paths = []
    for t, fr in enumerate(frames):
        p = os.path.join(dirpath, f"{t:05d}.jpg")
        if writer is None:
            cv2.imwrite(p, fr, [cv2.IMWRITE_JPEG_QUALITY, 95])
        else:
            writer(p, fr)
        paths.append(p)
    return paths


def _compare_file_vs_array(eng, paths, gt0, exact):
    """prepare_sequence_from_files vs the cv2-decoded-array route. When
    the file route falls back entirely to cv2 the two are IDENTICAL;
    when some frames ride the native fast path they differ by JPEG
    encoder-plane LSBs only (same bound as test_jpegdec.py)."""
    frames = read_sequence_frames_paths(paths)
    ref = eng.run_sequence(frames, gt0)
    out = eng.run_sequence(None, prepared=eng.prepare_sequence_from_files(
        paths, gt0))
    assert len(ref) == len(out)
    for a, b in zip(ref, out):
        assert a.shape == b.shape
        if exact:
            np.testing.assert_array_equal(a, b)
        else:
            assert (a != b).mean() < 0.02


def test_exif_orientation_parser(tmp_path):
    im = np.zeros((40, 60, 3), np.uint8)
    im[:20] = (255, 0, 0)
    for o in (1, 3, 6, 8):
        p = str(tmp_path / f"o{o}.jpg")
        _save_exif_jpeg(p, im, o)
        assert jpegdec.exif_orientation(np.fromfile(p, np.uint8)) == o
    # plain cv2 jpeg: no EXIF -> 1
    p = str(tmp_path / "plain.jpg")
    cv2.imwrite(p, im)
    assert jpegdec.exif_orientation(np.fromfile(p, np.uint8)) == 1
    # non-JPEG bytes -> 1 (never blocks a fallback that would anyway run)
    assert jpegdec.exif_orientation(np.zeros(16, np.uint8)) == 1


@pytest.mark.skipif(not jpegdec.HAVE_JPEGDEC, reason="no native decoder")
def test_exif_rotated_file_gets_no_fast_path(tmp_path):
    """probe_file must refuse the raw path for EXIF-rotated JPEGs (the
    raw planes skip the rotation cv2 applies) and decode_packed_into
    must refuse per frame."""
    frames, _ = make_synthetic_sequence(0, num_frames=1, size=(96, 160),
                                        num_objects=2)
    p = str(tmp_path / "rot.jpg")
    _save_exif_jpeg(p, frames[0], 6)
    # cv2 decodes this rotated (the ground truth of "what the image is")
    assert read_image_bgr(p).shape[:2] == (160, 96)
    pr = jpegdec.probe_file(p)
    assert pr is not None and not pr[2]
    buf = np.empty(jpegdec.packed_size(96, 160), np.uint8)
    assert not jpegdec.read_packed_into(p, buf)
    # orientation 1 keeps the fast path
    p1 = str(tmp_path / "norm.jpg")
    _save_exif_jpeg(p1, frames[0], 1)
    pr1 = jpegdec.probe_file(p1)
    assert pr1 is not None and pr1[2]


@pytest.mark.skipif(not jpegdec.HAVE_JPEGDEC, reason="no native decoder")
def test_exif_rotated_sequence_end_to_end(tmp_path):
    """A whole EXIF-rotated sequence through prepare_sequence_from_files
    equals the cv2 array route bit-for-bit (full fallback)."""
    # stored PORTRAIT so the displayed (rotated) image is the landscape
    # geometry the test config pads for
    frames, idmaps = make_synthetic_sequence(1, num_frames=4,
                                             size=(160, 96), num_objects=2)
    paths = _write_seq(str(tmp_path / "seq"), list(frames),
                       writer=lambda p, fr: _save_exif_jpeg(p, fr, 6))
    # GT in DISPLAY orientation (what cv2 decodes): orientation 6 shows
    # the stored image rotated 90 deg clockwise
    gt0 = np.rot90(idmaps[0], k=-1).copy()
    assert read_image_bgr(paths[0]).shape[:2] == gt0.shape
    eng = _engine()
    _compare_file_vs_array(eng, paths, gt0, exact=True)


@pytest.mark.skipif(not jpegdec.HAVE_JPEGDEC, reason="no native decoder")
def test_grayscale_frame_mid_sequence(tmp_path):
    """One grayscale JPEG mid-sequence: the native decode returns
    not-4:2:0 for that frame and the engine's per-frame fallback packs
    it from cv2 (3-channel replicated gray) — end-to-end output matches
    the array route."""
    frames, idmaps = make_synthetic_sequence(2, num_frames=4,
                                             size=(96, 160), num_objects=2)
    paths = _write_seq(str(tmp_path / "seq"), list(frames))
    gray = cv2.cvtColor(frames[2], cv2.COLOR_BGR2GRAY)
    cv2.imwrite(paths[2], gray, [cv2.IMWRITE_JPEG_QUALITY, 95])
    pr = jpegdec.probe_file(paths[2])
    assert pr is not None and not pr[2]  # 1-component: no fast path
    eng = _engine()
    _compare_file_vs_array(eng, paths, idmaps[0], exact=False)


@pytest.mark.skipif(not jpegdec.HAVE_JPEGDEC, reason="no native decoder")
def test_444_frame_mid_sequence(tmp_path):
    """One 4:4:4-subsampled JPEG mid-sequence falls back per frame."""
    frames, idmaps = make_synthetic_sequence(3, num_frames=4,
                                             size=(96, 160), num_objects=2)
    paths = _write_seq(str(tmp_path / "seq"), list(frames))
    _save_444_jpeg(paths[1], frames[1])
    pr = jpegdec.probe_file(paths[1])
    assert pr is not None and not pr[2]  # 1x1 sampling: no fast path
    eng = _engine()
    _compare_file_vs_array(eng, paths, idmaps[0], exact=False)


def test_odd_dimension_sequence(tmp_path):
    """Odd-dimension frames (95x157): no 4:2:0 layout exists, the whole
    sequence must take the cv2 route and match the array path exactly."""
    frames, idmaps = make_synthetic_sequence(4, num_frames=4,
                                             size=(95, 157), num_objects=2)
    paths = _write_seq(str(tmp_path / "seq"), list(frames))
    if jpegdec.HAVE_JPEGDEC:
        pr = jpegdec.probe_file(paths[0])
        assert pr is not None and not pr[2]
    eng = _engine()
    _compare_file_vs_array(eng, paths, idmaps[0], exact=True)
