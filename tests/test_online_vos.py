"""OnlineVOS (engine/vos.py): the streaming per-frame API must reproduce
the offline chunked engine.

run_sequence batches frames through chunked lax.scans; OnlineVOS drives
the same compiled step one frame at a time against persistent device
state. Association is sequential in both, so outputs should agree up to
conv batch-size numerics (boundary pixels of argmax-rendered id maps)."""

import numpy as np
import pytest

from vosdetectron_tpu.config import Config, apply_overrides
from vosdetectron_tpu.data.davis import make_synthetic_sequence
from vosdetectron_tpu.engine.vos import OnlineVOS, VOSEngine


def vos_cfg():
    return apply_overrides(Config(), [
        ("model.num_classes", 2),
        ("rpn.pre_nms_top_n_test", 64),
        ("rpn.post_nms_top_n_test", 16),
        ("test.padded_image_size", (128, 192)),
        ("test.scale", 96),
        ("test.max_size", 192),
        ("test.detections_per_im", 8),
        ("vos.max_tracks", 4),
        ("vos.track_mask_size", (32, 48)),
        ("vos.assoc_score_thresh", 0.99),
        ("vos.miss_tolerance", 100),
    ]).validate()


@pytest.mark.slow
def test_online_matches_offline_semi_supervised():
    frames, idmaps = make_synthetic_sequence(
        0, num_frames=4, size=(96, 160), num_objects=2)
    eng = VOSEngine(vos_cfg(), rng=0, chunk=4)
    offline = eng.run_sequence(frames, idmaps[0])

    online = OnlineVOS(eng)
    preds = [online.start(frames[0], idmaps[0])]
    for t in range(1, 4):
        preds.append(online.step(frames[t]))

    assert len(preds) == len(offline) == 4
    np.testing.assert_array_equal(preds[0], offline[0])  # GT passthrough
    for t in range(1, 4):
        assert preds[t].shape == offline[t].shape == (96, 160)
        agree = float(np.mean(preds[t] == offline[t]))
        assert agree > 0.995, f"frame {t}: online/offline agreement {agree}"


@pytest.mark.slow
def test_online_unsupervised_start():
    cfg = apply_overrides(vos_cfg(), [
        ("vos.semi_supervised", False),
        ("vos.assoc_score_thresh", 0.15),
        ("vos.new_track_thresh", 0.0),  # random detector: spawn anything
    ]).validate()
    frames, _ = make_synthetic_sequence(
        1, num_frames=2, size=(96, 160), num_objects=2)
    eng = VOSEngine(cfg, rng=0, chunk=2)
    online = OnlineVOS(eng)
    p0 = online.start(frames[0])        # no GT: frame 0 is a step()
    p1 = online.step(frames[1])
    for p in (p0, p1):
        assert p.shape == (96, 160) and p.dtype == np.uint8
        assert int(p.max()) <= cfg.vos.max_tracks


def test_online_errors():
    eng = VOSEngine(vos_cfg(), rng=0, chunk=2)
    online = OnlineVOS(eng)
    with pytest.raises(RuntimeError):
        online.step(np.zeros((96, 160, 3), np.uint8))
    frames, idmaps = make_synthetic_sequence(
        2, num_frames=1, size=(96, 160), num_objects=1)
    online.start(frames[0], idmaps[0])
    with pytest.raises(ValueError):
        online.step(np.zeros((64, 160, 3), np.uint8))
