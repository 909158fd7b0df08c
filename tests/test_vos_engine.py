"""End-to-end VOS engine test: synthetic sequence, semi-supervised protocol.

With random (untrained) detector weights the detections are garbage — the
invariant under test is the ENGINE: identity propagation must carry the
first-frame GT tracks through the scan, association must not corrupt ids,
and the output indexed maps must stay consistent with the GT object set.
A high assoc threshold disables spurious matches so the propagated GT
masks dominate, giving a measurable J&F floor on a static-ish sequence.
"""

import numpy as np
import pytest

from vosdetectron_tpu.config import Config, apply_overrides
from vosdetectron_tpu.data.davis import make_synthetic_sequence
from vosdetectron_tpu.engine.vos import VOSEngine
from vosdetectron_tpu.metrics.davis_jf import evaluate_sequence


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
        ("vos.assoc_score_thresh", 0.99),  # isolate propagation path
        ("vos.miss_tolerance", 100),
    ]).validate()


@pytest.mark.slow
def test_vos_sequence_semi_supervised():
    frames, idmaps = make_synthetic_sequence(
        0, num_frames=6, size=(96, 160), num_objects=2)
    # nearly-static sequence: zero out motion by using frame 0 repeatedly
    frames = np.repeat(frames[:1], 6, axis=0)
    idmaps = np.repeat(idmaps[:1], 6, axis=0)

    eng = VOSEngine(vos_cfg(), rng=0, chunk=3)
    preds = eng.run_sequence(frames, idmaps[0])

    assert len(preds) == 6
    assert preds[0].shape == (96, 160)
    # predicted ids must be a subset of GT ids
    for p in preds:
        assert set(np.unique(p)).issubset({0, 1, 2})
    # identity propagation on a static sequence keeps the GT objects
    res = evaluate_sequence(preds, list(idmaps))
    assert res["J"] > 0.7, f"propagated J too low: {res}"


def test_engine_params_committed_to_device():
    """Weights must be device-committed at construction: host numpy params
    re-upload on EVERY jitted call (~150 MB/chunk through the tunnel —
    measured 3.1 vs 183.5 f/s device scan, commit 6e400aa)."""
    import jax

    from vosdetectron_tpu.engine.inference import Detector

    cfg = vos_cfg()
    eng = VOSEngine(cfg, rng=0, chunk=2)
    for leaf in jax.tree_util.tree_leaves(eng.params):
        assert isinstance(leaf, jax.Array) and leaf.committed
    det = Detector(cfg, rng=0)
    for leaf in jax.tree_util.tree_leaves(det.params):
        assert isinstance(leaf, jax.Array) and leaf.committed
