"""Learned propagation head: warp math, identity-at-init, training gain,
engine integration (reference: fork-added propagation module, SURVEY.md
§2.2 — the Tier-A "mask-propagate" capability)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vosdetectron_tpu.config import Config, apply_overrides
from vosdetectron_tpu.models.propagation import (PropagationHead,
                                                 init_propagation_params,
                                                 local_correlation,
                                                 warp_bilinear)


def small_cfg(**extra):
    over = [
        ("model.num_classes", 2),
        ("test.padded_image_size", (128, 192)),
        ("test.scale", 96),
        ("test.max_size", 192),
        ("vos.max_tracks", 4),
        ("vos.track_mask_size", (32, 48)),
    ] + list(extra.items())
    return apply_overrides(Config(), over).validate()


def test_warp_bilinear_integer_shift():
    m = np.zeros((1, 8, 8), np.float32)
    m[0, 2:4, 2:4] = 1.0
    flow = np.zeros((8, 8, 2), np.float32)
    flow[..., 0] = 1.0  # out[y] = in[y+1] -> content moves up
    out = np.asarray(warp_bilinear(jnp.asarray(m), jnp.asarray(flow)))
    exp = np.zeros_like(m)
    exp[0, 1:3, 2:4] = 1.0
    np.testing.assert_allclose(out, exp)


def test_warp_bilinear_subpixel_weights():
    m = np.zeros((1, 1, 4), np.float32)
    m[0, 0, 1] = 1.0
    flow = np.full((1, 4, 2), 0.0, np.float32)
    flow[..., 1] = 0.5
    out = np.asarray(warp_bilinear(jnp.asarray(m), jnp.asarray(flow)))
    np.testing.assert_allclose(out[0, 0], [0.5, 0.5, 0.0, 0.0], atol=1e-6)


def test_local_correlation_peak_at_true_shift(rng):
    a = rng.randn(16, 16, 8).astype(np.float32)
    b = np.roll(a, shift=(-2, 1), axis=(0, 1))  # b[y,x] = a[y+2, x-1]
    corr = np.asarray(local_correlation(jnp.asarray(a), jnp.asarray(b), 3))
    # interior pixel: displacement (dy=2, dx=-1) should win
    idx = corr[8, 8].argmax()
    dy, dx = idx // 7 - 3, idx % 7 - 3
    assert (dy, dx) == (2, -1)


def test_untrained_head_is_identity(rng):
    cfg = small_cfg()
    head = PropagationHead(feat_dim=cfg.vos.prop_feat_dim)
    params = init_propagation_params(cfg, head, jax.random.PRNGKey(0), 64)
    img = rng.randn(32, 48, 3).astype(np.float32) * 50
    feat = rng.randn(32, 48, 64).astype(np.float32) * 10
    inp = head.apply({"params": params}, jnp.asarray(img),
                     jnp.asarray(feat), method=PropagationHead.frame_input)
    masks = (rng.rand(4, 32, 48) > 0.5).astype(np.float32)
    prop = np.asarray(head.apply({"params": params}, inp, inp,
                                 jnp.asarray(masks)))
    assert ((prop > 0.5) == (masks > 0.5)).all()


def test_training_fits_motion(rng):
    """A short run must already beat identity on its own training data —
    the fit-capability check (generalization is the slow test below)."""
    from vosdetectron_tpu.data.davis import make_synthetic_sequence
    from vosdetectron_tpu.engine.train_propagation import (
        PropagationTrainer, build_pair_batches)

    cfg = small_cfg()
    tr = PropagationTrainer(cfg, rng=0, lr=1e-3)
    seqs = [make_synthetic_sequence(s, 8, (96, 160), 2) for s in range(2)]
    batches = build_pair_batches(tr, seqs)
    base = tr.evaluate_pairs(batches[0])
    for it in range(250):
        tr.train_step(batches[it % len(batches)])
    final = tr.evaluate_pairs(batches[0])
    assert final["J_learned"] > base["J_identity"] + 0.02, (base, final)


@pytest.mark.slow
def test_training_generalizes_to_heldout_motion():
    """Held-out sequences with unseen objects/motion: learned propagation
    must beat identity by a reported margin (VERDICT r1 missing #1)."""
    from vosdetectron_tpu.engine.train_propagation import train_on_synthetic

    cfg = small_cfg()
    _, report = train_on_synthetic(cfg, num_train_seqs=24, num_frames=10,
                                   steps=2000, lr=1e-3, rng=0,
                                   size=(96, 160), num_objects=2)
    assert report["J_learned_final"] > report["J_identity"] + 0.02, report


@pytest.mark.slow
def test_vos_engine_with_learned_head():
    """Engine integration: the scan runs with vos.propagation=learned and
    an untrained (identity-equivalent) head keeps GT tracks on a static
    sequence, same invariant as the identity-propagation engine test."""
    from vosdetectron_tpu.data.davis import make_synthetic_sequence
    from vosdetectron_tpu.engine.vos import VOSEngine
    from vosdetectron_tpu.metrics.davis_jf import evaluate_sequence

    cfg = small_cfg(**{
        "rpn.pre_nms_top_n_test": 64,
        "rpn.post_nms_top_n_test": 16,
        "test.detections_per_im": 8,
        "vos.assoc_score_thresh": 0.99,
        "vos.miss_tolerance": 100,
        "vos.propagation": "learned",
    })
    frames, idmaps = make_synthetic_sequence(
        0, num_frames=6, size=(96, 160), num_objects=2)
    frames = np.repeat(frames[:1], 6, axis=0)
    idmaps = np.repeat(idmaps[:1], 6, axis=0)

    eng = VOSEngine(cfg, rng=0, chunk=3)
    preds = eng.run_sequence(frames, idmaps[0])
    assert len(preds) == 6
    for p in preds:
        assert set(np.unique(p)).issubset({0, 1, 2})
    res = evaluate_sequence(preds, list(idmaps))
    assert res["J"] > 0.6, f"learned-head engine J too low: {res}"
