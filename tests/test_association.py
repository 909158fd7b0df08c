"""Confidence-gated detection-track association (VERDICT r2 #3).

The reference's association overwrites a track's mask with the matched
detection's mask unconditionally; the gated update blends by relative
confidence so a weak detection cannot destroy a confident propagated mask
(reference: fork-added association module, SURVEY.md:133 — propagated-mask
IoU + embedding matching with spawn/retire).
"""

import numpy as np
import jax.numpy as jnp

from vosdetectron_tpu.config import Config, apply_overrides
from vosdetectron_tpu.models.propagation import (TrackState,
                                                 associate_and_update,
                                                 empty_track_state)


def make_cfg(**vos_over):
    over = [("vos.max_tracks", 4), ("vos.track_mask_size", (16, 24)),
            ("vos.emb_dim", 8), ("vos.assoc_score_thresh", 0.1)]
    over += [(f"vos.{k}", v) for k, v in vos_over.items()]
    return apply_overrides(Config(), over).validate()


def seeded_state(cfg, mask, score=0.9):
    st = empty_track_state(cfg, 8)
    return TrackState(
        masks=st.masks.at[0].set(mask),
        emb=st.emb.at[0, 0].set(1.0),
        alive=st.alive.at[0].set(True),
        miss=st.miss,
        score=st.score.at[0].set(score),
        obj_id=st.obj_id.at[0].set(1),
        pfeat=None)


def det_inputs(cfg, mask, score):
    d = cfg.vos.max_dets_per_frame
    mh, mw = cfg.vos.track_mask_size
    masks = jnp.zeros((d, mh, mw)).at[0].set(mask)
    emb = jnp.zeros((d, 8)).at[0, 0].set(1.0)
    scores = jnp.zeros((d,)).at[0].set(score)
    valid = jnp.zeros((d,), bool).at[0].set(True)
    return masks, emb, scores, valid


def square_mask(cfg, x0, x1):
    mh, mw = cfg.vos.track_mask_size
    m = np.zeros((mh, mw), np.float32)
    m[4:12, x0:x1] = 1.0
    return jnp.asarray(m)


def test_weak_detection_below_floor_keeps_propagated_mask():
    cfg = make_cfg(assoc_det_floor=0.3)
    prop = square_mask(cfg, 4, 16)
    det = square_mask(cfg, 8, 20)  # overlaps but shifted
    st = seeded_state(cfg, prop, score=0.9)
    dm, de, ds, dv = det_inputs(cfg, det, score=0.2)  # below floor
    out = associate_and_update(cfg, st, dm, de, ds, dv, prop[None].repeat(
        cfg.vos.max_tracks, 0) * st.alive[:, None, None])
    np.testing.assert_allclose(np.asarray(out.masks[0]), np.asarray(prop),
                               atol=1e-6)
    assert int(out.miss[0]) == 0  # the match still resets miss
    # weak det must not collapse the score outright; with the blend fully
    # floor-gated (w=0) the track counts as unsupported this frame and
    # decays at score_decay_unsupported, no faster
    assert float(out.score[0]) >= 0.9 * cfg.vos.score_decay_unsupported - 1e-6


def test_weak_detection_blends_mostly_propagated():
    # agreement gate disabled ((0,0) ramp saturates at 1) to isolate the
    # confidence blend
    cfg = make_cfg(assoc_det_floor=0.0, assoc_blend_sharpness=2.0,
                   assoc_agreement_gate=(0.0, 0.0))
    prop = square_mask(cfg, 4, 16)
    det = square_mask(cfg, 8, 20)
    st = seeded_state(cfg, prop, score=0.9)
    dm, de, ds, dv = det_inputs(cfg, det, score=0.4)
    propagated = prop[None].repeat(cfg.vos.max_tracks, 0) \
        * st.alive[:, None, None]
    out = associate_and_update(cfg, st, dm, de, ds, dv, propagated)
    m = np.asarray(out.masks[0])
    # w_det = .4^2/(.4^2+.9^2) ~ 0.165: the region only the propagated
    # mask covers keeps ~83% weight; det-only region gets ~17%.
    w = 0.4 ** 2 / (0.4 ** 2 + 0.9 ** 2)
    np.testing.assert_allclose(m[8, 5], 1.0 - w, atol=1e-3)
    np.testing.assert_allclose(m[8, 18], w, atol=1e-3)


def test_strong_agreeing_detection_on_weak_track_mostly_adopts_det():
    cfg = make_cfg(assoc_det_floor=0.0, assoc_blend_sharpness=2.0)
    prop = square_mask(cfg, 4, 16)
    det = square_mask(cfg, 5, 17)  # near-identical: IoU 0.846 > gate hi
    st = seeded_state(cfg, prop, score=0.3)
    dm, de, ds, dv = det_inputs(cfg, det, score=0.95)
    propagated = prop[None].repeat(cfg.vos.max_tracks, 0) \
        * st.alive[:, None, None]
    out = associate_and_update(cfg, st, dm, de, ds, dv, propagated)
    m = np.asarray(out.masks[0])
    w = 0.95 ** 2 / (0.95 ** 2 + 0.3 ** 2)
    assert w > 0.9
    np.testing.assert_allclose(m[8, 16], w, atol=1e-3)  # det-only column
    assert float(out.score[0]) >= 0.95 - 1e-6  # strong det raises score


def test_confident_but_contradicting_detection_is_ignored():
    """The dominant failure mode with a weakly-generalizing detector:
    a CONFIDENT detection whose mask contradicts a confident propagated
    mask must not corrupt the track (agreement gate at work)."""
    cfg = make_cfg(assoc_det_floor=0.0, assoc_score_thresh=0.0)
    mh, mw = cfg.vos.track_mask_size
    prop = square_mask(cfg, 2, 10)
    det = jnp.zeros((mh, mw)).at[4:12, 12:20].set(1.0)  # overlap cols none
    # soft IoU between prop ([4:12, 2:10]) and det ([4:12, 12:20]) is 0
    st = seeded_state(cfg, prop, score=0.9)
    dm, de, ds, dv = det_inputs(cfg, det, score=0.99)
    propagated = prop[None].repeat(cfg.vos.max_tracks, 0) \
        * st.alive[:, None, None]
    out = associate_and_update(cfg, st, dm, de, ds, dv, propagated)
    # whether or not the greedy match fired (emb sim can exceed the
    # threshold), the mask must remain the propagated one
    np.testing.assert_allclose(np.asarray(out.masks[0]), np.asarray(prop),
                               atol=1e-6)
    # and the embedding must not have moved toward the contradicting det
    np.testing.assert_allclose(np.asarray(out.emb[0, 0]), 1.0, atol=1e-6)


def test_blend_disabled_restores_reference_overwrite():
    cfg = make_cfg(assoc_blend=False)
    prop = square_mask(cfg, 4, 16)
    det = square_mask(cfg, 8, 20)
    st = seeded_state(cfg, prop, score=0.9)
    dm, de, ds, dv = det_inputs(cfg, det, score=0.2)
    propagated = prop[None].repeat(cfg.vos.max_tracks, 0) \
        * st.alive[:, None, None]
    out = associate_and_update(cfg, st, dm, de, ds, dv, propagated)
    np.testing.assert_allclose(np.asarray(out.masks[0]), np.asarray(det),
                               atol=1e-6)


def test_max_spawn_config_honored():
    cfg = make_cfg(semi_supervised=False, max_spawn=2,
                   new_track_thresh=0.5)
    st = empty_track_state(cfg, 8)
    d = cfg.vos.max_dets_per_frame
    mh, mw = cfg.vos.track_mask_size
    masks = jnp.zeros((d, mh, mw))
    for i in range(4):
        masks = masks.at[i, 2 * i:2 * i + 2, :].set(1.0)
    emb = jnp.zeros((d, 8)).at[:, 0].set(1.0)
    scores = jnp.zeros((d,)).at[:4].set(0.9)
    valid = jnp.zeros((d,), bool).at[:4].set(True)
    out = associate_and_update(cfg, st, masks, emb, scores, valid,
                               st.masks)
    assert int(out.alive.sum()) == 2  # capped by max_spawn, not 4


def test_semi_supervised_tracks_never_retire():
    """DAVIS semi-supervised protocol: the object set is fixed at frame 0,
    so a detector dry spell longer than miss_tolerance must NOT retire the
    track — it keeps propagating (a retired track could never return and
    the object's J would be zero for the rest of the sequence)."""
    cfg = make_cfg(miss_tolerance=3, semi_supervised=True)
    mask = square_mask(cfg, 8, 16)
    st = seeded_state(cfg, mask)
    no_det = det_inputs(cfg, jnp.zeros_like(mask), 0.0)
    # 10 frames with no detection at all (valid=False everywhere)
    masks, emb, scores, _ = no_det
    valid = jnp.zeros_like(scores, bool)
    for _ in range(10):
        st = associate_and_update(cfg, st, masks, emb, scores, valid,
                                  propagated=st.masks)
    assert bool(st.alive[0])          # still alive well past tolerance
    assert int(st.miss[0]) == 10      # miss counter still reports truth
    np.testing.assert_allclose(np.asarray(st.masks[0]), np.asarray(mask))


def _rescue_setup(cfg, n_lost=1):
    """Two alive tracks: slot 0 'lost' (drifted, decayed score), slot 1
    healthy. Anchor embeddings one-hot on distinct axes."""
    st = empty_track_state(cfg, 8)
    mh, mw = cfg.vos.track_mask_size
    drifted = jnp.zeros((mh, mw)).at[0:4, 0:4].set(1.0)   # far corner
    healthy = square_mask(cfg, 4, 12)
    emb = st.emb.at[0, 0].set(1.0).at[1, 1].set(1.0)
    return TrackState(
        masks=st.masks.at[0].set(drifted).at[1].set(healthy),
        emb=emb,
        alive=st.alive.at[0].set(True).at[1].set(True),
        miss=st.miss,
        score=st.score.at[0].set(0.2).at[1].set(0.9),
        obj_id=st.obj_id.at[0].set(1).at[1].set(2),
        pfeat=None,
        emb0=emb)


def test_rescue_reanchors_drifted_track():
    """A lost track (decayed score, zero IoU with every det, working
    embedding drift-polluted so the greedy match declines) must be
    re-anchored outright to a confident unclaimed detection that is its
    unambiguous ANCHOR-embedding match (emb0, not the polluted emb)."""
    cfg = make_cfg()
    st = _rescue_setup(cfg)
    # Drift pollution: the working embedding no longer resembles the
    # anchor (anti-aligned with the det -> cosine -1 -> assoc score 0,
    # below the match threshold). emb0 stays the frozen birth anchor.
    st = st._replace(emb=st.emb.at[0, 0].set(-1.0))
    mh, mw = cfg.vos.track_mask_size
    d = cfg.vos.max_dets_per_frame
    det0 = jnp.zeros((mh, mw)).at[8:14, 16:22].set(1.0)  # where obj 1 really is
    dm = jnp.zeros((d, mh, mw)).at[0].set(det0)
    de = jnp.zeros((d, 8)).at[0, 0].set(1.0)             # matches track 0 anchor
    ds = jnp.zeros((d,)).at[0].set(0.9)
    dv = jnp.zeros((d,), bool).at[0].set(True)
    propagated = st.masks
    out = associate_and_update(cfg, st, dm, de, ds, dv, propagated)
    np.testing.assert_allclose(np.asarray(out.masks[0]), np.asarray(det0),
                               atol=1e-6)
    assert float(out.score[0]) >= 0.9 - 1e-6
    # anchor embedding itself must remain frozen
    np.testing.assert_allclose(np.asarray(out.emb0[0, 0]), 1.0)
    # healthy track untouched
    np.testing.assert_allclose(np.asarray(out.masks[1]),
                               np.asarray(st.masks[1]), atol=1e-6)


def test_rescue_requires_confident_track_to_stay_put():
    """A CONFIDENT track (score above rescue_track_conf) is never
    re-anchored, even by a perfect embedding match with zero IoU —
    that is the agreement gate's jurisdiction."""
    cfg = make_cfg()
    st = _rescue_setup(cfg)
    st = st._replace(score=st.score.at[0].set(0.9))  # track 0 confident
    mh, mw = cfg.vos.track_mask_size
    d = cfg.vos.max_dets_per_frame
    det0 = jnp.zeros((mh, mw)).at[8:14, 16:22].set(1.0)
    dm = jnp.zeros((d, mh, mw)).at[0].set(det0)
    de = jnp.zeros((d, 8)).at[0, 0].set(1.0)
    ds = jnp.zeros((d,)).at[0].set(0.9)
    dv = jnp.zeros((d,), bool).at[0].set(True)
    out = associate_and_update(cfg, st, dm, de, ds, dv, st.masks)
    np.testing.assert_allclose(np.asarray(out.masks[0]),
                               np.asarray(st.masks[0]), atol=1e-6)


def test_rescue_ambiguous_match_declines():
    """Two lost tracks with the SAME anchor embedding and one candidate
    detection: the margin/mutual-best test must refuse to guess."""
    cfg = make_cfg()
    st = _rescue_setup(cfg)
    emb = st.emb.at[1].set(0.0).at[1, 0].set(1.0)  # track 1 same axis as 0
    st = st._replace(emb=emb, emb0=emb,
                     score=st.score.at[1].set(0.2))  # both lost
    mh, mw = cfg.vos.track_mask_size
    d = cfg.vos.max_dets_per_frame
    det0 = jnp.zeros((mh, mw)).at[8:14, 16:22].set(1.0)
    dm = jnp.zeros((d, mh, mw)).at[0].set(det0)
    de = jnp.zeros((d, 8)).at[0, 0].set(1.0)
    ds = jnp.zeros((d,)).at[0].set(0.9)
    dv = jnp.zeros((d,), bool).at[0].set(True)
    out = associate_and_update(cfg, st, dm, de, ds, dv, st.masks)
    # Two equally-similar lost tracks: the COLUMN margin (chosen det must
    # prefer this track over every other lost track by rescue_margin)
    # refuses the coin flip — neither track may be re-anchored.
    for i in (0, 1):
        np.testing.assert_allclose(np.asarray(out.masks[i]),
                                   np.asarray(st.masks[i]), atol=1e-6)


def test_rescue_leaves_claimed_detection_alone():
    """A detection blending into a healthy track (agreeing match) must not
    simultaneously re-anchor a lost track."""
    cfg = make_cfg(assoc_det_floor=0.0)
    st = _rescue_setup(cfg)
    mh, mw = cfg.vos.track_mask_size
    d = cfg.vos.max_dets_per_frame
    det0 = square_mask(cfg, 5, 13)  # near-identical to healthy track 1
    dm = jnp.zeros((d, mh, mw)).at[0].set(det0)
    # embedding matches BOTH track anchors equally (axis 0 and 1)
    de = jnp.zeros((d, 8)).at[0, 0].set(0.707).at[0, 1].set(0.707)
    ds = jnp.zeros((d,)).at[0].set(0.95)
    dv = jnp.zeros((d,), bool).at[0].set(True)
    out = associate_and_update(cfg, st, dm, de, ds, dv, st.masks)
    # lost track 0 must NOT adopt the det claimed by healthy track 1
    np.testing.assert_allclose(np.asarray(out.masks[0]),
                               np.asarray(st.masks[0]), atol=1e-6)


def test_rescue_disabled_keeps_lost_track_drifting():
    cfg = make_cfg(assoc_rescue=False)
    st = _rescue_setup(cfg)
    mh, mw = cfg.vos.track_mask_size
    d = cfg.vos.max_dets_per_frame
    det0 = jnp.zeros((mh, mw)).at[8:14, 16:22].set(1.0)
    dm = jnp.zeros((d, mh, mw)).at[0].set(det0)
    de = jnp.zeros((d, 8)).at[0, 0].set(1.0)
    ds = jnp.zeros((d,)).at[0].set(0.9)
    dv = jnp.zeros((d,), bool).at[0].set(True)
    out = associate_and_update(cfg, st, dm, de, ds, dv, st.masks)
    np.testing.assert_allclose(np.asarray(out.masks[0]),
                               np.asarray(st.masks[0]), atol=1e-6)


def test_unsupervised_tracks_retire_after_miss_tolerance():
    """Unsupervised mode keeps the reference's retire semantics."""
    cfg = make_cfg(miss_tolerance=3, semi_supervised=False,
                   new_track_thresh=2.0)  # no spawns
    mask = square_mask(cfg, 8, 16)
    st = seeded_state(cfg, mask)
    masks, emb, scores, _ = det_inputs(cfg, jnp.zeros_like(mask), 0.0)
    valid = jnp.zeros_like(scores, bool)
    for _ in range(4):
        st = associate_and_update(cfg, st, masks, emb, scores, valid,
                                  propagated=st.masks)
    assert not bool(st.alive[0])


def test_rescue_steals_detection_from_drifted_claimer():
    """Claim starvation (measured on heldout_1003): a drifted track parks
    on ANOTHER object and keeps claiming its detection every frame, so
    the true owner's rescue never sees a free candidate. A lost track
    whose ANCHOR similarity to the claimed det beats the claimer's by
    rescue_steal_margin must take it; the claimer's update is cancelled
    (it reverts to its propagated mask)."""
    cfg = make_cfg(assoc_det_floor=0.0, assoc_agreement_gate=(0.0, 0.0))
    st = _rescue_setup(cfg)
    mh, mw = cfg.vos.track_mask_size
    d = cfg.vos.max_dets_per_frame
    # one det, sitting exactly where healthy track 1's mask is -> track 1
    # claims it through the normal match (high IoU with its propagated)
    det0 = square_mask(cfg, 4, 12)
    dm = jnp.zeros((d, mh, mw)).at[0].set(det0)
    # ...but by ANCHOR similarity the det is track 0's object, clearly
    de = jnp.zeros((d, 8)).at[0, 0].set(0.9).at[0, 1].set(0.436)
    ds = jnp.zeros((d,)).at[0].set(0.95)
    dv = jnp.zeros((d,), bool).at[0].set(True)
    out = associate_and_update(cfg, st, dm, de, ds, dv, st.masks)
    # lost track 0 stole the det
    np.testing.assert_allclose(np.asarray(out.masks[0]), np.asarray(det0),
                               atol=1e-6)
    # the claimer reverted to its propagated mask (no shared det mask)
    np.testing.assert_allclose(np.asarray(out.masks[1]),
                               np.asarray(st.masks[1]), atol=1e-6)
    # and pays the unsupported decay for the frame
    assert float(out.score[1]) <= 0.9 * cfg.vos.score_decay_unsupported + 1e-6


def test_rescue_steal_respects_margin():
    """When the claimer's anchor similarity is comparable (within the
    steal margin), the claim stands — identical-looking objects must not
    swap dets."""
    cfg = make_cfg(assoc_det_floor=0.0, assoc_agreement_gate=(0.0, 0.0))
    st = _rescue_setup(cfg)
    mh, mw = cfg.vos.track_mask_size
    d = cfg.vos.max_dets_per_frame
    det0 = square_mask(cfg, 4, 12)
    dm = jnp.zeros((d, mh, mw)).at[0].set(det0)
    de = jnp.zeros((d, 8)).at[0, 0].set(0.707).at[0, 1].set(0.707)
    ds = jnp.zeros((d,)).at[0].set(0.95)
    dv = jnp.zeros((d,), bool).at[0].set(True)
    out = associate_and_update(cfg, st, dm, de, ds, dv, st.masks)
    np.testing.assert_allclose(np.asarray(out.masks[0]),
                               np.asarray(st.masks[0]), atol=1e-6)


def _jump_inputs(cfg):
    mh, mw = cfg.vos.track_mask_size
    d = cfg.vos.max_dets_per_frame
    wrong = jnp.zeros((mh, mw)).at[0:4, 0:4].set(1.0)   # = track 0's mask
    right = jnp.zeros((mh, mw)).at[8:14, 16:22].set(1.0)
    dm = jnp.zeros((d, mh, mw)).at[0].set(wrong).at[1].set(right)
    # det 0 (the wrong object) matches track 0's anchor weakly; det 1
    # (free, disjoint from det 0) matches it far better
    de = jnp.zeros((d, 8)).at[0, 0].set(0.5).at[1, 0].set(0.98)
    ds = jnp.zeros((d,)).at[0].set(0.9).at[1].set(0.9)
    dv = jnp.zeros((d,), bool).at[0].set(True).at[1].set(True)
    return right, dm, de, ds, dv


def test_rescue_jump_from_wrong_object_lock():
    """Anchor jump (measured on heldout_1007): a track matched to the
    WRONG object with a healthy score must jump to a free confident det
    that matches its anchor embedding better by rescue_jump_margin —
    after the condition persists rescue_jump_patience frames.

    rescue_jump ships default-OFF (measured-and-rejected for the bench
    config — see ROUND5_STATUS); the behavior stays tested under an
    explicit opt-in so the guard logic can't rot."""
    cfg = make_cfg(assoc_det_floor=0.0, assoc_agreement_gate=(0.0, 0.0),
                   rescue_jump=True)
    st = _rescue_setup(cfg)
    # track 0 is CONFIDENT but sitting on the wrong object
    st = st._replace(score=st.score.at[0].set(0.95))
    right, dm, de, ds, dv = _jump_inputs(cfg)
    for i in range(cfg.vos.rescue_jump_patience):
        # within patience the track must NOT have moved to `right`
        assert float(jnp.minimum(st.masks[0], right).sum()) < 1.0, i
        st = associate_and_update(cfg, st, dm, de, ds, dv, st.masks)
        st = st._replace(score=st.score.at[0].set(0.95))
    np.testing.assert_allclose(np.asarray(st.masks[0]), np.asarray(right),
                               atol=1e-6)


def test_rescue_jump_patience_resets_on_jitter():
    """One qualifying frame followed by a clean frame must reset the
    drift counter — sim jitter between lookalike dets never jumps."""
    cfg = make_cfg(assoc_det_floor=0.0, assoc_agreement_gate=(0.0, 0.0))
    st = _rescue_setup(cfg)
    st = st._replace(score=st.score.at[0].set(0.95))
    right, dm, de, ds, dv = _jump_inputs(cfg)
    de_clean = de.at[1, 0].set(0.0)  # free det stops looking like anchor
    pat = cfg.vos.rescue_jump_patience
    for i in range(3 * pat):
        use = de if i % 2 == 0 else de_clean  # condition never persists
        st = associate_and_update(cfg, st, dm, use, ds, dv, st.masks)
        st = st._replace(score=st.score.at[0].set(0.95))
        assert float(jnp.minimum(st.masks[0], right).sum()) < 1.0, i


def test_rescue_jump_disabled_keeps_lock():
    cfg = make_cfg(assoc_det_floor=0.0, assoc_agreement_gate=(0.0, 0.0),
                   rescue_jump=False)
    st = _rescue_setup(cfg)
    st = st._replace(score=st.score.at[0].set(0.95))
    right, dm, de, ds, dv = _jump_inputs(cfg)
    for _ in range(2 * cfg.vos.rescue_jump_patience):
        st = associate_and_update(cfg, st, dm, de, ds, dv, st.masks)
        st = st._replace(score=st.score.at[0].set(0.95))
    # stays blended around the wrong object's det; never adopts `right`
    iou_right = float((jnp.minimum(st.masks[0], right).sum()
                       / jnp.maximum(st.masks[0], right).sum()))
    assert iou_right < 0.5


def test_rescue_jump_same_object_duplicate_never_jumps():
    """A free near-duplicate det of the SAME object (high overlap with
    the matched det) must never trigger a jump, no matter how its anchor
    similarity jitters."""
    cfg = make_cfg(assoc_det_floor=0.0, assoc_agreement_gate=(0.0, 0.0),
                   rescue_jump=True)
    st = _rescue_setup(cfg)
    st = st._replace(score=st.score.at[0].set(0.95))
    mh, mw = cfg.vos.track_mask_size
    d = cfg.vos.max_dets_per_frame
    obj = jnp.zeros((mh, mw)).at[0:4, 0:4].set(1.0)     # = track 0's mask
    dup = jnp.zeros((mh, mw)).at[0:4, 1:5].set(1.0)     # shifted duplicate
    dm = jnp.zeros((d, mh, mw)).at[0].set(obj).at[1].set(dup)
    de = jnp.zeros((d, 8)).at[0, 0].set(0.8).at[1, 0].set(0.99)
    ds = jnp.zeros((d,)).at[0].set(0.9).at[1].set(0.9)
    dv = jnp.zeros((d,), bool).at[0].set(True).at[1].set(True)
    for _ in range(3 * cfg.vos.rescue_jump_patience):
        out = associate_and_update(cfg, st, dm, de, ds, dv, st.masks)
        assert int(out.drift[0]) == 0  # overlap guard keeps it disarmed
        st = out._replace(score=out.score.at[0].set(0.95))


def test_post_rescue_trust_window_bypasses_agreement_gate():
    """After a rescue the track's miss is negative (trust window): a
    matched CONTRADICTING det must still re-anchor it, because the
    propagation it disagrees with is exactly what just failed."""
    cfg = make_cfg(assoc_det_floor=0.0)
    mask = square_mask(cfg, 8, 16)
    st = seeded_state(cfg, mask, score=0.9)
    st = st._replace(miss=st.miss.at[0].set(-4))
    det = jnp.zeros_like(mask).at[0:4, 0:6].set(1.0)  # zero IoU with prop
    dm, de, ds, dv = det_inputs(cfg, det, score=0.95)
    out = associate_and_update(cfg, st, dm, de, ds, dv, st.masks)
    # outside a trust window this det is fully gated (agreement ~ 0);
    # inside, it blends at the confidence weight
    assert float(jnp.abs(out.masks[0] - mask).max()) > 0.3
    assert int(out.miss[0]) == -3  # window counts up toward 0


def test_unsupported_decay_arms_rescue_faster():
    """A track with no effective det support decays at
    score_decay_unsupported per frame (not score_decay). The shipped
    default equals score_decay (the fast decay collapsed 4/10 held-out
    sequences — see config.py); pin the fast rate so the mechanism stays
    exercised."""
    cfg = make_cfg(score_decay_unsupported=0.88)
    mask = square_mask(cfg, 8, 16)
    st = seeded_state(cfg, mask, score=1.0)
    masks, emb, scores, _ = det_inputs(cfg, jnp.zeros_like(mask), 0.0)
    valid = jnp.zeros_like(scores, bool)
    for _ in range(3):
        st = associate_and_update(cfg, st, masks, emb, scores, valid,
                                  propagated=st.masks)
    np.testing.assert_allclose(
        float(st.score[0]), cfg.vos.score_decay_unsupported ** 3, atol=1e-5)


def test_rescue_territory_guard_blocks_duplicate_of_healthy_object():
    """A lost track whose own object is occluded must NOT re-anchor onto
    an unclaimed DUPLICATE detection of a healthy track's object — the
    lone wrong candidate passes margin tests trivially (second-best is
    -inf), so territory is the only effective defense."""
    cfg = make_cfg()
    st = _rescue_setup(cfg)  # slot 0 lost, slot 1 healthy on square(4,12)
    mh, mw = cfg.vos.track_mask_size
    d = cfg.vos.max_dets_per_frame
    # det 0: slot 1's own det (exact overlap — greedy matches it);
    # det 1: an UNCLAIMED duplicate of the same object whose embedding
    # best-matches LOST track 0's anchor
    own = square_mask(cfg, 4, 12)
    dup = square_mask(cfg, 5, 13)
    dm = jnp.zeros((d, mh, mw)).at[0].set(own).at[1].set(dup)
    de = jnp.zeros((d, 8)).at[0, 1].set(1.0).at[1, 0].set(1.0)
    ds = jnp.zeros((d,)).at[0].set(0.95).at[1].set(0.95)
    dv = jnp.zeros((d,), bool).at[0].set(True).at[1].set(True)
    out = associate_and_update(cfg, st, dm, de, ds, dv, st.masks)
    # stays lost rather than grabbing the healthy object's duplicate
    np.testing.assert_allclose(np.asarray(out.masks[0]),
                               np.asarray(st.masks[0]), atol=1e-6)


def test_rescue_free_det_outside_healthy_territory_still_rescues():
    """The territory guard must not block legitimate rescues: a free det
    in UNEXPLAINED territory (no healthy track's propagated mask there)
    re-anchors the lost track as before."""
    cfg = make_cfg()
    st = _rescue_setup(cfg)
    # pollute the working emb so the greedy match declines and the HARD
    # rescue path (not the conf-relax blend) is what re-anchors
    st = st._replace(emb=st.emb.at[0, 0].set(-1.0))
    mh, mw = cfg.vos.track_mask_size
    d = cfg.vos.max_dets_per_frame
    det0 = jnp.zeros((mh, mw)).at[8:14, 16:22].set(1.0)  # empty territory
    dm = jnp.zeros((d, mh, mw)).at[0].set(det0)
    de = jnp.zeros((d, 8)).at[0, 0].set(1.0)
    ds = jnp.zeros((d,)).at[0].set(0.9)
    dv = jnp.zeros((d,), bool).at[0].set(True)
    out = associate_and_update(cfg, st, dm, de, ds, dv, st.masks)
    np.testing.assert_allclose(np.asarray(out.masks[0]), np.asarray(det0),
                               atol=1e-6)


def test_refresh_ramp_starved_match_decays():
    """A matched detection whose blend weight was gated to ~0 must NOT
    refresh the track score to the det's (the wrong-object-lock
    signature, heldout_1007 obj1: w flickering at 0.04-0.2 kept a
    drifted track 'healthy' for 34 frames). Below the ramp's lo the
    score decays exactly as unmatched."""
    cfg = make_cfg(assoc_conf_relax=False)
    prop = square_mask(cfg, 4, 12)
    det = square_mask(cfg, 10, 18)   # IoU ~0.14: agreement-gated off
    st = seeded_state(cfg, prop, score=0.8)
    dm, de, ds, dv = det_inputs(cfg, det, score=1.0)
    out = associate_and_update(cfg, st, dm, de, ds, dv, st.masks)
    assert bool(out.alive[0])
    # gated blend -> w below ramp lo -> decay, not refresh-to-1.0
    assert float(out.score[0]) <= 0.8 * cfg.vos.score_decay + 1e-6


def test_refresh_ramp_strong_match_still_refreshes():
    """A strongly-agreeing confident match (w above the ramp's hi)
    refreshes the score to the full det score, as before."""
    cfg = make_cfg()
    prop = square_mask(cfg, 4, 12)
    st = seeded_state(cfg, prop, score=0.4)  # decayed
    dm, de, ds, dv = det_inputs(cfg, prop, score=0.95)  # perfect agree
    out = associate_and_update(cfg, st, dm, de, ds, dv, st.masks)
    assert float(out.score[0]) >= 0.95 - 1e-6


def test_conf_relax_adopts_confident_anchor_consistent_det():
    """Soft rescue through the match path (heldout_1004 obj3): a DECAYED
    track matched to a confident det that is its best anchor candidate
    has the agreement gate relaxed — the det mask dominates the update
    even though det-vs-prop IoU sits in the gate's dead zone. The
    mechanism ships default-OFF (it cost heldout_1008 in the r5 sweep);
    opt in explicitly to keep it exercised."""
    cfg = make_cfg(assoc_conf_relax=True)
    prop = square_mask(cfg, 4, 12)
    det = square_mask(cfg, 8, 16)   # IoU ~0.33: agree ramp ~0.08 alone
    st = seeded_state(cfg, prop, score=0.3)         # decayed
    st = st._replace(emb0=st.emb)                    # anchor = emb
    dm, de, ds, dv = det_inputs(cfg, det, score=0.95)
    out = associate_and_update(cfg, st, dm, de, ds, dv, st.masks)
    # relax -> w ~= det^2/(det^2+trk^2) ~= 0.9: binarized mask is the det
    got = np.asarray(out.masks[0]) > 0.5
    np.testing.assert_array_equal(got, np.asarray(det) > 0.5)
    assert float(out.score[0]) >= 0.9


def test_conf_relax_blocked_when_better_anchor_candidate_free():
    """The anchor gate: a wrong-object lock (some OTHER eligible det
    anchor-matches the track better than its matched det) must NOT be
    relax-adopted — the track keeps its propagated mask and decays
    toward rescue instead of cementing the wrong object."""
    cfg = make_cfg(assoc_conf_relax=True)
    prop = square_mask(cfg, 4, 12)
    wrong = square_mask(cfg, 8, 16)          # overlaps the track: matched
    mh, mw = cfg.vos.track_mask_size
    true_det = jnp.zeros((mh, mw)).at[12:16, 18:24].set(1.0)  # elsewhere
    st = seeded_state(cfg, prop, score=0.3)
    st = st._replace(emb0=st.emb)
    d = cfg.vos.max_dets_per_frame
    dm = jnp.zeros((d, mh, mw)).at[0].set(wrong).at[1].set(true_det)
    # det 0 (matched, wrong object): anchor-orthogonal; det 1 (true
    # object, free): anchor-aligned
    de = jnp.zeros((d, 8)).at[0, 1].set(1.0).at[1, 0].set(1.0)
    ds = jnp.zeros((d,)).at[0].set(0.95).at[1].set(0.95)
    dv = jnp.zeros((d,), bool).at[0].set(True).at[1].set(True)
    out, diag = associate_and_update(cfg, st, dm, de, ds, dv, st.masks,
                                     return_diag=True)
    assert bool(diag["matched"][0]) and int(diag["midx"][0]) == 0
    assert float(diag["relax"][0]) == 0.0


def test_reid_embedding_raw_matches_masked_embedding():
    cfg = make_cfg(emb_mode="raw")
    from vosdetectron_tpu.models.propagation import (masked_embedding,
                                                     reid_embedding)
    mh, mw = cfg.vos.track_mask_size
    key = __import__("jax").random.PRNGKey(0)
    feat = __import__("jax").random.normal(key, (mh, mw, 8))
    masks = jnp.zeros((2, mh, mw)).at[0, 2:8, 2:8].set(1.0) \
        .at[1, 9:14, 12:20].set(1.0)
    np.testing.assert_allclose(
        np.asarray(reid_embedding(cfg, feat, masks)),
        np.asarray(masked_embedding(feat, masks)), atol=1e-6)


def test_reid_embedding_centering_spreads_cosines():
    """ReLU-style all-positive features give uniformly high cosines
    between DIFFERENT objects; scene-mean centering must spread them
    (the wrong-lone-candidate rescue failure, heldout_1009)."""
    from vosdetectron_tpu.models.propagation import reid_embedding
    cfg_raw = make_cfg(emb_mode="raw")
    cfg_c = make_cfg(emb_mode="centered")
    mh, mw = cfg_raw.vos.track_mask_size
    # shared positive base activation + small object-specific deviations
    base = jnp.ones((mh, mw, 8)) * 3.0
    feat = base.at[2:8, 2:8, 0].add(1.0).at[9:14, 12:20, 1].add(1.0)
    masks = jnp.zeros((2, mh, mw)).at[0, 2:8, 2:8].set(1.0) \
        .at[1, 9:14, 12:20].set(1.0)

    def cos01(e):
        return float((e[0] @ e[1] + 1.0) * 0.5)

    raw = cos01(reid_embedding(cfg_raw, feat, masks))
    cen = cos01(reid_embedding(cfg_c, feat, masks))
    assert raw > 0.9            # the failure mode: wrong pairs look alike
    assert cen < raw - 0.3      # centering separates them decisively


def test_reid_embedding_color_discriminates_same_shape_objects():
    """Two identically-shaped objects over identical features but with
    different colors must separate under centered_color."""
    from vosdetectron_tpu.models.propagation import (reid_embedding,
                                                     reid_embedding_dim)
    cfg = make_cfg(emb_mode="centered_color")
    mh, mw = cfg.vos.track_mask_size
    feat = jnp.ones((mh, mw, 8))      # featureless: centering zeroes it
    img = jnp.zeros((mh, mw, 3)).at[2:8, 2:8, 0].set(90.0) \
        .at[9:14, 12:20, 2].set(90.0)  # object 0 blue-ish, object 1 red-ish
    masks = jnp.zeros((2, mh, mw)).at[0, 2:8, 2:8].set(1.0) \
        .at[1, 9:14, 12:20].set(1.0)
    e = reid_embedding(cfg, feat, masks, img)
    assert e.shape[-1] == reid_embedding_dim(cfg, 8) == 14
    sim01 = float((e[0] @ e[1] + 1.0) * 0.5)
    self_sim = float((e[0] @ e[0] + 1.0) * 0.5)
    assert self_sim > 0.99
    assert sim01 < 0.75   # different colors -> clearly below self-sim
