"""Mask propagation, track state, and detection-track association.

TPU-native rebuild of the fork's VOS temporal layer
(reference: fork-added propagation/association modules, SURVEY.md §2.2
"Mask propagation / association" ~500 LoC + §3.3 call stack — capability
Tier A via BASELINE.json, design Tier C).

The reference processes frames in a Python loop carrying per-track masks and
appearance features, matching per-frame Mask R-CNN detections to tracks by
propagated-mask IoU + embedding similarity. Here the whole recurrence is a
``lax.scan``-compatible pure step over a fixed-size TrackState:

  * tracks padded to ``cfg.vos.max_tracks`` with an ``alive`` mask;
  * association is greedy argmax over a (K, D) score matrix — a fori_loop of
    K cheap vector steps (K <= 16), fully on device;
  * propagation is behind a function interface so the baseline (identity /
    EMA) can be swapped for a learned warp head without touching the engine
    (SURVEY.md §7 hard-part 6).

Embeddings are parameter-free in this revision: masked-average FPN features,
L2-normalized — appearance similarity without extra training.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import Config


class TrackState(NamedTuple):
    masks: jnp.ndarray   # (K, mh, mw) float32 soft masks in [0, 1]
    emb: jnp.ndarray     # (K, E) L2-normalized appearance embedding
    alive: jnp.ndarray   # (K,) bool
    miss: jnp.ndarray    # (K,) int32 consecutive unmatched frames
    score: jnp.ndarray   # (K,) float32 track confidence
    obj_id: jnp.ndarray  # (K,) int32 palette id (0 = unused slot)


def empty_track_state(cfg: Config, emb_dim: int) -> TrackState:
    k = cfg.vos.max_tracks
    mh, mw = cfg.vos.track_mask_size
    return TrackState(
        masks=jnp.zeros((k, mh, mw), jnp.float32),
        emb=jnp.zeros((k, emb_dim), jnp.float32),
        alive=jnp.zeros((k,), bool),
        miss=jnp.zeros((k,), jnp.int32),
        score=jnp.zeros((k,), jnp.float32),
        obj_id=jnp.zeros((k,), jnp.int32),
    )


def soft_mask_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise soft IoU: (K, h, w) x (D, h, w) -> (K, D)."""
    a_ = a[:, None]  # (K, 1, h, w)
    b_ = b[None, :]  # (1, D, h, w)
    inter = jnp.minimum(a_, b_).sum(axis=(2, 3))
    union = jnp.maximum(a_, b_).sum(axis=(2, 3))
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-6), 0.0)


def masked_embedding(feat: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
    """Appearance embedding: mask-weighted average of a feature map.

    feat: (h, w, C) (an FPN level resized to mask resolution);
    masks: (N, h, w) soft. -> (N, C) L2-normalized.
    """
    w = masks[..., None]  # (N, h, w, 1)
    num = (w * feat[None]).sum(axis=(1, 2))
    den = jnp.maximum(w.sum(axis=(1, 2)), 1e-6)
    e = num / den
    return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-6)


def greedy_assignment(score: jnp.ndarray, row_valid: jnp.ndarray,
                      col_valid: jnp.ndarray,
                      thresh: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy bipartite matching under masking, fixed shape.

    score: (K, D); returns (match (K,) int32 det index or -1,
    det_taken (D,) bool). K iterations of global argmax + row/col masking —
    the fixed-shape equivalent of the reference's greedy association loop.
    """
    k, d = score.shape
    neg = -1e10
    s0 = jnp.where(row_valid[:, None] & col_valid[None, :], score, neg)

    def body(_, carry):
        s, match, taken = carry
        flat = jnp.argmax(s)
        i, j = flat // d, flat % d
        ok = s[i, j] > thresh
        match = jnp.where(ok, match.at[i].set(j.astype(jnp.int32)), match)
        taken = jnp.where(ok, taken.at[j].set(True), taken)
        s = jnp.where(ok, s.at[i, :].set(neg).at[:, j].set(neg), s)
        return s, match, taken

    init = (s0, jnp.full((k,), -1, jnp.int32), jnp.zeros((d,), bool))
    _, match, taken = jax.lax.fori_loop(0, min(k, d), body, init)
    return match, taken


def propagate_identity(state: TrackState) -> jnp.ndarray:
    """Baseline propagation: masks persist from t-1 (swap point for a
    learned warp/recurrent head)."""
    return state.masks


def associate_and_update(cfg: Config, state: TrackState,
                         det_masks_lr: jnp.ndarray, det_emb: jnp.ndarray,
                         det_scores: jnp.ndarray, det_valid: jnp.ndarray,
                         propagated: jnp.ndarray) -> TrackState:
    """One association step: match detections to tracks, update state.

    det_masks_lr: (D, mh, mw) soft masks at track resolution.
    """
    v = cfg.vos
    iou = soft_mask_iou(propagated, det_masks_lr)          # (K, D)
    sim = (state.emb @ det_emb.T + 1.0) * 0.5              # (K, D) in [0,1]
    score = v.assoc_iou_weight * iou + v.assoc_emb_weight * sim

    match, det_taken = greedy_assignment(
        score, state.alive, det_valid & (det_scores > 0),
        v.assoc_score_thresh)

    matched = match >= 0
    midx = jnp.maximum(match, 0)
    new_masks = jnp.where(matched[:, None, None],
                          det_masks_lr[midx], propagated)
    # EMA on appearance; renormalize.
    cand = 0.7 * state.emb + 0.3 * det_emb[midx]
    cand = cand / jnp.maximum(jnp.linalg.norm(cand, axis=-1, keepdims=True),
                              1e-6)
    new_emb = jnp.where(matched[:, None], cand, state.emb)
    new_miss = jnp.where(matched, 0, state.miss + state.alive.astype(
        jnp.int32))
    new_score = jnp.where(matched, det_scores[midx], state.score * 0.95)
    alive = state.alive & (new_miss <= v.miss_tolerance)

    state = TrackState(new_masks, new_emb, alive, new_miss, new_score,
                       state.obj_id)

    if not v.semi_supervised:
        state = _spawn_tracks(cfg, state, det_masks_lr, det_emb, det_scores,
                              det_valid & ~det_taken)
    return state


def _spawn_tracks(cfg: Config, state: TrackState, det_masks_lr, det_emb,
                  det_scores, spawnable) -> TrackState:
    """Unsupervised mode: open new tracks from confident unmatched dets.

    Up to `max_spawn` spawns per frame; each iteration takes the best
    remaining candidate and the first free slot, fully fixed-shape.
    """
    v = cfg.vos
    max_spawn = 4
    cand0 = jnp.where(spawnable & (det_scores > v.new_track_thresh),
                      det_scores, -jnp.inf)

    def body(_, carry):
        st, cand = carry
        j = jnp.argmax(cand)
        free_mask = ~st.alive & (st.obj_id == 0)
        free = jnp.argmax(free_mask)
        ok = jnp.isfinite(cand[j]) & jnp.any(free_mask)
        next_id = jnp.max(st.obj_id) + 1
        st = TrackState(
            masks=jnp.where(ok, st.masks.at[free].set(det_masks_lr[j]),
                            st.masks),
            emb=jnp.where(ok, st.emb.at[free].set(det_emb[j]), st.emb),
            alive=jnp.where(ok, st.alive.at[free].set(True), st.alive),
            miss=jnp.where(ok, st.miss.at[free].set(0), st.miss),
            score=jnp.where(ok, st.score.at[free].set(det_scores[j]),
                            st.score),
            obj_id=jnp.where(ok, st.obj_id.at[free].set(next_id), st.obj_id),
        )
        cand = cand.at[j].set(-jnp.inf)
        return st, cand

    state, _ = jax.lax.fori_loop(0, max_spawn, body, (state, cand0))
    return state


def render_indexed_pallas(state: TrackState, out_hw: Tuple[int, int],
                          mask_thresh: float = 0.5) -> jnp.ndarray:
    """Fused Pallas renderer: track masks -> (H, W) id map without the
    (K, H, W) upsampled stack (ops/pallas/mask_paste_pallas.py)."""
    from ..ops.pallas.mask_paste_pallas import paste_flatten_pallas

    k = state.masks.shape[0]
    h, w = out_hw
    full = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, float(w), float(h)], jnp.float32), (k, 4))
    return paste_flatten_pallas(state.masks, full, state.score,
                                state.obj_id, state.alive, h, w,
                                mask_thresh)


def render_indexed(state: TrackState, out_hw: Tuple[int, int],
                   mask_thresh: float = 0.5) -> jnp.ndarray:
    """Compose track masks into an (H, W) int32 indexed map.

    Ties are broken by track score (matching the reference's score-priority
    PNG writing); background where no track exceeds the threshold.
    """
    k = state.masks.shape[0]
    # bf16 halves the HBM traffic of the big upsample; threshold compare is
    # insensitive to the precision loss.
    up = jax.image.resize(state.masks.astype(jnp.bfloat16),
                          (k,) + tuple(out_hw), "linear")
    pri = jnp.where(state.alive, state.score, -jnp.inf)
    val = jnp.where(up > mask_thresh, pri[:, None, None], -jnp.inf)
    val = jnp.broadcast_to(val, up.shape)
    best = jnp.argmax(val, axis=0)
    covered = jnp.any(jnp.isfinite(val), axis=0)
    ids = state.obj_id[best]
    return jnp.where(covered, ids, 0).astype(jnp.int32)
