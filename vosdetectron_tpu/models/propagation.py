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

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import Config
from .convs import Conv


class TrackState(NamedTuple):
    masks: jnp.ndarray   # (K, mh, mw) float32 soft masks in [0, 1]
    emb: jnp.ndarray     # (K, E) L2-normalized appearance embedding
    alive: jnp.ndarray   # (K,) bool
    miss: jnp.ndarray    # (K,) int32 consecutive unmatched frames
    score: jnp.ndarray   # (K,) float32 track confidence
    obj_id: jnp.ndarray  # (K,) int32 palette id (0 = unused slot)
    # Previous frame's propagation input (mh, mw, F) for the learned
    # flow-warp head; None under identity propagation (None is an empty
    # pytree, so the scan carry structure stays consistent either way).
    pfeat: Optional[jnp.ndarray] = None
    # Anchor embedding: frozen at track birth (frame-0 GT / spawn det),
    # never EMA-updated — the drift-immune appearance identity the
    # rescue stage matches against (state.emb can be polluted by frames
    # of wrong-match EMA once a track has drifted).
    emb0: Optional[jnp.ndarray] = None
    # Consecutive frames the anchor-jump arming condition has held (see
    # config.rescue_jump_patience) — one-frame anchor-similarity jitter
    # between near-duplicate detections must not re-anchor a healthy
    # track; a wrong-object lock holds the condition for many frames.
    drift: Optional[jnp.ndarray] = None


def empty_track_state(cfg: Config, emb_dim: int,
                      pfeat: Optional[jnp.ndarray] = None) -> TrackState:
    k = cfg.vos.max_tracks
    mh, mw = cfg.vos.track_mask_size
    return TrackState(
        masks=jnp.zeros((k, mh, mw), jnp.float32),
        emb=jnp.zeros((k, emb_dim), jnp.float32),
        alive=jnp.zeros((k,), bool),
        miss=jnp.zeros((k,), jnp.int32),
        score=jnp.zeros((k,), jnp.float32),
        obj_id=jnp.zeros((k,), jnp.int32),
        pfeat=pfeat,
        emb0=jnp.zeros((k, emb_dim), jnp.float32),
        drift=jnp.zeros((k,), jnp.int32),
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


def reid_embedding(cfg: Config, feat: jnp.ndarray, masks: jnp.ndarray,
                   img: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Re-identification embedding, dispatched on cfg.vos.emb_mode.

    "raw": masked_embedding as-is. Its weakness, measured on the held-out
    rescue traces: ReLU backbone features are all-positive, so cosines
    between DIFFERENT objects run 0.8-0.99 (a wrong lone rescue candidate
    scored anchor-sim 0.90 on heldout_1009) — only margins discriminate,
    and margins are mute for a lone candidate.

    "centered": the feature map's spatial mean (the scene-common
    component every pooled vector shares) is subtracted BEFORE pooling,
    so the embedding is the object's deviation from the scene — cosines
    spread over [-1, 1] and wrong-object similarities drop toward and
    below the (cos+1)/2 = 0.5 uncorrelated point, giving rescue_sim
    real discriminative work.

    "centered_color": additionally concatenates mask-weighted color
    moments (mean + std per BGR channel of the mean-subtracted image at
    track resolution, O(1)-scaled) as an L2-normalized block weighted
    by vos.emb_color_weight. With both blocks unit-norm, the combined
    cosine is the weight-squared-average of the feature and color
    cosines. Color is a strong, propagation-independent re-id cue (the
    reference's appearance re-id uses learned features only; color
    moments need no training and survive mask degradation).

    img: (h, w, 3) mean-subtracted BGR at mask resolution (pixel-means
    removed; any pixel_stds already multiplied back), required for
    "centered_color".
    """
    mode = cfg.vos.emb_mode
    if mode == "raw":
        return masked_embedding(feat, masks)
    w = masks[..., None]  # (N, h, w, 1)
    den = jnp.maximum(w.sum(axis=(1, 2)), 1e-6)
    f = feat - feat.mean(axis=(0, 1), keepdims=True)
    e = (w * f[None]).sum(axis=(1, 2)) / den
    e = e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-6)
    if mode == "centered":
        return e
    if mode != "centered_color":
        raise ValueError(f"unknown vos.emb_mode: {mode!r}")
    if img is None:
        raise ValueError("emb_mode=centered_color needs the low-res image")
    cm = (w * img[None]).sum(axis=(1, 2)) / den            # (N, 3)
    c2 = (w * img[None] ** 2).sum(axis=(1, 2)) / den - cm ** 2
    col = jnp.concatenate([cm, jnp.sqrt(jnp.maximum(c2, 0.0))],
                          axis=-1) * (1.0 / 128.0)
    col = col / jnp.maximum(jnp.linalg.norm(col, axis=-1, keepdims=True),
                            1e-6)
    out = jnp.concatenate([e, col * cfg.vos.emb_color_weight], axis=-1)
    return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True),
                             1e-6)


def reid_embedding_dim(cfg: Config, feat_dim: int) -> int:
    """Embedding width for empty_track_state under cfg.vos.emb_mode."""
    return feat_dim + (6 if cfg.vos.emb_mode == "centered_color" else 0)


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


def local_correlation(prev: jnp.ndarray, cur: jnp.ndarray,
                      radius: int) -> jnp.ndarray:
    """Cost volume between two (h, w, c) feature maps.

    out[y, x, i(dy,dx)] = <prev[y+dy, x+dx], cur[y, x]> / sqrt(c) for
    displacements in [-radius, radius]^2 — the appearance-invariant motion
    evidence a flow net can generalize from (convs on raw concatenated
    frames memorize textures instead; cf. PWC-Net cost volumes). The
    (2r+1)^2 shifts unroll at trace time into fused slices+dots."""
    h, w, c = prev.shape
    pad = jnp.pad(prev, ((radius, radius), (radius, radius), (0, 0)))
    outs = []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            shifted = jax.lax.dynamic_slice(
                pad, (radius + dy, radius + dx, 0), (h, w, c))
            outs.append((shifted * cur).sum(-1))
    return jnp.stack(outs, axis=-1) / jnp.sqrt(float(c))


def warp_bilinear(masks: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp (K, h, w) masks by a (h, w, 2) flow field (dy, dx in
    pixels): out[k, y, x] = masks[k, y + flow_y, x + flow_x], bilinear,
    border-clamped. Pure gather — XLA-friendly, trivially differentiable."""
    k, h, w = masks.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    sy = jnp.clip(yy + flow[..., 0], 0.0, h - 1.0)
    sx = jnp.clip(xx + flow[..., 1], 0.0, w - 1.0)
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = sy - y0
    wx = sx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h - 1)
    x1i = jnp.minimum(x0i + 1, w - 1)
    return (((1 - wy) * (1 - wx))[None] * masks[:, y0i, x0i]
            + ((1 - wy) * wx)[None] * masks[:, y0i, x1i]
            + (wy * (1 - wx))[None] * masks[:, y1i, x0i]
            + (wy * wx)[None] * masks[:, y1i, x1i])


class PropagationHead(nn.Module):
    """Learned mask propagation: flow-warp + per-track refinement.

    TPU-native design of the fork's propagation module (reference:
    fork-added recurrent/flow-warp propagation head, SURVEY.md §2.2 "Mask
    propagation / association" ~500 LoC; capability Tier A via
    BASELINE.json "mask-propagate"). All ops are fixed-shape convs,
    gathers, and elementwise math at track resolution — one lax.scan step's
    worth of work is a few MXU-sized convs over a (mh, mw) grid.

    Structure:
      * ``frame_input``: per-frame input G_t = [normalized image at track
        res (3) | 1x1-projected backbone features (feat_dim)] — computed
        once per frame in the batched detection phase, carried in
        TrackState.pfeat between frames.
      * flow net: concat(G_{t-1}, G_t) -> 2 convs at half resolution ->
        2-ch flow, upsampled x2. Zero-init final conv => zero flow =>
        exact identity warp at initialization.
      * warp: backward bilinear warp of every track mask by the (shared)
        flow field.
      * refine: per-track convs on [warped | G_t] -> residual logits,
        zero-init; added to a sharpened-warp base logit so the untrained
        head behaves like (a slightly sharpened) identity propagation.
    """

    feat_dim: int = 16
    hidden: int = 32
    corr_radius: int = 4  # cost-volume window at half resolution
    base_scale: float = 4.0  # sharpness of the warped-mask base logit

    def setup(self):
        zeros = nn.initializers.zeros
        self.proj = Conv(self.feat_dim, (1, 1), name="proj")
        self.corr_feat = Conv(self.hidden, (3, 3), name="corr_feat")
        self.flow1 = Conv(self.hidden, (3, 3), name="flow1")
        self.flow2 = Conv(self.hidden, (3, 3), name="flow2")
        self.flow_out = Conv(2, (3, 3), kernel_init=zeros,
                                bias_init=zeros, name="flow_out")
        self.refine1 = Conv(16, (3, 3), name="refine1")
        self.refine_out = Conv(1, (3, 3), kernel_init=zeros,
                                  bias_init=zeros, name="refine_out")
        self.feat_norm = nn.LayerNorm(name="feat_norm")

    def frame_input(self, img_lr: jnp.ndarray,
                    feat_lr: jnp.ndarray) -> jnp.ndarray:
        """(mh, mw, 3) image + (mh, mw, C) features -> (mh, mw, 3+F).

        Both inputs are brought to O(1) scale — the image MUST arrive in
        mean-subtracted UNIT-stds units (values span ±~150; callers using
        cfg.data.pixel_stds != 1 multiply the stds back — engine/vos.py)
        and raw backbone features have arbitrary magnitude; without this
        the flow/refine convs see exploding activations and training
        diverges, and a head checkpoint silently stops working under a
        different preprocessing config."""
        img = img_lr * (1.0 / 64.0)
        feat = self.feat_norm(self.proj(feat_lr))
        return jnp.concatenate([img, feat], axis=-1)

    def flow(self, prev_inp: jnp.ndarray, cur_inp: jnp.ndarray
             ) -> jnp.ndarray:
        """Flow field (mh, mw, 2) estimated at half resolution from a
        local cost volume (appearance-invariant, so it transfers to unseen
        objects) plus the current-frame context."""
        mh, mw, _ = cur_inp.shape

        def half(x):
            return nn.avg_pool(x[None], (2, 2), strides=(2, 2))[0]

        ph, ch = half(prev_inp), half(cur_inp)
        pf = self.corr_feat(ph)
        cf = self.corr_feat(ch)

        def l2n(x):
            # smooth normalization: x/max(||x||, eps) has a NaN GRADIENT at
            # exactly-zero vectors (the image-padding region produces them),
            # x * rsqrt(||x||^2 + eps) does not.
            return x * jax.lax.rsqrt(
                (x * x).sum(axis=-1, keepdims=True) + 1e-8)

        corr = local_correlation(l2n(pf), l2n(cf), self.corr_radius)
        h = nn.relu(self.flow1(jnp.concatenate([corr, ch], axis=-1)))
        h = nn.relu(self.flow2(h))
        fh = self.flow_out(h)
        return 2.0 * jax.image.resize(fh, (mh, mw, 2), "linear")

    def propagate_with_aux(self, prev_inp: jnp.ndarray,
                           cur_inp: jnp.ndarray, masks: jnp.ndarray
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (logits (K,mh,mw), warped (K,mh,mw)).

        The warped (pre-refine) masks are exposed so training can place an
        auxiliary loss directly on the flow path — otherwise the refine
        convs compensate for a lazy flow during training and the motion
        model never forms. The refinement itself sees only appearance-light
        signals (warped mask, current image channels, flow); raw backbone
        features feed the flow's cost volume but not the refine convs,
        which would otherwise memorize per-sequence texture instead of
        boundary structure."""
        k = masks.shape[0]
        flow = self.flow(prev_inp, cur_inp)
        warped = warp_bilinear(masks, flow)
        ctx = jnp.concatenate([cur_inp[..., :3], flow * 0.25], axis=-1)
        ctx = jnp.broadcast_to(ctx[None], (k,) + ctx.shape)
        z = jnp.concatenate([warped[..., None], ctx], axis=-1)
        res = self.refine_out(nn.relu(self.refine1(z)))[..., 0]
        return res + self.base_scale * (2.0 * warped - 1.0), warped

    def propagate_logits(self, prev_inp: jnp.ndarray, cur_inp: jnp.ndarray,
                         masks: jnp.ndarray) -> jnp.ndarray:
        """(mh,mw,F) x (mh,mw,F) x (K,mh,mw) -> (K,mh,mw) mask logits."""
        return self.propagate_with_aux(prev_inp, cur_inp, masks)[0]

    def __call__(self, prev_inp: jnp.ndarray, cur_inp: jnp.ndarray,
                 masks: jnp.ndarray) -> jnp.ndarray:
        return nn.sigmoid(self.propagate_logits(prev_inp, cur_inp, masks))

    def init_all(self, img_lr: jnp.ndarray, feat_lr: jnp.ndarray,
                 masks: jnp.ndarray) -> jnp.ndarray:
        """Init entrypoint touching every submodule (proj + flow + refine)."""
        inp = self.frame_input(img_lr, feat_lr)
        return self.propagate_logits(inp, inp, masks)


class GRUPropagationHead(PropagationHead):
    """Gated-recurrent (ConvGRU-style) propagation — the alternate design
    behind the same interface (SURVEY §7 hard-part 6: the fork's exact
    head is Tier-C unknown, "recurrent/flow-warp"; this is the recurrent
    hedge to PropagationHead's flow-warp).

    The per-track mask is the recurrent state (it already rides the
    engine's TrackState carry); gates are small convs over
    [mask | G_{t-1} | G_t]. No flow/cost-volume path. Zero-init gates make
    the untrained head a (slightly sharpened) identity, like the flow
    head, so it drops into an engine without retraining anything else.
    Shares frame_input (projection + LayerNorm) with the base class, so
    the engine-side contract is identical.
    """

    def setup(self):
        zeros = nn.initializers.zeros
        self.proj = Conv(self.feat_dim, (1, 1), name="proj")
        self.feat_norm = nn.LayerNorm(name="feat_norm")
        self.gru1 = Conv(self.hidden, (3, 3), name="gru1")
        self.gru2 = Conv(self.hidden, (3, 3), name="gru2")
        # update gate: zero kernel + negative bias => z ~ 0.05 at init
        self.gate_out = Conv(1, (3, 3), kernel_init=zeros,
                             bias_init=nn.initializers.constant(-3.0),
                             name="gate_out")
        self.cand_out = Conv(1, (3, 3), kernel_init=zeros,
                             bias_init=zeros, name="cand_out")

    def propagate_with_aux(self, prev_inp: jnp.ndarray,
                           cur_inp: jnp.ndarray, masks: jnp.ndarray
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (logits (K,mh,mw), aux (K,mh,mw)).

        The aux slot (the flow head's pre-refine warp) is the input mask
        here — there is no flow path, so an auxiliary warp loss sees a
        parameter-free identity and contributes zero gradient."""
        k = masks.shape[0]
        ctx = jnp.concatenate([prev_inp, cur_inp], axis=-1)
        ctx = jnp.broadcast_to(ctx[None], (k,) + ctx.shape)
        x = jnp.concatenate([masks[..., None], ctx], axis=-1)
        h = nn.relu(self.gru1(x))
        h = nn.relu(self.gru2(h))
        z = nn.sigmoid(self.gate_out(h))[..., 0]
        cand = self.cand_out(h)[..., 0]
        base = self.base_scale * (2.0 * masks - 1.0)
        return (1.0 - z) * base + z * cand, masks


def make_propagation_head(cfg: Config):
    """cfg.vos.propagation -> head instance (None for "identity").

    "learned" keeps meaning the flow-warp head (back-compat with shipped
    checkpoints); "flow_warp" is its alias; "convgru" is the recurrent
    variant."""
    kind = cfg.vos.propagation
    if kind == "identity":
        return None
    if kind in ("learned", "flow_warp"):
        return PropagationHead(feat_dim=cfg.vos.prop_feat_dim)
    if kind == "convgru":
        return GRUPropagationHead(feat_dim=cfg.vos.prop_feat_dim)
    raise ValueError(f"unknown vos.propagation {kind!r}")


def init_propagation_params(cfg: Config, head: PropagationHead, key,
                            backbone_dim: int):
    """Jitted head init (eager flax init is ruinous over a device tunnel)."""
    mh, mw = cfg.vos.track_mask_size
    k = cfg.vos.max_tracks

    def _init(k_):
        return head.init(k_, jnp.zeros((mh, mw, 3), jnp.float32),
                         jnp.zeros((mh, mw, backbone_dim), jnp.float32),
                         jnp.zeros((k, mh, mw), jnp.float32),
                         method=type(head).init_all)["params"]

    return jax.jit(_init)(key)


def associate_and_update(cfg: Config, state: TrackState,
                         det_masks_lr: jnp.ndarray, det_emb: jnp.ndarray,
                         det_scores: jnp.ndarray, det_valid: jnp.ndarray,
                         propagated: jnp.ndarray,
                         return_diag: bool = False) -> TrackState:
    """One association step: match detections to tracks, update state.

    det_masks_lr: (D, mh, mw) soft masks at track resolution.

    With ``return_diag=True`` also returns a dict of per-slot association
    internals (matched index, blend weight, rescue gates) — used by
    tools/diag_assoc.py to attribute quality failures; never set in the
    production scan, so the traced program is unchanged.
    """
    diag = {}
    v = cfg.vos
    iou = soft_mask_iou(propagated, det_masks_lr)          # (K, D)
    sim = (state.emb @ det_emb.T + 1.0) * 0.5              # (K, D) in [0,1]
    score = v.assoc_iou_weight * iou + v.assoc_emb_weight * sim

    match, det_taken = greedy_assignment(
        score, state.alive, det_valid & (det_scores > 0),
        v.assoc_score_thresh)

    matched = match >= 0
    midx = jnp.maximum(match, 0)
    k = state.masks.shape[0]
    anchor = state.emb0 if state.emb0 is not None else state.emb
    sim0 = (anchor @ det_emb.T + 1.0) * 0.5                # (K, D)
    if v.assoc_blend:
        # Confidence- and agreement-gated blend (VERDICT r2 #3): the
        # matched detection's mask influence is (a) its confidence
        # RELATIVE to the track's, times (b) an agreement ramp on its
        # IoU with the propagated mask. (a) stops weak detections from
        # destroying confident propagated masks; (b) stops CONFIDENT-
        # but-wrong detections (the dominant failure with a weakly-
        # generalizing detector) — a det that contradicts propagation
        # only refines it when they substantially agree.
        det_conf = jnp.clip(det_scores[midx], 0.0, 1.0)
        trk_conf = jnp.clip(state.score, 0.0, 1.0)
        p = v.assoc_blend_sharpness
        dp = det_conf ** p
        w_det = dp / jnp.maximum(dp + trk_conf ** p, 1e-6)
        w_det = jnp.where(det_conf < v.assoc_det_floor, 0.0, w_det)
        lo, hi = v.assoc_agreement_gate
        q = iou[jnp.arange(iou.shape[0]), midx]
        agree = jnp.clip((q - lo) / max(hi - lo, 1e-6), 0.0, 1.0)
        if v.assoc_conf_relax and v.assoc_rescue:
            # Anchor-gated confidence relax (see config.assoc_conf_relax):
            # a decayed track trusts a confident matched det PROVIDED the
            # adoption would also survive the rescue stage's identity
            # guards, expressed for the MATCHED det:
            #   * best-candidate — the det is the track's best anchor-
            #     similarity candidate among eligible dets (a wrong-
            #     object lock fails: its true object's free det anchor-
            #     matches better, heldout_1007);
            #   * rival margin — no OTHER alive track anchor-matches this
            #     det within rescue_margin (two lookalike lost tracks
            #     must not be resolved by the greedy tie-break);
            #   * territory — the det must not overlap another healthy
            #     track's propagated mask (an unclaimed duplicate det of
            #     a healthy object would otherwise be adopted during the
            #     true object's occlusion).
            eye = jnp.eye(k, dtype=bool)
            elig0 = det_valid & (det_scores >= v.rescue_det_conf)
            best0 = jnp.max(jnp.where(elig0[None, :], sim0, -jnp.inf),
                            axis=1)
            cur0 = sim0[jnp.arange(k), midx]
            sim0_alive = jnp.where(state.alive[:, None], sim0, -jnp.inf)
            rival0 = jnp.max(jnp.where(eye, -jnp.inf,
                                       sim0_alive[:, midx]), axis=0)
            healthy_pre = state.alive & (state.score >= v.rescue_track_conf)
            iou_h = jnp.where(healthy_pre[:, None], iou, 0.0)
            occ_rival = jnp.max(jnp.where(eye, 0.0, iou_h[:, midx]),
                                axis=0)
            anchor_ok = (cur0 + v.rescue_margin >= best0) \
                & (cur0 - rival0 >= v.rescue_margin) \
                & (occ_rival < v.rescue_territory_iou)
            g0, g1 = v.assoc_conf_relax_gap
            relax = jnp.clip((det_conf - trk_conf - g0)
                             / max(g1 - g0, 1e-6), 0.0, 1.0)
            relax = jnp.where(
                anchor_ok & (det_conf >= v.rescue_det_conf), relax, 0.0)
            agree = agree + (1.0 - agree) * relax
            if return_diag:
                diag.update(relax=relax)
        # Post-rescue trust window (negative miss counts it down): a just-
        # rescued track's propagation is exactly what failed for this
        # object, so gating detections on agreement with it re-loses the
        # object within frames; trust the matched det outright until the
        # window expires.
        agree = jnp.where(state.miss < 0, 1.0, agree)
        w_det = w_det * agree
        w = jnp.where(matched, w_det, 0.0)
        new_masks = (w[:, None, None] * det_masks_lr[midx]
                     + (1.0 - w[:, None, None]) * propagated)
    else:  # reference-style unconditional overwrite
        w = jnp.where(matched, 1.0, 0.0)
        new_masks = jnp.where(matched[:, None, None],
                              det_masks_lr[midx], propagated)
    # EMA on appearance, scaled by the same effective det weight;
    # renormalize.
    alpha = (1.0 - v.emb_ema) * w
    cand = (1.0 - alpha[:, None]) * state.emb \
        + alpha[:, None] * det_emb[midx]
    cand = cand / jnp.maximum(jnp.linalg.norm(cand, axis=-1, keepdims=True),
                              1e-6)
    new_emb = jnp.where(matched[:, None], cand, state.emb)
    ticked = state.miss + state.alive.astype(jnp.int32)
    # negative miss = post-rescue trust window, counts up toward 0
    new_miss = jnp.where(state.miss < 0, state.miss + 1,
                         jnp.where(matched, 0, ticked))
    # Matched: a strong agreeing detection can raise the track score, but
    # a weak or contradicting one must not collapse it (the old
    # `new_score = det_score` let one bad frame reset a long track).
    # A track with no EFFECTIVE det support this frame (unmatched, or the
    # blend fully gated off) decays at the faster unsupported rate so the
    # rescue stage arms within frames of a drift, not a dozen.
    decay = jnp.where(matched & (w > 0.1), v.score_decay,
                      v.score_decay_unsupported)
    # Refresh ramp (see config.assoc_refresh_ramp): the matched det's
    # score refreshes the track's proportionally to the EFFECTIVE blend
    # weight — a match whose mask influence was gated off must not keep
    # certifying the track healthy (the wrong-object-lock signature).
    rlo, rhi = v.assoc_refresh_ramp
    refresh = det_scores[midx] * jnp.clip(
        (w - rlo) / max(rhi - rlo, 1e-6), 0.0, 1.0)
    new_score = jnp.where(matched,
                          jnp.maximum(refresh, state.score * decay),
                          state.score * decay)
    drift_out = state.drift

    if v.assoc_rescue and drift_out is None:
        # Hardening (VERDICT r4 weak #2): whenever the rescue stage is on,
        # drift is ALWAYS an array, even for hand-built TrackStates that
        # left it at the NamedTuple default — the rescue_jump branch
        # subscripts it, and a None there is a latent TypeError that only
        # fires when the feature is toggled on. (empty_track_state always
        # materializes it; this covers direct callers/tests.)
        drift_out = jnp.zeros_like(state.miss)

    if v.assoc_rescue:
        # Drift rescue (re-identification). Once a track has drifted, its
        # det-vs-prop IoU is ~0 for every detection, so the agreement gate
        # (correctly) blocks all mask updates and the track can never
        # recover — its score just decays. When that decay marks the track
        # as lost, re-anchor it OUTRIGHT to a confident detection that no
        # healthy track claimed, provided the pairing is unambiguous:
        # mutual best by ANCHOR-embedding similarity (emb0 is frozen at
        # birth, immune to wrong-match EMA pollution) with a margin over
        # the track's second-best candidate (margins, not absolute
        # similarity, discriminate identities — cosines of ReLU features
        # are uniformly high).
        d = score.shape[1]
        claimed = jnp.zeros((d,)).at[midx].max(
            jnp.where(matched & (w > 0.1), 1.0, 0.0)) > 0.5
        elig = det_valid & (det_scores >= v.rescue_det_conf)
        neg = -jnp.inf
        lost = state.alive & (state.score < v.rescue_track_conf) \
            & ~(matched & (w > 0.1))
        # Territory guard (measured on heldout_1003 f14): while a lost
        # track's true object is OCCLUDED, the only rescue candidates are
        # other objects' detections — and a lone wrong candidate passes
        # every margin test trivially (second-best is -inf). A free det
        # that substantially overlaps a HEALTHY track's propagated mask
        # is that track's object (or an unclaimed duplicate detection of
        # it); re-anchoring there manufactures an identity error, which
        # costs two objects. Such dets are excluded from the FREE rescue
        # path — staying lost is cheaper than guessing. (The steal path
        # is exempt: a stolen det inherently overlaps its claimer's
        # propagated mask; anchor-margin arbitration governs it.)
        healthy = state.alive & ~lost
        occ = jnp.max(jnp.where(healthy[:, None], iou, 0.0), axis=0)
        free = elig & ~claimed & (occ < v.rescue_territory_iou)
        if v.rescue_jump:
            # Anchor jump: a track can drift onto the WRONG object (or a
            # confident false positive) and keep re-anchoring there with a
            # HEALTHY score — score-based arming never fires (measured on
            # heldout_1007 obj1: 15 straight frames with the true object's
            # det free and confident while the track sat matched elsewhere
            # at score ~0.9). Arm rescue-eligibility additionally when
            # some FREE confident det matches the track's anchor embedding
            # better than its currently-matched det does, by a margin
            # (absolute anchor similarities don't discriminate — ReLU-
            # feature cosines are uniformly high — margins do).
            # Two guards, both load-bearing (measured on heldout_1003,
            # where the unguarded jump broke HEALTHY tracks from frame 1):
            #   * same-object guard — no jump to a target that overlaps
            #     the currently-matched det (a near-duplicate detection of
            #     the same object whose anchor sim jitters higher would
            #     otherwise swap a good propagated mask for a mediocre det
            #     mask);
            #   * patience — the condition must hold rescue_jump_patience
            #     consecutive frames (TrackState.drift counts them); one-
            #     frame sim jitter between lookalike dets is noise, a
            #     wrong-object lock holds for dozens of frames.
            # Skipped inside the post-rescue trust window (miss < 0) to
            # prevent oscillation.
            sfree = jnp.where(free[None, :], sim0, neg)
            bv_free = jnp.max(sfree, axis=1)
            bj_free = jnp.argmax(sfree, axis=1)
            cur_sim = jnp.where(matched & (w > 0.1),
                                sim0[jnp.arange(k), midx], neg)
            tgt = det_masks_lr[bj_free]                      # (K, mh, mw)
            cur = det_masks_lr[midx]
            inter = jnp.minimum(tgt, cur).sum(axis=(1, 2))
            union = jnp.maximum(tgt, cur).sum(axis=(1, 2))
            pair_iou = jnp.where(union > 0,
                                 inter / jnp.maximum(union, 1e-6), 0.0)
            armed = state.alive & matched & (w > 0.1) \
                & (state.miss >= 0) \
                & jnp.isfinite(bv_free) \
                & (bv_free >= v.rescue_sim) \
                & (bv_free - cur_sim >= v.rescue_jump_margin) \
                & (pair_iou < v.rescue_jump_max_overlap)
            d0 = (state.drift if state.drift is not None
                  else jnp.zeros_like(state.miss))
            drift_out = jnp.where(armed, d0 + 1, 0)
            misanchored = armed & (drift_out >= v.rescue_jump_patience)
            lost = lost | misanchored
        rcand = lost[:, None] & free[None, :]
        if v.rescue_steal:
            # A lost track may also take a CLAIMED detection when its
            # anchor similarity to it beats the CLAIMER's anchor
            # similarity by a margin — the drifted-claimer starvation
            # fix (see config.rescue_steal). The claimer's update is
            # cancelled below if the steal goes through.
            claim_sim = sim0[jnp.arange(k), midx]          # (K,)
            claimer_sim = jnp.zeros((d,)).at[midx].max(
                jnp.where(matched & (w > 0.1), claim_sim, neg))
            stealable = (elig & claimed)[None, :] \
                & (sim0 > claimer_sim[None, :] + v.rescue_steal_margin)
            rcand = rcand | (lost[:, None] & stealable)
        s = jnp.where(rcand, sim0, neg)
        bj = jnp.argmax(s, axis=1)                         # (K,)
        bv = jnp.max(s, axis=1)
        second = jnp.max(jnp.where(jnp.arange(d)[None, :] == bj[:, None],
                                   neg, s), axis=1)
        mutual = jnp.argmax(s, axis=0)[bj] == jnp.arange(k)
        # Column margin: the chosen det must prefer THIS track over every
        # other lost track by the same margin — two identical-looking lost
        # objects must not be resolved by a coin flip (identity swaps are
        # worse for J&F than staying lost: a swap zeroes TWO objects).
        col_second = jnp.max(
            jnp.where(jnp.arange(k)[:, None] == jnp.arange(k)[None, :],
                      neg, s.T[bj]), axis=1)               # (K,)
        rescue = lost & jnp.isfinite(bv) & (bv >= v.rescue_sim) \
            & (bv - second >= v.rescue_margin) \
            & (bv - col_second >= v.rescue_margin) & mutual
        if return_diag:
            diag.update(lost=lost, rescued=rescue, rescue_det=bj,
                        rescue_sim=bv,
                        rescue_row_margin=bv - second,
                        rescue_col_margin=bv - col_second,
                        rescue_mutual=mutual,
                        free=free, claimed=claimed)
        new_masks = jnp.where(rescue[:, None, None],
                              det_masks_lr[bj], new_masks)
        # Reset the working embedding to the re-anchoring detection's —
        # the current one carries frames of drift pollution.
        new_emb = jnp.where(rescue[:, None], det_emb[bj], new_emb)
        # negative miss opens the post-rescue trust window (see the
        # agreement-gate bypass above)
        new_miss = jnp.where(rescue, -v.rescue_trust_frames, new_miss)
        new_score = jnp.where(rescue, det_scores[bj], new_score)
        if drift_out is not None:
            drift_out = jnp.where(rescue, 0, drift_out)
        if v.rescue_steal:
            # Cancel the claimer's update for any detection a rescue
            # stole: its mask/embedding/score revert to the propagated-
            # only outcome (two tracks must not share one det's mask).
            stolen = (jnp.zeros((d,)).at[bj].max(
                jnp.where(rescue, 1.0, 0.0)) > 0.5) & claimed
            victim = matched & (w > 0.1) & stolen[midx]
            new_masks = jnp.where(victim[:, None, None], propagated,
                                  new_masks)
            new_emb = jnp.where(victim[:, None], state.emb, new_emb)
            new_miss = jnp.where(victim,
                                 jnp.where(state.miss < 0,
                                           state.miss + 1, ticked),
                                 new_miss)
            new_score = jnp.where(
                victim, state.score * v.score_decay_unsupported, new_score)
            if return_diag:
                diag.update(victim=victim)
    # Retirement is an UNSUPERVISED-mode concept (reference: spawn/retire
    # of discovered tracks). Under the DAVIS semi-supervised protocol the
    # object set is fixed at frame 0 and a retired track can never return
    # — one detector dry spell of miss_tolerance frames would zero the
    # object's J for the rest of the sequence even though propagation was
    # carrying it. Semi-supervised tracks therefore never retire; they
    # just keep propagating (their score decays, so a confident detection
    # re-anchors them through the blend when one reappears).
    if v.semi_supervised:
        alive = state.alive
    else:
        alive = state.alive & (new_miss <= v.miss_tolerance)

    state = TrackState(new_masks, new_emb, alive, new_miss, new_score,
                       state.obj_id, state.pfeat, state.emb0, drift_out)

    if not v.semi_supervised:
        state = _spawn_tracks(cfg, state, det_masks_lr, det_emb, det_scores,
                              det_valid & ~det_taken)
    if return_diag:
        diag.update(matched=matched, midx=midx, w=w,
                    iou_matched=iou[jnp.arange(iou.shape[0]), midx],
                    score_after=state.score, miss_after=state.miss)
        return state, diag
    return state


def _spawn_tracks(cfg: Config, state: TrackState, det_masks_lr, det_emb,
                  det_scores, spawnable) -> TrackState:
    """Unsupervised mode: open new tracks from confident unmatched dets.

    Up to `max_spawn` spawns per frame; each iteration takes the best
    remaining candidate and the first free slot, fully fixed-shape.
    """
    v = cfg.vos
    max_spawn = v.max_spawn
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
            pfeat=st.pfeat,
            emb0=None if st.emb0 is None else jnp.where(
                ok, st.emb0.at[free].set(det_emb[j]), st.emb0),
            drift=None if st.drift is None else jnp.where(
                ok, st.drift.at[free].set(0), st.drift),
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
