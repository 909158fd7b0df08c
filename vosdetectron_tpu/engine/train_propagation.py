"""Propagation-head training on motion sequences with exact mask GT.

TPU-native training stage for the fork's learned propagation module
(reference: fork-added propagation head, SURVEY.md §2.2 "Mask propagation /
association" ~500 LoC — the reference trains it on video GT; here the
synthetic DAVIS generator provides exact per-frame motion GT, and real
DAVIS trains the same way once mounted).

Design: the detector is FROZEN (matching the reference's staged VOS
training); only the PropagationHead (projection + flow + refine convs)
learns. Frame inputs (image + backbone features at track resolution) are
precomputed per frame with one batched jitted program, then (t-1, t) pairs
stream through an Adam loop — every step is a handful of small convs, so
batches stay large and MXU-friendly.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..models.generalized_rcnn import GeneralizedRCNN, init_model_params
from ..models.propagation import PropagationHead, init_propagation_params
from .vos import preprocess_frame


def sequence_track_masks(idmaps: np.ndarray, cfg: Config, scale: float
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """GT id maps (T, H0, W0) -> (T, K, mh, mw) soft masks + (K,) valid.

    Slots are assigned from the ids present in frame 0 (DAVIS protocol) and
    stay fixed for the whole sequence, so (t-1, t) pairs line up per slot.
    """
    import cv2

    k = cfg.vos.max_tracks
    mh, mw = cfg.vos.track_mask_size
    ph, pw = cfg.test.padded_image_size
    t, h0, w0 = idmaps.shape
    nh, nw = int(round(h0 * scale)), int(round(w0 * scale))
    ids = sorted(int(i) for i in np.unique(idmaps[0]) if i != 0)[:k]
    masks = np.zeros((t, k, mh, mw), np.float32)
    valid = np.zeros((k,), bool)
    for slot, oid in enumerate(ids):
        valid[slot] = True
        for fr in range(t):
            m = (idmaps[fr] == oid).astype(np.float32)
            m = cv2.resize(m, (nw, nh), interpolation=cv2.INTER_LINEAR)
            canvas = np.zeros((ph, pw), np.float32)
            canvas[:nh, :nw] = m
            masks[fr, slot] = cv2.resize(canvas, (mw, mh),
                                         interpolation=cv2.INTER_LINEAR)
    return masks, valid


class PropagationTrainer:
    """Trains a PropagationHead against a frozen detector."""

    def __init__(self, cfg: Config, det_params=None, rng: int = 0,
                 lr: float = 1e-3, aux_warp_weight: float = 0.3):
        from ..utils.jax_setup import setup

        setup()
        self.cfg = cfg
        self.aux_warp_weight = aux_warp_weight
        self.model = GeneralizedRCNN(cfg)
        if det_params is None:
            det_params = init_model_params(
                self.model, jax.random.PRNGKey(rng),
                cfg.test.padded_image_size)
        self.det_params = det_params
        self.head = PropagationHead(feat_dim=cfg.vos.prop_feat_dim)
        emb_dim = cfg.fpn.dim if cfg.fpn.enabled else 1024
        self.head_params = init_propagation_params(
            cfg, self.head, jax.random.PRNGKey(rng + 1), emb_dim)
        self.tx = optax.adam(lr)
        self.opt_state = jax.jit(self.tx.init)(self.head_params)
        self._step = self._make_step()
        self._fi_jit = self._make_frame_inputs()

    # ------------------------------------------------------------ features

    def frame_inputs(self, frames_u8: np.ndarray, scale: float
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(B, H0, W0, 3) uint8 -> (img_lr (B,mh,mw,3) f32,
        feat_lr (B,mh,mw,C) bf16) with the frozen detector."""
        return self._fi_jit(self.det_params, jnp.asarray(frames_u8), scale)

    def _make_frame_inputs(self):
        import functools

        cfg = self.cfg
        mh, mw = cfg.vos.track_mask_size

        @functools.partial(jax.jit, static_argnums=(2,))
        def fi(params, frames, scale):
            def one(f):
                im, _ = preprocess_frame(cfg, f, scale)
                return im

            imgs = jax.vmap(one)(frames)
            feats = self.model.apply({"params": params}, imgs,
                                     method=GeneralizedRCNN.extract_feats)
            feat = feats[1] if cfg.fpn.enabled else feats[0]
            feat_lr = jax.vmap(lambda f: jax.image.resize(
                f.astype(jnp.bfloat16), (mh, mw, f.shape[-1]),
                "linear"))(feat)
            # unit-stds images for frame_input (matches engine/vos.py)
            stds = jnp.asarray(cfg.data.pixel_stds, jnp.float32)
            img_lr = jax.vmap(lambda im: jax.image.resize(
                im, (mh, mw, 3), "linear"))(imgs) * stds
            return img_lr, feat_lr

        return fi

    # ------------------------------------------------------------ training

    def _make_step(self):
        head, tx = self.head, self.tx
        aux_weight = self.aux_warp_weight

        def pair_with_aux(params, pi, pf, ci, cf, mp):
            prev_inp = head.apply({"params": params}, pi,
                                  pf.astype(jnp.float32),
                                  method=PropagationHead.frame_input)
            cur_inp = head.apply({"params": params}, ci,
                                 cf.astype(jnp.float32),
                                 method=PropagationHead.frame_input)
            return head.apply({"params": params}, prev_inp, cur_inp, mp,
                              method=PropagationHead.propagate_with_aux)

        def pair_logits(params, pi, pf, ci, cf, mp):
            return pair_with_aux(params, pi, pf, ci, cf, mp)[0]

        def loss_fn(params, batch):
            pi, pf, ci, cf, mp, mc, valid = batch
            logits, warped = jax.vmap(
                lambda a, b, c, d, e: pair_with_aux(params, a, b, c, d, e))(
                    pi, pf, ci, cf, mp)                       # (B, K, mh, mw)
            bce = optax.sigmoid_binary_cross_entropy(logits, mc)
            w = valid.astype(jnp.float32)[..., None, None]
            per_px = (bce * w).sum() / jnp.maximum(
                w.sum() * logits.shape[-1] * logits.shape[-2], 1.0)
            # Auxiliary soft-IoU loss on the warp alone: supervises the
            # flow path directly so refine cannot mask a lazy motion model.
            inter = (jnp.minimum(warped, mc) * w).sum(axis=(-1, -2))
            union = (jnp.maximum(warped, mc) * w).sum(axis=(-1, -2))
            iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-6),
                            1.0)
            v = valid.astype(jnp.float32)
            warp_loss = ((1.0 - iou) * v).sum() / jnp.maximum(v.sum(), 1.0)
            return per_px + aux_weight * warp_loss

        @jax.jit
        def step(params, opt_state, batch):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._pair_logits = pair_logits
        return step

    def train_step(self, batch) -> float:
        self.head_params, self.opt_state, loss = self._step(
            self.head_params, self.opt_state, batch)
        return float(loss)

    # ------------------------------------------------------------ eval

    def evaluate_pairs(self, batch) -> Dict[str, float]:
        """Mean J (IoU@0.5) of learned propagation vs identity baseline."""
        pi, pf, ci, cf, mp, mc, valid = batch

        @jax.jit
        def run(params, pi, pf, ci, cf, mp):
            return jax.vmap(
                lambda a, b, c, d, e: self._pair_logits(params, a, b, c,
                                                        d, e))(
                pi, pf, ci, cf, mp)

        logits = np.asarray(run(self.head_params, pi, pf, ci, cf, mp))
        prop = (logits > 0.0)

        def mean_iou(pred):
            pred = pred.astype(bool)
            gt = np.asarray(mc) > 0.5
            v = np.asarray(valid).astype(bool)
            inter = (pred & gt).sum(axis=(-1, -2)).astype(np.float64)
            union = (pred | gt).sum(axis=(-1, -2)).astype(np.float64)
            iou = np.where(union > 0, inter / np.maximum(union, 1), 1.0)
            return float(iou[v].mean()) if v.any() else 0.0

        return {
            "J_learned": mean_iou(prop),
            "J_identity": mean_iou(np.asarray(mp) > 0.5),
        }


def build_pair_batches(trainer: PropagationTrainer,
                       sequences: List[Tuple[np.ndarray, np.ndarray]],
                       scale: Optional[float] = None):
    """[(frames (T,H,W,3) u8, idmaps (T,H,W))] -> list of per-sequence pair
    tuples (pi, pf, ci, cf, mp, mc, valid) with B = T-1 pairs each."""
    cfg = trainer.cfg
    out = []
    for frames, idmaps in sequences:
        h0, w0 = frames.shape[1:3]
        sc = scale if scale is not None else min(
            cfg.test.scale / min(h0, w0), cfg.test.max_size / max(h0, w0))
        img_lr, feat_lr = trainer.frame_inputs(frames, sc)
        masks, valid = sequence_track_masks(idmaps, cfg, sc)
        t = frames.shape[0]
        batch = (img_lr[:-1], feat_lr[:-1], img_lr[1:], feat_lr[1:],
                 jnp.asarray(masks[:-1]), jnp.asarray(masks[1:]),
                 jnp.asarray(np.tile(valid, (t - 1, 1))))
        out.append(batch)
    return out


def train_on_synthetic(cfg: Config, num_train_seqs: int = 24,
                       num_frames: int = 10, steps: int = 2000,
                       lr: float = 1e-3, rng: int = 0,
                       size: Tuple[int, int] = (96, 160),
                       num_objects: int = 2,
                       det_params=None,
                       log_every: int = 50):
    """Train on synthetic moving sequences; report J vs identity on a
    held-out sequence with unseen motion. Returns (head_params, report)."""
    from ..data.davis import make_synthetic_sequence

    trainer = PropagationTrainer(cfg, det_params=det_params, rng=rng, lr=lr)
    train_seqs = [make_synthetic_sequence(seed, num_frames, size,
                                          num_objects)
                  for seed in range(rng, rng + num_train_seqs)]
    val_seq = make_synthetic_sequence(rng + 1000, num_frames, size,
                                      num_objects)

    batches = build_pair_batches(trainer, train_seqs)
    val_batch = build_pair_batches(trainer, [val_seq])[0]

    base = trainer.evaluate_pairs(val_batch)
    history = []
    for it in range(steps):
        loss = trainer.train_step(batches[it % len(batches)])
        if log_every and (it % log_every == 0 or it == steps - 1):
            history.append((it, loss))
    final = trainer.evaluate_pairs(val_batch)
    report = {
        "J_identity": base["J_identity"],
        "J_learned_init": base["J_learned"],
        "J_learned_final": final["J_learned"],
        "final_loss": history[-1][1] if history else float("nan"),
        "history": history,
    }
    return trainer.head_params, report
