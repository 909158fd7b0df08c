"""VOS sequence engine — whole-sequence lax.scan, one compiled program.

TPU-native rebuild of the fork's VOS inference tool
(reference: fork-added VOS sequence engine, SURVEY.md §3.3: Python loop of
im_detect_all -> propagate -> associate -> write PNG per frame).

Redesign (the core of the 60 f/s/chip strategy, BASELINE.json north_star):
  * the per-frame loop is a ``lax.scan`` carrying TrackState — detector,
    propagation, association, and indexed-map rendering all inside ONE XLA
    program; sequences are processed in fixed-size frame chunks so each
    unique length compiles once;
  * frames enter the device as raw uint8 480p; resize / normalize / pad
    happen on-device (host only decodes JPEG), slashing host->device
    bandwidth 4x vs float32 and keeping the host out of the hot path;
  * chunks are double-buffered: the host enqueues chunk t+1's uint8 frames
    (device_put is async) while the device scans chunk t.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models.generalized_rcnn import GeneralizedRCNN
from ..models.propagation import (PropagationHead, TrackState,
                                  make_propagation_head,
                                  associate_and_update, empty_track_state,
                                  init_propagation_params, reid_embedding,
                                  reid_embedding_dim,
                                  propagate_identity, render_indexed,
                                  render_indexed_pallas)
from ..ops.mask_paste import paste_masks_in_image
from .inference import postprocess_boxes, select_class_masks


class PreparedSequence(NamedTuple):
    """Host-side handle to a sequence whose chunks are uploading and whose
    track state is initializing, all off the critical path."""
    state: TrackState
    chunk_futs: list          # futures resolving to device chunk buffers
    t: int
    h0: int
    w0: int
    scale: float
    first_frame_gt: Optional[np.ndarray]


class DeltaChunk(NamedTuple):
    """Device handle for one temporally delta-coded chunk
    (vos.upload_format="yuv420_delta"): frame 0's full packed buffer plus,
    per frame, the indices and payloads of the blocks that changed vs the
    previous frame. Reconstruction (VOSEngine._expand_delta) is bit-exact;
    upload bytes drop by however static the content is.

    CHAINED form (full0 is None): frame 0 itself is delta-coded against
    the LAST frame of the previous chunk (adjacent frames of the same
    sequence), which the resolver carries on device — every chunk after a
    sequence's first skips the full-frame upload entirely. idx row 0 then
    holds real block indices instead of the all-drop sentinel."""
    full0: object    # (nblocks*block,) uint8 on device, or None (chained)
    idx: object      # (C, K) int32; nblocks = drop sentinel
    payload: object  # (C, K, block) uint8
    psize: int       # unpadded packed bytes per frame


def _quantize_k(kmax: int, nb: int) -> int:
    """Round the per-frame changed-block budget up to a bounded alphabet
    (powers of two up to 64, then 8 steps per octave: step = 2^(b-4) for
    kmax of bit length b) so the device-side reconstruction program
    compiles for a handful of K values rather than one per chunk; padding
    waste is <= 12.5% — and the padded payload bytes really do upload, so
    the waste bound is an upload-bytes bound too."""
    if kmax <= 64:
        k = 1 << max(3, int(kmax - 1).bit_length())
    else:
        step = 1 << (int(kmax).bit_length() - 4)
        k = -(-kmax // step) * step
    return min(nb, k)


def _delta_encode_chunk(buf: np.ndarray, block: int,
                        max_ratio: float = 0.75,
                        base: Optional[np.ndarray] = None):
    """(C, P) uint8 packed chunk -> (full0_padded, idx, payload) numpy
    triple, or None when delta coding wouldn't save >= (1 - max_ratio) of
    the bytes (dense change: camera motion, sensor noise — upload the full
    chunk instead).

    Frame j>0 is encoded as the set of `block`-byte blocks where it
    differs from frame j-1. With `base` (the (P,) packed LAST frame of the
    previous chunk — its temporal neighbour), frame 0 is delta-coded
    against it too and full0 comes back None (the CHAINED DeltaChunk form;
    the resolver supplies the base from the previous chunk's
    reconstruction, so no full frame crosses the tunnel at all)."""
    c, p = buf.shape
    nb = -(-p // block)
    pad = nb * block - p

    def blocks(x):
        return (np.concatenate([x, np.zeros((x.shape[0], pad), np.uint8)],
                               axis=1) if pad else x).reshape(-1, nb, block)

    a = blocks(buf)
    if base is None:
        if c < 2:
            return None
        neq = (a[1:] != a[:-1]).any(axis=2)      # (c-1, nb), rows 1..c-1
        first = 1
    else:
        prev = np.concatenate([blocks(base[None]), a[:-1]], axis=0)
        neq = (a != prev).any(axis=2)            # (c, nb), rows 0..c-1
        first = 0
    k = _quantize_k(int(neq.sum(axis=1).max()) if neq.size else 0, nb)
    full_bytes = 0 if base is not None else nb * block
    if full_bytes + c * k * (block + 4) >= max_ratio * c * p:
        return None
    idx = np.full((c, k), nb, np.int32)
    payload = np.zeros((c, k, block), np.uint8)
    for j in range(first, c):
        w = np.nonzero(neq[j - first])[0]
        idx[j, :w.size] = w
        payload[j, :w.size] = a[j, w]
    full0 = None if base is not None \
        else np.ascontiguousarray(a[0].reshape(-1))
    return full0, idx, payload


def _delta_encode_multi(packed: np.ndarray, block: int,
                        bases: Optional[np.ndarray] = None):
    """Batched _delta_encode_chunk over a leading sequence axis.

    packed: (S, C, P) uint8; bases: optional (S, P) previous-chunk last
    frames (the chained form). Per-sequence encodings are padded to ONE
    shared K (max over sequences — they share a compiled program) with the
    out-of-range sentinel. Returns (full0 (S, NB*block) or None, idx
    (S, C, K), payload (S, C, K, block)), or None when ANY sequence's
    encode falls back (all-or-nothing: the chunk's sequences must travel
    in one format)."""
    s, c, p = packed.shape
    encs = []
    for i in range(s):
        enc = _delta_encode_chunk(
            packed[i], block, base=None if bases is None else bases[i])
        if enc is None:
            return None
        encs.append(enc)
    nb = -(-p // block)
    k = max(e[1].shape[1] for e in encs)
    idx = np.full((s, c, k), nb, np.int32)
    payload = np.zeros((s, c, k, block), np.uint8)
    for i, e in enumerate(encs):
        ki = e[1].shape[1]
        idx[i, :, :ki] = e[1]
        payload[i, :, :ki] = e[2]
    full0 = None if bases is not None else np.stack([e[0] for e in encs])
    return full0, idx, payload


def preprocess_frame(cfg: Config, frame_u8: jnp.ndarray, scale: float
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """uint8/float (H0, W0, 3) BGR -> padded float (PH, PW, 3); returns
    (image, effective hw). All shapes static under jit."""
    h0, w0 = frame_u8.shape[:2]
    nh, nw = int(round(h0 * scale)), int(round(w0 * scale))
    im = frame_u8.astype(jnp.float32)
    if (nh, nw) != (h0, w0):
        im = jax.image.resize(im, (nh, nw, 3), "linear")
    im = (im - jnp.asarray(cfg.data.pixel_means, jnp.float32)) \
        / jnp.asarray(cfg.data.pixel_stds, jnp.float32)
    ph, pw = cfg.test.padded_image_size
    im = jnp.pad(im, ((0, ph - nh), (0, pw - nw), (0, 0)))
    return im, jnp.asarray([nh, nw], jnp.float32)


def _frame_yuv420_planes(frame: np.ndarray, den: int = 2):
    """(H, W, 3) uint8 BGR -> full-range JFIF (Y (H,W), U, V chroma
    planes at chroma_hw(H, W, den) resolution).

    FULL-RANGE BT.601 (cv2.COLOR_BGR2YCrCb) with exact 2x2 chroma
    averaging — the same convention JPEG files store and the device-side
    `_frames_to_bgr` inverts. (cv2.COLOR_BGR2YUV_I420 is STUDIO-swing,
    Y in [16,235]: packing with it while unpacking full-range silently
    compressed contrast by 219/255 — a real bug found when the native
    raw-plane decoder disagreed with it by up to 17 LSB.)
    """
    import cv2

    ycc = cv2.cvtColor(frame, cv2.COLOR_BGR2YCrCb)
    h, w = frame.shape[:2]
    # INTER_AREA on a 2x downscale is exact 2x2 box averaging
    u = cv2.resize(ycc[..., 2], (w // 2, h // 2),
                   interpolation=cv2.INTER_AREA)  # Cb
    v = cv2.resize(ycc[..., 1], (w // 2, h // 2),
                   interpolation=cv2.INTER_AREA)  # Cr
    if den == 4:
        # exact 2x2 box with edge clamp — matches the native decoder's
        # den=4 averaging (cv2.resize would use fractional-area weights
        # on odd half-dims)
        u, v = _box2x2_clamp(u), _box2x2_clamp(v)
    return ycc[..., 0], u, v


def _box2x2_clamp(p: np.ndarray) -> np.ndarray:
    """2x downscale by 2x2 box average; odd trailing row/col clamp."""
    h, w = p.shape
    if h % 2:
        p = np.concatenate([p, p[-1:]], axis=0)
    if w % 2:
        p = np.concatenate([p, p[:, -1:]], axis=1)
    q = p.astype(np.uint16)
    q = (q[0::2, 0::2] + q[0::2, 1::2] + q[1::2, 0::2] + q[1::2, 1::2]
         + 2) >> 2
    return q.astype(np.uint8)


def _to_yuv420(chunk: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(C, H, W, 3) uint8 BGR -> (Y (C, H, W), UV (C, H/2, W/2, 2)) uint8.

    Halves host->device bytes: JPEG sources are already 4:2:0 chroma-
    subsampled, so this re-subsampling is effectively lossless.
    """
    c, h, w, _ = chunk.shape
    ys = np.empty((c, h, w), np.uint8)
    uvs = np.empty((c, h // 2, w // 2, 2), np.uint8)
    for i in range(c):
        ys[i], uvs[i, ..., 0], uvs[i, ..., 1] = \
            _frame_yuv420_planes(chunk[i])
    return ys, uvs


def _to_yuv420_packed(chunk: np.ndarray, den: int = 2) -> np.ndarray:
    """(C, H, W, 3) uint8 BGR -> ONE packed (C, H*W + CH*CW*2) uint8
    buffer per chunk (Y plane then interleaved UV, per frame; CH/CW from
    chroma_hw(H, W, den)).

    One device_put per chunk instead of two: the tunnel's per-transfer
    overhead is substantial (measured: packed 62 f/s vs split 44 f/s
    single-stream at 480p).
    """
    from ..native.jpegdec import chroma_hw

    c, h, w, _ = chunk.shape
    ybytes = h * w
    ch, cw = chroma_hw(h, w, den)
    buf = np.empty((c, ybytes + ch * cw * 2), np.uint8)
    for i in range(c):
        y, u, v = _frame_yuv420_planes(chunk[i], den)
        buf[i, :ybytes] = y.reshape(-1)
        uv = buf[i, ybytes:].reshape(ch, cw, 2)
        uv[..., 0] = u
        uv[..., 1] = v
    return buf


def _pack_ids4(ids: jnp.ndarray) -> jnp.ndarray:
    """(..., W) uint8 id map with values <= 15, W even -> (..., W/2)
    nibble-packed uint8 (low nibble = even column). Halves the
    device->host id-map download, which shares the tunnel with (and is
    starved by) the frame uploads — measured 2.6 MB/s downstream under
    saturated upload vs 23 MB/s idle."""
    return (ids[..., 0::2] | (ids[..., 1::2] << 4)).astype(jnp.uint8)


def _unpack_ids4(packed: np.ndarray) -> np.ndarray:
    """Host-side inverse of _pack_ids4 (numpy, ~0.2 ms/frame at 480p)."""
    out = np.empty(packed.shape[:-1] + (packed.shape[-1] * 2,), np.uint8)
    out[..., 0::2] = packed & 0xF
    out[..., 1::2] = packed >> 4
    return out


class VOSEngine:
    """Runs semi-supervised VOS over DAVIS sequences."""

    def __init__(self, cfg: Config, params=None, rng: int = 0,
                 chunk: int = 16, prop_params=None):
        from concurrent.futures import ThreadPoolExecutor

        from ..models.generalized_rcnn import init_model_params
        from ..utils.jax_setup import setup

        setup()
        self.cfg = cfg
        self.chunk = chunk
        from ..models.convs import set_conv_impl

        set_conv_impl(cfg.model.conv_impl)
        self.model = GeneralizedRCNN(cfg)
        if params is None:
            params = init_model_params(self.model, jax.random.PRNGKey(rng),
                                       cfg.test.padded_image_size)
        # Commit the weights to the device ONCE. Host-resident (numpy)
        # params would be re-transferred on EVERY jitted call — invisible
        # over PCIe, but through the tunnel that is ~150 MB per chunk:
        # measured 2026-08-18, it turned a 28 ms extract_feats into 3.8 s
        # and capped the whole pipeline at ~3 f/s in 30 MB/s weather.
        self.params = jax.device_put(params, jax.local_devices()[0])
        # feat_dim: backbone feature channels (prop-head input width);
        # emb_dim: re-id embedding width (feat_dim + color moments when
        # vos.emb_mode == "centered_color") — the TrackState emb size.
        self.feat_dim = cfg.fpn.dim if cfg.fpn.enabled else 1024
        self.emb_dim = reid_embedding_dim(cfg, self.feat_dim)
        self.prop_head = make_propagation_head(cfg)
        self.learned_prop = self.prop_head is not None
        self.prop_params = prop_params
        if self.learned_prop:
            if self.prop_params is None:
                self.prop_params = init_propagation_params(
                    cfg, self.prop_head, jax.random.PRNGKey(rng),
                    self.feat_dim)
            self.prop_params = jax.device_put(self.prop_params,
                                              jax.local_devices()[0])
        # Persistent transfer pools: device_put over the host<->device link
        # is effectively synchronous, so concurrent streams are the only way
        # to keep the link saturated while the device scans.
        self._up_pool = ThreadPoolExecutor(
            max_workers=max(cfg.vos.upload_streams, 1))
        self._down_pool = ThreadPoolExecutor(max_workers=3)

    # ------------------------------------------------------------ device side

    def _frames_to_bgr(self, frames, src_hw=None) -> jnp.ndarray:
        """Chunk buffer -> (C, H, W, 3) float32 BGR.

        Accepts raw uint8 BGR (C, H, W, 3), a (Y, UV) yuv420 pair, or a
        packed per-frame yuv420 buffer (C, H*W + H*W/2) with src_hw giving
        (H, W); the 4:2:0 reconstruction (nearest chroma upsample +
        full-range BT.601) is elementwise, so XLA fuses it into the
        preprocess."""
        den = getattr(getattr(self, "cfg", None), "vos", None)
        den = den.chroma_den if den is not None else 2
        if not isinstance(frames, (tuple, list)):
            if frames.ndim == 2:  # packed yuv
                from ..native.jpegdec import chroma_hw

                h0, w0 = src_hw
                c = frames.shape[0]
                yb = h0 * w0
                ch, cw = chroma_hw(h0, w0, den)
                y = frames[:, :yb].reshape(c, h0, w0)
                uv = frames[:, yb:].reshape(c, ch, cw, 2)
                frames = (y, uv)
            else:
                return frames.astype(jnp.float32)
        y, uv = frames
        h0, w0 = y.shape[-2:]
        # infer the subsampling factor from the actual plane shapes (a
        # tuple caller may have packed at a different den than cfg)
        den = max(1, round(h0 / uv.shape[-3]))
        yf = y.astype(jnp.float32)
        u = uv[..., 0].astype(jnp.float32) - 128.0
        v = uv[..., 1].astype(jnp.float32) - 128.0
        u = jnp.repeat(jnp.repeat(u, den, axis=-2), den, axis=-1)
        v = jnp.repeat(jnp.repeat(v, den, axis=-2), den, axis=-1)
        # ceil-div chroma planes can overshoot on odd half-dims
        u = u[..., :h0, :w0]
        v = v[..., :h0, :w0]
        b = yf + 1.772 * u
        g = yf - 0.344136 * u - 0.714136 * v
        r = yf + 1.402 * v
        return jnp.clip(jnp.stack([b, g, r], axis=-1), 0.0, 255.0)

    def _preprocess(self, frame_u8: jnp.ndarray, scale: float
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return preprocess_frame(self.cfg, frame_u8, scale)

    def _det_lowres(self, dets_boxes, masks):
        """Paste det masks into the track-resolution grid spanning the
        padded image."""
        cfg = self.cfg
        mh, mw = cfg.vos.track_mask_size
        ph, pw = cfg.test.padded_image_size
        sx, sy = mw / pw, mh / ph
        scaled = dets_boxes * jnp.asarray([sx, sy, sx, sy], jnp.float32)
        return paste_masks_in_image(masks, scaled, mh, mw, threshold=-1.0)

    def _detect_chunk(self, params, frames_u8: jnp.ndarray, scale: float,
                      prop_params=None, src_hw=None):
        """Batched detection phase over a chunk of frames.

        The Mask R-CNN forward carries no frame-to-frame state, so a whole
        chunk runs as ONE batched program (better MXU utilization than the
        reference's frame-at-a-time loop); only the cheap association
        recurrence is sequential.

        frames_u8 (C, H0, W0, 3) -> per-frame (det_masks_lr, det_emb,
        scores, valid).
        """
        cfg = self.cfg
        frames_f32 = self._frames_to_bgr(frames_u8, src_hw)
        imgs, hws = jax.vmap(
            lambda f: self._preprocess(f, scale))(frames_f32)
        out = self.model.apply({"params": params}, imgs, hws)
        dets = postprocess_boxes(out, hws, cfg,
                                 candidate_topk=min(
                                     1000, out.cls_scores.shape[1]
                                     * max(out.cls_scores.shape[2] - 1, 1)))
        mask_logits = self.model.apply(
            {"params": params}, out.feats, dets.boxes,
            method=GeneralizedRCNN.mask_branch)
        masks = select_class_masks(mask_logits, dets.classes)

        det_masks_lr = jax.vmap(self._det_lowres)(dets.boxes, masks)

        feat = out.feats[1] if cfg.fpn.enabled else out.feats[0]
        mh, mw = cfg.vos.track_mask_size

        def per_frame_lr(f):
            f_lr = jax.image.resize(f.astype(jnp.bfloat16),
                                    (mh, mw, f.shape[-1]), "linear")
            return f_lr.astype(jnp.float32)

        feat_lr = jax.vmap(per_frame_lr)(feat)           # (C, mh, mw, Cf)

        # low-res image: the prop head's frame_input and the color block
        # of the re-id embedding both want mean-subtracted UNIT-stds
        # pixels with the cfg stds multiplied back (raw-minus-mean BGR),
        # so one head checkpoint / one embedding definition works under
        # any preprocessing config.
        img_lr = None
        if self.learned_prop or cfg.vos.emb_mode == "centered_color":
            stds = jnp.asarray(cfg.data.pixel_stds, jnp.float32)
            img_lr = jax.vmap(lambda im: jax.image.resize(
                im, (mh, mw, 3), "linear"))(imgs) * stds  # (C, mh, mw, 3)

        if cfg.vos.emb_mode == "centered_color":
            det_emb = jax.vmap(lambda f, m, im: reid_embedding(
                cfg, f, m, im))(feat_lr, det_masks_lr, img_lr)
        else:
            det_emb = jax.vmap(lambda f, m: reid_embedding(
                cfg, f, m))(feat_lr, det_masks_lr)

        prop_inp = None
        if self.learned_prop:
            prop_inp = jax.vmap(
                lambda i, f: self.prop_head.apply(
                    {"params": prop_params}, i, f,
                    method=type(self.prop_head).frame_input))(img_lr, feat_lr)
        return det_masks_lr, det_emb, dets.scores, dets.valid, prop_inp

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def _expand_delta(self, base, idx, payload, psize: int):
        """Reconstruct a delta-coded chunk (see DeltaChunk) to the (C, P)
        packed frames the scan consumes. A cheap sequential scatter scan —
        frame j = frame j-1 with its changed blocks replaced. `base` is
        either full0 (already block-padded; row 0's all-drop indices make
        frame 0 exactly full0) or, for a CHAINED chunk, the previous
        chunk's (P,) last frame (row 0 then scatters frame 0's real
        changes onto it). Out-of-range indices (the padding sentinel) are
        dropped by the scatter."""
        b = payload.shape[2]
        nb = -(-psize // b)
        pad = nb * b - base.shape[0]
        if pad:
            base = jnp.concatenate([base, jnp.zeros((pad,), jnp.uint8)])

        def body(carry, x):
            i, pl = x
            f = carry.reshape(nb, b).at[i].set(pl, mode="drop").reshape(-1)
            return f, f

        _, frames = jax.lax.scan(body, base, (idx, payload))
        return frames[:, :psize]

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def _expand_delta_multi(self, base, idx, payload, psize: int):
        """_expand_delta over a leading sequence axis (base (S, NB*b) or
        (S, P); idx (S, C, K); payload (S, C, K, b)). The per-sequence
        scatter scans are independent, so a leading-axis sharding runs
        each sequence's reconstruction on its own device with zero
        collectives."""
        return jax.vmap(lambda b, i, p: self._expand_delta.__wrapped__(
            self, b, i, p, psize))(base, idx, payload)

    def _resolve_chunk_multi(self, buf, base=None):
        """Batched _resolve_chunk for the sharded eval path: buf is a
        DeltaChunk whose leaves carry a leading sequence axis (see
        _delta_encode_multi), or a plain (S, C, P) array. base: (S, P)
        device array of each sequence's previous chunk's last frame."""
        if isinstance(buf, DeltaChunk):
            if buf.full0 is None:
                if base is None:
                    raise ValueError("chained DeltaChunk needs the previous "
                                     "chunk's last frames as base")
                if base.ndim != 2 or base.shape[-1] != buf.psize \
                        or base.dtype != jnp.uint8:
                    raise ValueError(
                        f"chained multi base mismatch: got "
                        f"{base.dtype}{base.shape}, need uint8"
                        f"(S, {buf.psize})")
                return self._expand_delta_multi(base, buf.idx, buf.payload,
                                                buf.psize)
            return self._expand_delta_multi(buf.full0, buf.idx, buf.payload,
                                            buf.psize)
        return buf

    def _resolve_chunk(self, buf, base=None):
        """Chunk future result -> the device array _scan_chunk consumes.
        `base`: the previous chunk's last packed frame on device ((P,)
        uint8) — required to reconstruct a CHAINED DeltaChunk. Callers
        walking a sequence keep ``base = resolved[-1]`` between chunks."""
        if isinstance(buf, DeltaChunk):
            if buf.full0 is None:
                if base is None:
                    raise ValueError("chained DeltaChunk needs the previous "
                                     "chunk's last frame as base")
                # a wrong base (different sequence / out-of-order resolve)
                # would silently corrupt EVERY frame of the chunk — the
                # cheap shape/dtype gate catches the common mixups
                if base.ndim != 1 or base.shape[0] != buf.psize \
                        or base.dtype != jnp.uint8:
                    raise ValueError(
                        f"chained DeltaChunk base mismatch: got "
                        f"{base.dtype}{base.shape}, need uint8"
                        f"({buf.psize},) — resolve chunks IN ORDER with "
                        f"the same sequence's previous chunk")
                return self._expand_delta(base, buf.idx, buf.payload,
                                          buf.psize)
            return self._expand_delta(buf.full0, buf.idx, buf.payload,
                                      buf.psize)
        return buf

    def _upload_packed(self, packed: np.ndarray, device,
                       base: Optional[np.ndarray] = None):
        """Upload one packed yuv420 chunk, delta-coded when the config asks
        for it and the content cooperates. `base`: host copy of the
        previous chunk's last packed frame — enables the chained encoding
        (no full-frame upload; see DeltaChunk)."""
        if self.cfg.vos.upload_format == "yuv420_delta":
            enc = _delta_encode_chunk(packed, self.cfg.vos.delta_block,
                                      base=base)
            if enc is None and base is not None:
                # chained didn't fit the budget; retry self-contained
                enc = _delta_encode_chunk(packed, self.cfg.vos.delta_block)
            if enc is not None:
                f0, idx, payload = enc
                return DeltaChunk(
                    None if f0 is None else jax.device_put(f0, device),
                    jax.device_put(idx, device),
                    jax.device_put(payload, device),
                    packed.shape[1])
        return jax.device_put(packed, device)

    @functools.partial(jax.jit, static_argnums=(0, 3, 4, 7, 8))
    def _scan_chunk(self, params, state: TrackState, scale: float,
                    out_hw, frames_u8: jnp.ndarray, prop_params=None,
                    src_hw=None, pack: bool = False):
        """frames_u8: (C, H0, W0, 3) -> (state, idmaps (C,)+out_hw uint8);
        with pack=True the idmaps come back nibble-packed
        ((C, oh, ow/2), see _pack_ids4) — only valid when every object id
        fits 4 bits (semi-supervised, max first-frame GT id <= 15).

        Phase A: batched detection (no recurrence). Phase B: lax.scan of
        propagation + association + track update + indexed rendering.
        """
        cfg = self.cfg
        det_masks_lr, det_emb, scores, valid, prop_inp = self._detect_chunk(
            params, frames_u8, scale, prop_params, src_hw)

        render = (render_indexed_pallas if cfg.vos.use_pallas_render
                  else render_indexed)

        def step(st, per_frame):
            if self.learned_prop:
                dm, de, sc, va, inp = per_frame
                prop = self.prop_head.apply({"params": prop_params},
                                            st.pfeat, inp, st.masks)
                # dead/padded slots keep their (zero) masks
                propagated = jnp.where(st.alive[:, None, None], prop,
                                       st.masks)
            else:
                dm, de, sc, va = per_frame
                propagated = propagate_identity(st)
            st = associate_and_update(cfg, st, dm, de, sc, va, propagated)
            if self.learned_prop:
                st = st._replace(pfeat=inp)
            idmap = render(st, out_hw, cfg.mrcnn.thresh_binarize)
            return st, idmap.astype(jnp.uint8)

        xs = (det_masks_lr, det_emb, scores, valid)
        if self.learned_prop:
            xs = xs + (prop_inp,)
        state, ids = jax.lax.scan(step, state, xs)
        if pack:
            ids = _pack_ids4(ids)
        return state, ids

    @functools.partial(jax.jit, static_argnums=(0, 3, 4, 7, 8))
    def _scan_chunk_multi(self, params, states: TrackState, scale: float,
                          out_hw, frames_u8: jnp.ndarray, prop_params=None,
                          src_hw=None, pack: bool = False):
        """Sharded multi-sequence scan (workload 5 eval half).

        states: TrackState with leading sequence axis S; frames_u8:
        (S, C, H0, W0, 3) raw BGR or (S, C, P) packed yuv420 (src_hw
        giving (H0, W0), exactly as _scan_chunk takes it; pack likewise
        nibble-packs the id maps). The leading axis shards over the data
        mesh (caller places inputs with shard_batch) — each device
        advances its own sequences; there is NO cross-sequence dependency
        so GSPMD inserts zero collectives in the hot loop.
        """
        def one(st, fr):
            return self._scan_chunk.__wrapped__(self, params, st, scale,
                                                out_hw, fr, prop_params,
                                                src_hw, pack)

        return jax.vmap(one)(states, frames_u8)

    @functools.partial(jax.jit, static_argnums=(0, 3, 4, 5, 8, 9))
    def _scan_chunk_multi_shardmap(self, params, states: TrackState,
                                   scale: float, out_hw, mesh,
                                   frames_u8: jnp.ndarray, prop_params=None,
                                   src_hw=None, pack: bool = False):
        """shard_map variant of the multi-sequence scan: each device runs
        the UNVMAPPED per-sequence program on its shard, so the Pallas
        RoIAlign (whose scalar prefetch cannot be vmapped) serves the
        sharded eval path too (VERDICT r1 weak #4). Python-loops over the
        per-device sequences (a static factor) instead of vmapping.
        src_hw/pack as in _scan_chunk (packed yuv420 input, nibble-packed
        id-map output)."""
        from jax.sharding import PartitionSpec as P

        s = states.alive.shape[0]
        per = s // mesh.devices.size
        assert per * mesh.devices.size == s, \
            f"S={s} must divide the mesh ({mesh.devices.size})"

        def local_fn(params, st, fr, pp):
            sts, outs = [], []
            for i in range(per):
                sti = jax.tree_util.tree_map(lambda x: x[i], st)
                fri = jax.tree_util.tree_map(lambda x: x[i], fr)
                so, ids = self._scan_chunk.__wrapped__(
                    self, params, sti, scale, out_hw, fri, pp,
                    src_hw, pack)
                sts.append(so)
                outs.append(ids)
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *sts)
            return stacked, jnp.stack(outs)

        # check_vma=False: the per-device program has no collectives, and
        # the varying-manual-axes inference rejects while_loop carries that
        # start as replicated constants (the NMS fixpoint loop).
        ax = mesh.axis_names[0]
        fn = jax.shard_map(local_fn, mesh=mesh,
                           in_specs=(P(), P(ax), P(ax), P()),
                           out_specs=(P(ax), P(ax)),
                           check_vma=False)
        return fn(params, states, frames_u8, prop_params)

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def _init_state(self, params, frame_u8, gt_masks_lr, scale: float,
                    obj_ids, prop_params=None) -> TrackState:
        """Semi-supervised init: first-frame GT masks (already at track
        resolution) + embeddings from first-frame features."""
        cfg = self.cfg
        image, im_hw = self._preprocess(frame_u8, scale)
        feats = self.model.apply({"params": params}, image[None],
                                 method=GeneralizedRCNN.extract_feats)
        feat = feats[1] if cfg.fpn.enabled else feats[0]
        mh, mw = cfg.vos.track_mask_size
        feat_lr = jax.image.resize(feat[0].astype(jnp.float32),
                                   (mh, mw, feat.shape[-1]), "linear")
        img_lr = None
        if self.learned_prop or cfg.vos.emb_mode == "centered_color":
            # unit-stds input for the head / color block (see _detect_chunk)
            img_lr = jax.image.resize(image, (mh, mw, 3), "linear") \
                * jnp.asarray(cfg.data.pixel_stds, jnp.float32)
        emb = reid_embedding(cfg, feat_lr, gt_masks_lr, img_lr)
        pfeat = None
        if self.learned_prop:
            pfeat = self.prop_head.apply(
                {"params": prop_params}, img_lr, feat_lr,
                method=type(self.prop_head).frame_input)
        alive = obj_ids > 0
        return TrackState(
            masks=gt_masks_lr, emb=emb, alive=alive,
            miss=jnp.zeros_like(obj_ids),
            score=jnp.where(alive, 1.0, 0.0).astype(jnp.float32),
            obj_id=obj_ids, pfeat=pfeat, emb0=emb,
            drift=jnp.zeros_like(obj_ids))

    # -------------------------------------------------------------- host side

    def _gt_to_track_masks(self, idmap: np.ndarray, scale: float
                           ) -> Tuple[np.ndarray, np.ndarray]:
        """First-frame GT id map -> (K, mh, mw) soft masks in padded frame
        coords + (K,) object ids."""
        import cv2

        cfg = self.cfg
        k = cfg.vos.max_tracks
        mh, mw = cfg.vos.track_mask_size
        ph, pw = cfg.test.padded_image_size
        h0, w0 = idmap.shape
        nh, nw = int(round(h0 * scale)), int(round(w0 * scale))
        ids = sorted(int(i) for i in np.unique(idmap) if i != 0)[:k]
        masks = np.zeros((k, mh, mw), np.float32)
        obj_ids = np.zeros((k,), np.int32)
        for slot, oid in enumerate(ids):
            m = (idmap == oid).astype(np.float32)
            m = cv2.resize(m, (nw, nh), interpolation=cv2.INTER_LINEAR)
            canvas = np.zeros((ph, pw), np.float32)
            canvas[:nh, :nw] = m
            masks[slot] = cv2.resize(canvas, (mw, mh),
                                     interpolation=cv2.INTER_LINEAR)
            obj_ids[slot] = oid
        return masks, obj_ids

    def _empty_pfeat(self):
        """Zero previous-frame propagation input for unsupervised starts."""
        if not self.learned_prop:
            return None
        mh, mw = self.cfg.vos.track_mask_size
        return jnp.zeros((mh, mw, 3 + self.cfg.vos.prop_feat_dim),
                         jnp.float32)

    def _output_scale(self, h0: int, w0: int) -> float:
        cfg = self.cfg
        return min(cfg.test.scale / min(h0, w0),
                   cfg.test.max_size / max(h0, w0))

    def prepare_sequence(self, frames: np.ndarray,
                         first_frame_gt: Optional[np.ndarray] = None
                         ) -> PreparedSequence:
        """Kick off everything that precedes the scan: track-state init and
        all chunk uploads (multi-stream). Returns immediately-consumable
        futures so a caller can prepare sequence i+1 while scanning i."""
        cfg = self.cfg
        t, h0, w0, _ = frames.shape
        scale = self._output_scale(h0, w0)

        device = jax.local_devices()[0]
        if first_frame_gt is not None:
            gt_lr, obj_ids = self._gt_to_track_masks(first_frame_gt, scale)
            state = self._init_state(self.params, jnp.asarray(frames[0]),
                                     jnp.asarray(gt_lr), scale,
                                     jnp.asarray(obj_ids), self.prop_params)
        else:
            state = empty_track_state(cfg, self.emb_dim,
                                      pfeat=self._empty_pfeat())
        # Commit the carry to the device so its sharding matches the scan's
        # own output exactly — otherwise the 2nd chunk retraces _scan_chunk
        # under a different (committed) argument mapping.
        state = jax.device_put(state, device)

        c = self.chunk
        pad_t = (-t) % c
        padded = np.concatenate(
            [frames, np.repeat(frames[-1:], pad_t, 0)]) if pad_t else frames
        chunks = padded.reshape(-1, c, h0, w0, 3)
        use_yuv = (cfg.vos.upload_format.startswith("yuv420")
                   and h0 % 2 == 0 and w0 % 2 == 0)

        def upload(i):
            # device_put on raw numpy: the jnp.asarray route transfers
            # through a ~20x slower path on this backend.
            if use_yuv:
                # chunks after the first chain their frame-0 delta off the
                # previous chunk's last frame (repacking that ONE frame
                # here keeps the upload workers independent)
                base = (_to_yuv420_packed(chunks[i - 1][-1:],
                                          cfg.vos.chroma_den)[0]
                        if i > 0
                        and cfg.vos.upload_format == "yuv420_delta"
                        else None)
                return self._upload_packed(
                    _to_yuv420_packed(chunks[i], cfg.vos.chroma_den),
                    device, base)
            return jax.device_put(np.ascontiguousarray(chunks[i]), device)

        chunk_futs = [self._up_pool.submit(upload, i)
                      for i in range(chunks.shape[0])]
        return PreparedSequence(state, chunk_futs, t, h0, w0, scale,
                                first_frame_gt)

    def prepare_sequence_from_files(self, frame_paths,
                                    first_frame_gt: Optional[np.ndarray]
                                    = None) -> PreparedSequence:
        """prepare_sequence, but decoding JPEGs straight into the packed
        yuv420 upload buffers with the native decoder (native/jpegdec.cpp):
        JPEG stores 4:2:0 YCbCr, so the cv2 route (YCbCr->RGB upsample,
        then BGR->I420 re-subsample) does two redundant color transforms
        per frame. Falls back to the decode-all-BGR path when the native
        decoder or the 4:2:0 layout is unavailable.

        Only frame 0 is decoded to BGR (cv2) — track-state init consumes
        it; every other frame goes file -> packed planes -> device.
        """
        from ..data.davis import read_image_bgr
        from ..native import jpegdec

        cfg = self.cfg
        probe = (jpegdec.probe_file(frame_paths[0])
                 if cfg.vos.upload_format.startswith("yuv420") else None)
        if probe is None or not probe[2]:
            from ..data.davis import read_sequence_frames_paths

            return self.prepare_sequence(
                read_sequence_frames_paths(frame_paths), first_frame_gt)
        h0, w0 = probe[0], probe[1]
        t = len(frame_paths)
        scale = self._output_scale(h0, w0)

        device = jax.local_devices()[0]
        frame0 = read_image_bgr(frame_paths[0])
        if first_frame_gt is not None:
            gt_lr, obj_ids = self._gt_to_track_masks(first_frame_gt, scale)
            state = self._init_state(self.params, jnp.asarray(frame0),
                                     jnp.asarray(gt_lr), scale,
                                     jnp.asarray(obj_ids),
                                     self.prop_params)
        else:
            state = empty_track_state(cfg, self.emb_dim,
                                      pfeat=self._empty_pfeat())
        state = jax.device_put(state, device)

        c = self.chunk
        den = cfg.vos.chroma_den
        psize = jpegdec.packed_size(h0, w0, den)
        n_chunks = (t + c - 1) // c

        def decode_packed(path, out):
            if not jpegdec.read_packed_into(path, out, den):
                # per-frame fallback (e.g. one non-4:2:0 frame)
                out[:] = _to_yuv420_packed(read_image_bgr(path)[None],
                                           den)[0]

        def decode_upload(i):
            buf = np.empty((c, psize), np.uint8)
            for j in range(c):
                k = i * c + j
                if k >= t:  # only the last chunk pads; the last real
                    buf[j] = buf[(t - 1) % c]  # frame is already decoded
                    continue
                decode_packed(frame_paths[k], buf[j])
            base = None
            if i > 0 and cfg.vos.upload_format == "yuv420_delta":
                # chain frame 0 off the previous chunk's last frame (one
                # extra decode keeps the upload workers independent)
                base = np.empty(psize, np.uint8)
                decode_packed(frame_paths[i * c - 1], base)
            return self._upload_packed(buf, device, base)

        chunk_futs = [self._up_pool.submit(decode_upload, i)
                      for i in range(n_chunks)]
        return PreparedSequence(state, chunk_futs, t, h0, w0, scale,
                                first_frame_gt)

    def _pack_gate(self, first_frame_gt: Optional[np.ndarray],
                   out_hw) -> bool:
        """Nibble-pack the id-map downloads? Only when lossless: the id
        alphabet is fixed by the first-frame GT (semi-supervised tracks
        never spawn, models/propagation.py::associate_and_update) and its
        max id fits 4 bits. Packing happens on the stacked uint8 id maps
        after the scan, so it composes with either renderer."""
        cfg = self.cfg
        return bool(cfg.vos.pack_downloads
                    and cfg.vos.semi_supervised
                    and first_frame_gt is not None
                    and out_hw[1] % 2 == 0
                    and int(np.max(first_frame_gt)) <= 15)

    def run_sequence(self, frames: Optional[np.ndarray],
                     first_frame_gt: Optional[np.ndarray] = None,
                     prepared: Optional[PreparedSequence] = None
                     ) -> List[np.ndarray]:
        """frames: (T, H0, W0, 3) uint8 BGR. Returns T id maps (H0, W0).

        Semi-supervised when first_frame_gt (H0, W0 id map) is given;
        unsupervised track spawning otherwise (cfg.vos.semi_supervised).
        Pass `prepared` (from prepare_sequence) to consume pre-uploaded
        chunks — the cross-sequence pipelining used by run_davis_dataset.
        """
        import cv2

        cfg = self.cfg
        p = prepared if prepared is not None else self.prepare_sequence(
            frames, first_frame_gt)
        t, h0, w0, scale = p.t, p.h0, p.w0, p.scale
        nh, nw = int(round(h0 * scale)), int(round(w0 * scale))

        den = max(cfg.vos.render_scale_den, 1)
        ph, pw = cfg.test.padded_image_size
        out_hw = (ph // den, pw // den)

        pack = self._pack_gate(p.first_frame_gt, out_hw)

        def download(a):
            return _unpack_ids4(np.asarray(a)) if pack else np.asarray(a)

        state = p.state
        downloads = []
        base = None  # previous chunk's last packed frame, for chained delta
        for fut in p.chunk_futs:
            buf = self._resolve_chunk(fut.result(), base)
            base = buf[-1]
            state, ids = self._scan_chunk(self.params, state, scale,
                                          out_hw, buf, self.prop_params,
                                          (h0, w0), pack)
            downloads.append(self._down_pool.submit(download, ids))
        idmaps = np.concatenate([f.result() for f in downloads])[:t]

        out = []
        for fr in range(t):
            m = idmaps[fr][:nh // den, :nw // den].astype(np.uint8)
            out.append(cv2.resize(m, (w0, h0),
                                  interpolation=cv2.INTER_NEAREST))
        if p.first_frame_gt is not None:
            out[0] = p.first_frame_gt.astype(np.uint8)  # DAVIS protocol
        return out


class OnlineVOS:
    """Streaming per-frame VOS for serving (live video): ``start()`` with
    the first frame (plus optional first-frame GT instances — the DAVIS
    semi-supervised protocol), then ``step(frame)`` -> (H0, W0) id map,
    one frame at a time against persistent on-device track state.

    The reference runs VOS as exactly this per-frame loop (SURVEY §3.3:
    detect -> propagate -> associate -> render per frame); the offline
    engine batches frames into chunked lax.scans for throughput, while
    this wrapper drives the SAME compiled step (chunk length 1) for
    latency-bound serving — identical semantics, one program per frame,
    no sequence buffering. Association is sequential either way, so
    online outputs match run_sequence up to conv batch-size numerics.
    """

    def __init__(self, engine: VOSEngine):
        self.eng = engine
        self._state = None
        self._scale = None
        self._hw = None
        self._pack = False

    def start(self, frame_bgr: np.ndarray,
              first_frame_gt: Optional[np.ndarray] = None) -> np.ndarray:
        """frame_bgr: (H0, W0, 3) uint8. Returns the frame-0 id map."""
        eng = self.eng
        h0, w0, _ = frame_bgr.shape
        self._hw = (h0, w0)
        self._scale = eng._output_scale(h0, w0)
        device = jax.local_devices()[0]
        if first_frame_gt is not None:
            gt_lr, obj_ids = eng._gt_to_track_masks(first_frame_gt,
                                                    self._scale)
            state = eng._init_state(eng.params, jnp.asarray(frame_bgr),
                                    jnp.asarray(gt_lr), self._scale,
                                    jnp.asarray(obj_ids), eng.prop_params)
            self._state = jax.device_put(state, device)
            self._pack = eng._pack_gate(first_frame_gt, self._out_hw())
            return first_frame_gt.astype(np.uint8)  # DAVIS protocol
        state = empty_track_state(eng.cfg, eng.emb_dim,
                                  pfeat=eng._empty_pfeat())
        self._state = jax.device_put(state, device)
        self._pack = False
        return self.step(frame_bgr)  # unsupervised: frame 0 spawns tracks

    def _out_hw(self) -> Tuple[int, int]:
        cfg = self.eng.cfg
        den = max(cfg.vos.render_scale_den, 1)
        ph, pw = cfg.test.padded_image_size
        return (ph // den, pw // den)

    def step(self, frame_bgr: np.ndarray) -> np.ndarray:
        """Advance one frame. frame_bgr: (H0, W0, 3) uint8 BGR."""
        import cv2

        if self._state is None:
            raise RuntimeError("OnlineVOS.step before start()")
        eng = self.eng
        cfg = eng.cfg
        h0, w0 = self._hw
        if frame_bgr.shape[:2] != (h0, w0):
            raise ValueError(f"frame shape {frame_bgr.shape[:2]} != "
                             f"start() shape {(h0, w0)}")
        # delta coding needs a chunk's worth of temporal context — the
        # per-frame streaming path always uploads full packed frames
        use_yuv = (cfg.vos.upload_format.startswith("yuv420")
                   and h0 % 2 == 0 and w0 % 2 == 0)
        buf = (_to_yuv420_packed(frame_bgr[None], cfg.vos.chroma_den)
               if use_yuv else np.ascontiguousarray(frame_bgr[None]))
        buf = jax.device_put(buf, jax.local_devices()[0])
        out_hw = self._out_hw()
        self._state, ids = eng._scan_chunk(
            eng.params, self._state, self._scale, out_hw, buf,
            eng.prop_params, (h0, w0), self._pack)
        idmap = (_unpack_ids4(np.asarray(ids)) if self._pack
                 else np.asarray(ids))[0]
        den = max(cfg.vos.render_scale_den, 1)
        nh = int(round(h0 * self._scale))
        nw = int(round(w0 * self._scale))
        m = idmap[:nh // den, :nw // den].astype(np.uint8)
        return cv2.resize(m, (w0, h0), interpolation=cv2.INTER_NEAREST)


def _download_local_rows(arr) -> np.ndarray:
    """Host copy of a leading-axis-sharded global array's LOCAL rows.

    Single-process this is np.asarray. Multi-process, np.asarray of a
    non-replicated global array is an error — and downloading every
    host's rows would waste exactly the cross-host bandwidth the sharded
    eval exists to avoid. Each process reads only its addressable shards
    (deduped: replicated inner axes repeat row blocks) in row order,
    which are its own input sequences' rows under shard_batch's
    process-contiguous assembly."""
    if jax.process_count() == 1:
        return np.asarray(arr)
    rows = {}
    for sh in arr.addressable_shards:
        start = sh.index[0].start or 0
        if start not in rows:
            rows[start] = np.asarray(sh.data)
    return np.concatenate([rows[k] for k in sorted(rows)], axis=0)


def run_sequences_sharded(engine: VOSEngine, frames: np.ndarray,
                          first_gts: np.ndarray, mesh,
                          verbose: bool = False) -> List[List[np.ndarray]]:
    """Batched multi-sequence VOS eval sharded over a device mesh
    (workload 5: "batched multi-sequence eval sharded over a v5e-8").

    frames: (S, T, H0, W0, 3) uint8 — S sequences of equal (padded) length;
    first_gts: (S, H0, W0) first-frame id maps. S must be a multiple of
    the mesh size. The Pallas RoIAlign path runs through shard_map (each
    device invokes the kernel unvmapped on its own sequences); other
    roi_xform methods run through vmap + GSPMD.

    Uploads honor cfg.vos.upload_format exactly like the single-device
    engine: packed yuv420 (~2x fewer bytes than raw BGR) and lossless
    temporal delta coding with cross-chunk chaining (the per-sequence
    bases ride on device between chunks). Delta runs single-process only:
    a multi-host global array needs identical non-leading dims, and the
    per-chunk K alphabet is content-dependent per process. Id-map
    downloads nibble-pack under the same gate as run_sequence.

    Multi-PROCESS (jax.distributed): each process passes its LOCAL
    sequences — shard_batch assembles the global batch from per-process
    shards — and receives its local sequences' predictions back (each
    host downloads only its own devices' rows; tests/_sharded_eval_worker
    asserts cross-process parity). The nibble-pack gate is agreed
    globally (AND over processes) so every process traces the same SPMD
    program.

    Returns per-sequence lists of (H0, W0) id maps (the caller's local
    sequences, in order).
    """
    import cv2

    from ..parallel.mesh import shard_batch

    cfg = engine.cfg
    s, t, h0, w0, _ = frames.shape
    scale = engine._output_scale(h0, w0)
    nh, nw = int(round(h0 * scale)), int(round(w0 * scale))

    # Per-sequence init (host loop over S; states stacked + sharded).
    states = []
    for i in range(s):
        gt_lr, obj_ids = engine._gt_to_track_masks(first_gts[i], scale)
        states.append(engine._init_state(
            engine.params, jnp.asarray(frames[i, 0]), jnp.asarray(gt_lr),
            scale, jnp.asarray(obj_ids), engine.prop_params))
    states = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)

    c = engine.chunk
    pad_t = (-t) % c
    if pad_t:
        frames = np.concatenate(
            [frames, np.repeat(frames[:, -1:], pad_t, 1)], axis=1)
    chunks = frames.reshape(s, -1, c, h0, w0, 3)

    den = max(cfg.vos.render_scale_den, 1)
    ph, pw = cfg.test.padded_image_size
    out_hw = (ph // den, pw // den)

    use_yuv = (cfg.vos.upload_format.startswith("yuv420")
               and h0 % 2 == 0 and w0 % 2 == 0)
    use_delta = (use_yuv and cfg.vos.upload_format == "yuv420_delta"
                 and jax.process_count() == 1)
    src_hw = (h0, w0) if use_yuv else None
    pack = engine._pack_gate(first_gts, out_hw)
    if jax.process_count() > 1:
        # the gate is content-dependent (max id < 16 on THIS host's
        # sequences); processes must agree or they trace different SPMD
        # programs and the collective program hangs
        from ..parallel.gather import allgather_object

        pack = all(allgather_object(bool(pack)))

    use_shardmap = cfg.fast_rcnn.roi_xform_method == "roi_align_pallas"
    # engine.params are committed to ONE device (see __init__); a mesh
    # computation needs them replicated across the mesh or jit rejects the
    # mixed placements.
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    repl = NamedSharding(mesh, P())

    def _replicate(tree):
        if jax.process_count() > 1:
            # device->global-device transfers are cross-host here and the
            # backend rejects them; hop through host instead. Every process
            # holds identical params (identical init/checkpoint), so
            # replicating each host's local copy is a consistent global
            # array.
            tree = jax.tree_util.tree_map(np.asarray, tree)
        return jax.device_put(tree, repl)

    params = _replicate(engine.params)
    prop_params = (None if engine.prop_params is None
                   else _replicate(engine.prop_params))
    up_bytes = 0
    with mesh:
        states = shard_batch(mesh, states)
        all_ids = []
        base_dev = None       # (S, P) on device: previous chunk's last frames
        prev_last = None      # host copy of the same, for the chained encode
        for ci in range(chunks.shape[1]):
            if use_yuv:
                packed = np.stack(
                    [_to_yuv420_packed(chunks[i, ci], cfg.vos.chroma_den)
                     for i in range(s)])                    # (S, C, psize)
                buf = None
                if use_delta:
                    enc = _delta_encode_multi(packed, cfg.vos.delta_block,
                                              bases=prev_last)
                    if enc is None and prev_last is not None:
                        # chained blew the budget; retry self-contained
                        enc = _delta_encode_multi(packed,
                                                  cfg.vos.delta_block)
                    if enc is not None:
                        f0, idx, payload = enc
                        up_bytes += ((0 if f0 is None else f0.nbytes)
                                     + idx.nbytes + payload.nbytes)
                        dc = DeltaChunk(
                            None if f0 is None else shard_batch(mesh, f0),
                            shard_batch(mesh, idx),
                            shard_batch(mesh, payload), packed.shape[2])
                        buf = engine._resolve_chunk_multi(dc, base_dev)
                if buf is None:
                    up_bytes += packed.nbytes
                    buf = shard_batch(mesh, packed)
                if use_delta:  # chained-encode context for the next chunk
                    base_dev = buf[:, -1]
                    prev_last = packed[:, -1]
            else:
                up_bytes += chunks[:, ci].nbytes
                buf = shard_batch(mesh, jnp.asarray(chunks[:, ci]))
            if use_shardmap:
                states, ids = engine._scan_chunk_multi_shardmap(
                    params, states, scale, out_hw, mesh, buf,
                    prop_params, src_hw, pack)
            else:
                states, ids = engine._scan_chunk_multi(
                    params, states, scale, out_hw, buf,
                    prop_params, src_hw, pack)
            all_ids.append(_download_local_rows(ids))
    idmaps = np.concatenate(all_ids, axis=1)[:, :t]  # (S, T, oh, ow[/2])
    if pack:
        idmaps = _unpack_ids4(idmaps)
    if verbose:
        import sys as _sys

        n_frames = s * chunks.shape[1] * c
        print(f"run_sequences_sharded: upload "
              f"{up_bytes / n_frames / 1024:.1f} KiB/frame "
              f"(format={cfg.vos.upload_format}, delta={use_delta}, "
              f"pack_downloads={pack})", file=_sys.stderr)

    out = []
    for i in range(s):
        seq = []
        for fr in range(t):
            m = idmaps[i, fr][: nh // den, : nw // den].astype(np.uint8)
            seq.append(cv2.resize(m, (w0, h0),
                                  interpolation=cv2.INTER_NEAREST))
        seq[0] = first_gts[i].astype(np.uint8)
        out.append(seq)
    return out


def run_davis_dataset(engine: VOSEngine, davis_root: str,
                      split: str = "val", out_dir: Optional[str] = None,
                      max_sequences: Optional[int] = None,
                      evaluate: bool = True,
                      merge_processes: bool = True):
    """Dataset-level VOS: run every sequence, export PNGs, optionally score.

    (reference: the VOS infer tool + DAVIS evaluator, SURVEY.md §3.3)

    Host pipeline: sequence i+1 is decoded, converted, UPLOADED, and its
    track state initialized on background threads while the TPU scans
    sequence i (the uploads are the critical resource on a tunnel-attached
    host); PNG export also runs off the critical path.

    Multi-host: each process runs a strided sequence shard; with
    merge_processes the per-sequence results are all-gathered so every
    process returns the SAME complete per-sequence table + aggregate
    (reference: test_engine.py per-GPU shard merge, SURVEY.md:131).
    """
    import os
    from concurrent.futures import ThreadPoolExecutor

    import jax

    from ..data.davis import (DavisCatalog, read_indexed_png,
                              write_sequence_pngs)
    from ..metrics.davis_jf import evaluate_dataset, evaluate_sequence

    cat = DavisCatalog(davis_root)
    names = cat.split_sequences(split)
    if max_sequences:
        names = names[:max_sequences]
    pc = jax.process_count()
    if pc > 1:
        names = names[jax.process_index()::pc]

    seqs = [cat.sequence(n) for n in names]
    # 2-deep prefetch: keep >= 2 sequences' decodes + uploads in flight so
    # a multi-second tunnel stall drains into queued work instead of
    # leaving the device idle (VERDICT r2 #1).
    depth = 2
    prefetch_pool = ThreadPoolExecutor(max_workers=depth)
    write_pool = ThreadPoolExecutor(max_workers=2)

    def prefetch(i):
        gt0 = read_indexed_png(seqs[i].anno_paths[0])
        return engine.prepare_sequence_from_files(seqs[i].frame_paths, gt0)

    futures = {i: prefetch_pool.submit(prefetch, i)
               for i in range(min(depth, len(seqs)))}

    all_preds = {}
    pending_writes = []
    for i, (name, seq) in enumerate(zip(names, seqs)):
        prepared = futures.pop(i).result()
        if i + depth < len(seqs):
            futures[i + depth] = prefetch_pool.submit(prefetch, i + depth)
        preds = engine.run_sequence(None, prepared=prepared)
        all_preds[name] = preds
        if out_dir:
            pending_writes.append(write_pool.submit(
                write_sequence_pngs, os.path.join(out_dir, name), preds))
    for f in pending_writes:
        f.result()
    prefetch_pool.shutdown()
    write_pool.shutdown()

    if not evaluate:
        return all_preds, None
    per_seq = {}
    for name, seq in zip(names, seqs):
        gts = [read_indexed_png(p) for p in seq.anno_paths]
        if len(gts) == len(all_preds[name]):
            per_seq[name] = evaluate_sequence(all_preds[name], gts)
    if merge_processes and pc > 1:
        from ..parallel.gather import allgather_object

        merged: dict = {}
        for shard in allgather_object(per_seq):
            merged.update(shard)
        per_seq = merged
    return per_seq, evaluate_dataset(per_seq)


def run_davis_eval(engine: VOSEngine, davis_root: str, split: str = "val",
                   out_dir: Optional[str] = None,
                   max_sequences: Optional[int] = None):
    """Back-compat wrapper returning (per_seq, aggregate)."""
    return run_davis_dataset(engine, davis_root, split, out_dir,
                             max_sequences, evaluate=True)
