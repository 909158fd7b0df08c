"""Typed configuration tree for the TPU-native VOS framework.

TPU-first redesign of the reference's global ``AttrDict`` config
(reference: lib/core/config.py, ~1100 lines of mutable global defaults).
We keep the same *section names and semantics* (MODEL / RESNETS / FPN / RPN /
FAST_RCNN / MRCNN / TRAIN / TEST / SOLVER) so reference YAML experiment files
map 1:1, but the implementation is immutable frozen dataclasses: a config is
a value you pass around, never a process-global — required for jit-safety
(configs become static Python constants captured at trace time).

Extra sections vs reference: ``VOS`` (propagation / association / track
limits — fork-added capability, SURVEY.md §2.2 Tier C) and ``PARALLEL``
(mesh axes for pjit, replacing the reference's mynn.DataParallel).

All *shape-determining* values (max proposals, max detections, max tracks,
pooled sizes, image padding) live here because XLA requires static shapes:
the reference's dynamic per-image box counts become fixed maxima + validity
masks everywhere.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any, Optional, Sequence, Tuple


# ---------------------------------------------------------------------------
# Sections
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ModelCfg:
    """Reference: cfg.MODEL (lib/core/config.py)."""

    type: str = "generalized_rcnn"
    # Builder string, mirroring reference MODEL.CONV_BODY values such as
    # 'FPN.fpn_ResNet50_conv5_body' / 'ResNet.ResNet50_conv4_body'.
    conv_body: str = "fpn_resnet50"  # "resnet50_c4" | "fpn_resnet50"
    num_classes: int = 81  # COCO default; DAVIS fine-tune overrides
    mask_on: bool = True
    # Keypoint R-CNN branch (reference: cfg.MODEL.KEYPOINTS_ON +
    # lib/modeling/keypoint_rcnn_heads.py; person-keypoint models).
    keypoint_on: bool = False
    # Bbox regression weights — Detectron (10, 10, 5, 5).
    bbox_reg_weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0)
    cls_agnostic_bbox_reg: bool = False
    # Original Detectron integer-box semantics (+1 widths in bbox
    # transforms/IoU/NMS, clip to w-1/h-1) across the WHOLE traced path —
    # proposals, target assignment, postprocess (SURVEY §7 hard-part 3;
    # flip when importing Caffe2-era weights; record the reference's value
    # in configs/reference_parity.yaml once the mount materializes).
    legacy_plus1: bool = False
    # Convolution lowering (models/convs.py): "native" = lax.conv ops
    # (XLA's own MXU lowering — the default), "dots" = every conv expressed
    # as shifted-slice + dot_general (weather insurance for remote-compile
    # toolchains whose conv lowering regresses; measured 15x faster than a
    # broken native lowering on 2026-08-18, ~HBM-bound otherwise). Process-
    # level: engines apply it before tracing; VOSDETECTRON_CONV_IMPL env
    # var overrides.
    conv_impl: str = "native"  # "native" | "dots"


@dataclass(frozen=True)
class ResNetsCfg:
    """Reference: cfg.RESNETS."""

    depth: int = 50
    # ResNeXt (reference: RESNETS.NUM_GROUPS / WIDTH_PER_GROUP; 32x4d ->
    # num_groups=32, width_per_group=4).
    num_groups: int = 1
    width_per_group: int = 64
    stem_width: int = 64
    freeze_at: int = 2  # freeze stem + res2 during fine-tune
    # Default norm is frozen BatchNorm (AffineChannel2d in the reference —
    # lib/nn/modules/affine.py): scale/bias folded, no batch stats.
    # use_gn swaps every trunk norm for GroupNorm (reference:
    # RESNETS.USE_GN, lib/nn/modules/normalization.py + gn_baselines/).
    use_gn: bool = False
    res5_dilation: int = 1


@dataclass(frozen=True)
class GroupNormCfg:
    """Reference: cfg.GROUP_NORM (lib/core/config.py; Detectron GN paper
    defaults — 32 groups, eps 1e-5)."""

    num_groups: int = 32
    eps: float = 1e-5


@dataclass(frozen=True)
class FPNCfg:
    """Reference: cfg.FPN."""

    enabled: bool = True
    dim: int = 256
    min_level: int = 2  # P2
    max_level: int = 6  # P6 (extra max-pool level for RPN)
    rpn_min_level: int = 2
    rpn_max_level: int = 6
    roi_min_level: int = 2
    roi_max_level: int = 5
    # FPN level assignment k = floor(k0 + log2(sqrt(wh)/224))
    roi_canonical_scale: int = 224
    roi_canonical_level: int = 4
    # GroupNorm on lateral + output convs (reference: FPN.USE_GN).
    use_gn: bool = False


@dataclass(frozen=True)
class RPNCfg:
    """Reference: cfg.RPN + cfg.TRAIN/TEST RPN_* keys."""

    # Anchors. Single-scale (C4): sizes (32..512) stride 16.
    # FPN: one size per level: 32 on P2 ... 512 on P6.
    aspect_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    anchor_start_size: int = 32  # FPN: size at min_level, doubling per level
    sizes: Tuple[int, ...] = (32, 64, 128, 256, 512)  # C4 single-scale
    stride: int = 16  # C4 feature stride

    # Proposal filtering (train/test variants, Detectron semantics).
    pre_nms_top_n_train: int = 2000  # per FPN level (12000 for C4)
    pre_nms_top_n_test: int = 1000  # per FPN level (6000 for C4)
    post_nms_top_n_train: int = 2000
    post_nms_top_n_test: int = 1000
    nms_thresh: float = 0.7
    min_size: float = 0.0

    # Target assignment (lib/roi_data/rpn.py).
    positive_overlap: float = 0.7
    negative_overlap: float = 0.3
    fg_fraction: float = 0.5
    batch_size_per_im: int = 256
    straddle_thresh: int = 0  # anchors outside image by > this are ignored


@dataclass(frozen=True)
class FastRCNNCfg:
    """Reference: cfg.FAST_RCNN."""

    # FPN box-head builder (reference: FAST_RCNN.ROI_BOX_HEAD):
    #   roi_2mlp_head        — two FC (default)
    #   roi_xconv1fc_head    — X conv3x3 + one FC
    #   roi_xconv1fc_gn_head — X conv3x3 with GroupNorm + one FC
    # C4 models always use the res5 head (roi_conv5_head).
    roi_box_head: str = "roi_2mlp_head"
    mlp_head_dim: int = 1024
    # Conv-head geometry (reference: FAST_RCNN.NUM_STACKED_CONVS/CONV_HEAD_DIM).
    num_stacked_convs: int = 4
    conv_head_dim: int = 256
    roi_xform_method: str = "roi_align"  # roi_align | roi_pool
    roi_xform_resolution: int = 7
    roi_xform_sampling_ratio: int = 2
    # Run Pallas kernels in interpret mode (CPU-mesh tests of the exact
    # TPU code path; never set on real hardware).
    pallas_interpret: bool = False

    # Training target sampling (lib/roi_data/fast_rcnn.py).
    batch_size_per_im: int = 512
    fg_fraction: float = 0.25
    fg_thresh: float = 0.5
    bg_thresh_hi: float = 0.5
    bg_thresh_lo: float = 0.0


@dataclass(frozen=True)
class MRCNNCfg:
    """Reference: cfg.MRCNN."""

    # "mask_rcnn_fcn_head_v1up4convs" or the GN variant
    # "mask_rcnn_fcn_head_v1up4convs_gn" (reference: MRCNN.ROI_MASK_HEAD,
    # lib/modeling/mask_rcnn_heads.py::mask_rcnn_fcn_head_v1upXconvs_gn).
    roi_mask_head: str = "mask_rcnn_fcn_head_v1up4convs"
    resolution: int = 28
    roi_xform_resolution: int = 14
    roi_xform_sampling_ratio: int = 2
    dim_reduced: int = 256
    conv_layers: int = 4
    thresh_binarize: float = 0.5


@dataclass(frozen=True)
class KRCNNCfg:
    """Reference: cfg.KRCNN (lib/modeling/keypoint_rcnn_heads.py
    add_roi_pose_head_v1convX: 8x conv3x3(512) -> ConvTranspose 4x4/2 ->
    2x bilinear upsample -> per-keypoint heatmap logits; spatial-softmax
    CE loss over visible keypoints, lib/roi_data/keypoint_rcnn.py)."""

    num_keypoints: int = 17  # COCO person keypoints
    roi_xform_resolution: int = 14
    roi_xform_sampling_ratio: int = 2
    conv_layers: int = 8
    dim: int = 512
    # Heatmap side = roi_xform_resolution * 2 (deconv) * up_scale.
    up_scale: int = 2
    # Loss normalizer: mean over visible keypoints
    # (cfg.KRCNN.NORMALIZE_BY_VISIBLE_KEYPOINTS).
    normalize_by_visible: bool = True
    loss_weight: float = 1.0

    @property
    def resolution(self) -> int:
        return self.roi_xform_resolution * 2 * self.up_scale


@dataclass(frozen=True)
class TrainCfg:
    """Reference: cfg.TRAIN."""

    datasets: Tuple[str, ...] = ("davis_2017_train",)
    scales: Tuple[int, ...] = (800,)
    max_size: int = 1333
    ims_per_batch: int = 2  # per device
    use_flipped: bool = True
    snapshot_iters: int = 2000
    # Static padded image shape for the jitted train step (H, W).
    # All images are resized(shortest side = scale, capped max_size) then
    # padded to this; must be divisible by 2**fpn.max_level.
    padded_image_size: Tuple[int, int] = (832, 1344)
    # Fixed-shape maxima (validity-masked). Replaces dynamic numpy sampling.
    max_gt_instances: int = 32
    freeze_conv_body: bool = False
    double_buffer: bool = True


@dataclass(frozen=True)
class TestCfg:
    """Reference: cfg.TEST (+ SOFT_NMS / BBOX_AUG subsets we support)."""

    datasets: Tuple[str, ...] = ("davis_2017_val",)
    scale: int = 800
    max_size: int = 1333
    padded_image_size: Tuple[int, int] = (832, 1408)
    score_thresh: float = 0.05
    nms: float = 0.5
    detections_per_im: int = 100
    soft_nms_enabled: bool = False
    soft_nms_method: str = "linear"
    soft_nms_sigma: float = 0.5
    bbox_vote_enabled: bool = False
    bbox_vote_thresh: float = 0.8
    # Multi-scale / flip test-time augmentation (reference: TEST.BBOX_AUG).
    bbox_aug_enabled: bool = False
    bbox_aug_scales: Tuple[int, ...] = ()
    bbox_aug_flip: bool = False
    # Fixed-shape maxima.
    max_proposals: int = 1000  # RoIs entering box head at test time


@dataclass(frozen=True)
class SolverCfg:
    """Reference: cfg.SOLVER."""

    type: str = "SGD"
    base_lr: float = 0.0025
    momentum: float = 0.9
    weight_decay: float = 0.0001
    gamma: float = 0.1
    lr_policy: str = "steps_with_decay"
    steps: Tuple[int, ...] = (0, 12000, 16000)
    max_iter: int = 18000
    warm_up_iters: int = 500
    warm_up_factor: float = 1.0 / 3.0
    warm_up_method: str = "linear"
    bias_double_lr: bool = True
    bias_weight_decay: bool = False
    clip_grad_norm: float = 0.0  # 0 = off


@dataclass(frozen=True)
class VOSCfg:
    """Video-object-segmentation (fork-added capability; SURVEY.md §3.3).

    Governs the per-sequence lax.scan engine: propagation of track masks
    from frame t-1 to t and association of per-frame detections to tracks.
    """

    max_tracks: int = 16  # DAVIS-2017 has <= 10 objects/sequence
    max_dets_per_frame: int = 32
    # Association score = w_iou * mask-IoU(propagated, detected)
    #                   + w_emb * cosine(track_emb, det_emb)
    assoc_iou_weight: float = 0.7
    assoc_emb_weight: float = 0.3
    assoc_score_thresh: float = 0.15
    # Confidence-gated mask update (VERDICT r2 #3): blend a matched
    # detection's mask with the propagated mask by relative confidence
    # (det score vs track score) instead of overwriting — a weak
    # detection must not destroy a confident propagated mask. False
    # restores the reference-style unconditional overwrite.
    assoc_blend: bool = True
    assoc_blend_sharpness: float = 2.0  # power on the confidences
    # Below this detection score the propagated mask is kept outright
    # (the match still refreshes miss/embedding bookkeeping).
    assoc_det_floor: float = 0.3
    # Agreement gate: the matched detection's influence is scaled by a
    # linear ramp on its mask-IoU with the PROPAGATED mask — a det that
    # contradicts a confident propagation is ignored no matter how
    # confident the detector is (confidence is uninformative when the
    # detector is wrong-but-sure; agreement is not).
    assoc_agreement_gate: Tuple[float, float] = (0.3, 0.7)
    # Score-refresh ramp: the matched det's score refreshes the track's
    # scaled by a linear ramp on the EFFECTIVE blend weight (below lo no
    # refresh, above hi the full det score); the default (0.0, 1e-6) is
    # the legacy step-at-w>0 (any nonzero-weight match refreshes fully).
    # MEASURED AND REJECTED as a default (r5, tools/sweep_assoc.py on
    # shared detections): (0.15, 0.45) fixes the wrong-object-lock dead
    # window (heldout_1007 obj1: w flickering at 0.04-0.2 kept a drifted
    # track "healthy" for 34 frames, +0.04..+0.08 J&F there) but turns
    # detector flicker during object crossings into early losses whose
    # rescue gambles wrong (heldout_1009: 0.77 -> 0.42, an identity swap
    # cemented by a wrong lone-candidate rescue — under BOTH raw and
    # centered_color embeddings), netting mean 0.787 -> 0.753. Opt in
    # per-run for content where wrong-object locks dominate crossings.
    assoc_refresh_ramp: Tuple[float, float] = (0.0, 1e-6)
    # Anchor-gated confidence relax of the agreement gate (r5, measured
    # on heldout_1004 obj3 f24-32): when a track's own mask has degraded
    # (propagation drift on the RIGHT object), its det-vs-prop IoU falls
    # into the gate's dead zone and a confident correcting detection is
    # throttled to w ~ 0.1 — the drift then compounds until the object
    # is lost. When the matched det is (a) confident (>= rescue_det_conf),
    # (b) more confident than the track by a gap inside this ramp, and
    # (c) identity-safe — the track's BEST anchor-similarity candidate
    # among eligible dets (a wrong-object lock fails this: its true
    # object's free det anchor-matches better, see heldout_1007), with
    # no rival alive track anchor-matching the det within rescue_margin
    # (lookalike lost tracks must not be resolved by the greedy
    # tie-break) and no healthy track's propagated mask overlapping it
    # above rescue_territory_iou (unclaimed duplicate dets of healthy
    # objects stay unadoptable during the true object's occlusion) —
    # the agreement gate is relaxed toward 1 proportionally to the
    # confidence gap: a decayed track trusts a confident, anchor-
    # consistent detection (a soft rescue through the match path, no
    # trust window needed). Part of the rescue family: inert when
    # assoc_rescue is off. MEASURED AND REJECTED as a default (r5,
    # tools/sweep_assoc.py): ~neutral on the motivating sequences but
    # deterministically costs heldout_1008 ~0.02-0.10 (an adoption the
    # guards don't catch), netting mean -0.003..-0.010. Opt-in.
    assoc_conf_relax_gap: Tuple[float, float] = (0.15, 0.5)
    assoc_conf_relax: bool = False
    # Drift rescue (re-identification): a track whose confidence has
    # decayed (no agreeing detection for many frames — the signature of
    # propagation drift) may be RE-ANCHORED outright to a confident,
    # unclaimed detection that is its MUTUAL best match by anchor-
    # embedding similarity (the immutable frame-0 embedding, immune to
    # drift pollution) with a margin over the track's second-best
    # candidate. This is the recovery path the agreement gate closes:
    # once drifted, det-vs-prop IoU is ~0 forever, so only appearance
    # can bring the track back (reference: fork association re-ID via
    # appearance features, SURVEY.md §2.2).
    assoc_rescue: bool = True
    rescue_track_conf: float = 0.5  # track score below which rescue arms
    rescue_det_conf: float = 0.6    # min detection score to re-anchor from
    rescue_sim: float = 0.5         # min anchor-embedding cosine (in [0,1])
    rescue_margin: float = 0.02     # margin over the 2nd-best candidate
    # Claim stealing: a drifted track that parked on ANOTHER object keeps
    # claiming that object's detection every frame, starving the true
    # owner's rescue forever (measured on heldout_1003: 9 frames of
    # n_free=0 while the lost track's own det sat claimed by the drifted
    # one, then rescue grabbed the only-free WRONG det -> full identity
    # swap). Fix: a lost track may take a CLAIMED detection when its
    # anchor-embedding similarity to it beats the claimer's by this
    # margin; the claimer's mask update for the frame is cancelled (it
    # keeps propagating).
    rescue_steal: bool = True
    rescue_steal_margin: float = 0.02
    # Territory guard on the FREE rescue path: candidates overlapping a
    # healthy track's propagated mask above this IoU are that track's
    # object (or an unclaimed duplicate detection of it) — re-anchoring
    # a lost track there during its occlusion manufactures an identity
    # swap (a lone wrong candidate passes every margin test when the
    # true object is invisible). Staying lost is cheaper than guessing.
    rescue_territory_iou: float = 0.45
    # Anchor jump: arm rescue for a track whose matched det is anchor-
    # WORSE (by this margin) than some free confident det — the drifted-
    # onto-wrong-object / false-positive-lock failure, where the track's
    # score stays healthy and score-based arming never fires. DEFAULT
    # OFF: measured on the r4 held-out set, the anchor embedding (masked-
    # average FPN features) is not discriminative enough to move HEALTHY
    # tracks on — the jump traded +0.08 J&F on heldout_1007 (a true
    # false-positive lock) for -0.08 on heldout_1003 (healthy tracks
    # jumping to lookalike free dets), even with the patience and same-
    # object guards. Enable per-run for content with distinctive object
    # appearance.
    rescue_jump: bool = False
    rescue_jump_margin: float = 0.03
    # The jump condition must hold this many CONSECUTIVE frames before a
    # jump fires (one-frame anchor-sim jitter between lookalike dets must
    # not move a healthy track; a wrong-object lock persists for dozens
    # of frames) ...
    rescue_jump_patience: int = 3
    # ... and the jump target must NOT overlap the currently-matched det
    # (a near-duplicate detection of the same object is not a different
    # object, however its anchor similarity jitters).
    rescue_jump_max_overlap: float = 0.3
    # Post-rescue trust window: for this many frames after a re-anchor
    # the agreement gate is bypassed for the rescued track (its matched
    # det re-anchors outright). A rescue lands on a track whose
    # propagation just failed for this object — gating its recovery on
    # agreement with that same propagation re-loses it within ~5 frames
    # (measured on heldout_1007 obj1: rescue at f47, J 0.60 -> 0.07 by
    # f52 with every det blocked by the gate).
    rescue_trust_frames: int = 8
    max_spawn: int = 4       # new tracks per frame (unsupervised mode)
    emb_ema: float = 0.7     # appearance-embedding EMA keep fraction
    score_decay: float = 0.95  # per-frame track-score decay when unmatched
    # Optional faster decay when the track has NO effective detection
    # support this frame (unmatched, or matched with the blend fully
    # gated off). Values < score_decay arm rescue sooner (0.88: ~5 frames
    # instead of 11+), which helped exactly one held-out sequence (1007's
    # false-positive lock, +0.09) but collapsed four others (r5 ablation,
    # 10-seq hardness-1.0 set: 0.88 -> mean 0.739, 0.92 -> 0.748,
    # 0.95 -> 0.788) — a briefly-occluded or weakly-detected HEALTHY
    # track hits the rescue threshold during the occlusion, and the
    # premature rescue/steal re-anchors it onto the wrong object, which
    # the trust window then cements. DEFAULT: equal to score_decay
    # (feature off). Lower per-run for content with distinctive
    # appearance where false locks dominate drift.
    score_decay_unsupported: float = 0.95
    # Track state masks kept at low resolution for the scan carry.
    track_mask_size: Tuple[int, int] = (120, 216)
    emb_dim: int = 128
    # Re-id embedding construction (models/propagation.reid_embedding):
    # "raw" = mask-pooled FPN features as-is (legacy; ReLU features make
    # cross-object cosines uniformly 0.8-0.99, so only margins
    # discriminate and a lone wrong rescue candidate passes trivially —
    # measured anchor-sim 0.90 on a wrong re-anchor, heldout_1009);
    # "centered" = scene-mean-subtracted features (cosines spread, wrong
    # objects fall toward/below the 0.5 uncorrelated point);
    # "centered_color" = centered features + mask-weighted color moments
    # (mean+std per channel), an L2 block weighted by emb_color_weight —
    # color is a training-free re-id cue that survives mask degradation.
    # DEFAULT centered_color (r5 sweep: mean J&F equal to raw on the
    # held-out set, +0.01 on heldout_1008, and the similarity
    # distribution rescue thresholds assume — sims spread instead of
    # bunching at 0.8-0.99 — holds by construction, not by luck).
    emb_mode: str = "centered_color"
    emb_color_weight: float = 1.0
    new_track_thresh: float = 0.7  # detection score to spawn a track (unsup)
    semi_supervised: bool = True  # DAVIS protocol: first-frame GT instances
    miss_tolerance: int = 10  # frames a track may go unmatched before retire
    # Device-side render resolution for the per-frame indexed map; 0 = full
    # padded resolution. Lower values shrink device->host transfers (the id
    # map is upsampled nearest on host) at a small boundary-accuracy cost.
    render_scale_den: int = 1  # render at padded_size / den
    use_pallas_render: bool = False  # fused paste kernel for id maps
    # Host->device frame transfer encoding. "yuv420" halves upload bytes
    # (Y full-res + 2x2-subsampled UV, reconstructed on device) — lossless
    # in practice for JPEG sources, which are already chroma-subsampled.
    # "yuv420_delta" adds LOSSLESS temporal delta coding on top: each frame
    # uploads only the fixed-size blocks that changed vs the previous frame
    # (video is mostly static between frames), and the device reconstructs
    # bit-identical packed frames with a scatter scan. Chunks after a
    # sequence's first CHAIN their frame-0 delta off the previous chunk's
    # last frame (engine/vos.py::DeltaChunk), so only the very first frame
    # of a sequence ever uploads in full. Auto-falls back to full-frame
    # upload per chunk when the content doesn't compress (camera motion,
    # noise). "u8" uploads raw BGR (fallback for odd-sized frames).
    upload_format: str = "yuv420"
    # Block granularity (bytes) for "yuv420_delta" change detection. Finer
    # blocks track change more tightly at 4 B/block index overhead; device
    # reconstruction cost is flat across 32..256 (measured >5000 f/s on
    # v5e). 32 measured 3.6x fewer upload bytes than 256 on 480p DAVIS
    # content, and upload is the binding constraint on tunnel hosts.
    delta_block: int = 32
    # Chroma subsampling denominator for the yuv upload: 2 = standard
    # 4:2:0 (1.5 B/px), 4 = an extra 2x2 chroma box filter (1.125 B/px,
    # 25% fewer upload bytes). The upload link is the binding constraint
    # on a tunnel-attached host (tools/bench_pipeline.py attributes the
    # whole gap to the 60 f/s target to upload bandwidth). den=4 costs
    # measurable quality (held-out synthetic full-pipeline J&F 0.721 ->
    # 0.701), so the parity default stays 2; opt into 4 only on
    # upload-bound deployments that can absorb the loss.
    chroma_den: int = 2
    # Concurrent device_put streams. The tunnel's per-stream throughput
    # saturates well below the link: measured 35/50/54/59 MB/s at
    # 1/2/4/8 streams on the v5e tunnel, so 8 is the sweet spot.
    upload_streams: int = 8
    # Nibble-pack (2 px/byte) the device->host id-map downloads when the
    # object-id alphabet fits 4 bits (semi-supervised, max first-frame GT
    # id <= 15 — all of DAVIS). Lossless; halves the download bytes that
    # otherwise contend with frame uploads for the tunnel (downloads are
    # starved to ~2.6 MB/s while uploads saturate the link).
    pack_downloads: bool = True
    # Mask propagation: "identity" (masks persist, baseline), "learned"/
    # "flow_warp" (cost-volume flow + warp + refine head), or "convgru"
    # (gated-recurrent variant — the alternate design hedge, SURVEY §7
    # hard-part 6; reference: fork-added "recurrent/flow-warp" propagation
    # module, SURVEY.md §2.2 "Mask propagation / association").
    propagation: str = "identity"
    prop_feat_dim: int = 16  # projected feature channels for the prop head


@dataclass(frozen=True)
class ParallelCfg:
    """Mesh / sharding (replaces mynn.DataParallel; SURVEY.md §2.3)."""

    data_axis: str = "data"
    # devices per host used for the data mesh; -1 = all
    num_devices: int = -1


@dataclass(frozen=True)
class DataCfg:
    """Dataset roots and loader knobs (reference: cfg.DATA_LOADER + catalog)."""

    davis_root: str = "/data/DAVIS"
    # Root for catalog-relative datasets (COCO etc.; data/catalog.py —
    # reference: dataset_catalog.py's hardcoded data dir).
    datasets_root: str = "/data"
    pixel_means: Tuple[float, float, float] = (102.9801, 115.9465, 122.7717)  # BGR
    # (1,1,1) = reference parity (Detectron does not divide by std; its
    # pretrained weights expect raw-scale inputs). Set ~ (57.4, 57.1, 58.4)
    # for from-scratch training so activations start unit-scale.
    pixel_stds: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    num_workers: int = 4
    prefetch_depth: int = 2


@dataclass(frozen=True)
class Config:
    """Root config. Sections mirror reference lib/core/config.py."""

    model: ModelCfg = field(default_factory=ModelCfg)
    resnets: ResNetsCfg = field(default_factory=ResNetsCfg)
    fpn: FPNCfg = field(default_factory=FPNCfg)
    rpn: RPNCfg = field(default_factory=RPNCfg)
    fast_rcnn: FastRCNNCfg = field(default_factory=FastRCNNCfg)
    mrcnn: MRCNNCfg = field(default_factory=MRCNNCfg)
    krcnn: KRCNNCfg = field(default_factory=KRCNNCfg)
    group_norm: GroupNormCfg = field(default_factory=GroupNormCfg)
    train: TrainCfg = field(default_factory=TrainCfg)
    test: TestCfg = field(default_factory=TestCfg)
    solver: SolverCfg = field(default_factory=SolverCfg)
    vos: VOSCfg = field(default_factory=VOSCfg)
    parallel: ParallelCfg = field(default_factory=ParallelCfg)
    data: DataCfg = field(default_factory=DataCfg)
    # Compute dtype for the conv body / heads; params stay float32.
    compute_dtype: str = "bfloat16"

    # -- validation (reference: assert_and_infer_cfg) --------------------
    def validate(self) -> "Config":
        div = 2 ** self.fpn.max_level if self.fpn.enabled else self.rpn.stride
        for name, (h, w) in (
            ("train.padded_image_size", self.train.padded_image_size),
            ("test.padded_image_size", self.test.padded_image_size),
        ):
            if h % div or w % div:
                raise ValueError(
                    f"{name}={h}x{w} must be divisible by {div} "
                    f"(fpn max_level={self.fpn.max_level})"
                )
        if self.model.conv_body not in ("resnet50_c4", "fpn_resnet50",
                                        "resnet101_c4", "fpn_resnet101"):
            raise ValueError(f"unknown conv_body {self.model.conv_body!r}")
        if self.model.conv_impl not in ("native", "dots"):
            raise ValueError(f"unknown conv_impl {self.model.conv_impl!r}")
        if self.fast_rcnn.roi_box_head not in (
                "roi_2mlp_head", "roi_xconv1fc_head", "roi_xconv1fc_gn_head",
                "roi_conv5_head"):
            raise ValueError(
                f"unknown roi_box_head {self.fast_rcnn.roi_box_head!r}")
        if self.mrcnn.roi_mask_head not in (
                "mask_rcnn_fcn_head_v1up4convs",
                "mask_rcnn_fcn_head_v1up4convs_gn"):
            raise ValueError(
                f"unknown roi_mask_head {self.mrcnn.roi_mask_head!r}")
        if self.solver.lr_policy not in ("steps_with_decay", "cosine_decay"):
            raise ValueError(f"unknown lr_policy {self.solver.lr_policy!r}")
        if self.solver.warm_up_method not in ("linear", "constant"):
            raise ValueError(
                f"unknown warm_up_method {self.solver.warm_up_method!r}")
        if self.resnets.use_gn:
            g = self.group_norm.num_groups
            widths = [self.resnets.stem_width,
                      self.resnets.num_groups * self.resnets.width_per_group]
            if any(w % g for w in widths):
                raise ValueError(
                    f"resnets.use_gn: channel widths {widths} must be "
                    f"divisible by group_norm.num_groups={g}")
        if self.fpn.enabled and "fpn" not in self.model.conv_body:
            raise ValueError("fpn.enabled=True requires an FPN conv body")
        if self.vos.upload_format not in ("yuv420", "yuv420_delta", "u8"):
            raise ValueError(
                f"unknown vos.upload_format {self.vos.upload_format!r}")
        if self.vos.propagation not in ("identity", "learned", "flow_warp",
                                        "convgru"):
            raise ValueError(
                f"unknown vos.propagation {self.vos.propagation!r}")
        return self


# ---------------------------------------------------------------------------
# YAML loading + dotted-path overrides
# (reference: merge_cfg_from_file / merge_cfg_from_list)
# ---------------------------------------------------------------------------


def _coerce(value: Any, target_type: Any) -> Any:
    """Coerce a YAML/CLI value to the dataclass field type."""
    import typing

    origin = typing.get_origin(target_type)
    if origin in (tuple, Tuple):
        args = typing.get_args(target_type)
        elem = args[0] if args else float
        if elem is Ellipsis:
            elem = float
        if isinstance(value, str):
            # CLI strings like "(57.4,57.1,58.4)" or "800,900"
            # (reference: merge_cfg_from_list literal-evals --set values)
            import ast

            try:
                value = ast.literal_eval(value)
            except (ValueError, SyntaxError):
                value = [v for v in value.strip("()[]").split(",") if v]
        seq = value if isinstance(value, (list, tuple)) else [value]
        return tuple(_coerce(v, elem) for v in seq)
    if target_type is bool and isinstance(value, str):
        return value.lower() in ("1", "true", "yes", "on")
    if target_type in (int, float, str, bool):
        return target_type(value)
    return value


def _replace_path(cfg: Any, path: Sequence[str], value: Any) -> Any:
    """Immutable dotted-path update, e.g. ('rpn', 'nms_thresh')."""
    key = path[0].lower()
    f = {fl.name: fl for fl in fields(cfg)}.get(key)
    if f is None:
        raise KeyError(f"config has no field {key!r} in {type(cfg).__name__}")
    if len(path) == 1:
        return dataclasses.replace(
            cfg, **{key: _coerce(value, _resolve_type(cfg, key))})
    sub = getattr(cfg, key)
    if not is_dataclass(sub):
        raise KeyError(f"{key!r} is a leaf, cannot descend into it")
    return dataclasses.replace(cfg, **{key: _replace_path(sub, path[1:], value)})


def _resolve_type(cfg: Any, name: str) -> Any:
    import typing

    hints = typing.get_type_hints(type(cfg))
    return hints[name]


def apply_overrides(cfg: Config, overrides: Sequence[Tuple[str, Any]]) -> Config:
    """Apply ('rpn.nms_thresh', 0.6)-style overrides (reference: --set)."""
    for dotted, value in overrides:
        cfg = _replace_path(cfg, dotted.split("."), value)
    return cfg


def load_config(yaml_path: Optional[str] = None,
                overrides: Sequence[Tuple[str, Any]] = ()) -> Config:
    """Build a Config from defaults, an optional YAML file, and overrides.

    YAML layout mirrors the dataclass tree (lower-case section names)::

        model:
          conv_body: fpn_resnet50
        rpn:
          nms_thresh: 0.7
    """
    cfg = Config()
    if yaml_path is not None:
        import yaml  # pyyaml is available transitively; gate import

        with open(yaml_path) as f:
            tree = yaml.safe_load(f) or {}
        flat: list = []

        def _walk(prefix: str, node: Any) -> None:
            if isinstance(node, dict):
                for k, v in node.items():
                    _walk(f"{prefix}.{k}" if prefix else str(k), v)
            else:
                flat.append((prefix, node))

        _walk("", tree)
        cfg = apply_overrides(cfg, flat)
    cfg = apply_overrides(cfg, overrides)
    return cfg.validate()
