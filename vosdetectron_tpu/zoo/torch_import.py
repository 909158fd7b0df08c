"""Import PyTorch/Caffe2-lineage weights into the flax param tree.

Rebuild of the reference's weight-import layer
(reference: lib/utils/detectron_weight_helper.py ~300 LoC Caffe2-.pkl name
mapping + lib/utils/resnet_weights_helper.py ~120 LoC ImageNet import).
Needed for J&F parity without retraining (SURVEY.md §7 hard-part 3).

Supported dialects:
  * ``torchvision`` ResNet-50/101 state dicts (conv1/bn1/layerX.Y.convZ…)
    -> backbone params with BatchNorm FOLDED into AffineChannel
    (scale = gamma / sqrt(var + eps), bias = beta - mean * scale) — the
    exact transformation Detectron bakes into its frozen-BN checkpoints.
    NOTE: torchvision ResNets put stride on the 3x3 (stride_1x1=False);
    configure resnets accordingly when using such weights.
  * ``detectron_pytorch`` state dicts (Conv_Body.res1…, RPN.*, Box_Head.*)
    -> full-detector import (naming per the Detectron.pytorch lineage,
    reconstructed — verify against the actual checkpoint when available).

All convs transpose OIHW -> HWIO; linears transpose (out,in) -> (in,out).
The 12544->1024 box fc1 additionally needs CHW->HWC input-dim reordering.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

BN_EPS = 1e-5


def _t_conv(w: np.ndarray) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _t_fc(w: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(w), (1, 0))


def _t_fc_chw(w: np.ndarray, c: int, h: int, w_: int) -> np.ndarray:
    """FC over flattened conv features: torch flattens CHW, we flatten HWC."""
    o = w.shape[0]
    return np.transpose(
        np.asarray(w).reshape(o, c, h, w_), (2, 3, 1, 0)).reshape(-1, o)


def _t_deconv(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight (in, out, kh, kw) -> flax (kh, kw, in,
    out).

    flax.linen.ConvTranspose (lax.conv_transpose) does NOT mirror the
    kernel, while torch's transposed conv is the true gradient-of-conv
    (spatially flipped): the kernel must be flipped along both spatial
    axes or every imported deconv (mask upconv, keypoint score_lowres)
    is scrambled. Verified numerically against torch for k2/s2 and
    k4/s2/p1 (tests/test_zoo_import.py::test_deconv_import_matches_torch).
    """
    return np.transpose(np.asarray(w)[:, :, ::-1, ::-1], (2, 3, 0, 1))


def fold_bn(gamma, beta, mean, var, eps: float = BN_EPS):
    scale = np.asarray(gamma) / np.sqrt(np.asarray(var) + eps)
    bias = np.asarray(beta) - np.asarray(mean) * scale
    return scale.astype(np.float32), bias.astype(np.float32)


def _affine_from(sd: Mapping[str, np.ndarray], prefix: str) -> Dict:
    """BN (running stats) or affine-only (weight/bias) -> AffineChannel."""
    if f"{prefix}.running_mean" in sd:
        scale, bias = fold_bn(sd[f"{prefix}.weight"], sd[f"{prefix}.bias"],
                              sd[f"{prefix}.running_mean"],
                              sd[f"{prefix}.running_var"])
    else:
        scale = np.asarray(sd[f"{prefix}.weight"], dtype=np.float32)
        bias = np.asarray(sd[f"{prefix}.bias"], dtype=np.float32)
    return {"scale": scale, "bias": bias}


# ---------------------------------------------------------------------------
# torchvision ResNet -> ResNetBody params
# ---------------------------------------------------------------------------

_TV_LAYERS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


def import_torchvision_resnet(sd: Mapping[str, np.ndarray],
                              depth: int = 50) -> Dict:
    """torchvision resnet state dict -> params for models.resnet.ResNetBody
    (stages_out any subset; returns all stages present in sd)."""
    p: Dict = {"stem": {
        "conv1": {"kernel": _t_conv(sd["conv1.weight"])},
        "bn1": _affine_from(sd, "bn1"),
    }}
    blocks = _TV_LAYERS[depth]
    for si, n in enumerate(blocks):
        stage: Dict = {}
        for b in range(n):
            pre = f"layer{si + 1}.{b}"
            blk: Dict = {}
            for ci in (1, 2, 3):
                blk[f"conv{ci}"] = {
                    "kernel": _t_conv(sd[f"{pre}.conv{ci}.weight"])}
                blk[f"bn{ci}"] = _affine_from(sd, f"{pre}.bn{ci}")
            if f"{pre}.downsample.0.weight" in sd:
                blk["shortcut_conv"] = {
                    "kernel": _t_conv(sd[f"{pre}.downsample.0.weight"])}
                blk["shortcut_bn"] = _affine_from(sd, f"{pre}.downsample.1")
            stage[f"block{b}"] = blk
        p[f"res{si + 2}"] = stage
    return p


# ---------------------------------------------------------------------------
# Detectron.pytorch full-detector state dict -> GeneralizedRCNN params
# ---------------------------------------------------------------------------


def _dp_resnet_stage(sd: Mapping[str, np.ndarray], prefix: str,
                     num_blocks: int) -> Dict:
    stage: Dict = {}
    for b in range(num_blocks):
        pre = f"{prefix}.{b}"
        blk: Dict = {}
        for ci in (1, 2, 3):
            blk[f"conv{ci}"] = {
                "kernel": _t_conv(sd[f"{pre}.conv{ci}.weight"])}
            blk[f"bn{ci}"] = _affine_from(sd, f"{pre}.bn{ci}")
        if f"{pre}.downsample.0.weight" in sd:
            blk["shortcut_conv"] = {
                "kernel": _t_conv(sd[f"{pre}.downsample.0.weight"])}
            blk["shortcut_bn"] = _affine_from(sd, f"{pre}.downsample.1")
        stage[f"block{b}"] = blk
    return stage


def import_detectron_pytorch(sd: Mapping[str, np.ndarray], cfg) -> Dict:
    """Full-model import for the FPN and C4 Mask R-CNN assemblies.

    Expected key families (reconstructed reference naming — Tier B):
      Conv_Body.res{1..5}...    backbone (res1 = stem)
      Conv_Body.conv_top / topdown_lateral_modules.N.conv_lateral /
      posthoc_modules.N         FPN lateral+output convs
      FPN: RPN.FPN_RPN_conv / FPN_RPN_cls_score / FPN_RPN_bbox_pred;
           Box_Head.fc1 / fc2
      C4:  RPN.RPN_conv / RPN_cls_score / RPN_bbox_pred;
           Box_Head.res5.{b}... (ResNet_roi_conv5_head)
      Box_Outs.cls_score / bbox_pred
      Mask_Head.conv_fcn.{0,2,4,6} / upconv ; Mask_Outs.classify
    """
    sd = _as_arrays(sd)
    is_fpn = cfg.fpn.enabled
    body: Dict = {"stem": {
        "conv1": {"kernel": _t_conv(sd["Conv_Body.res1.conv1.weight"])},
        "bn1": _affine_from(sd, "Conv_Body.res1.bn1"),
    }}
    blocks = _TV_LAYERS[50 if "101" not in cfg.model.conv_body else 101]
    n_body_stages = 4 if is_fpn else 3  # C4 keeps res5 in the box head
    for si in range(n_body_stages):
        body[f"res{si + 2}"] = _dp_resnet_stage(
            sd, f"Conv_Body.res{si + 2}", blocks[si])

    def conv(prefix):
        out = {"kernel": _t_conv(sd[f"{prefix}.weight"])}
        if f"{prefix}.bias" in sd:
            out["bias"] = np.asarray(sd[f"{prefix}.bias"], np.float32)
        return out

    params = {"body": body}
    if is_fpn:
        fpn = {"lateral_c5": conv("Conv_Body.conv_top")}
        for i in range(3):  # C4, C3, C2 laterals (top-down order in ref)
            fpn[f"lateral_c{4 - i}"] = conv(
                f"Conv_Body.topdown_lateral_modules.{i}.conv_lateral")
        for i in range(4):  # P5..P2 output convs
            fpn[f"output_p{5 - i}"] = conv(f"Conv_Body.posthoc_modules.{i}")
        params["fpn"] = fpn
        params["rpn"] = {"conv": conv("RPN.FPN_RPN_conv"),
                         "cls_logits": conv("RPN.FPN_RPN_cls_score"),
                         "bbox_pred": conv("RPN.FPN_RPN_bbox_pred")}
        r = cfg.fast_rcnn.roi_xform_resolution
        params["box_head"] = {
            "fc1": {"kernel": _t_fc_chw(sd["Box_Head.fc1.weight"],
                                        cfg.fpn.dim, r, r),
                    "bias": sd["Box_Head.fc1.bias"].astype(np.float32)},
            "fc2": {"kernel": _t_fc(sd["Box_Head.fc2.weight"]),
                    "bias": sd["Box_Head.fc2.bias"].astype(np.float32)},
        }
    else:
        params["rpn"] = {"conv": conv("RPN.RPN_conv"),
                         "cls_logits": conv("RPN.RPN_cls_score"),
                         "bbox_pred": conv("RPN.RPN_bbox_pred")}
        params["box_head"] = {
            "res5": _dp_resnet_stage(sd, "Box_Head.res5", blocks[3])}

    params["box_outs"] = {
        "cls_score": {"kernel": _t_fc(sd["Box_Outs.cls_score.weight"]),
                      "bias": sd["Box_Outs.cls_score.bias"].astype(
                          np.float32)},
        "bbox_pred": {"kernel": _t_fc(sd["Box_Outs.bbox_pred.weight"]),
                      "bias": sd["Box_Outs.bbox_pred.bias"].astype(
                          np.float32)},
    }

    if cfg.model.mask_on and "Mask_Head.conv_fcn.0.weight" in sd:
        mask = {}
        for i in range(cfg.mrcnn.conv_layers):
            mask[f"fcn{i + 1}"] = conv(f"Mask_Head.conv_fcn.{2 * i}")
        mask["upconv"] = {
            "kernel": _t_deconv(sd["Mask_Head.upconv.weight"]),
            "bias": sd["Mask_Head.upconv.bias"].astype(np.float32)}
        mask["mask_logits"] = conv("Mask_Outs.classify")
        params["mask_head"] = mask

    if cfg.model.keypoint_on and "Keypoint_Head.conv_fcn.0.weight" in sd:
        # reference: keypoint_rcnn_heads.roi_pose_head_v1convX (conv_fcn
        # Sequential of conv+relu pairs) + keypoint_outputs.classify
        # (the kps_score_lowres ConvTranspose2d).
        kp = {}
        for i in range(cfg.krcnn.conv_layers):
            kp[f"conv{i + 1}"] = conv(f"Keypoint_Head.conv_fcn.{2 * i}")
        kp["score_lowres"] = {
            "kernel": _t_deconv(sd["Keypoint_Outs.classify.weight"]),
            "bias": sd["Keypoint_Outs.classify.bias"].astype(np.float32)}
        params["keypoint_head"] = kp
    return params


# ---------------------------------------------------------------------------
# Caffe2 Detectron .pkl blobs -> GeneralizedRCNN params
# (reference: lib/utils/detectron_weight_helper.py — blob-name mapping.
#  Blob naming below is the public Caffe2 Detectron convention, Tier B
#  until /root/reference materializes.)
# ---------------------------------------------------------------------------

_STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


def _c2_affine(bl: Mapping[str, np.ndarray], name: str) -> Dict:
    """Detectron checkpoints ship frozen BN already folded to scale/bias
    blobs (`*_bn_s` / `*_bn_b`)."""
    return {"scale": np.asarray(bl[f"{name}_bn_s"], np.float32),
            "bias": np.asarray(bl[f"{name}_bn_b"], np.float32)}


def _c2_conv(bl: Mapping[str, np.ndarray], name: str) -> Dict:
    out = {"kernel": _t_conv(bl[f"{name}_w"])}
    if f"{name}_b" in bl:
        out["bias"] = np.asarray(bl[f"{name}_b"], np.float32)
    return out


def _c2_resnet_stage(bl: Mapping[str, np.ndarray], stage: int,
                     num_blocks: int) -> Dict:
    stage_p: Dict = {}
    for b in range(num_blocks):
        pre = f"res{stage}_{b}"
        blk: Dict = {}
        for ci, br in enumerate("abc", start=1):
            blk[f"conv{ci}"] = {
                "kernel": _t_conv(bl[f"{pre}_branch2{br}_w"])}
            blk[f"bn{ci}"] = _c2_affine(bl, f"{pre}_branch2{br}")
        if f"{pre}_branch1_w" in bl:
            blk["shortcut_conv"] = {
                "kernel": _t_conv(bl[f"{pre}_branch1_w"])}
            blk["shortcut_bn"] = _c2_affine(bl, f"{pre}_branch1")
        stage_p[f"block{b}"] = blk
    return stage_p


def import_detectron_pkl(blobs: Mapping[str, np.ndarray], cfg) -> Dict:
    """Caffe2 Detectron blob dict -> params for our GeneralizedRCNN.

    Handles both assemblies:
      * R-50/101-FPN: fpn_inner_* laterals, fpn_res*_sum outputs,
        *_fpn2-named shared RPN, fc6/fc7 box head.
      * R-50/101-C4: single-scale conv_rpn RPN, res5 box head
        (Res5RoIHead), cls_score/bbox_pred outputs.
    Mask head (v1up4convs): _[mask]_fcn1..4, conv5_mask, mask_fcn_logits.
    """
    bl = _as_arrays(blobs)
    depth = 101 if "101" in cfg.model.conv_body else 50
    blocks = _STAGE_BLOCKS[depth]
    is_fpn = cfg.fpn.enabled

    body: Dict = {"stem": {
        "conv1": {"kernel": _t_conv(bl["conv1_w"])},
        "bn1": _c2_affine(bl, "res_conv1"),
    }}
    n_body_stages = 4 if is_fpn else 3  # C4 keeps res5 in the box head
    for si in range(n_body_stages):
        body[f"res{si + 2}"] = _c2_resnet_stage(bl, si + 2, blocks[si])
    params: Dict = {"body": body}

    if is_fpn:
        # last block index per stage names the sum blobs (R50: res5_2 etc.)
        last = {s: blocks[s - 2] - 1 for s in (2, 3, 4, 5)}
        fpn = {"lateral_c5": _c2_conv(bl, f"fpn_inner_res5_{last[5]}_sum")}
        for s in (4, 3, 2):
            fpn[f"lateral_c{s}"] = _c2_conv(
                bl, f"fpn_inner_res{s}_{last[s]}_sum_lateral")
        for s in (2, 3, 4, 5):
            fpn[f"output_p{s}"] = _c2_conv(bl, f"fpn_res{s}_{last[s]}_sum")
        params["fpn"] = fpn
        params["rpn"] = {"conv": _c2_conv(bl, "conv_rpn_fpn2"),
                         "cls_logits": _c2_conv(bl, "rpn_cls_logits_fpn2"),
                         "bbox_pred": _c2_conv(bl, "rpn_bbox_pred_fpn2")}
        r = cfg.fast_rcnn.roi_xform_resolution
        params["box_head"] = {
            "fc1": {"kernel": _t_fc_chw(bl["fc6_w"], cfg.fpn.dim, r, r),
                    "bias": bl["fc6_b"].astype(np.float32)},
            "fc2": {"kernel": _t_fc(bl["fc7_w"]),
                    "bias": bl["fc7_b"].astype(np.float32)},
        }
    else:
        params["rpn"] = {"conv": _c2_conv(bl, "conv_rpn"),
                         "cls_logits": _c2_conv(bl, "rpn_cls_logits"),
                         "bbox_pred": _c2_conv(bl, "rpn_bbox_pred")}
        params["box_head"] = {
            "res5": _c2_resnet_stage(bl, 5, blocks[3])}

    params["box_outs"] = {
        "cls_score": {"kernel": _t_fc(bl["cls_score_w"]),
                      "bias": bl["cls_score_b"].astype(np.float32)},
        "bbox_pred": {"kernel": _t_fc(bl["bbox_pred_w"]),
                      "bias": bl["bbox_pred_b"].astype(np.float32)},
    }

    if cfg.model.mask_on and "_[mask]_fcn1_w" in bl:
        mask: Dict = {}
        for i in range(cfg.mrcnn.conv_layers):
            mask[f"fcn{i + 1}"] = _c2_conv(bl, f"_[mask]_fcn{i + 1}")
        mask["upconv"] = {
            "kernel": _t_deconv(bl["conv5_mask_w"]),
            "bias": bl["conv5_mask_b"].astype(np.float32)}
        mask["mask_logits"] = _c2_conv(bl, "mask_fcn_logits")
        params["mask_head"] = mask

    if cfg.model.keypoint_on and "conv_fcn1_w" in bl:
        # Caffe2 keypoint blobs: conv_fcn{i}_w/b + kps_score_lowres
        # deconv (the 2x bilinear upsample above it carries no weights).
        kp: Dict = {}
        for i in range(cfg.krcnn.conv_layers):
            kp[f"conv{i + 1}"] = _c2_conv(bl, f"conv_fcn{i + 1}")
        kp["score_lowres"] = {
            "kernel": _t_deconv(bl["kps_score_lowres_w"]),
            "bias": bl["kps_score_lowres_b"].astype(np.float32)}
        params["keypoint_head"] = kp
    return params


def load_detectron_pkl(path: str) -> Dict[str, np.ndarray]:
    """Load a Caffe2 Detectron .pkl weights file (py2 pickle of a blob
    dict, possibly nested under 'blobs')."""
    import pickle

    with open(path, "rb") as f:
        data = pickle.load(f, encoding="latin1")
    if isinstance(data, dict) and "blobs" in data:
        data = data["blobs"]
    return {k: np.asarray(v) for k, v in data.items()
            if not k.endswith("_momentum")}


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth/.pt state dict to numpy (torch cpu available here)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt)) \
        if isinstance(ckpt, dict) else ckpt
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def _as_arrays(sd: Mapping) -> Mapping:
    """Numpy-ify values, preserving a RecordingSource wrapper (sharing its
    consumed set) so importers' internal re-wraps keep recording."""
    data = {k: np.asarray(v) for k, v in sd.items()}
    if isinstance(sd, RecordingSource):
        out = RecordingSource(data)
        out.consumed = sd.consumed
        return out
    return data


class RecordingSource(dict):
    """Checkpoint-blob dict that records which keys an importer actually
    reads — the raw material of the key-coverage report (VERDICT r2 #7:
    when a real checkpoint's naming drifts from the reconstructed mapping,
    the report turns an opaque KeyError into a 2-minute diagnosis).
    Membership tests don't count as consumption; reads do."""

    def __init__(self, data):
        super().__init__(data)
        self.consumed = set()

    def __getitem__(self, k):
        v = super().__getitem__(k)
        self.consumed.add(k)
        return v

    def get(self, k, default=None):
        if k in self:
            return self[k]
        return default


def _leaf_paths(tree, prefix=""):
    out = []
    if isinstance(tree, Mapping):
        for k in sorted(tree):
            out.extend(_leaf_paths(tree[k], f"{prefix}/{k}" if prefix
                                   else str(k)))
    else:
        out.append(prefix)
    return out


def coverage_report(model_params: Dict, imported: Dict,
                    source: "RecordingSource") -> Dict:
    """Importer diagnosis (reference: detectron_weight_helper.py name
    mapping, SURVEY.md:137): which model leaves the import filled, which
    it left at init, and which checkpoint blobs it never consumed."""
    model_leaves = set(_leaf_paths(model_params))
    filled = set(_leaf_paths(imported))
    return {
        "filled": sorted(filled),
        "unfilled_params": sorted(model_leaves - filled),
        "unconsumed_keys": sorted(set(source) - source.consumed),
        "n_model": len(model_leaves),
        "n_filled": len(filled),
        "n_source": len(source),
        "n_consumed": len(source.consumed),
    }


def format_coverage_report(rep: Dict) -> str:
    lines = [
        f"model leaves filled: {rep['n_filled']}/{rep['n_model']}",
        f"checkpoint blobs consumed: {rep['n_consumed']}/{rep['n_source']}",
    ]
    if rep["unfilled_params"]:
        lines.append("-- model params left at init:")
        lines += [f"   {p}" for p in rep["unfilled_params"]]
    if rep["unconsumed_keys"]:
        lines.append("-- checkpoint keys not consumed:")
        lines += [f"   {k}" for k in rep["unconsumed_keys"]]
    if not rep["unfilled_params"] and not rep["unconsumed_keys"]:
        lines.append("full bidirectional coverage")
    return "\n".join(lines)


def merge_params(init_params: Dict, imported: Dict) -> Dict:
    """Overlay imported subtrees on freshly-initialized params, with shape
    checks — unmatched leaves keep their init (reference behavior: partial
    ImageNet init for new heads)."""
    import jax

    def _merge(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                raise KeyError(f"imported key {path}/{k} not in model")
            if isinstance(v, Mapping):
                out[k] = _merge(dst[k], v, f"{path}/{k}")
            else:
                have = np.asarray(dst[k])
                if have.shape != np.asarray(v).shape:
                    raise ValueError(
                        f"shape mismatch at {path}/{k}: "
                        f"model {have.shape} vs import {np.shape(v)}")
                out[k] = np.asarray(v, dtype=have.dtype)
        return out

    return _merge(init_params, imported)
