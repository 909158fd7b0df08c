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
    out)."""
    return np.transpose(np.asarray(w), (2, 3, 0, 1))


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


def import_detectron_pytorch(sd: Mapping[str, np.ndarray], cfg) -> Dict:
    """Full-model import for the FPN Mask R-CNN assembly.

    Expected key families (reconstructed reference naming — Tier B):
      Conv_Body.res{1..5}...    backbone (res1 = stem)
      Conv_Body.conv_top / topdown_lateral_modules.N.conv_lateral /
      posthoc_modules.N         FPN lateral+output convs
      RPN.FPN_RPN_conv / FPN_RPN_cls_score / FPN_RPN_bbox_pred
      Box_Head.fc1 / fc2 ; Box_Outs.cls_score / bbox_pred
      Mask_Head.conv_fcn.{0,2,4,6} / upconv ; Mask_Outs.classify
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    body: Dict = {"stem": {
        "conv1": {"kernel": _t_conv(sd["Conv_Body.res1.conv1.weight"])},
        "bn1": _affine_from(sd, "Conv_Body.res1.bn1"),
    }}
    blocks = _TV_LAYERS[50 if "101" not in cfg.model.conv_body else 101]
    for si, n in enumerate(blocks):
        stage: Dict = {}
        for b in range(n):
            pre = f"Conv_Body.res{si + 2}.{b}"
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
        body[f"res{si + 2}"] = stage

    def conv(prefix):
        out = {"kernel": _t_conv(sd[f"{prefix}.weight"])}
        if f"{prefix}.bias" in sd:
            out["bias"] = np.asarray(sd[f"{prefix}.bias"], np.float32)
        return out

    fpn = {"lateral_c5": conv("Conv_Body.conv_top")}
    for i in range(3):  # C4, C3, C2 laterals (top-down order in reference)
        fpn[f"lateral_c{4 - i}"] = conv(
            f"Conv_Body.topdown_lateral_modules.{i}.conv_lateral")
    for i in range(4):  # P5..P2 output convs
        fpn[f"output_p{5 - i}"] = conv(f"Conv_Body.posthoc_modules.{i}")

    rpn = {"conv": conv("RPN.FPN_RPN_conv"),
           "cls_logits": conv("RPN.FPN_RPN_cls_score"),
           "bbox_pred": conv("RPN.FPN_RPN_bbox_pred")}

    r = cfg.fast_rcnn.roi_xform_resolution
    box_head = {
        "fc1": {"kernel": _t_fc_chw(sd["Box_Head.fc1.weight"],
                                    cfg.fpn.dim, r, r),
                "bias": sd["Box_Head.fc1.bias"].astype(np.float32)},
        "fc2": {"kernel": _t_fc(sd["Box_Head.fc2.weight"]),
                "bias": sd["Box_Head.fc2.bias"].astype(np.float32)},
    }
    box_outs = {
        "cls_score": {"kernel": _t_fc(sd["Box_Outs.cls_score.weight"]),
                      "bias": sd["Box_Outs.cls_score.bias"].astype(
                          np.float32)},
        "bbox_pred": {"kernel": _t_fc(sd["Box_Outs.bbox_pred.weight"]),
                      "bias": sd["Box_Outs.bbox_pred.bias"].astype(
                          np.float32)},
    }

    params = {"body": body, "fpn": fpn, "rpn": rpn, "box_head": box_head,
              "box_outs": box_outs}

    if cfg.model.mask_on and "Mask_Head.conv_fcn.0.weight" in sd:
        mask = {}
        for i in range(cfg.mrcnn.conv_layers):
            mask[f"fcn{i + 1}"] = conv(f"Mask_Head.conv_fcn.{2 * i}")
        mask["upconv"] = {
            "kernel": _t_deconv(sd["Mask_Head.upconv.weight"]),
            "bias": sd["Mask_Head.upconv.bias"].astype(np.float32)}
        mask["mask_logits"] = conv("Mask_Outs.classify")
        params["mask_head"] = mask
    return params


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth/.pt state dict to numpy (torch cpu available here)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt.get("state_dict", ckpt)) \
        if isinstance(ckpt, dict) else ckpt
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


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
