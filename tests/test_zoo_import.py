"""Weight-import tests: numeric parity vs a real torch bottleneck forward,
BN folding, full-tree merge shape safety."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from vosdetectron_tpu.config import Config, apply_overrides  # noqa: E402
from vosdetectron_tpu.zoo import torch_import as Z  # noqa: E402


def make_tv_resnet50_sd(rng, with_stats=True):
    """Minimal torchvision-shaped resnet50 state dict (random values)."""
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.randn(o, i, k, k).astype(np.float32) * .05

    def bn(name, c):
        sd[f"{name}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{name}.bias"] = rng.randn(c).astype(np.float32) * .1
        if with_stats:
            sd[f"{name}.running_mean"] = rng.randn(c).astype(np.float32) * .1
            sd[f"{name}.running_var"] = rng.uniform(.5, 1.5, c).astype(
                np.float32)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    blocks = (3, 4, 6, 3)
    cin = 64
    for li, n in enumerate(blocks):
        width = 64 * 2 ** li
        out = width * 4
        for b in range(n):
            p = f"layer{li + 1}.{b}"
            conv(f"{p}.conv1", width, cin if b == 0 else out, 1)
            bn(f"{p}.bn1", width)
            conv(f"{p}.conv2", width, width, 3)
            bn(f"{p}.bn2", width)
            conv(f"{p}.conv3", out, width, 1)
            bn(f"{p}.bn3", out)
            if b == 0:
                conv(f"{p}.downsample.0", out, cin, 1)
                bn(f"{p}.downsample.1", out)
        cin = out
    return sd


def torch_bottleneck_forward(sd, prefix, x, stride):
    """Reference torch bottleneck (torchvision semantics: stride on 3x3)."""
    import torch.nn.functional as F

    def bn(name, t):
        g = torch.tensor(sd[f"{name}.weight"])
        b = torch.tensor(sd[f"{name}.bias"])
        m = torch.tensor(sd[f"{name}.running_mean"])
        v = torch.tensor(sd[f"{name}.running_var"])
        return (t - m[None, :, None, None]) / torch.sqrt(
            v[None, :, None, None] + 1e-5) * g[None, :, None, None] \
            + b[None, :, None, None]

    w = lambda n: torch.tensor(sd[f"{n}.weight"])
    idn = x
    y = F.relu(bn(f"{prefix}.bn1", F.conv2d(x, w(f"{prefix}.conv1"))))
    y = F.relu(bn(f"{prefix}.bn2", F.conv2d(y, w(f"{prefix}.conv2"),
                                            stride=stride, padding=1)))
    y = bn(f"{prefix}.bn3", F.conv2d(y, w(f"{prefix}.conv3")))
    if f"{prefix}.downsample.0.weight" in sd:
        idn = bn(f"{prefix}.downsample.1",
                 F.conv2d(x, w(f"{prefix}.downsample.0"), stride=stride))
    return F.relu(y + idn)


def test_bottleneck_numeric_parity(rng):
    """Imported weights reproduce torch's bottleneck output exactly."""
    from vosdetectron_tpu.models.resnet import Bottleneck

    sd = make_tv_resnet50_sd(rng)
    params = Z.import_torchvision_resnet(sd, 50)

    x = rng.randn(1, 16, 16, 64).astype(np.float32)
    # torchvision puts stride on 3x3 -> stride_1x1=False
    mod = Bottleneck(inner=64, out=256, stride=1, stride_1x1=False)
    y = mod.apply({"params": params["res2"]["block0"]}, jnp.asarray(x))

    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    yt = torch_bottleneck_forward(sd, "layer1.0", xt, 1)
    yt = np.transpose(yt.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(y), yt, atol=2e-4)


def test_bn_folding_formula():
    g = np.array([2.0]); b = np.array([1.0])
    m = np.array([0.5]); v = np.array([4.0])
    scale, bias = Z.fold_bn(g, b, m, v, eps=0.0)
    # y = (x - m)/sqrt(v) * g + b  ==  x*scale + bias
    x = 3.0
    np.testing.assert_allclose(x * scale + bias,
                               (x - m) / np.sqrt(v) * g + b, rtol=1e-6)


def test_full_backbone_import_into_model(rng):
    """Imported torchvision tree merges into ResNetBody params cleanly."""
    import jax

    from vosdetectron_tpu.models.resnet import ResNetBody

    sd = make_tv_resnet50_sd(rng)
    imported = Z.import_torchvision_resnet(sd, 50)
    body = ResNetBody(depth=50, stages_out=(2, 3, 4, 5), freeze_at=0,
                      stride_1x1=False)
    init = body.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 64, 64, 3)))["params"]
    merged = Z.merge_params(init, imported)
    outs = body.apply({"params": merged},
                      jnp.asarray(rng.randn(1, 64, 64, 3)
                                  .astype(np.float32)))
    assert [o.shape[-1] for o in outs] == [256, 512, 1024, 2048]
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()


def test_merge_rejects_shape_mismatch(rng):
    from vosdetectron_tpu.models.resnet import ResNetBody
    import jax

    sd = make_tv_resnet50_sd(rng)
    imported = Z.import_torchvision_resnet(sd, 50)
    imported["stem"]["conv1"]["kernel"] = np.zeros((3, 3, 3, 64), np.float32)
    body = ResNetBody(depth=50, stages_out=(2,), freeze_at=0)
    init = body.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 32, 32, 3)))["params"]
    with pytest.raises(ValueError, match="shape mismatch"):
        Z.merge_params(init, {"stem": imported["stem"]})


def test_detectron_pytorch_import_smoke(rng):
    """Full-detector dialect: build a synthetic state dict with the expected
    reference naming and import it into GeneralizedRCNN params."""
    import jax

    from vosdetectron_tpu.models.generalized_rcnn import (GeneralizedRCNN,
                                                          init_model_params)

    cfg = apply_overrides(Config(), [
        ("model.num_classes", 4),
        ("rpn.pre_nms_top_n_test", 32),
        ("rpn.post_nms_top_n_test", 16),
        ("test.padded_image_size", (128, 192)),
    ]).validate()
    model = GeneralizedRCNN(cfg)
    init = init_model_params(model, jax.random.PRNGKey(0), (128, 192))

    tv = make_tv_resnet50_sd(rng)
    sd = {}
    # backbone under Conv_Body.resN (res1 = stem)
    sd["Conv_Body.res1.conv1.weight"] = tv["conv1.weight"]
    for stat in ("weight", "bias", "running_mean", "running_var"):
        sd[f"Conv_Body.res1.bn1.{stat}"] = tv[f"bn1.{stat}"]
    for k, v in tv.items():
        if k.startswith("layer"):
            li = int(k[5]) + 1
            sd[f"Conv_Body.res{li}.{k.split('.', 1)[1]}"] = v
    # FPN / RPN / heads
    def add_conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.randn(o, i, k, k).astype(np.float32) * .05
        sd[f"{name}.bias"] = np.zeros(o, np.float32)

    add_conv("Conv_Body.conv_top", 256, 2048, 1)
    for i, c in enumerate((1024, 512, 256)):
        add_conv(f"Conv_Body.topdown_lateral_modules.{i}.conv_lateral",
                 256, c, 1)
    for i in range(4):
        add_conv(f"Conv_Body.posthoc_modules.{i}", 256, 256, 3)
    add_conv("RPN.FPN_RPN_conv", 256, 256, 3)
    add_conv("RPN.FPN_RPN_cls_score", 3, 256, 1)
    add_conv("RPN.FPN_RPN_bbox_pred", 12, 256, 1)
    sd["Box_Head.fc1.weight"] = rng.randn(1024, 12544).astype(np.float32) * .01
    sd["Box_Head.fc1.bias"] = np.zeros(1024, np.float32)
    sd["Box_Head.fc2.weight"] = rng.randn(1024, 1024).astype(np.float32) * .01
    sd["Box_Head.fc2.bias"] = np.zeros(1024, np.float32)
    sd["Box_Outs.cls_score.weight"] = rng.randn(4, 1024).astype(np.float32) * .01
    sd["Box_Outs.cls_score.bias"] = np.zeros(4, np.float32)
    sd["Box_Outs.bbox_pred.weight"] = rng.randn(16, 1024).astype(np.float32) * .01
    sd["Box_Outs.bbox_pred.bias"] = np.zeros(16, np.float32)
    for i in range(4):
        add_conv(f"Mask_Head.conv_fcn.{2 * i}", 256, 256, 3)
    sd["Mask_Head.upconv.weight"] = rng.randn(256, 256, 2, 2).astype(
        np.float32) * .05
    sd["Mask_Head.upconv.bias"] = np.zeros(256, np.float32)
    add_conv("Mask_Outs.classify", 4, 256, 1)

    imported = Z.import_detectron_pytorch(sd, cfg)
    merged = Z.merge_params(init, imported)
    # run a forward with the merged params
    img = jnp.asarray(rng.randn(1, 128, 192, 3).astype(np.float32))
    hw = jnp.asarray([[128.0, 192.0]])
    out = model.apply({"params": merged}, img, hw)
    assert np.isfinite(np.asarray(out.cls_scores)).all()


# ---------------------------------------------------------------------------
# Caffe2 Detectron .pkl dialect (reference: detectron_weight_helper.py)
# ---------------------------------------------------------------------------


def make_detectron_pkl_blobs(rng, cfg, num_classes):
    """Synthetic Caffe2 Detectron blob dict with the public blob naming,
    shapes derived from Detectron conventions (independent of the importer)."""
    bl = {}

    def conv(name, o, i, k, bias=False):
        bl[f"{name}_w"] = rng.randn(o, i, k, k).astype(np.float32) * .05
        if bias:
            bl[f"{name}_b"] = np.zeros(o, np.float32)

    def bn(name, c):
        bl[f"{name}_bn_s"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        bl[f"{name}_bn_b"] = rng.randn(c).astype(np.float32) * .1

    def fc(name, o, i):
        bl[f"{name}_w"] = rng.randn(o, i).astype(np.float32) * .01
        bl[f"{name}_b"] = np.zeros(o, np.float32)

    def stage(s, n, cin, width):
        out = width * 4
        for b in range(n):
            conv(f"res{s}_{b}_branch2a", width, cin if b == 0 else out, 1)
            bn(f"res{s}_{b}_branch2a", width)
            conv(f"res{s}_{b}_branch2b", width, width, 3)
            bn(f"res{s}_{b}_branch2b", width)
            conv(f"res{s}_{b}_branch2c", out, width, 1)
            bn(f"res{s}_{b}_branch2c", out)
            if b == 0:
                conv(f"res{s}_{b}_branch1", out, cin, 1)
                bn(f"res{s}_{b}_branch1", out)
        return out

    conv("conv1", 64, 3, 7)
    bn("res_conv1", 64)
    blocks = (3, 4, 6, 3)
    is_fpn = cfg.fpn.enabled
    cin = 64
    for si in range(4 if is_fpn else 3):
        cin = stage(si + 2, blocks[si], cin, 64 * 2 ** si)

    k = num_classes
    if is_fpn:
        last = {2: 2, 3: 3, 4: 5, 5: 2}
        conv(f"fpn_inner_res5_{last[5]}_sum", 256, 2048, 1, bias=True)
        for s, c in ((4, 1024), (3, 512), (2, 256)):
            conv(f"fpn_inner_res{s}_{last[s]}_sum_lateral", 256, c, 1,
                 bias=True)
        for s in (2, 3, 4, 5):
            conv(f"fpn_res{s}_{last[s]}_sum", 256, 256, 3, bias=True)
        conv("conv_rpn_fpn2", 256, 256, 3, bias=True)
        conv("rpn_cls_logits_fpn2", 3, 256, 1, bias=True)
        conv("rpn_bbox_pred_fpn2", 12, 256, 1, bias=True)
        fc("fc6", 1024, 256 * 7 * 7)
        fc("fc7", 1024, 1024)
        # mask head reads 256-ch FPN roi features
        for i in range(4):
            conv(f"_[mask]_fcn{i + 1}", 256, 256, 3, bias=True)
        bl["conv5_mask_w"] = rng.randn(256, 256, 2, 2).astype(np.float32) * .05
        bl["conv5_mask_b"] = np.zeros(256, np.float32)
        conv("mask_fcn_logits", k, 256, 1, bias=True)
    else:
        # C4: single-scale RPN on res4 (1024 ch), res5 box head
        a = len(cfg.rpn.aspect_ratios) * len(cfg.rpn.sizes)
        conv("conv_rpn", 1024, 1024, 3, bias=True)
        conv("rpn_cls_logits", a, 1024, 1, bias=True)
        conv("rpn_bbox_pred", 4 * a, 1024, 1, bias=True)
        stage(5, blocks[3], 1024, 512)
    fc("cls_score", k, 1024 if is_fpn else 2048)
    fc("bbox_pred", 4 * k, 1024 if is_fpn else 2048)
    return bl


def test_detectron_pkl_fpn_roundtrip(rng):
    import jax

    from vosdetectron_tpu.models.generalized_rcnn import (GeneralizedRCNN,
                                                          init_model_params)

    cfg = apply_overrides(Config(), [
        ("model.num_classes", 4),
        ("rpn.pre_nms_top_n_test", 32),
        ("rpn.post_nms_top_n_test", 16),
        ("test.padded_image_size", (128, 192)),
    ]).validate()
    model = GeneralizedRCNN(cfg)
    init = init_model_params(model, jax.random.PRNGKey(0), (128, 192))

    bl = make_detectron_pkl_blobs(rng, cfg, 4)
    imported = Z.import_detectron_pkl(bl, cfg)
    merged = Z.merge_params(init, imported)
    # transposes round-trip: OIHW blob -> HWIO kernel
    np.testing.assert_array_equal(
        np.asarray(merged["body"]["stem"]["conv1"]["kernel"]),
        np.transpose(bl["conv1_w"], (2, 3, 1, 0)))
    # deconv additionally flips spatially (flax ConvTranspose does not
    # mirror the kernel; torch/caffe2 transposed conv does)
    np.testing.assert_array_equal(
        np.asarray(merged["mask_head"]["upconv"]["kernel"]),
        np.transpose(bl["conv5_mask_w"][:, :, ::-1, ::-1], (2, 3, 0, 1)))
    img = jnp.asarray(rng.randn(1, 128, 192, 3).astype(np.float32))
    hw = jnp.asarray([[128.0, 192.0]])
    out = model.apply({"params": merged}, img, hw)
    assert np.isfinite(np.asarray(out.cls_scores)).all()


def test_detectron_pkl_c4_roundtrip(rng):
    """Workload 1 (R-50-C4) is weight-checkable: .pkl blobs incl. the res5
    box head and single-scale RPN import and run."""
    import jax

    from vosdetectron_tpu.models.generalized_rcnn import (GeneralizedRCNN,
                                                          init_model_params)

    cfg = apply_overrides(Config(), [
        ("model.conv_body", "resnet50_c4"),
        ("fpn.enabled", False),
        ("model.mask_on", False),
        ("model.num_classes", 4),
        ("rpn.pre_nms_top_n_test", 32),
        ("rpn.post_nms_top_n_test", 16),
        ("test.padded_image_size", (128, 192)),
    ]).validate()
    model = GeneralizedRCNN(cfg)
    init = init_model_params(model, jax.random.PRNGKey(0), (128, 192))

    bl = make_detectron_pkl_blobs(rng, cfg, 4)
    imported = Z.import_detectron_pkl(bl, cfg)
    merged = Z.merge_params(init, imported)
    assert "res5" in merged["box_head"]
    np.testing.assert_array_equal(
        np.asarray(merged["box_head"]["res5"]["block0"]["conv2"]["kernel"]),
        np.transpose(bl["res5_0_branch2b_w"], (2, 3, 1, 0)))
    img = jnp.asarray(rng.randn(1, 128, 192, 3).astype(np.float32))
    hw = jnp.asarray([[128.0, 192.0]])
    out = model.apply({"params": merged}, img, hw)
    assert np.isfinite(np.asarray(out.cls_scores)).all()


def test_detectron_pytorch_c4_import(rng):
    """C4 dialect of the Detectron.pytorch naming (RPN.RPN_conv,
    Box_Head.res5) imports into the Res5RoIHead assembly."""
    import jax

    from vosdetectron_tpu.models.generalized_rcnn import (GeneralizedRCNN,
                                                          init_model_params)

    cfg = apply_overrides(Config(), [
        ("model.conv_body", "resnet50_c4"),
        ("fpn.enabled", False),
        ("model.mask_on", False),
        ("model.num_classes", 4),
        ("rpn.pre_nms_top_n_test", 32),
        ("rpn.post_nms_top_n_test", 16),
        ("test.padded_image_size", (128, 192)),
    ]).validate()
    model = GeneralizedRCNN(cfg)
    init = init_model_params(model, jax.random.PRNGKey(0), (128, 192))

    tv = make_tv_resnet50_sd(rng)
    sd = {}
    sd["Conv_Body.res1.conv1.weight"] = tv["conv1.weight"]
    for stat in ("weight", "bias", "running_mean", "running_var"):
        sd[f"Conv_Body.res1.bn1.{stat}"] = tv[f"bn1.{stat}"]
    for k, v in tv.items():
        if k.startswith("layer4"):
            sd[f"Box_Head.res5.{k.split('.', 1)[1]}"] = v
        elif k.startswith("layer"):
            li = int(k[5]) + 1
            sd[f"Conv_Body.res{li}.{k.split('.', 1)[1]}"] = v

    a = len(cfg.rpn.aspect_ratios) * len(cfg.rpn.sizes)

    def add_conv(name, o, i, kk):
        sd[f"{name}.weight"] = rng.randn(o, i, kk, kk).astype(np.float32) * .05
        sd[f"{name}.bias"] = np.zeros(o, np.float32)

    add_conv("RPN.RPN_conv", 1024, 1024, 3)
    add_conv("RPN.RPN_cls_score", a, 1024, 1)
    add_conv("RPN.RPN_bbox_pred", 4 * a, 1024, 1)
    sd["Box_Outs.cls_score.weight"] = rng.randn(4, 2048).astype(np.float32) * .01
    sd["Box_Outs.cls_score.bias"] = np.zeros(4, np.float32)
    sd["Box_Outs.bbox_pred.weight"] = rng.randn(16, 2048).astype(np.float32) * .01
    sd["Box_Outs.bbox_pred.bias"] = np.zeros(16, np.float32)

    imported = Z.import_detectron_pytorch(sd, cfg)
    merged = Z.merge_params(init, imported)
    img = jnp.asarray(rng.randn(1, 128, 192, 3).astype(np.float32))
    hw = jnp.asarray([[128.0, 192.0]])
    out = model.apply({"params": merged}, img, hw)
    assert np.isfinite(np.asarray(out.cls_scores)).all()


def test_load_detectron_pkl(tmp_path, rng):
    """Py2-era pickle loading: 'blobs' nesting + momentum filtering."""
    import pickle

    bl = {"conv1_w": rng.randn(8, 3, 7, 7).astype(np.float32),
          "conv1_w_momentum": np.zeros((8, 3, 7, 7), np.float32)}
    p = tmp_path / "model_final.pkl"
    with open(p, "wb") as f:
        pickle.dump({"blobs": bl}, f, protocol=2)
    loaded = Z.load_detectron_pkl(str(p))
    assert set(loaded) == {"conv1_w"}
    np.testing.assert_array_equal(loaded["conv1_w"], bl["conv1_w"])


# ---------------------------------------------------------------------------
# Key-coverage report (VERDICT r2 #7; reference: detectron_weight_helper.py
# name mapping — dialect drift must be diagnosable, not an opaque KeyError)
# ---------------------------------------------------------------------------


def test_coverage_report_torchvision_backbone(rng):
    """Backbone-only import: classifier blobs unconsumed, head params
    unfilled, every backbone leaf filled — all listed by name."""
    import jax

    from vosdetectron_tpu.models.resnet import ResNetBody

    sd = Z.RecordingSource(make_tv_resnet50_sd(rng))
    sd["fc.weight"] = rng.randn(1000, 2048).astype(np.float32)
    sd["fc.bias"] = np.zeros(1000, np.float32)
    sd.consumed.clear()  # the two setup writes above are not importer reads

    imported = Z.import_torchvision_resnet(sd, 50)
    body = ResNetBody(depth=50, stages_out=(2, 3, 4, 5), freeze_at=0,
                      stride_1x1=False)
    init = body.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 64, 64, 3)))["params"]
    rep = Z.coverage_report(init, imported, sd)
    # the ImageNet classifier head is not part of the detector
    assert "fc.weight" in rep["unconsumed_keys"]
    assert "fc.bias" in rep["unconsumed_keys"]
    # every backbone leaf is filled; nothing else is left at init
    assert rep["n_filled"] == rep["n_model"]
    assert rep["unfilled_params"] == []
    txt = Z.format_coverage_report(rep)
    assert "fc.weight" in txt


def test_coverage_report_flags_drifted_pkl_blob(rng):
    """A blob the importer never reads (naming drift / extra key) must be
    reported; a fully-covered import reports full coverage."""
    import jax

    from vosdetectron_tpu.models.generalized_rcnn import (GeneralizedRCNN,
                                                          init_model_params)

    cfg = apply_overrides(Config(), [
        ("model.num_classes", 4),
        ("rpn.pre_nms_top_n_test", 32),
        ("rpn.post_nms_top_n_test", 16),
        ("test.padded_image_size", (128, 192)),
    ]).validate()
    model = GeneralizedRCNN(cfg)
    init = init_model_params(model, jax.random.PRNGKey(0), (128, 192))

    blobs = make_detectron_pkl_blobs(rng, cfg, 4)
    blobs["conv_rpn_w_DRIFTED"] = np.zeros((1,), np.float32)
    src = Z.RecordingSource(blobs)
    imported = Z.import_detectron_pkl(src, cfg)
    rep = Z.coverage_report(init, imported, src)
    assert "conv_rpn_w_DRIFTED" in rep["unconsumed_keys"]
    assert len(rep["unconsumed_keys"]) == 1, rep["unconsumed_keys"]
    assert rep["unfilled_params"] == [], rep["unfilled_params"]


def test_grouped_conv_import_matches_torch(rng):
    """ResNeXt grouped 3x3: torch Conv2d(groups=g) weight (O, I/g, k, k)
    through _t_conv -> flax Conv(feature_group_count=g) must match torch
    numerically (reference: RESNETS.NUM_GROUPS group conv in
    lib/modeling/ResNet.py)."""
    torch = pytest.importorskip("torch")
    import flax.linen as nn
    import jax

    g, cin, cout = 8, 32, 64
    x = rng.randn(2, 6, 6, cin).astype(np.float32)
    w = rng.randn(cout, cin // g, 3, 3).astype(np.float32)
    t = torch.nn.Conv2d(cin, cout, 3, padding=1, groups=g, bias=False)
    with torch.no_grad():
        t.weight.copy_(torch.from_numpy(w))
        yt = t(torch.from_numpy(x.transpose(0, 3, 1, 2))
               ).numpy().transpose(0, 2, 3, 1)
    m = nn.Conv(cout, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                feature_group_count=g)
    with jax.default_matmul_precision("float32"):
        yj = m.apply({"params": {"kernel": jnp.asarray(Z._t_conv(w))}},
                     jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(yj), yt, atol=1e-4)


def test_deconv_import_matches_torch(rng):
    """_t_deconv must spatially flip: flax ConvTranspose does not mirror
    the kernel while torch's transposed conv does. Covers both deconv
    geometries we import (mask upconv k2/s2, keypoint score_lowres
    k4/s2/p1)."""
    torch = pytest.importorskip("torch")
    import flax.linen as nn
    import jax

    x = rng.randn(2, 8, 8, 5).astype(np.float32)
    for k, s, p, pad in ((2, 2, 0, "VALID"), (4, 2, 1, "SAME")):
        w = rng.randn(5, 3, k, k).astype(np.float32)
        b = rng.randn(3).astype(np.float32)
        t = torch.nn.ConvTranspose2d(5, 3, k, stride=s, padding=p)
        with torch.no_grad():
            t.weight.copy_(torch.from_numpy(w))
            t.bias.copy_(torch.from_numpy(b))
            yt = t(torch.from_numpy(x.transpose(0, 3, 1, 2))
                   ).numpy().transpose(0, 2, 3, 1)
        m = nn.ConvTranspose(3, (k, k), strides=(s, s), padding=pad)
        with jax.default_matmul_precision("float32"):
            yj = m.apply({"params": {"kernel": jnp.asarray(Z._t_deconv(w)),
                                     "bias": jnp.asarray(b)}},
                         jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(yj), yt, atol=1e-4)
