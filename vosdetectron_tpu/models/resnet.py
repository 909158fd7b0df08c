"""ResNet conv bodies — flax.linen, NHWC, frozen BatchNorm.

TPU-native re-design of the reference's ResNet bodies
(reference: lib/modeling/ResNet.py ~450 LoC: ResNet50_conv4_body /
ResNet50_conv5_body / ResNet_roi_conv5_head, with AffineChannel2d frozen-BN
from lib/nn/modules/affine.py).

Design notes:
  * NHWC layout throughout (TPU conv-friendly; the reference is NCHW torch).
  * Frozen BN is an ``AffineChannel`` — a per-channel scale/bias with NO
    batch statistics, matching Detectron semantics where BN is folded after
    ImageNet pretraining and never updated. Under jit this fuses into the
    adjacent conv.
  * Caffe-style stride placement: stride lives on the FIRST 1x1 conv of a
    bottleneck (Detectron default), switchable for torchvision-style weights.
  * Stage freezing (cfg.resnets.freeze_at) is implemented functionally with
    ``jax.lax.stop_gradient`` on stage outputs — parameters stay in the
    pytree (checkpoint compatible) but receive zero gradient.
  * Compute dtype is a parameter (bf16 on TPU); params remain float32.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from .convs import Conv

# Block counts per stage for each depth.
STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class AffineChannel(nn.Module):
    """Frozen BN: y = x * scale + bias (reference: AffineChannel2d).

    zero_init: initialize scale to 0 — used on each bottleneck's last
    affine so residual blocks start as identity. With frozen BN there is
    no statistic normalization, so WITHOUT this a randomly-initialized
    50-layer trunk blows activations up exponentially (the reference never
    trains from scratch — it always imports ImageNet weights, which
    overwrite these values anyway)."""

    features: int
    zero_init: bool = False

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.zeros if self.zero_init \
            else nn.initializers.ones
        scale = self.param("scale", init, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


def _make_norm(norm: str, features: int, zero_init: bool, name: str,
               gn_groups: int = 32, gn_eps: float = 1e-5):
    """Trunk norm factory: "affine" = frozen BN (Detectron default),
    "gn" = GroupNorm (reference: RESNETS.USE_GN swaps AffineChannel2d for
    lib/nn/modules/normalization.py::GroupNorm). Param names (scale/bias)
    and shapes are identical for both, so checkpoints stay structurally
    compatible."""
    if norm == "gn":
        scale_init = nn.initializers.zeros if zero_init \
            else nn.initializers.ones
        return nn.GroupNorm(num_groups=gn_groups, epsilon=gn_eps,
                            scale_init=scale_init, name=name)
    return AffineChannel(features, zero_init=zero_init, name=name)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with frozen-BN affines.

    groups > 1 gives the ResNeXt transform (reference:
    lib/modeling/ResNet.py::bottleneck_transformation with
    cfg.RESNETS.NUM_GROUPS; grouped conv == feature_group_count here,
    which XLA lowers to a blocked MXU matmul)."""

    inner: int
    out: int
    stride: int = 1
    stride_1x1: bool = True  # Caffe/Detectron style
    dilation: int = 1
    groups: int = 1
    norm: str = "affine"
    gn_groups: int = 32
    gn_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s1 = self.stride if self.stride_1x1 else 1
        s3 = 1 if self.stride_1x1 else self.stride
        mk = lambda feat, zero, name: _make_norm(  # noqa: E731
            self.norm, feat, zero, name, self.gn_groups, self.gn_eps)
        shortcut = x
        if x.shape[-1] != self.out or self.stride != 1:
            shortcut = Conv(self.out, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, dtype=self.dtype,
                               name="shortcut_conv")(x)
            shortcut = mk(self.out, False, "shortcut_bn")(shortcut)

        y = Conv(self.inner, (1, 1), strides=(s1,) * 2, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(mk(self.inner, False, "bn1")(y))
        y = Conv(self.inner, (3, 3), strides=(s3,) * 2,
                    kernel_dilation=(self.dilation,) * 2,
                    padding=[(self.dilation,) * 2] * 2, use_bias=False,
                    feature_group_count=self.groups,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.relu(mk(self.inner, False, "bn2")(y))
        y = Conv(self.out, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = mk(self.out, True, "bn3")(y)
        return nn.relu(y + shortcut)


class Stem(nn.Module):
    """7x7/2 conv + frozen BN + 3x3/2 maxpool (res1)."""

    width: int = 64
    norm: str = "affine"
    gn_groups: int = 32
    gn_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv(self.width, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = _make_norm(self.norm, self.width, False, "bn1",
                       self.gn_groups, self.gn_eps)(x)
        x = nn.relu(x)
        # Caffe ceil-mode 3x3/2 maxpool == pad (0,1)x(0,1) then VALID-ish;
        # use SAME-style padding (1,1) which matches for even inputs.
        return nn.max_pool(x, (3, 3), strides=(2, 2),
                           padding=[(1, 1), (1, 1)])


class ResNetStage(nn.Module):
    num_blocks: int
    inner: int
    out: int
    stride: int
    stride_1x1: bool = True
    dilation: int = 1
    groups: int = 1
    norm: str = "affine"
    gn_groups: int = 32
    gn_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_blocks):
            x = Bottleneck(self.inner, self.out,
                           stride=self.stride if i == 0 else 1,
                           stride_1x1=self.stride_1x1,
                           dilation=self.dilation, groups=self.groups,
                           norm=self.norm, gn_groups=self.gn_groups,
                           gn_eps=self.gn_eps, dtype=self.dtype,
                           name=f"block{i}")(x)
        return x


class ResNetBody(nn.Module):
    """ResNet trunk. Returns features of the requested stages.

    C4 body (reference ResNet50_conv4_body): stages_out=(4,) -> res4,
    stride 16. FPN body (ResNet50_conv5_body): stages_out=(2,3,4,5).
    """

    depth: int = 50
    stages_out: Tuple[int, ...] = (2, 3, 4, 5)
    freeze_at: int = 2
    stride_1x1: bool = True
    res5_dilation: int = 1
    # ResNeXt (reference: cfg.RESNETS.NUM_GROUPS / WIDTH_PER_GROUP, e.g.
    # 32x4d -> num_groups=32, width_per_group=4). Defaults reproduce plain
    # ResNet exactly (stage-2 inner = 1 * 64 = 64), so existing checkpoints
    # keep their param tree.
    num_groups: int = 1
    width_per_group: int = 64
    stem_width: int = 64
    norm: str = "affine"  # "affine" (frozen BN) | "gn" (RESNETS.USE_GN)
    gn_groups: int = 32
    gn_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, ...]:
        blocks = STAGE_BLOCKS[self.depth]
        max_stage = max(self.stages_out)
        x = Stem(width=self.stem_width, norm=self.norm,
                 gn_groups=self.gn_groups, gn_eps=self.gn_eps,
                 dtype=self.dtype, name="stem")(x)
        if self.freeze_at >= 1:
            x = jax.lax.stop_gradient(x)
        outs = []
        inner, out = self.num_groups * self.width_per_group, 256
        for stage in range(2, max_stage + 1):
            stride = 1 if stage == 2 else 2
            dilation = self.res5_dilation if stage == 5 else 1
            if dilation > 1:
                stride = 1
            x = ResNetStage(blocks[stage - 2], inner, out, stride,
                            stride_1x1=self.stride_1x1, dilation=dilation,
                            groups=self.num_groups, norm=self.norm,
                            gn_groups=self.gn_groups, gn_eps=self.gn_eps,
                            dtype=self.dtype, name=f"res{stage}")(x)
            if self.freeze_at >= stage:
                x = jax.lax.stop_gradient(x)
            if stage in self.stages_out:
                outs.append(x)
            inner *= 2
            out *= 2
        return tuple(outs)


class Res5RoIHead(nn.Module):
    """res5 applied per-RoI — the C4 box head
    (reference: ResNet.py::ResNet_roi_conv5_head). Input (N, 14, 14, 1024),
    output (N, 2048) after res5 (stride 2 -> 7x7) and global average pool.
    """

    depth: int = 50
    stride_1x1: bool = True
    num_groups: int = 1
    width_per_group: int = 64
    norm: str = "affine"
    gn_groups: int = 32
    gn_eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.num_groups * self.width_per_group * 8
        x = ResNetStage(STAGE_BLOCKS[self.depth][3], inner, 2048, 2,
                        stride_1x1=self.stride_1x1,
                        groups=self.num_groups, norm=self.norm,
                        gn_groups=self.gn_groups, gn_eps=self.gn_eps,
                        dtype=self.dtype, name="res5")(x)
        return x.mean(axis=(1, 2))
