"""Convolutions with a selectable lowering: native XLA conv ops or an
MXU-friendly matmul decomposition ("dots").

Why this exists: the TPU compute path normally wants plain
``lax.conv_general_dilated`` — XLA lowers it onto the MXU itself. But the
conv lowering is a *compiler* property, and this framework runs against
remote-compiled executables whose toolchain can change underneath it. On
2026-08-18 the tunnel's remote compiler emitted convolutions running at
0.2 TFLOP/s while plain ``dot_general`` on the same chip sustained
54 TFLOP/s (tools/probe_tpu_health.py) — a 250x regression that made the
whole detector unusable. The "dots" implementation expresses every conv as
K*K shifted strided slices contracted with ``dot_general`` (f32
accumulation), i.e. HLO the MXU path cannot miss — measured 15x faster
than the broken native lowering on that day, at the cost of re-reading the
input K*K times from HBM (so it is NOT the default; it is weather
insurance, selected by ``cfg.model.conv_impl`` or the
``VOSDETECTRON_CONV_IMPL`` env var).

Both ``Conv`` and ``ConvTranspose`` are parameter-compatible with
``flax.linen.Conv`` / ``flax.linen.ConvTranspose`` (same param names
"kernel"/"bias", same shapes, same default initializers), so checkpoints
and the zoo importers are oblivious to the lowering choice.

Reference parity note: the reference (lib/modeling/*.py) has no analogue —
cuDNN picks conv algorithms at runtime; on TPU the equivalent degree of
freedom is which HLO we emit, which is what this module controls.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# ---------------------------------------------------------------------------
# Process-level implementation switch.
#
# Read at TRACE time by Conv/ConvTranspose. Set once per process (engines set
# it from cfg.model.conv_impl before building any jitted program); flipping it
# after programs are traced does not invalidate their caches.
# ---------------------------------------------------------------------------

_VALID_IMPLS = ("native", "dots")
_impl = "native"


def set_conv_impl(mode: str) -> None:
    """Select the conv lowering ("native" | "dots"). Env var
    VOSDETECTRON_CONV_IMPL, when set, wins over this (ops escape hatch)."""
    if mode not in _VALID_IMPLS:
        raise ValueError(f"conv_impl must be one of {_VALID_IMPLS}: {mode}")
    global _impl
    _impl = mode


def get_conv_impl() -> str:
    env = os.environ.get("VOSDETECTRON_CONV_IMPL", "")
    if env:
        if env not in _VALID_IMPLS:
            raise ValueError(
                f"VOSDETECTRON_CONV_IMPL must be one of {_VALID_IMPLS}: {env}")
        return env
    return _impl


# ---------------------------------------------------------------------------
# dots lowering
# ---------------------------------------------------------------------------


def _norm_pair(v: Union[int, Sequence[int]]) -> Tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    return (int(v[0]), int(v[1]))


def _explicit_pads(padding, in_hw, k_hw, strides, dilation):
    """Resolve a flax-style padding spec to explicit ((pt,pb),(pl,pr))."""
    if isinstance(padding, str):
        if padding == "VALID":
            return ((0, 0), (0, 0))
        if padding != "SAME":
            raise NotImplementedError(f"padding {padding!r}")
        pads = []
        for size, k, s, d in zip(in_hw, k_hw, strides, dilation):
            eff = (k - 1) * d + 1
            out = -(-size // s)  # ceil
            total = max((out - 1) * s + eff - size, 0)
            pads.append((total // 2, total - total // 2))
        return tuple(pads)
    (pt, pb), (pl, pr) = padding
    return ((int(pt), int(pb)), (int(pl), int(pr)))


def dots_conv(x: jnp.ndarray, kernel: jnp.ndarray,
              strides: Tuple[int, int], pads, dilation: Tuple[int, int],
              groups: int = 1) -> jnp.ndarray:
    """NHWC conv as sum over kernel taps of strided-slice + dot_general.

    x: (N, H, W, Cin); kernel: (KH, KW, Cin//groups, Cout). f32 accumulation
    (preferred_element_type), output cast back to x.dtype. Equivalent to
    lax.conv_general_dilated(..., NHWC/HWIO/NHWC) with rhs_dilation.
    """
    n, h, w, cin = x.shape
    kh, kw, cing, cout = kernel.shape
    sh, sw = strides
    dh, dw = dilation
    (pt, pb), (pl, pr) = pads
    xp = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))
    hp, wp = h + pt + pb, w + pl + pr
    oh = (hp - ((kh - 1) * dh + 1)) // sh + 1
    ow = (wp - ((kw - 1) * dw + 1)) // sw + 1
    acc = None
    for dy in range(kh):
        for dx in range(kw):
            y0, x0 = dy * dh, dx * dw
            xs = lax.slice(
                xp, (0, y0, x0, 0),
                (n, y0 + (oh - 1) * sh + 1, x0 + (ow - 1) * sw + 1, cin),
                (1, sh, sw, 1))
            if groups == 1:
                y = lax.dot_general(
                    xs.reshape(-1, cin), kernel[dy, dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                og = cout // groups
                xg = xs.reshape(-1, groups, cing)
                wg = kernel[dy, dx].reshape(cing, groups, og)
                # batched over the group dim: (M,G,c) x (G,c,o) -> (M,G,o)
                y = lax.dot_general(
                    xg, wg.transpose(1, 0, 2),
                    (((2,), (1,)), ((1,), (0,))),
                    preferred_element_type=jnp.float32)
                # dot_general puts batch dims first: (G, M, o) -> (M, G*o)
                y = y.transpose(1, 0, 2).reshape(-1, cout)
            acc = y if acc is None else acc + y
    return acc.reshape(n, oh, ow, cout).astype(x.dtype)


def _conv_transpose_pads(k: int, s: int, padding: str) -> Tuple[int, int]:
    """Padding of the equivalent lhs-dilated conv (jax conv_transpose)."""
    if padding == "SAME":
        pad_len = k + s - 2
        pad_a = k - 1 if s > k - 1 else int(np.ceil(pad_len / 2))
    elif padding == "VALID":
        pad_len = k + s - 2 + max(k - s, 0)
        pad_a = k - 1
    else:
        raise NotImplementedError(f"conv_transpose padding {padding!r}")
    return pad_a, pad_len - pad_a


def dots_conv_transpose(x: jnp.ndarray, kernel: jnp.ndarray,
                        strides: Tuple[int, int],
                        padding: str = "SAME") -> jnp.ndarray:
    """Polyphase transposed conv: per output phase, a small stride-1 conv
    (as dots) over the relevant kernel taps, then spatial interleave.

    Matches flax.linen.ConvTranspose (no kernel flip; jax conv_transpose
    padding rules). kernel: (KH, KW, Cin, Cout).
    """
    n, h, w, cin = x.shape
    kh, kw, cing, cout = kernel.shape
    sh, sw = strides
    pt, _ = _conv_transpose_pads(kh, sh, padding)
    pl, _ = _conv_transpose_pads(kw, sw, padding)

    # Phase (ry, rx): output[s*i + r] = sum over taps k with
    # (r + k - p) % s == 0 of x[i + (r + k - p)//s] @ W[k].
    def taps(r, k, s, p):
        return [(k_, (r + k_ - p) // s) for k_ in range(k)
                if (r + k_ - p) % s == 0]

    # Pre-pad x so every tap offset becomes a plain slice.
    offs_y = [d for r in range(sh) for _, d in taps(r, kh, sh, pt)]
    offs_x = [d for r in range(sw) for _, d in taps(r, kw, sw, pl)]
    py0, py1 = max(0, -min(offs_y)), max(0, max(offs_y) + 1 - 1)
    px0, px1 = max(0, -min(offs_x)), max(0, max(offs_x) + 1 - 1)
    xp = jnp.pad(x, ((0, 0), (py0, py1), (px0, px1), (0, 0)))

    phases = []
    for ry in range(sh):
        row = []
        for rx in range(sw):
            acc = None
            for ky, dy in taps(ry, kh, sh, pt):
                for kx, dx in taps(rx, kw, sw, pl):
                    xs = lax.slice(
                        xp, (0, dy + py0, dx + px0, 0),
                        (n, dy + py0 + h, dx + px0 + w, cin))
                    y = lax.dot_general(
                        xs.reshape(-1, cin), kernel[ky, kx],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = y if acc is None else acc + y
            if acc is None:
                acc = jnp.zeros((n * h * w, cout), jnp.float32)
            row.append(acc.reshape(n, h, w, cout))
        phases.append(row)
    # interleave: (sh, sw, N, H, W, C) -> (N, H*sh, W*sw, C)
    y = jnp.stack([jnp.stack(r) for r in phases])
    y = y.transpose(2, 3, 0, 4, 1, 5)
    return y.reshape(n, h * sh, w * sw, cout).astype(x.dtype)


def bilinear_x2_dots(x: jnp.ndarray) -> jnp.ndarray:
    """dots-mode exact-2x FCN bilinear upsample (separable, elementwise —
    no conv op). Matches models/heads.py::bilinear_upsample_x2 (depthwise
    lhs-dilated conv, kernel [.25,.75,.75,.25], pad 2)."""
    def up1(v, axis):
        # phase 0: .25*v[i-1] + .75*v[i]; phase 1: .75*v[i] + .25*v[i+1]
        pad = [(0, 0)] * v.ndim
        pad[axis] = (1, 1)
        vp = jnp.pad(v, pad)
        m = v.shape[axis]
        prv = lax.slice_in_dim(vp, 0, m, axis=axis)
        cur = v
        nxt = lax.slice_in_dim(vp, 2, m + 2, axis=axis)
        p0 = 0.25 * prv + 0.75 * cur
        p1 = 0.75 * cur + 0.25 * nxt
        y = jnp.stack([p0, p1], axis=axis + 1)
        shape = list(v.shape)
        shape[axis] = 2 * m
        return y.reshape(shape)

    dt = x.dtype
    x = x.astype(jnp.float32)
    return up1(up1(x, 1), 2).astype(dt)


# ---------------------------------------------------------------------------
# flax modules (param-compatible with nn.Conv / nn.ConvTranspose)
# ---------------------------------------------------------------------------

default_kernel_init = nn.initializers.lecun_normal()


class Conv(nn.Module):
    """Drop-in for flax.linen.Conv (NHWC) with selectable lowering."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Union[int, Tuple[int, int]] = 1
    padding: Any = "SAME"
    use_bias: bool = True
    feature_group_count: int = 1
    kernel_dilation: Union[int, Tuple[int, int]] = 1
    dtype: Any = None
    kernel_init: Callable = default_kernel_init
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        # flax batch-dim flexibility: (H,W,C) unbatched and (...,H,W,C)
        # multi-batch inputs are flattened to one batch dim.
        lead = x.shape[:-3]
        x = x.reshape((-1,) + x.shape[-3:])
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", self.kernel_init,
            (kh, kw, cin // self.feature_group_count, self.features),
            jnp.float32)
        bias = self.param("bias", self.bias_init, (self.features,),
                          jnp.float32) if self.use_bias else None
        # flax semantics: dtype=None promotes inputs with the f32 params.
        dtype = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
        strides = _norm_pair(self.strides)
        dilation = _norm_pair(self.kernel_dilation)
        if get_conv_impl() == "dots":
            pads = _explicit_pads(self.padding, x.shape[1:3], (kh, kw),
                                  strides, dilation)
            y = dots_conv(x, kernel, strides, pads, dilation,
                          self.feature_group_count)
        else:
            y = lax.conv_general_dilated(
                x, kernel, strides, self.padding,
                rhs_dilation=dilation,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.feature_group_count)
        if bias is not None:
            y = y + bias.astype(dtype)
        return y.reshape(lead + y.shape[-3:])


class ConvTranspose(nn.Module):
    """Drop-in for flax.linen.ConvTranspose (NHWC) with selectable
    lowering. No kernel flip (flax semantics; the zoo importer flips torch
    deconv kernels on import to match)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Union[int, Tuple[int, int]] = 1
    padding: str = "SAME"
    use_bias: bool = True
    dtype: Any = None
    kernel_init: Callable = default_kernel_init
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        lead = x.shape[:-3]
        x = x.reshape((-1,) + x.shape[-3:])
        kh, kw = self.kernel_size
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, cin, self.features), jnp.float32)
        bias = self.param("bias", self.bias_init, (self.features,),
                          jnp.float32) if self.use_bias else None
        dtype = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
        strides = _norm_pair(self.strides)
        if get_conv_impl() == "dots":
            y = dots_conv_transpose(x, kernel, strides, self.padding)
        else:
            y = lax.conv_transpose(
                x, kernel, strides, self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bias is not None:
            y = y + bias.astype(dtype)
        return y.reshape(lead + y.shape[-3:])
