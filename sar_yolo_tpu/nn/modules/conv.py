"""Convolution building blocks, TPU-native (Flax linen, NHWC, bf16-ready).

Capability parity with reference conv zoo (ultralytics/nn/modules/conv.py: Conv:38,
DSConv:84, DWConv:121, ChannelAttention:297, SpatialAttention:312, CBAM:328,
Concat:342). New design: NHWC layout (TPU-native), functional Flax modules,
fp32 params with configurable compute dtype so XLA keeps convs on the MXU in bf16.
"""

from __future__ import annotations

import math
from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch kaiming_uniform(a=sqrt(5)) equivalent: uniform with bound 1/sqrt(fan_in)
conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")

Dtype = Any

# Global default activation for Conv/Conv2 (act=True), overridable per model via the
# yaml `activation:` key (≙ reference Conv.default_act reassignment, tasks.py:1004).
ACTIVATIONS = {"silu": nn.silu, "relu": nn.relu, "relu6": lambda x: jnp.clip(x, 0, 6),
               "leakyrelu": lambda x: nn.leaky_relu(x, 0.01),
               "gelu": nn.gelu, "hardswish": nn.hard_swish, "mish": lambda x: x * jnp.tanh(nn.softplus(x))}
_DEFAULT_ACT = [nn.silu]


class default_act:
    """Context manager: temporarily swap the default Conv activation during a trace."""

    def __init__(self, fn):
        self.fn = fn

    def __enter__(self):
        _DEFAULT_ACT.append(self.fn)

    def __exit__(self, *exc):
        _DEFAULT_ACT.pop()


# Deploy-time fusion flag (≙ reference Conv.forward_fuse / RepConv deploy mode,
# conv.py:54,230). When active, Conv/Conv2/RepConv/DSConv trace their fused form
# (conv-with-bias, no BN, rep branches merged); `nn/fuse.py:fuse_variables` produces
# the matching folded parameters.
_FUSED = [False]


class fused_mode:
    """Context manager: trace modules in their deploy-fused structure."""

    def __init__(self, on: bool = True):
        self.on = on

    def __enter__(self):
        _FUSED.append(self.on)

    def __exit__(self, *exc):
        _FUSED.pop()


# Serving quantization flag. "int8" makes fused Conv blocks run their conv on
# the MXU's int8 path (2x the bf16 rate on v5e): per-output-channel symmetric
# weight quantization + dynamic per-tensor activation quantization, both
# computed INSIDE the jit from the ordinary fused f32 parameters — no separate
# quantized checkpoint format, no calibration pass (the activation scale is the
# batch's own abs-max; ≙ TensorRT dynamic-range int8, the A100 baseline's
# next gear after the FP16 mode BASELINE.md names).
_QUANT = [""]


class quant_mode:
    """Context manager: trace fused Conv blocks with int8 MXU convolutions."""

    def __init__(self, kind: str = "int8"):
        self.kind = kind

    def __enter__(self):
        _QUANT.append(self.kind)

    def __exit__(self, *exc):
        _QUANT.pop()


class Int8Conv2D(nn.Module):
    """Drop-in for fused nn.Conv(name="conv"): identical {kernel, bias} params,
    int8 symmetric quantized convolution with f32 rescale.

    Weight scales are per output channel; the activation scale is per tensor,
    derived from the live batch (dynamic quantization). Quantization error is
    bounded by 1/254 of the per-tensor activation range and 1/254 of each
    filter's weight range — measured end-to-end box deviation is the test's
    tolerance contract (tests/test_fuse.py).
    """

    features: int
    kernel_size: tuple
    strides: tuple
    padding: list
    kernel_dilation: tuple
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kshape = (*self.kernel_size, x.shape[-1], self.features)
        w = self.param("kernel", conv_init, kshape, jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        # quantize in f32 regardless of the serving dtype: with half=True the
        # bound params are bf16, whose spacing near 127 is 0.5 — round(w/sw)
        # could hit 128.0 and wrap to -128 on the max-magnitude weight
        w = w.astype(jnp.float32)
        sw = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-12) / 127.0  # (O,)
        wq = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
        xf = x.astype(jnp.float32)
        # per-sample activation scale: conv never mixes the batch axis, so the
        # rescale stays exact and batched results match single-image serving
        sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True), 1e-12) / 127.0
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        dn = jax.lax.conv_dimension_numbers(x.shape, kshape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            xq, wq, window_strides=self.strides, padding=self.padding,
            rhs_dilation=self.kernel_dilation, dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * (sx * sw) + b).astype(self.dtype)


def autopad(k: int, p: int | None = None, d: int = 1) -> int:
    """'Same'-shape padding for stride-1 convs (matches reference autopad semantics)."""
    if d > 1:
        k = d * (k - 1) + 1
    if p is None:
        p = k // 2
    return p


class Conv(nn.Module):
    """Conv2d(no bias) + BatchNorm + SiLU — the universal YOLO conv block.

    Args mirror the reference: (c2, k, s, p, g, d, act). c1 is inferred from input.
    """

    c2: int
    k: int = 1
    s: int = 1
    p: int | None = None
    g: int = 1
    d: int = 1
    act: bool | Callable = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = autopad(self.k, self.p, self.d)
        if _FUSED[-1] and _QUANT[-1] == "int8" and self.g == 1:
            # int8 MXU path (dense convs only; grouped/depthwise stay bf16 —
            # they are bandwidth-bound, not MXU-bound)
            x = Int8Conv2D(
                features=self.c2, kernel_size=(self.k, self.k),
                strides=(self.s, self.s), padding=[(pad, pad), (pad, pad)],
                kernel_dilation=(self.d, self.d), dtype=self.dtype,
                name="conv")(x)
        else:
            x = nn.Conv(
                features=self.c2,
                kernel_size=(self.k, self.k),
                strides=(self.s, self.s),
                padding=[(pad, pad), (pad, pad)],
                feature_group_count=self.g,
                kernel_dilation=(self.d, self.d),
                use_bias=_FUSED[-1],
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=conv_init,
                name="conv",
            )(x)
        if not _FUSED[-1]:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.97,
                epsilon=1e-3,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="bn",
            )(x)
        if self.act is True:
            x = _DEFAULT_ACT[-1](x)
        elif callable(self.act):
            x = self.act(x)
        return x


class DWConv(nn.Module):
    """Depthwise convolution block (groups = gcd(c1, c2))."""

    c2: int
    k: int = 1
    s: int = 1
    d: int = 1
    act: bool | Callable = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        # nn.share_scope: the inner Conv's conv/bn params live directly in THIS
        # module's scope, mirroring the torch DWConv(Conv) param layout so
        # converted checkpoints map 1:1
        inner = Conv(self.c2, self.k, self.s, None, math.gcd(c1, self.c2), self.d,
                     self.act, dtype=self.dtype)
        nn.share_scope(self, inner)
        return inner(x, train)


class DSConv(nn.Module):
    """Depthwise-separable conv: DW kxk then PW 1x1, one BN+SiLU on the output.

    Reference: ultralytics/nn/modules/conv.py:84 (fork addition for YOLOv13).
    """

    c2: int
    k: int = 3
    s: int = 1
    p: int | None = None
    d: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        pad = self.p if self.p is not None else (self.d * (self.k - 1)) // 2
        x = nn.Conv(c1, (self.k, self.k), (self.s, self.s), [(pad, pad), (pad, pad)],
                    feature_group_count=c1, kernel_dilation=(self.d, self.d), use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, kernel_init=conv_init, name="dw")(x)
        x = nn.Conv(self.c2, (1, 1), use_bias=_FUSED[-1], dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=conv_init, name="pw")(x)
        if not _FUSED[-1]:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                             dtype=self.dtype, param_dtype=jnp.float32, name="bn")(x)
        return nn.silu(x)


class ChannelAttention(nn.Module):
    """Squeeze-excite style channel attention (reference conv.py:297)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)  # (B,1,1,C)
        attn = nn.Conv(c, (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
                       name="fc")(pooled)
        return x * jax.nn.sigmoid(attn)


class SpatialAttention(nn.Module):
    """Spatial attention over channel-pooled maps (reference conv.py:312)."""

    kernel_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        pooled = jnp.concatenate([avg, mx], axis=-1)
        pad = self.kernel_size // 2
        attn = nn.Conv(1, (self.kernel_size, self.kernel_size),
                       padding=[(pad, pad), (pad, pad)], use_bias=False,
                       dtype=self.dtype, param_dtype=jnp.float32, name="cv1")(pooled)
        return x * jax.nn.sigmoid(attn)


class CBAM(nn.Module):
    """Convolutional Block Attention Module: channel then spatial attention."""

    kernel_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ChannelAttention(dtype=self.dtype, name="channel_attention")(x, train)
        return SpatialAttention(self.kernel_size, dtype=self.dtype, name="spatial_attention")(x, train)


class Concat(nn.Module):
    """Concatenate a list of NHWC tensors along channels (reference dim=1 ≙ NHWC -1)."""

    dim: int = -1

    @nn.compact
    def __call__(self, xs, train: bool = False):
        return jnp.concatenate(xs, axis=-1)


class Upsample(nn.Module):
    """Nearest-neighbor 2x upsample (≙ reference nn.Upsample(None, 2, 'nearest')).

    Implemented as repeat (cheaper than gather-based resize on TPU).
    """

    scale: int = 2
    mode: str = "nearest"

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = int(self.scale)
        x = jnp.repeat(x, s, axis=1)
        return jnp.repeat(x, s, axis=2)


class LightConv(nn.Module):
    """1x1 conv (no act) + depthwise kxk with ReLU (reference conv.py LightConv)."""

    c2: int
    k: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.c2, 1, act=False, dtype=self.dtype, name="conv1")(x, train)
        return DWConv(self.c2, self.k, act=nn.relu, dtype=self.dtype, name="conv2")(x, train)


class RepConv(nn.Module):
    """RepVGG-style conv: parallel 3x3 + 1x1 branches at train time (reference conv.py:193).

    Deploy-time fusion folds both into one 3x3 (a param transform, `nn/fuse.py`).
    """

    c2: int
    k: int = 3
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if _FUSED[-1]:
            pad = self.k // 2
            y = nn.Conv(self.c2, (self.k, self.k), (self.s, self.s),
                        [(pad, pad), (pad, pad)], use_bias=True, dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv")(x)
            return nn.silu(y)
        y1 = Conv(self.c2, self.k, self.s, act=False, dtype=self.dtype, name="conv1")(x, train)
        y2 = Conv(self.c2, 1, self.s, act=False, dtype=self.dtype, name="conv2")(x, train)
        return nn.silu(y1 + y2)


class Conv2(nn.Module):
    """Simplified RepConv: parallel kxk + 1x1 convs into one shared BN (ref conv.py:59)."""

    c2: int
    k: int = 3
    s: int = 1
    p: int | None = None
    g: int = 1
    d: int = 1
    act: bool | Callable = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = autopad(self.k, self.p, self.d)
        y = nn.Conv(self.c2, (self.k, self.k), (self.s, self.s), [(pad, pad), (pad, pad)],
                    feature_group_count=self.g, kernel_dilation=(self.d, self.d),
                    use_bias=_FUSED[-1], dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=conv_init, name="conv")(x)
        if not _FUSED[-1]:
            p1 = autopad(1, self.p, self.d)
            y = y + nn.Conv(self.c2, (1, 1), (self.s, self.s), [(p1, p1), (p1, p1)],
                            feature_group_count=self.g, use_bias=False, dtype=self.dtype,
                            param_dtype=jnp.float32, kernel_init=conv_init, name="cv2")(x)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                             dtype=self.dtype, param_dtype=jnp.float32, name="bn")(y)
        if self.act is True:
            return _DEFAULT_ACT[-1](y)
        return self.act(y) if callable(self.act) else y


class GhostConv(nn.Module):
    """Ghost convolution: cheap 5x5 depthwise features concatenated to a primary conv
    (reference conv.py:177, GhostNet)."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: bool | Callable = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = Conv(c_, self.k, self.s, None, self.g, act=self.act, dtype=self.dtype,
                 name="cv1")(x, train)
        y2 = Conv(c_, 5, 1, None, c_, act=self.act, dtype=self.dtype, name="cv2")(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class Index(nn.Module):
    """Select one tensor from a list input (reference conv.py:355)."""

    c2: int = 0
    index: int = 0

    @nn.compact
    def __call__(self, xs, train: bool = False):
        return xs[self.index]


class ConvTranspose2d(nn.Module):
    """Raw transposed conv (≙ yaml `nn.ConvTranspose2d [c2, k, s, p]`, bias, no BN/act)."""

    c2: int
    k: int = 2
    s: int = 2
    p: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # torch output size: (H-1)*s - 2p + k. Flax VALID + transpose_kernel
        # yields (H-1)*s + k; torch's `padding` then crops p from each side.
        y = nn.ConvTranspose(self.c2, (self.k, self.k), (self.s, self.s), padding="VALID",
                             use_bias=True, transpose_kernel=True, dtype=self.dtype,
                             param_dtype=jnp.float32, name="conv")(x)
        if self.p:
            y = y[:, self.p:-self.p, self.p:-self.p, :]
        return y


class MaxPool2d(nn.Module):
    """Raw max-pool layer (≙ yaml `nn.MaxPool2d [k, s, p]`)."""

    k: int = 2
    s: int = 2
    p: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = [(self.p, self.p), (self.p, self.p)]
        return nn.max_pool(x, (self.k, self.k), strides=(self.s, self.s), padding=pad)


class ZeroPad2d(nn.Module):
    """Zero padding (left, right, top, bottom) — yaml `nn.ZeroPad2d [[l,r,t,b]]`."""

    pads: tuple = (0, 1, 0, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        left, right, top, bottom = self.pads
        return jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)))


class Identity(nn.Module):
    """Passthrough (≙ yaml `nn.Identity`, used as an input tap by yolov9e)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return x
