"""TinyViT encoder for MobileSAM (reference models/sam/modules/tiny_encoder.py:
Conv2d_BN:24, PatchEmbed:62, MBConv:104, PatchMerging:165, Attention:363,
TinyViTBlock:492, TinyViT:765).

TPU-native: windows are static reshapes, the learned attention-bias table is
gathered once per static resolution (compile-time constant indices), convs are
NHWC.
"""

from __future__ import annotations

import itertools
import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .modules import _gelu_exact, window_partition, window_unpartition

Dtype = Any


class ConvBN(nn.Module):
    ch: int
    k: int = 1
    s: int = 1
    p: int = 0
    groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.ch, (self.k, self.k), strides=self.s, padding=self.p,
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="c")(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                            name="bn")(x)


class MBConv(nn.Module):
    """Mobile inverted bottleneck with 4x expansion (reference MBConv:104)."""

    dim: int
    expand: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = int(self.dim * self.expand)
        y = _gelu_exact(ConvBN(h, dtype=self.dtype, name="conv1")(x, train))
        y = _gelu_exact(ConvBN(h, 3, 1, 1, groups=h, dtype=self.dtype, name="conv2")(y, train))
        y = ConvBN(self.dim, dtype=self.dtype, name="conv3")(y, train)
        return _gelu_exact(x + y)


class PatchMerging(nn.Module):
    """Downsample + channel change between stages (reference PatchMerging:165).
    Depthwise stride is 1 for the SAM 320-dim final stage (keeps 64x64)."""

    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        s = 1 if self.out_dim in {320, 448, 576} else 2
        x = _gelu_exact(ConvBN(self.out_dim, dtype=self.dtype, name="conv1")(x, train))
        x = _gelu_exact(ConvBN(self.out_dim, 3, s, 1, groups=self.out_dim,
                           dtype=self.dtype, name="conv2")(x, train))
        return ConvBN(self.out_dim, dtype=self.dtype, name="conv3")(x, train)


class BiasAttention(nn.Module):
    """MHA over window tokens with a learned per-offset bias table
    (reference tiny_encoder.py Attention:363)."""

    dim: int
    key_dim: int
    num_heads: int
    attn_ratio: float = 4.0
    resolution: tuple = (7, 7)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, N, _ = x.shape
        nh, kd = self.num_heads, self.key_dim
        d = int(self.attn_ratio * kd)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm")(x)
        qkv = nn.Dense(nh * (2 * kd + d), dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(x).reshape(B, N, nh, 2 * kd + d)
        q, k, v = jnp.split(qkv, [kd, 2 * kd], -1)
        # offset-indexed bias table (static resolution -> constant idx matrix)
        pts = list(itertools.product(range(self.resolution[0]),
                                     range(self.resolution[1])))
        offsets, idxs = {}, []
        for p1 in pts:
            for p2 in pts:
                off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
                offsets.setdefault(off, len(offsets))
                idxs.append(offsets[off])
        bias_table = self.param("attention_biases", nn.initializers.zeros,
                                (nh, len(offsets)), jnp.float32)
        bias = bias_table[:, jnp.asarray(idxs, jnp.int32).reshape(len(pts), len(pts))]
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(kd)
        attn = attn + bias[None].astype(attn.dtype)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, N, nh * d)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(out)


class TinyViTBlock(nn.Module):
    """Window attention + local dw-conv + MLP (reference TinyViTBlock:492)."""

    dim: int
    num_heads: int
    window_size: int = 7
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        res = x
        ws = self.window_size
        xw, pad_hw = window_partition(x, ws)
        xw = xw.reshape(-1, ws * ws, C)
        # attn_ratio=1 (reference tiny_encoder.py:578): value dim == key dim,
        # so proj maps nh*key_dim == dim back to dim
        xw = BiasAttention(self.dim, self.dim // self.num_heads, self.num_heads,
                           attn_ratio=1.0, resolution=(ws, ws), dtype=self.dtype,
                           name="attn")(xw)
        x = window_unpartition(xw.reshape(-1, ws, ws, C), ws, pad_hw, (H, W))
        x = res + x
        x = ConvBN(self.dim, 3, 1, 1, groups=self.dim, dtype=self.dtype,
                   name="local_conv")(x, train)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_norm")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     param_dtype=jnp.float32, name="mlp_fc1")(y)
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_fc2")(_gelu_exact(y))
        return x + y


class TinyViT(nn.Module):
    """TinyViT image encoder producing (B, S/16, S/16, 256) like SAM's ViT
    (reference TinyViT:765)."""

    embed_dims: tuple = (64, 128, 160, 320)
    depths: tuple = (2, 2, 6, 2)
    num_heads: tuple = (2, 4, 5, 10)
    window_sizes: tuple = (7, 7, 14, 7)
    out_chans: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        d0 = self.embed_dims[0]
        x = _gelu_exact(ConvBN(d0 // 2, 3, 2, 1, dtype=self.dtype, name="pe_conv1")(x, train))
        x = ConvBN(d0, 3, 2, 1, dtype=self.dtype, name="pe_conv2")(x, train)
        # stage 0: MBConv conv stage
        for i in range(self.depths[0]):
            x = MBConv(d0, dtype=self.dtype, name=f"s0_mb{i}")(x, train)
        for s in range(1, 4):
            x = PatchMerging(self.embed_dims[s], dtype=self.dtype,
                             name=f"merge{s}")(x, train)
            for i in range(self.depths[s]):
                x = TinyViTBlock(self.embed_dims[s], self.num_heads[s],
                                 self.window_sizes[s], dtype=self.dtype,
                                 name=f"s{s}_blk{i}")(x, train)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="neck_conv1")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32,
                         name="neck_ln1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="neck_conv2")(x)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32,
                            name="neck_ln2")(x)


# mobile_sam_test mirrors the parity test's reference-side TinyViT (final dim
# must sit in PatchMerging's stride-1 set so both sides keep the /16 geometry)
MOBILE_SAM_CONFIGS = {
    "mobile_sam": {},
    "mobile_sam_test": dict(
        img_size=128,
        tiny_cfg=dict(embed_dims=(16, 32, 40, 320), depths=(1, 1, 1, 1),
                      num_heads=(2, 4, 5, 10), window_sizes=(4, 4, 4, 4))),
}


def build_mobile_sam(name="mobile_sam", weights=None, dtype=jnp.float32, imgsz=None):
    """MobileSAM = TinyViT encoder + the standard SAM prompt/mask heads."""
    from .build import _load_or_init
    from .modules import SAMModel

    cfg = dict(MOBILE_SAM_CONFIGS.get(name, {}))
    img_size = imgsz or cfg.pop("img_size", 1024)
    module = SAMModel(img_size=img_size, encoder="tiny", dtype=dtype, **cfg)
    variables = _load_or_init(module, weights, img_size, name)
    return module, variables, {"name": name, "img_size": img_size,
                               "is_sam2": False}
