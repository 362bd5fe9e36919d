"""YOLO block zoo (v8 CSP blocks + fork's v13 hypergraph/area-attention blocks).

TPU-native Flax/NHWC re-implementations with capability parity to the reference:
  C2f/C3/SPPF/Bottleneck  -> ultralytics/nn/modules/block.py:176-760
  AAttn/ABlock/A2C2f      -> block.py:1213-1405 (flash-attn area attention)
  DSBottleneck/DSC3k(2)   -> block.py:1408-1580 (depthwise-separable CSP)
  AdaHyperedgeGen/AdaHGConv/C3AH/FuseModule/HyperACE -> block.py:1624-1984
  DownsampleConv/FullPAD_Tunnel -> block.py:1955-2021
  CBAM variants           -> block.py:742-772,1582

Design notes (TPU-first, not a translation):
  * NHWC everywhere; channel concat on the last (lane) axis keeps layouts trivial.
  * Attention math runs through jnp.einsum so XLA tiles it onto the MXU; the
    area chunking folds into the batch dimension (B*area) — static shapes, no
    dynamic control flow. A Pallas flash-attention kernel can swap in under
    `area_attention` without touching callers.
  * All hidden-channel arithmetic matches the reference so YAML configs and
    checkpoint-converted weights line up 1:1.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .conv import CBAM, Conv, DSConv

Dtype = Any


def _gelu_exact(x):
    """erf-form GELU (torch nn.GELU default), not the tanh approximation."""
    return nn.gelu(x, approximate=False)


class Bottleneck(nn.Module):
    """Standard residual bottleneck: Conv(k1) -> Conv(k2), add if channels match."""

    c2: int
    shortcut: bool = True
    g: int = 1
    k: tuple = (3, 3)
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = Conv(c_, self.k[0], 1, dtype=self.dtype, name="cv1")(x, train)
        y = Conv(self.c2, self.k[1], 1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        return x + y if self.shortcut and c1 == self.c2 else y


class C2f(nn.Module):
    """Cross-stage partial bottleneck with 2-way split and (2+n)-way fuse."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(Bottleneck(c, self.shortcut, self.g, (3, 3), 1.0,
                                 dtype=self.dtype, name=f"m{i}")(ys[-1], train))
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


class C2(nn.Module):
    """CSP bottleneck with 2 convs, sequential m-stack (ref block.py:213)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        for i in range(self.n):
            a = Bottleneck(c, self.shortcut, self.g, (3, 3), 1.0,
                           dtype=self.dtype, name=f"m{i}")(a, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate([a, b], -1), train)


class C3(nn.Module):
    """CSP bottleneck with 3 convs."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    k: tuple = ((1, 1), (3, 3))
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, self.g, (self.k[0][0], self.k[1][0]), 1.0,
                           dtype=self.dtype, name=f"m{i}")(a, train)
        b = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([a, b], -1), train)


class C3k(nn.Module):
    """C3 with configurable bottleneck kernel size k."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    k: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, self.g, (self.k, self.k), 1.0,
                           dtype=self.dtype, name=f"m{i}")(a, train)
        b = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([a, b], -1), train)


class C3k2(nn.Module):
    """C2f whose inner blocks are either C3k stacks or plain bottlenecks."""

    c2: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    g: int = 1
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    def inner(self, i: int):
        if self.c3k:
            return C3k(self.c, 2, self.shortcut, self.g, dtype=self.dtype, name=f"m{i}")
        # NOTE: e=0.5 (torch Bottleneck default) — unlike C2f which passes e=1.0
        return Bottleneck(self.c, self.shortcut, self.g, (3, 3), 0.5, dtype=self.dtype, name=f"m{i}")

    @property
    def c(self):
        return int(self.c2 * self.e)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(self.inner(i)(ys[-1], train))
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


class C3k2_CBAM(C3k2):
    """C3k2 with CBAM attention applied to the fused output (fork block.py:742)."""

    kernel_size: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(self.inner(i)(ys[-1], train))
        out = Conv(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)
        return CBAM(self.kernel_size, dtype=self.dtype, name="cbam")(out, train)


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): three cumulative k x k maxpools."""

    c2: int
    k: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = c1 // 2
        y = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        pad = self.k // 2
        pool = lambda t: nn.max_pool(t, (self.k, self.k), strides=(1, 1),
                                     padding=[(pad, pad), (pad, pad)])
        y1 = pool(y)
        y2 = pool(y1)
        y3 = pool(y2)
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([y, y1, y2, y3], -1), train)


# ---------------------------------------------------------------------------
# YOLOv13 fork blocks
# ---------------------------------------------------------------------------


def area_attention(q, k, v, num_heads: int, area: int):
    """Block-local multi-head attention over flattened spatial tokens.

    q,k,v: (B, N, C). The N tokens are split into `area` contiguous chunks and
    attention is computed within each chunk (folded into the batch dim — static
    shapes, XLA maps the matmuls straight onto the MXU).

    Semantics match reference AAttn (block.py:1254-1298); the flash-attn fp16 CUDA
    path is replaced by bf16-friendly einsum attention (Pallas kernel slot-in later).
    """
    B, N, C = q.shape
    hd = C // num_heads
    if area > 1:
        q = q.reshape(B * area, N // area, C)
        k = k.reshape(B * area, N // area, C)
        v = v.reshape(B * area, N // area, C)
    Ba, Na, _ = q.shape
    q = q.reshape(Ba, Na, num_heads, hd)
    k = k.reshape(Ba, Na, num_heads, hd)
    v = v.reshape(Ba, Na, num_heads, hd)
    scale = hd ** -0.5
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(Ba, Na, C)
    if area > 1:
        out = out.reshape(B, N, C)
    return out


class AAttn(nn.Module):
    """Area-attention: local attention within `area` spatial chunks + conv position bias.

    Reference: ultralytics/nn/modules/block.py:1213 (AAttn). On TPU the attention
    runs through the Pallas flash kernel (ops/pallas/flash_attention.py) — the
    TPU-native replacement for the CUDA flash_attn dependency; einsum fallback
    elsewhere (identical math, tested to 1e-6).
    """

    dim: int
    num_heads: int
    area: int = 1
    use_flash: bool | None = None  # None = auto (TPU backend)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        N = H * W
        qk = Conv(2 * C, 1, act=False, dtype=self.dtype, name="qk")(x, train)
        v = Conv(C, 1, act=False, dtype=self.dtype, name="v")(x, train)
        pe = Conv(C, 5, 1, 2, g=C, act=False, dtype=self.dtype, name="pe")(v, train)
        qk = qk.reshape(B, N, 2 * C)
        q, k = qk[..., :C], qk[..., C:]
        # Auto kernel selection (measured on the real chip, tools/v13_layer_profile.py):
        # the Pallas flash kernel pads head_dim 32 -> 128 lanes, wasting 4x MXU FLOPs,
        # so at short chunk lengths (640px: Na <= 400) the einsum form is ~1.6x faster
        # full-model (508 vs 835 us/img). Flash only pays once the (Na, Na) score
        # matrix is too large to materialize (large imgsz) — switch above 1024 tokens.
        if _AATTN_FORCE[-1] is not None:  # profiling A/B override (last wins)
            use_flash = _AATTN_FORCE[-1]
        elif self.use_flash is None:
            use_flash = jax.default_backend() == "tpu" and (N // self.area) > 1024
        else:
            use_flash = self.use_flash
        if use_flash:
            from sar_yolo_tpu.ops.pallas import flash_area_attention
            out = flash_area_attention(q, k, v.reshape(B, N, C), self.num_heads,
                                       self.area, interpret=False)
        else:
            out = area_attention(q, k, v.reshape(B, N, C), self.num_heads, self.area)
        out = out.reshape(B, H, W, C) + pe
        return Conv(C, 1, act=False, dtype=self.dtype, name="proj")(out, train)


class ABlock(nn.Module):
    """Area-attention block: attn + MLP, both residual (reference block.py:1301)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 1.2
    area: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + AAttn(self.dim, self.num_heads, self.area, dtype=self.dtype, name="attn")(x, train)
        hidden = int(self.dim * self.mlp_ratio)
        y = Conv(hidden, 1, dtype=self.dtype, name="mlp1")(x, train)
        y = Conv(self.dim, 1, act=False, dtype=self.dtype, name="mlp2")(y, train)
        return x + y


# AAttn kernel-select override for profiling A/Bs (tools/v13_layer_profile.py):
# push True (force Pallas flash) or False (force einsum) and pop when done.
# None = the measured auto-select above. Without this, an A/B at small imgsz
# silently times the einsum path twice.
_AATTN_FORCE: list = [None]


class A2C2f(nn.Module):
    """R-ELAN area-attention CSP block (reference block.py:1352).

    n stacked pairs of ABlocks (or C3k when a2=False), ELAN concat, optional
    layer-scaled residual (gamma init 0.01).
    """

    c2: int
    n: int = 1
    a2: bool = True
    area: int = 1
    residual: bool = False
    mlp_ratio: float = 2.0
    e: float = 0.5
    g: int = 1
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        assert c_ % 32 == 0, "A2C2f hidden dim must be a multiple of 32"
        num_heads = c_ // 32
        y = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y]
        for i in range(self.n):
            t = ys[-1]
            if self.a2:
                t = ABlock(c_, num_heads, self.mlp_ratio, self.area,
                           dtype=self.dtype, name=f"m{i}_0")(t, train)
                t = ABlock(c_, num_heads, self.mlp_ratio, self.area,
                           dtype=self.dtype, name=f"m{i}_1")(t, train)
            else:
                t = C3k(c_, 2, self.shortcut, self.g, dtype=self.dtype, name=f"m{i}")(t, train)
            ys.append(t)
        out = Conv(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)
        if self.a2 and self.residual:
            gamma = self.param("gamma", nn.initializers.constant(0.01), (self.c2,), jnp.float32)
            return x + gamma.astype(out.dtype) * out
        return out


class DSBottleneck(nn.Module):
    """Depthwise-separable bottleneck: DSConv(k1) -> DSConv(k2, dilation d2)."""

    c2: int
    shortcut: bool = True
    e: float = 0.5
    k1: int = 3
    k2: int = 5
    d2: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = DSConv(c_, self.k1, 1, dtype=self.dtype, name="cv1")(x, train)
        y = DSConv(self.c2, self.k2, 1, d=self.d2, dtype=self.dtype, name="cv2")(y, train)
        return x + y if self.shortcut and c1 == self.c2 else y


class DSC3k(nn.Module):
    """C3 with DSBottleneck inner blocks (reference block.py:1447)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    k1: int = 3
    k2: int = 5
    d2: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            a = DSBottleneck(c_, self.shortcut, 1.0, self.k1, self.k2, self.d2,
                             dtype=self.dtype, name=f"m{i}")(a, train)
        b = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([a, b], -1), train)


class DSC3k2(nn.Module):
    """C2f whose inner blocks are DSC3k stacks or DSBottlenecks (reference block.py:1505)."""

    c2: int
    n: int = 1
    dsc3k: bool = False
    e: float = 0.5
    g: int = 1
    shortcut: bool = True
    k1: int = 3
    k2: int = 7
    d2: int = 1
    dtype: Dtype = jnp.float32

    def inner(self, i: int, c: int):
        if self.dsc3k:
            return DSC3k(c, 2, self.shortcut, self.g, 1.0, self.k1, self.k2, self.d2,
                         dtype=self.dtype, name=f"m{i}")
        return DSBottleneck(c, self.shortcut, 1.0, self.k1, self.k2, self.d2,
                            dtype=self.dtype, name=f"m{i}")

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(self.inner(i, c)(ys[-1], train))
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


class DSC3k2_CBAM(DSC3k2):
    """DSC3k2 with CBAM on the output (fork block.py:1582)."""

    kernel_size: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(self.inner(i, c)(ys[-1], train))
        out = Conv(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)
        return CBAM(self.kernel_size, dtype=self.dtype, name="cbam")(out, train)


class AdaHyperedgeGen(nn.Module):
    """Adaptive hyperedge participation matrix generator (reference block.py:1624).

    Produces A (B, N, E): softmax over the *vertex* axis so each hyperedge's
    participation over nodes sums to 1 (matches reference F.softmax(logits, dim=1)).
    """

    node_dim: int
    num_hyperedges: int
    num_heads: int = 4
    dropout: float = 0.1
    context: str = "both"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, X, train: bool = False):
        B, N, D = X.shape
        E, h = self.num_hyperedges, self.num_heads
        hd = D // h
        proto_base = self.param("prototype_base", nn.initializers.xavier_uniform(), (E, D), jnp.float32)
        if self.context == "mean":
            ctx = jnp.mean(X, axis=1)
        elif self.context == "max":
            ctx = jnp.max(X, axis=1)
        else:
            ctx = jnp.concatenate([jnp.mean(X, axis=1), jnp.max(X, axis=1)], axis=-1)
        offsets = nn.Dense(E * D, dtype=self.dtype, param_dtype=jnp.float32,
                           name="context_net")(ctx).reshape(B, E, D)
        prototypes = proto_base.astype(offsets.dtype)[None] + offsets
        Xp = nn.Dense(D, dtype=self.dtype, param_dtype=jnp.float32, name="pre_head_proj")(X)
        Xh = Xp.reshape(B, N, h, hd)
        Ph = prototypes.reshape(B, E, h, hd)
        logits = jnp.einsum("bnhd,behd->bhne", Xh, Ph) / jnp.sqrt(hd).astype(Xh.dtype)
        logits = jnp.mean(logits, axis=1)  # (B, N, E)
        logits = nn.Dropout(self.dropout, deterministic=not train)(logits)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=1).astype(X.dtype)


class AdaHGConv(nn.Module):
    """Adaptive hypergraph conv: vertex->edge->vertex message passing + residual."""

    embed_dim: int
    num_hyperedges: int = 16
    num_heads: int = 4
    dropout: float = 0.1
    context: str = "both"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, X, train: bool = False):
        A = AdaHyperedgeGen(self.embed_dim, self.num_hyperedges, self.num_heads,
                            self.dropout, self.context, dtype=self.dtype,
                            name="edge_generator")(X, train)
        He = jnp.einsum("bne,bnd->bed", A, X)
        He = _gelu_exact(nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32,
                              name="edge_proj")(He))
        Xn = jnp.einsum("bne,bed->bnd", A, He)
        Xn = _gelu_exact(nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32,
                              name="node_proj")(Xn))
        return Xn + X


class AdaHGComputation(nn.Module):
    """Wrap AdaHGConv for NHWC maps: flatten -> hypergraph conv -> reshape."""

    embed_dim: int
    num_hyperedges: int = 16
    num_heads: int = 8
    dropout: float = 0.1
    context: str = "both"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        tokens = x.reshape(B, H * W, C)
        tokens = AdaHGConv(self.embed_dim, self.num_hyperedges, self.num_heads,
                           self.dropout, self.context, dtype=self.dtype,
                           name="hgnn")(tokens, train)
        return tokens.reshape(B, H, W, C)


class C3AH(nn.Module):
    """CSP block with an adaptive-hypergraph branch (reference block.py:1796)."""

    c2: int
    e: float = 1.0
    num_hyperedges: int = 8
    context: str = "both"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        assert c_ % 16 == 0, "C3AH hidden dim must be a multiple of 16"
        num_heads = c_ // 16
        a = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        a = AdaHGComputation(c_, self.num_hyperedges, num_heads, 0.1, self.context,
                             dtype=self.dtype, name="m")(a, train)
        b = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([a, b], -1), train)


def _avgpool2(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def _upsample2(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class FuseModule(nn.Module):
    """Align 3 (or 4) pyramid scales to the middle resolution and fuse by 1x1 conv.

    Reference block.py:1839. Channel counts are inferred from the concat (flax
    infers in-channels), which covers both the 3*c and 4*c reference cases.
    """

    c_in: int
    channel_adjust: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        if len(xs) == 3:
            cat = jnp.concatenate([_avgpool2(xs[0]), xs[1], _upsample2(xs[2])], axis=-1)
        else:  # 4-scale (P2..P5) variant
            cat = jnp.concatenate(
                [_avgpool2(_avgpool2(xs[0])), _avgpool2(xs[1]), xs[2], _upsample2(xs[3])], axis=-1)
        return Conv(self.c_in, 1, dtype=self.dtype, name="conv_out")(cat, train)


class HyperACE(nn.Module):
    """Hypergraph-based Adaptive Correlation Enhancement (reference block.py:1901).

    fuse(P3,P4,P5) -> split 3 ways -> two C3AH high-order branches + DSC3k
    low-order chain -> fuse with 1x1 conv.
    """

    c1: int
    c2: int
    n: int = 1
    num_hyperedges: int = 8
    dsc3k: bool = True
    shortcut: bool = False
    e1: float = 0.5
    e2: float = 1.0
    context: str = "both"
    channel_adjust: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        c = int(self.c2 * self.e1)
        x = FuseModule(self.c1, self.channel_adjust, dtype=self.dtype, name="fuse")(xs, train)
        y = Conv(3 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:2 * c], y[..., 2 * c:]]
        out1 = C3AH(c, self.e2, self.num_hyperedges, self.context,
                    dtype=self.dtype, name="branch1")(ys[1], train)
        out2 = C3AH(c, self.e2, self.num_hyperedges, self.context,
                    dtype=self.dtype, name="branch2")(ys[1], train)
        for i in range(self.n):
            if self.dsc3k:
                ys.append(DSC3k(c, 2, self.shortcut, 1, 0.5, 3, 7,
                                dtype=self.dtype, name=f"m{i}")(ys[-1], train))
            else:
                ys.append(DSBottleneck(c, self.shortcut, dtype=self.dtype,
                                       name=f"m{i}")(ys[-1], train))
        ys[1] = out1
        ys.append(out2)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


class DownsampleConv(nn.Module):
    """2x avg-pool downsample with optional channel doubling (reference block.py:1955)."""

    c1: int
    channel_adjust: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _avgpool2(x)
        if self.channel_adjust:
            x = Conv(self.c1 * 2, 1, dtype=self.dtype, name="channel_adjust")(x, train)
        return x


class FullPAD_Tunnel(nn.Module):
    """Gated residual fusion: out = x0 + gate * x1, scalar learnable gate init 0."""

    @nn.compact
    def __call__(self, xs, train: bool = False):
        gate = self.param("gate", nn.initializers.zeros, (), jnp.float32)
        return xs[0] + gate.astype(xs[0].dtype) * xs[1]


# ---------------------------------------------------------------------------
# PPHGNetV2 backbone blocks + RepC3 (RT-DETR family; reference block.py:104-176,
# RepC3 near :700)
# ---------------------------------------------------------------------------

from .conv import LightConv, RepConv  # noqa: E402


class HGStem(nn.Module):
    """PPHGNetV2 stem: 5 convs + maxpool branch (reference block.py:104)."""

    cm: int
    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        relu = nn.relu
        x = Conv(self.cm, 3, 2, act=relu, dtype=self.dtype, name="stem1")(x, train)
        xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = Conv(self.cm // 2, 2, 1, p=0, act=relu, dtype=self.dtype, name="stem2a")(xp, train)
        x2 = jnp.pad(x2, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x2 = Conv(self.cm, 2, 1, p=0, act=relu, dtype=self.dtype, name="stem2b")(x2, train)
        x1 = nn.max_pool(xp, (2, 2), strides=(1, 1))  # ceil-mode pool on padded map
        x = jnp.concatenate([x1, x2], -1)
        x = Conv(self.cm, 3, 2, act=relu, dtype=self.dtype, name="stem3")(x, train)
        return Conv(self.c2, 1, 1, act=relu, dtype=self.dtype, name="stem4")(x, train)


class HGBlock(nn.Module):
    """PPHGNetV2 block: n (Light)Convs, dense concat, squeeze+excitation convs."""

    cm: int
    c2: int
    k: int = 3
    n: int = 6
    lightconv: bool = False
    shortcut: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        relu = nn.relu
        ys = [x]
        for i in range(self.n):
            if self.lightconv:
                ys.append(LightConv(self.cm, self.k, dtype=self.dtype, name=f"m{i}")(ys[-1], train))
            else:
                ys.append(Conv(self.cm, self.k, act=relu, dtype=self.dtype, name=f"m{i}")(ys[-1], train))
        y = Conv(self.c2 // 2, 1, 1, act=relu, dtype=self.dtype, name="sc")(
            jnp.concatenate(ys, -1), train)
        y = Conv(self.c2, 1, 1, act=relu, dtype=self.dtype, name="ec")(y, train)
        return y + x if self.shortcut and x.shape[-1] == self.c2 else y


class RepC3(nn.Module):
    """CSP block with RepConv body (reference block.py RepC3)."""

    c2: int
    n: int = 3
    e: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            a = RepConv(c_, dtype=self.dtype, name=f"m{i}")(a, train)
        b = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        y = a + b
        if c_ != self.c2:
            y = Conv(self.c2, 1, dtype=self.dtype, name="cv3")(y, train)
        return y


# ---------------------------------------------------------------------------
# YOLO11/YOLOv10 attention blocks (reference block.py:905-1140)
# ---------------------------------------------------------------------------


class YoloAttention(nn.Module):
    """Conv-qkv multi-head self-attention with depthwise positional bias
    (reference Attention:905). key_dim = head_dim * attn_ratio."""

    dim: int
    num_heads: int = 8
    attn_ratio: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        N = H * W
        hd = C // self.num_heads
        kd = int(hd * self.attn_ratio)
        nh_kd = kd * self.num_heads
        qkv = Conv(C + 2 * nh_kd, 1, act=False, dtype=self.dtype, name="qkv")(x, train)
        t = qkv.reshape(B, N, self.num_heads, 2 * kd + hd)
        q, k, v = t[..., :kd], t[..., kd:2 * kd], t[..., 2 * kd:]
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (kd ** -0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, H, W, C)
        pe = Conv(C, 3, 1, g=C, act=False, dtype=self.dtype, name="pe")(
            v.reshape(B, H, W, C), train)
        return Conv(C, 1, act=False, dtype=self.dtype, name="proj")(out + pe, train)


class PSABlock(nn.Module):
    """Attention + FFN with shortcuts (reference PSABlock:962)."""

    c: int
    attn_ratio: float = 0.5
    num_heads: int = 4
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = YoloAttention(self.c, self.num_heads, self.attn_ratio,
                          dtype=self.dtype, name="attn")(x, train)
        x = x + a if self.shortcut else a
        f = Conv(self.c * 2, 1, dtype=self.dtype, name="ffn1")(x, train)
        f = Conv(self.c, 1, act=False, dtype=self.dtype, name="ffn2")(f, train)
        return x + f if self.shortcut else f


class PSA(nn.Module):
    """Position-sensitive attention CSP block (reference PSA:998)."""

    c2: int
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        b = PSABlock(c, 0.5, max(c // 64, 1), dtype=self.dtype, name="m")(b, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate([a, b], -1), train)


class C2PSA(nn.Module):
    """Stacked PSABlocks in a CSP wrapper (reference C2PSA:1041)."""

    c2: int
    n: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        for i in range(self.n):
            b = PSABlock(c, 0.5, max(c // 64, 1), dtype=self.dtype, name=f"m{i}")(b, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate([a, b], -1), train)


class SCDown(nn.Module):
    """Separable-conv downsample (reference SCDown:1115, v10)."""

    c2: int
    k: int = 3
    s: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(self.c2, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        return Conv(self.c2, self.k, self.s, g=self.c2, act=False,
                    dtype=self.dtype, name="cv2")(x, train)


class RepVGGDW(nn.Module):
    """Parallel 7x7 + 3x3 depthwise convs, summed then SiLU (reference
    block.py:784 RepVGGDW, the v10 CIB large-kernel branch). Deploy fusion
    (`nn/fuse.py`) folds both + their BNs into one biased 7x7 dw conv."""

    ed: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .conv import _FUSED, conv_init
        if _FUSED[-1]:
            y = nn.Conv(self.ed, (7, 7), (1, 1), [(3, 3), (3, 3)],
                        feature_group_count=self.ed, use_bias=True, dtype=self.dtype,
                        param_dtype=jnp.float32, kernel_init=conv_init, name="conv")(x)
            return nn.silu(y)
        y7 = Conv(self.ed, 7, 1, 3, g=self.ed, act=False, dtype=self.dtype,
                  name="conv")(x, train)
        y3 = Conv(self.ed, 3, 1, 1, g=self.ed, act=False, dtype=self.dtype,
                  name="conv1")(x, train)
        return nn.silu(y7 + y3)


class CIB(nn.Module):
    """Compact Inverted Block (reference block.py CIB, YOLOv10): dw -> pw-expand
    -> [large-kernel dw | dw] -> pw -> dw, residual when channels match."""

    c2: int
    shortcut: bool = True
    e: float = 0.5
    lk: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = Conv(c1, 3, g=c1, dtype=self.dtype, name="cv1_0")(x, train)
        y = Conv(2 * c_, 1, dtype=self.dtype, name="cv1_1")(y, train)
        if self.lk:
            y = RepVGGDW(2 * c_, dtype=self.dtype, name="cv1_2")(y, train)
        else:
            y = Conv(2 * c_, 3, g=2 * c_, dtype=self.dtype, name="cv1_2")(y, train)
        y = Conv(self.c2, 1, dtype=self.dtype, name="cv1_3")(y, train)
        y = Conv(self.c2, 3, g=self.c2, dtype=self.dtype, name="cv1_4")(y, train)
        return x + y if self.shortcut and c1 == self.c2 else y


class C2fCIB(nn.Module):
    """C2f with CIB inner blocks (reference block.py C2fCIB, YOLOv10)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    lk: bool = False
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(CIB(c, self.shortcut, 1.0, self.lk,
                          dtype=self.dtype, name=f"m{i}")(ys[-1], train))
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


class SPP(nn.Module):
    """Classic spatial pyramid pooling with parallel k-sized maxpools (ref block.py:159)."""

    c2: int
    k: tuple = (5, 9, 13)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        y = Conv(c1 // 2, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y]
        for k in self.k:
            pad = [(k // 2, k // 2)] * 2
            ys.append(nn.max_pool(y, (k, k), strides=(1, 1), padding=pad))
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


class MaxSigmoidAttnBlock(nn.Module):
    """Text-guided max-sigmoid attention (ref block.py:418): per-head similarity
    of image features against guide embeddings, max over prompts, sigmoid-gated."""

    c2: int
    nh: int = 1
    ec: int = 128
    gc: int = 512
    scale: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, guide, train: bool = False):
        B, H, W, c1 = x.shape
        hc = self.c2 // self.nh
        g = nn.Dense(self.ec, dtype=self.dtype, param_dtype=jnp.float32, name="gl")(guide)
        g = g.reshape(B, -1, self.nh, self.ec // self.nh)           # (B, n, nh, hc_e)
        embed = Conv(self.ec, 1, act=False, dtype=self.dtype, name="ec")(x, train) \
            if c1 != self.ec else x
        e = embed.reshape(B, H, W, self.nh, self.ec // self.nh)
        aw = jnp.einsum("bhwmc,bnmc->bmhwn", e, g)                  # (B, nh, H, W, n)
        aw = aw.max(-1) / jnp.sqrt(self.ec // self.nh).astype(aw.dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.nh,), jnp.float32)
        aw = aw + bias[None, :, None, None].astype(aw.dtype)
        aw = jax.nn.sigmoid(aw)
        if self.scale:
            sc = self.param("scale", nn.initializers.ones, (1, self.nh, 1, 1), jnp.float32)
            aw = aw * sc.astype(aw.dtype)
        y = Conv(self.c2, 3, act=False, dtype=self.dtype, name="proj_conv")(x, train)
        y = y.reshape(B, H, W, self.nh, hc) * aw.transpose(0, 2, 3, 1)[..., None]
        return y.reshape(B, H, W, self.c2)


class C2fAttn(nn.Module):
    """C2f with a text-guided MaxSigmoidAttnBlock branch (ref block.py:453)."""

    c2: int
    n: int = 1
    ec: int = 128
    nh: int = 1
    gc: int = 512
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, guide, train: bool = False):
        c = int(self.c2 * self.e)
        y = Conv(2 * c, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(Bottleneck(c, self.shortcut, self.g, (3, 3), 1.0,
                                 dtype=self.dtype, name=f"m{i}")(ys[-1], train))
        ys.append(MaxSigmoidAttnBlock(c, self.nh, self.ec, self.gc,
                                      dtype=self.dtype, name="attn")(ys[-1], guide, train))
        return Conv(self.c2, 1, dtype=self.dtype, name="cv2")(jnp.concatenate(ys, -1), train)


def _adaptive_max_pool(x, k: int):
    """AdaptiveMaxPool2d((k, k)) on NHWC with static shapes: per-cell slice max."""
    B, H, W, C = x.shape
    rows = []
    for i in range(k):
        h0, h1 = (i * H) // k, -(-((i + 1) * H) // k)
        cols = []
        for j in range(k):
            w0, w1 = (j * W) // k, -(-((j + 1) * W) // k)
            cols.append(x[:, h0:h1, w0:w1].max((1, 2)))
        rows.append(jnp.stack(cols, 1))
    return jnp.stack(rows, 1)  # (B, k, k, C)


class ImagePoolingAttn(nn.Module):
    """Image-conditioned text-embedding update (ref block.py:480): pooled
    multi-level image patches attend into the text features."""

    ec: int = 256
    ch: tuple = ()
    ct: int = 512
    nh: int = 8
    k: int = 3
    scale: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, text, train: bool = False):
        B = xs[0].shape[0]
        hc = self.ec // self.nh
        patches = []
        for i, x in enumerate(xs):
            p = nn.Conv(self.ec, (1, 1), use_bias=True, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"projections_{i}")(x)
            patches.append(_adaptive_max_pool(p, self.k).reshape(B, self.k * self.k, self.ec))
        img = jnp.concatenate(patches, 1)                            # (B, nf*k^2, ec)
        ln = lambda n: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                    param_dtype=jnp.float32, name=n)
        fc = lambda d, n: nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32, name=n)
        q = fc(self.ec, "query_fc")(ln("query_ln")(text))
        kk = fc(self.ec, "key_fc")(ln("key_ln")(img))
        v = fc(self.ec, "value_fc")(ln("value_ln")(img))
        q = q.reshape(B, -1, self.nh, hc)
        kk = kk.reshape(B, -1, self.nh, hc)
        v = v.reshape(B, -1, self.nh, hc)
        aw = jnp.einsum("bnmc,bkmc->bmnk", q, kk) / jnp.sqrt(hc).astype(q.dtype)
        aw = jax.nn.softmax(aw.astype(jnp.float32), -1).astype(v.dtype)
        o = jnp.einsum("bmnk,bkmc->bnmc", aw, v).reshape(B, -1, self.ec)
        o = fc(self.ct, "proj")(o)
        if self.scale:
            sc = self.param("scale", nn.initializers.zeros, (1,), jnp.float32)
            o = o * sc.astype(o.dtype)
        return o + text


class ResNetBlock(nn.Module):
    """Bottleneck ResNet block (ref block.py:379): 1x1 -> 3x3/s -> 1x1(e*c2),
    relu(residual) — the reference's inner convs keep YOLO's default act.
    e=1 selects the two-3x3 BasicBlock form (resnet18/34-style; the reference
    reaches it only through its TorchVision wrapper, cfg/models/11/
    yolo11-cls-resnet18.yaml)."""

    c2: int
    s: int = 1
    e: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c3 = self.e * self.c2
        if self.e == 1:  # BasicBlock: 3x3/s -> 3x3, identity/1x1 shortcut
            y = Conv(self.c2, 3, self.s, p=1, dtype=self.dtype, name="cv1")(x, train)
            y = Conv(c3, 3, 1, p=1, act=False, dtype=self.dtype, name="cv2")(y, train)
        else:
            y = Conv(self.c2, 1, 1, dtype=self.dtype, name="cv1")(x, train)
            y = Conv(self.c2, 3, self.s, p=1, dtype=self.dtype, name="cv2")(y, train)
            y = Conv(c3, 1, act=False, dtype=self.dtype, name="cv3")(y, train)
        if self.s != 1 or c1 != c3:
            x = Conv(c3, 1, self.s, act=False, dtype=self.dtype, name="shortcut_0")(x, train)
        return nn.relu(y + x)


class ResNetLayer(nn.Module):
    """ResNet stage (ref block.py:396): 7x7/2+maxpool stem when is_first, else a
    stack of n ResNetBlocks. yaml args (c1, c2, s, is_first, n); c1 inferred."""

    c1: int
    c2: int
    s: int = 1
    is_first: bool = False
    n: int = 1
    e: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.is_first:
            x = Conv(self.c2, 7, 2, p=3, dtype=self.dtype, name="layer_0")(x, train)
            return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        x = ResNetBlock(self.c2, self.s, self.e, dtype=self.dtype, name="layer_0")(x, train)
        for j in range(1, self.n):
            x = ResNetBlock(self.c2, 1, self.e, dtype=self.dtype, name=f"layer_{j}")(x, train)
        return x


class GhostBottleneck(nn.Module):
    """Ghost bottleneck (ref block.py:320): pw ghost -> (dw if s=2) -> linear ghost,
    with a dw+pw shortcut on stride-2."""

    c2: int
    k: int = 3
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .conv import DWConv, GhostConv
        c_ = self.c2 // 2
        y = GhostConv(c_, 1, 1, dtype=self.dtype, name="conv_0")(x, train)
        if self.s == 2:
            y = DWConv(c_, self.k, self.s, act=False, dtype=self.dtype, name="conv_1")(y, train)
        y = GhostConv(self.c2, 1, 1, act=False, dtype=self.dtype, name="conv_2")(y, train)
        if self.s == 2:
            sc = DWConv(x.shape[-1], self.k, self.s, act=False, dtype=self.dtype,
                        name="shortcut_0")(x, train)
            sc = Conv(self.c2, 1, 1, act=False, dtype=self.dtype, name="shortcut_1")(sc, train)
        else:
            sc = x
        return y + sc


class C3Ghost(nn.Module):
    """C3 with GhostBottleneck inner blocks (ref block.py C3Ghost)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            a = GhostBottleneck(c_, dtype=self.dtype, name=f"m{i}")(a, train)
        b = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([a, b], -1), train)


# ---- YOLOv9 (GELAN) blocks: ref block.py:569-711 ----------------------------------


class RepBottleneck(nn.Module):
    """Bottleneck whose first conv is a RepConv (ref block.py:569)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    k: tuple = (3, 3)
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .conv import RepConv
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = RepConv(c_, self.k[0], 1, dtype=self.dtype, name="cv1")(x, train)
        y = Conv(self.c2, self.k[1], 1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        return x + y if self.shortcut and c1 == self.c2 else y


class RepCSP(nn.Module):
    """C3 variant with RepBottleneck inner blocks (ref block.py RepCSP)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a = Conv(c_, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            a = RepBottleneck(c_, self.shortcut, self.g, (3, 3), 1.0,
                              dtype=self.dtype, name=f"m{i}")(a, train)
        b = Conv(c_, 1, 1, dtype=self.dtype, name="cv2")(x, train)
        return Conv(self.c2, 1, dtype=self.dtype, name="cv3")(jnp.concatenate([a, b], -1), train)


class RepNCSPELAN4(nn.Module):
    """CSP-ELAN aggregation block (ref block.py:589): split, two RepCSP+Conv stages,
    4-way concat fuse."""

    c2: int
    c3: int = 64
    c4: int = 32
    n: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c3 // 2
        y = Conv(self.c3, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        z = RepCSP(self.c4, self.n, dtype=self.dtype, name="cv2_0")(ys[-1], train)
        ys.append(Conv(self.c4, 3, 1, dtype=self.dtype, name="cv2_1")(z, train))
        z = RepCSP(self.c4, self.n, dtype=self.dtype, name="cv3_0")(ys[-1], train)
        ys.append(Conv(self.c4, 3, 1, dtype=self.dtype, name="cv3_1")(z, train))
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv4")(jnp.concatenate(ys, -1), train)


class ELAN1(nn.Module):
    """Light ELAN with plain 3x3 convs in place of RepCSP stages (ref block.py:614)."""

    c2: int
    c3: int = 32
    c4: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c3 // 2
        y = Conv(self.c3, 1, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        ys.append(Conv(self.c4, 3, 1, dtype=self.dtype, name="cv2")(ys[-1], train))
        ys.append(Conv(self.c4, 3, 1, dtype=self.dtype, name="cv3")(ys[-1], train))
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv4")(jnp.concatenate(ys, -1), train)


class AConv(nn.Module):
    """2x2 stride-1 avgpool then 3x3 stride-2 conv downsample (ref block.py:627)."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.avg_pool(x, (2, 2), strides=(1, 1), padding="VALID")
        return Conv(self.c2, 3, 2, 1, dtype=self.dtype, name="cv1")(x, train)


class ADown(nn.Module):
    """Dual-branch downsample: avg+conv on one channel half, max+1x1 on the other
    (ref block.py:641)."""

    c2: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.c2 // 2
        x = nn.avg_pool(x, (2, 2), strides=(1, 1), padding="VALID")
        half = x.shape[-1] // 2
        x1, x2 = x[..., :half], x[..., half:]
        x1 = Conv(c, 3, 2, 1, dtype=self.dtype, name="cv1")(x1, train)
        x2 = nn.max_pool(x2, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        x2 = Conv(c, 1, 1, 0, dtype=self.dtype, name="cv2")(x2, train)
        return jnp.concatenate([x1, x2], -1)


class SPPELAN(nn.Module):
    """SPP-ELAN: 1x1 squeeze, three cumulative maxpools, 1x1 fuse (ref block.py:661)."""

    c2: int
    c3: int = 64
    k: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = [(self.k // 2, self.k // 2)] * 2
        ys = [Conv(self.c3, 1, 1, dtype=self.dtype, name="cv1")(x, train)]
        for _ in range(3):
            ys.append(nn.max_pool(ys[-1], (self.k, self.k), strides=(1, 1), padding=pad))
        return Conv(self.c2, 1, 1, dtype=self.dtype, name="cv5")(jnp.concatenate(ys, -1), train)


class CBLinear(nn.Module):
    """Cross-branch linear tap: one biased conv whose output is split into per-level
    chunks consumed by CBFuse (ref block.py:681)."""

    c2s: tuple
    k: int = 1
    s: int = 1
    g: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.k // 2
        y = nn.Conv(sum(self.c2s), (self.k, self.k), (self.s, self.s),
                    [(pad, pad), (pad, pad)], feature_group_count=self.g, use_bias=True,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        outs, off = [], 0
        for c in self.c2s:
            outs.append(y[..., off:off + c])
            off += c
        return tuple(outs)


class CBFuse(nn.Module):
    """Fuse selected CBLinear chunks by nearest-resize to the last input's grid and
    summation (ref block.py:695)."""

    idx: tuple

    @nn.compact
    def __call__(self, xs, train: bool = False):
        target = xs[-1]
        h, w = target.shape[1], target.shape[2]
        acc = target
        for i, x in enumerate(xs[:-1]):
            sel = x[self.idx[i]]
            if sel.shape[1] != h or sel.shape[2] != w:
                sel = jax.image.resize(sel, (sel.shape[0], h, w, sel.shape[3]), "nearest")
            acc = acc + sel
        return acc
