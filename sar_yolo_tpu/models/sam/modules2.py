"""SAM2 modules, TPU-native: Hiera trunk, FPN neck, SAM2 mask decoder with
high-res skip features + object scores, memory encoder/attention for video.

Capability parity with reference models/sam/modules/: encoders.py (Hiera:645,
FpnNeck:501, ImageEncoder:446, MemoryEncoder:378), blocks.py
(MultiScaleBlock:583, MultiScaleAttention:503, CXBlock:114, Fuser:208,
MaskDownSampler:54, RoPEAttention:405), decoders.py (SAM2MaskDecoder:176),
memory_attention.py (MemoryAttentionLayer:12, MemoryAttention:139) and
sam.py (SAM2Model).

TPU-native notes:
  * the video memory bank is a FIXED-size ring buffer (num_maskmem slots) with
    a validity mask — propagation over frames is a static-shape step function
    suitable for lax.scan / jit (the reference keeps a dynamic python dict);
  * axial RoPE is precomputed per static grid size and applied as two einsum
    rotations — no gathers;
  * q-pooling in Hiera is a maxpool reshape, window partition static.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .modules import (MLP, DownsampleAttention, PromptEncoder, TwoWayTransformer,
                      window_partition, window_unpartition)

Dtype = Any


def _interp_matrix_torch_bicubic(n_in: int, n_out: int):
    """(n_out, n_in) 1-D interpolation matrix matching torch F.interpolate
    bicubic (A=-0.75, align_corners=False, border replicate). Built in numpy at
    trace time — static shapes make the resize two constant matmuls on device.
    """
    import numpy as np

    A = -0.75

    def k(x):
        x = abs(x)
        if x <= 1:
            return (A + 2) * x ** 3 - (A + 3) * x ** 2 + 1
        if x < 2:
            return A * x ** 3 - 5 * A * x ** 2 + 8 * A * x - 4 * A
        return 0.0

    M = np.zeros((n_out, n_in), np.float32)
    scale = n_in / n_out
    for o in range(n_out):
        src = (o + 0.5) * scale - 0.5
        i0 = math.floor(src)
        t = src - i0
        for tap, d in enumerate((-1, 0, 1, 2)):
            M[o, min(max(i0 + d, 0), n_in - 1)] += k(d - t)
    return jnp.asarray(M)


def resize_bicubic_torch(x, size):
    """NHWC resize with torch-bicubic semantics (used for the Hiera absolute
    position embedding, reference encoders.py Hiera._get_pos_embed)."""
    H, W = size
    if x.shape[1:3] == (H, W):
        return x
    Mh = _interp_matrix_torch_bicubic(x.shape[1], H)
    Mw = _interp_matrix_torch_bicubic(x.shape[2], W)
    return jnp.einsum("oh,bhwc,pw->bopc", Mh, x, Mw)


class MultiScaleAttention(nn.Module):
    """Attention with optional 2x query pooling (reference blocks.py:503)."""

    dim_out: int
    num_heads: int
    q_pool: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, _ = x.shape
        nh = self.num_heads
        hd = self.dim_out // nh
        qkv = nn.Dense(3 * self.dim_out, dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(x).reshape(B, H * W, 3, nh, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.q_pool:
            q = nn.max_pool(q.reshape(B, H, W, nh * hd), (2, 2), strides=(2, 2))
            H, W = q.shape[1:3]
            q = q.reshape(B, H * W, nh, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, H, W, self.dim_out)
        return nn.Dense(self.dim_out, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(out)


class MultiScaleBlock(nn.Module):
    """Hiera block: windowed attention + optional stage-change pooling
    (reference blocks.py:583)."""

    dim: int
    dim_out: int
    num_heads: int
    mlp_ratio: float = 4.0
    q_pool: bool = False
    window_size: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm1")(x)
        if self.dim != self.dim_out:
            shortcut = nn.Dense(self.dim_out, dtype=self.dtype, param_dtype=jnp.float32,
                                name="proj")(x)
            if self.q_pool:
                shortcut = nn.max_pool(shortcut, (2, 2), strides=(2, 2))
        elif self.q_pool:
            shortcut = nn.max_pool(shortcut, (2, 2), strides=(2, 2))

        H, W = x.shape[1:3]
        ws = self.window_size
        if ws > 0:
            x, pad_hw = window_partition(x, ws)
        x = MultiScaleAttention(self.dim_out, self.num_heads, q_pool=self.q_pool,
                                dtype=self.dtype, name="attn")(x)
        if self.q_pool:
            ws = self.window_size // 2 if ws > 0 else 0
            H, W = H // 2, W // 2
            pad_hw = (H + (ws - H % ws) % ws, W + (ws - W % ws) % ws) if ws else None
        if self.window_size > 0:
            x = window_unpartition(x, ws, pad_hw, (H, W))
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm2")(x)
        y = nn.Dense(int(self.dim_out * self.mlp_ratio), dtype=self.dtype,
                     param_dtype=jnp.float32, name="mlp_lin1")(y)
        y = nn.Dense(self.dim_out, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_lin2")(nn.gelu(y))
        return x + y


class Hiera(nn.Module):
    """Hierarchical ViT trunk (reference encoders.py:645). Returns the 4 stage
    outputs NHWC at strides 4/8/16/32."""

    embed_dim: int = 96
    num_heads: int = 1
    stages: tuple = (2, 3, 16, 3)
    window_spec: tuple = (8, 4, 14, 7)
    global_att_blocks: tuple = (12, 16, 20)
    window_pos_bkg: tuple = (14, 14)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.embed_dim, (7, 7), strides=4, padding=3, dtype=self.dtype,
                    param_dtype=jnp.float32, name="patch_embed")(x)
        H, W = x.shape[1:3]
        pos_bkg = self.param("pos_embed", nn.initializers.zeros,
                             (1, *self.window_pos_bkg, self.embed_dim), jnp.float32)
        pos_win = self.param("pos_embed_window", nn.initializers.zeros,
                             (1, self.window_spec[0], self.window_spec[0],
                              self.embed_dim), jnp.float32)
        pos = resize_bicubic_torch(pos_bkg, (H, W))
        pos = pos + jnp.tile(pos_win, (1, H // pos_win.shape[1], W // pos_win.shape[2], 1))
        x = x + pos.astype(x.dtype)

        stage_ends = [sum(self.stages[:i]) - 1 for i in range(1, len(self.stages) + 1)]
        q_pool_blocks = [e + 1 for e in stage_ends[:-1]]
        dim, heads = self.embed_dim, self.num_heads
        cur_stage = 1
        outs = []
        for i in range(sum(self.stages)):
            window = self.window_spec[cur_stage - 1]
            if i in self.global_att_blocks:
                window = 0
            dim_out = dim
            if i - 1 in stage_ends:
                dim_out = dim * 2
                heads = heads * 2
                cur_stage += 1
            x = MultiScaleBlock(dim, dim_out, heads, q_pool=i in q_pool_blocks,
                                window_size=window, dtype=self.dtype,
                                name=f"block_{i}")(x)
            dim = dim_out
            if i in stage_ends:
                outs.append(x)
        return outs


def sine_pos_encoding(h: int, w: int, dim: int = 256, temperature: int = 10000):
    """2D sine positional encoding (reference PositionEmbeddingSine:698),
    (h, w, dim)."""
    ys = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None].repeat(w, 1)
    xs = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :].repeat(h, 0)
    eps = 1e-6
    ys = ys / (ys[-1:, :] + eps) * 2 * math.pi
    xs = xs / (xs[:, -1:] + eps) * 2 * math.pi
    t = temperature ** (2 * (jnp.arange(dim // 2) // 2) / (dim // 2))
    px = xs[..., None] / t
    py = ys[..., None] / t
    px = jnp.stack([jnp.sin(px[..., 0::2]), jnp.cos(px[..., 1::2])], -1).reshape(h, w, -1)
    py = jnp.stack([jnp.sin(py[..., 0::2]), jnp.cos(py[..., 1::2])], -1).reshape(h, w, -1)
    return jnp.concatenate([py, px], -1)


class FpnNeck(nn.Module):
    """FPN neck over Hiera stage outputs (reference encoders.py:501): lateral
    1x1 convs to d_model; top-down sum on the configured levels."""

    d_model: int = 256
    backbone_channel_list: tuple = (768, 384, 192, 96)   # low-res -> high-res
    fpn_top_down_levels: tuple = (2, 3)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xs):
        """xs: Hiera outputs high-res->low-res (stride 4..32); returns
        (feats, pos) same order."""
        n = len(xs) - 1
        out = [None] * len(xs)
        pos = [None] * len(xs)
        prev = None
        for i in range(n, -1, -1):
            lat = nn.Conv(self.d_model, (1, 1), dtype=self.dtype,
                          param_dtype=jnp.float32, name=f"conv_{n - i}")(xs[i])
            if i in self.fpn_top_down_levels and prev is not None:
                # reference fpn_interp_model="nearest" (build.py:259): a 2x
                # nearest upsample is a pure repeat — exact and gather-free
                up = jnp.repeat(jnp.repeat(prev, 2, axis=1), 2, axis=2)
                prev = lat + up.astype(lat.dtype)
            else:
                prev = lat
            out[i] = prev
            pos[i] = sine_pos_encoding(prev.shape[1], prev.shape[2],
                                       self.d_model).astype(prev.dtype)[None]
        return out, pos


class SAM2MaskDecoder(nn.Module):
    """Mask decoder with object-score token and high-res skip features
    (reference decoders.py:176). Returns (masks (B, 4, 4h, 4w), iou (B, 4),
    mask_tokens_out (B, 4, C), obj_score (B, 1))."""

    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt, dense_prompt,
                 high_res_features=None):
        n_tokens = self.num_multimask_outputs + 1
        C = self.transformer_dim
        obj_token = self.param("obj_score_token", nn.initializers.normal(1.0), (1, C),
                               jnp.float32)
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, C),
                               jnp.float32)
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (n_tokens, C), jnp.float32)
        B = sparse_prompt.shape[0]
        out_tokens = jnp.broadcast_to(
            jnp.concatenate([obj_token, iou_token, mask_tokens], 0)[None],
            (B, 2 + n_tokens, C))
        tokens = jnp.concatenate([out_tokens, sparse_prompt.astype(out_tokens.dtype)], 1)

        src = jnp.broadcast_to(image_embeddings,
                               (B,) + image_embeddings.shape[1:]) + dense_prompt
        posb = jnp.broadcast_to(image_pe, (B,) + image_pe.shape[1:])
        h, w = src.shape[1:3]
        hs, src = TwoWayTransformer(dtype=self.dtype, embedding_dim=C,
                                    name="transformer")(src, posb, tokens)
        obj_out, iou_out = hs[:, 0], hs[:, 1]
        mask_out = hs[:, 2:2 + n_tokens]

        src = src.reshape(B, h, w, C)
        # transpose_kernel=True: torch ConvTranspose2d orientation (convert.py)
        up = nn.ConvTranspose(C // 4, (2, 2), strides=(2, 2), transpose_kernel=True,
                              dtype=self.dtype,
                              param_dtype=jnp.float32, name="upscale_conv1")(src)
        if high_res_features is not None:  # skip connections from the trunk
            up = up + jnp.broadcast_to(high_res_features[1], (B,) + high_res_features[1].shape[1:])
        up = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32,
                          name="upscale_ln")(up)
        up = nn.gelu(up)
        up = nn.ConvTranspose(C // 8, (2, 2), strides=(2, 2), transpose_kernel=True,
                              dtype=self.dtype,
                              param_dtype=jnp.float32, name="upscale_conv2")(up)
        if high_res_features is not None:
            up = up + jnp.broadcast_to(high_res_features[0], (B,) + high_res_features[0].shape[1:])
        up = nn.gelu(up)

        hyper = jnp.stack([MLP(C, C // 8, 3, dtype=self.dtype,
                               name=f"hyper_mlp_{i}")(mask_out[:, i])
                           for i in range(n_tokens)], 1)
        masks = jnp.einsum("bnc,bhwc->bnhw", hyper, up)
        iou_pred = MLP(256, n_tokens, 3, sigmoid_output=True, dtype=self.dtype,
                       name="iou_head")(iou_out)
        obj_score = MLP(C, 1, 3, dtype=self.dtype, name="obj_score_head")(obj_out)
        return masks, iou_pred, mask_out, obj_score


# ----------------------------------------------------------------- memory
class MaskDownSampler(nn.Module):
    """Downsample masks 16x into the memory embedding space
    (reference blocks.py:54): 4 stride-2 convs + LN + GELU, then 1x1."""

    embed_dim: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, m):
        ch = 1
        for i in range(4):
            ch *= 4  # reference ramp: 4, 16, 64, 256 (stride-2 k3 per layer)
            m = nn.Conv(min(ch, 256), (3, 3), strides=2, padding=1, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"conv_{i}")(m)
            m = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"ln_{i}")(m)
            m = nn.gelu(m)
        return nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32, name="proj")(m)


class CXBlock(nn.Module):
    """ConvNeXt block (reference blocks.py:114): dw 7x7 + LN + MLP + layer scale."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x
        x = nn.Conv(self.dim, (7, 7), padding=3, feature_group_count=self.dim,
                    dtype=self.dtype, param_dtype=jnp.float32, name="dwconv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="pwconv1")(x)
        x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="pwconv2")(nn.gelu(x))
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (self.dim,),
                           jnp.float32)
        return inp + gamma * x


class MemoryEncoder(nn.Module):
    """Fuse pixel features with predicted masks into memory features
    (reference encoders.py:378). Returns (B, h, w, out_dim=64)."""

    out_dim: int = 64
    in_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, pix_feat, masks):
        """pix_feat (B, h, w, 256); masks (B, 16h, 16w, 1) sigmoid-scaled."""
        m = MaskDownSampler(self.in_dim, dtype=self.dtype, name="mask_downsampler")(masks)
        x = nn.Conv(self.in_dim, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="pix_feat_proj")(pix_feat)
        x = x + m
        for i in range(2):
            x = CXBlock(self.in_dim, dtype=self.dtype, name=f"fuser_{i}")(x)
        return nn.Conv(self.out_dim, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                       name="out_proj")(x)


def _axial_rope(x, h: int, w: int, theta: float = 10000.0):
    """Axial rotary embedding over an (h*w)-token grid (reference
    RoPEAttention blocks.py:405 / utils.py compute_axial_cis).

    x: (B, N, nh, hd) with N = h*w (+ optional trailing tokens left unrotated
    by callers). Pairs of channels rotate by x-angle for the first hd/4 pairs
    and y-angle for the second hd/4 (reference compute_axial_cis
    cat([cis_x, cis_y]); tokens row-major with x fastest, utils.py init_t_xy).
    """
    B, N, nh, hd = x.shape
    quarter = hd // 4
    fy = 1.0 / (theta ** (jnp.arange(quarter, dtype=jnp.float32) / quarter))
    fx = fy
    ys = jnp.arange(h, dtype=jnp.float32)[:, None].repeat(w, 1).reshape(-1)
    xs = jnp.arange(w, dtype=jnp.float32)[None, :].repeat(h, 0).reshape(-1)
    ang = jnp.concatenate([xs[:, None] * fx[None], ys[:, None] * fy[None]], -1)  # (hw, hd/2)
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    cos = jnp.tile(cos[None, :, None, :], (1, 1, 1, 1))
    sin = jnp.tile(sin[None, :, None, :], (1, 1, 1, 1))
    x2 = x.reshape(B, N, nh, hd // 2, 2)
    xr = x2[..., 0] * cos - x2[..., 1] * sin
    xi = x2[..., 0] * sin + x2[..., 1] * cos
    return jnp.stack([xr, xi], -1).reshape(B, N, nh, hd)


class RoPEAttention(nn.Module):
    """Attention with axial rotary position on grid tokens (reference
    blocks.py:405). Trailing `n_skip_k` key tokens (object pointers) are
    excluded from rotation; for memories the grid rope repeats over frames."""

    embedding_dim: int
    num_heads: int = 1
    kv_in_dim: int | None = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, grid_hw, n_skip_k: int = 0, key_mask=None):
        C = self.embedding_dim
        nh = self.num_heads
        hd = C // nh
        dense = lambda n: nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name=n)
        qh = dense("q_proj")(q).reshape(*q.shape[:2], nh, hd)
        kh = dense("k_proj")(k).reshape(*k.shape[:2], nh, hd)
        vh = dense("v_proj")(v).reshape(*v.shape[:2], nh, hd)
        h, w = grid_hw
        n_grid = h * w
        qh = _axial_rope(qh[:, :n_grid], h, w)if qh.shape[1] == n_grid else \
            jnp.concatenate([_axial_rope(qh[:, :n_grid], h, w), qh[:, n_grid:]], 1)
        nk = kh.shape[1] - n_skip_k
        reps = max(1, nk // n_grid)
        if nk % n_grid == 0 and reps >= 1:
            kr = kh[:, :nk].reshape(kh.shape[0], reps, n_grid, nh, hd)
            kr = jax.vmap(lambda t: _axial_rope(t, h, w), 1, 1)(kr)
            kh = jnp.concatenate([kr.reshape(kh.shape[0], nk, nh, hd),
                                  kh[:, nk:]], 1)
        attn = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(hd)
        if key_mask is not None:  # (B, Lk) True = attendable
            attn = jnp.where(key_mask[:, None, None, :], attn, -1e9)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(vh.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(*q.shape[:2], C)
        return dense("out_proj")(out)


class MemoryAttentionLayer(nn.Module):
    """Self-attn + cross-attn-to-memory + FFN (reference memory_attention.py:12)."""

    d_model: int = 256
    dim_feedforward: int = 2048
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos, grid_hw, n_skip_k: int = 0,
                 key_mask=None):
        ln = lambda n: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name=n)
        t2 = ln("norm1")(tgt)
        tgt = tgt + RoPEAttention(self.d_model, dtype=self.dtype, name="self_attn")(
            t2, t2, t2, grid_hw)
        t2 = ln("norm2")(tgt)
        tgt = tgt + RoPEAttention(self.d_model, dtype=self.dtype,
                                  name="cross_attn_image")(
            t2, memory + pos, memory, grid_hw, n_skip_k=n_skip_k,
            key_mask=key_mask)
        t2 = ln("norm3")(tgt)
        ff = nn.Dense(self.dim_feedforward, dtype=self.dtype, param_dtype=jnp.float32,
                      name="linear1")(t2)
        ff = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32,
                      name="linear2")(nn.relu(ff))
        return tgt + ff


class MemoryAttention(nn.Module):
    """Condition current-frame features on the memory bank
    (reference memory_attention.py:139)."""

    d_model: int = 256
    num_layers: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, curr, curr_pos, memory, memory_pos, grid_hw, n_skip_k: int = 0,
                 key_mask=None):
        x = curr + 0.1 * curr_pos                             # pos_enc_at_input
        for i in range(self.num_layers):
            x = MemoryAttentionLayer(self.d_model, dtype=self.dtype,
                                     name=f"layer_{i}")(
                x, memory, memory_pos, curr_pos, grid_hw, n_skip_k=n_skip_k,
                key_mask=key_mask)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm")(x)


class SAM2Model(nn.Module):
    """SAM2: promptable image + video segmentation (reference modules/sam.py
    SAM2Model). Image path: Hiera -> FPN -> (memory attention) -> SAM decoder
    with high-res skips. Video: fixed-slot memory bank, see
    `encode_memory` / `condition_on_memory`.
    """

    img_size: int = 1024
    embed_dim: int = 96
    stages: tuple = (1, 2, 7, 2)
    num_heads: int = 1
    global_att_blocks: tuple = (5, 7, 9)
    window_spec: tuple = (8, 4, 14, 7)
    window_spatial_size: tuple = (14, 14)
    backbone_channel_list: tuple = (768, 384, 192, 96)
    d_model: int = 256
    mem_dim: int = 64
    num_maskmem: int = 7
    dtype: Dtype = jnp.float32
    pixel_mean: tuple = (123.675, 116.28, 103.53)
    pixel_std: tuple = (58.395, 57.12, 57.375)

    def setup(self):
        self.trunk = Hiera(embed_dim=self.embed_dim, num_heads=self.num_heads,
                           stages=self.stages, window_spec=self.window_spec,
                           global_att_blocks=self.global_att_blocks,
                           window_pos_bkg=self.window_spatial_size, dtype=self.dtype)
        self.neck = FpnNeck(d_model=self.d_model,
                            backbone_channel_list=self.backbone_channel_list,
                            dtype=self.dtype)
        emb = self.img_size // 16
        self.sam_prompt_encoder = PromptEncoder(
            embed_dim=self.d_model, image_embedding_size=(emb, emb),
            input_image_size=(self.img_size, self.img_size), dtype=self.dtype)
        self.sam_mask_decoder = SAM2MaskDecoder(transformer_dim=self.d_model,
                                                dtype=self.dtype)
        self.memory_encoder = MemoryEncoder(out_dim=self.mem_dim, in_dim=self.d_model,
                                            dtype=self.dtype)
        self.memory_attention = MemoryAttention(d_model=self.d_model, dtype=self.dtype)
        self.no_mem_embed = self.param("no_mem_embed", nn.initializers.normal(0.02),
                                       (1, 1, self.d_model), jnp.float32)
        # temporal position embedding per memory slot (maskmem_tpos_enc)
        self.maskmem_tpos_enc = self.param(
            "maskmem_tpos_enc", nn.initializers.normal(0.02),
            (self.num_maskmem, 1, 1, self.mem_dim), jnp.float32)
        self.hr_proj0 = nn.Conv(self.d_model // 8, (1, 1), dtype=self.dtype,
                                param_dtype=jnp.float32, name="hr_proj0")
        self.hr_proj1 = nn.Conv(self.d_model // 4, (1, 1), dtype=self.dtype,
                                param_dtype=jnp.float32, name="hr_proj1")

    def preprocess(self, x):
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        return ((x.astype(jnp.float32) - mean) / std).astype(self.dtype)

    def encode(self, x, train: bool = False):
        """Image (B, S, S, 3) -> dict: image_embed (B, S/16, S/16, 256) with
        no_mem_embed added (image mode), high_res_feats [(B, S/4, ., 32),
        (B, S/8, ., 64)] projected for decoder skips."""
        outs = self.trunk(self.preprocess(x))
        feats, _pos = self.neck(outs)
        feats = feats[:-1]                                    # scalp=1: drop stride-32
        s4, s8, s16 = feats
        image_embed = s16 + self.no_mem_embed.reshape(1, 1, 1, -1).astype(s16.dtype)
        hr0 = self.hr_proj0(s4)
        hr1 = self.hr_proj1(s8)
        return {"image_embed": image_embed, "raw_embed": s16,
                "high_res_feats": (hr0, hr1)}

    def decode(self, features, points=None, labels=None, boxes=None, masks=None):
        """SAM decode over prompt batch; returns (masks (B, 4, h*4, w*4),
        iou (B, 4), mask_tokens (B, 4, C), obj_score (B, 1))."""
        sparse, dense = self.sam_prompt_encoder(points=points, labels=labels,
                                                boxes=boxes, masks=masks)
        pe = self.sam_prompt_encoder.get_dense_pe()
        return self.sam_mask_decoder(features["image_embed"],
                                     pe.astype(dense.dtype), sparse, dense,
                                     high_res_features=features["high_res_feats"])

    def encode_memory(self, raw_embed, mask_logits):
        """Current frame (stride-16 feats + predicted low-res mask logits at
        stride 4) -> memory features (B, h, w, mem_dim)."""
        h, w = raw_embed.shape[1:3]
        m = jax.image.resize(mask_logits, (mask_logits.shape[0], 16 * h, 16 * w,
                                           1), "bilinear")
        m = jax.nn.sigmoid(m) * 20.0 - 10.0                   # sigmoid scale/bias
        return self.memory_encoder(raw_embed, m)

    def condition_on_memory(self, raw_embed, mem_bank, mem_valid, mem_tpos=None):
        """Condition frame features on the memory ring buffer.

        raw_embed (1, h, w, C); mem_bank (T, h, w, mem_dim); mem_valid (T,);
        mem_tpos (T,) int = frames-back of each slot (0 for the conditioning
        frame). Invalid slots are MASKED out of the attention softmax (a large
        negative logit) — value-zeroing alone would let their positional keys
        absorb softmax mass and dilute the conditioned features. The temporal
        embedding is indexed by RECENCY (reference sam2: maskmem_tpos_enc[
        num_maskmem - t_pos - 1]) and enters the positional stream, not the
        memory values.

        The memory stays in mem_dim (64) space all the way into the cross
        attention — the reference's cross_attn_image has kv_in_dim=64
        (memory_attention.py:69-74), so its k/v projections consume RAW
        memory features; the positional stream is the mem_dim sine encoding
        the reference MemoryEncoder emits (encoders.py:378) plus the temporal
        slot embedding.
        """
        h, w = raw_embed.shape[1:3]
        T = mem_bank.shape[0]
        if mem_tpos is None:
            mem_tpos = jnp.arange(T)  # slot order fallback (init path)
        memory = mem_bank.reshape(1, T * h * w, self.mem_dim)
        idx = jnp.clip(self.num_maskmem - 1 - mem_tpos, 0, self.num_maskmem - 1)
        tpos = self.maskmem_tpos_enc[idx].reshape(T, self.mem_dim)
        mpos = sine_pos_encoding(h, w, self.mem_dim).reshape(1, h * w, -1)
        mem_pos = (jnp.tile(mpos, (1, T, 1))
                   + jnp.repeat(tpos, h * w, axis=0)[None]).astype(memory.dtype)
        key_mask = (jnp.repeat(mem_valid, h * w) > 0)[None]   # (1, T*h*w)
        curr = raw_embed.reshape(1, h * w, -1)
        curr_pos = sine_pos_encoding(h, w, self.d_model).reshape(1, h * w, -1) \
            .astype(curr.dtype)
        out = self.memory_attention(curr, curr_pos, memory, mem_pos, (h, w),
                                    key_mask=key_mask)
        return out.reshape(raw_embed.shape)

    def __call__(self, x, points=None, labels=None, boxes=None, train: bool = False):
        feats = self.encode(x, train=train)
        return self.decode(feats, points=points, labels=labels, boxes=boxes)

    def init_all(self, x, points=None, labels=None, masks=None):
        """Init entry: touches the memory path too so all params materialize."""
        feats = self.encode(x)
        masks, iou, _tok, _obj = self.decode(feats, points=points, labels=labels,
                                             masks=masks)
        mem = self.encode_memory(feats["raw_embed"],
                                 masks[:, :1].transpose(0, 2, 3, 1))
        bank = jnp.broadcast_to(mem, (self.num_maskmem,) + mem.shape[1:])
        self.condition_on_memory(feats["raw_embed"], bank,
                                 jnp.ones(self.num_maskmem))
        return masks, iou


def build_sam2_module(name: str, weights=None, dtype=jnp.float32, imgsz=None):
    """Builder for sam2_* and mobile_sam names (called from build.py)."""
    from .build import SAM2_CONFIGS, _load_or_init

    if name.startswith("mobile_sam"):
        from .tiny_vit import build_mobile_sam
        return build_mobile_sam(name, weights=weights, dtype=dtype, imgsz=imgsz)
    if name not in SAM2_CONFIGS:
        raise ValueError(f"unknown SAM2 variant '{name}'")
    cfg = dict(SAM2_CONFIGS[name])
    img_size = imgsz or cfg.pop("img_size", 1024)
    module = SAM2Model(
        img_size=img_size, embed_dim=cfg["embed_dim"], stages=cfg["stages"],
        num_heads=cfg["num_heads"], global_att_blocks=cfg["global_att_blocks"],
        window_spec=cfg["window_spec"],
        window_spatial_size=cfg.get("window_spatial_size", (14, 14)),
        backbone_channel_list=cfg["backbone_channel_list"], dtype=dtype)
    variables = _load_or_init(module, weights, img_size, name)
    return module, variables, {"name": name, "img_size": img_size, "is_sam2": True}
