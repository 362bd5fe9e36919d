"""SAM (Segment Anything) core modules, TPU-native.

Capability parity with reference models/sam/modules/: blocks.py (Block:877,
REAttention:977, PatchEmbed:1073, PositionEmbeddingRandom:813),
encoders.py (ImageEncoderViT:23, PromptEncoder:165), transformer.py
(TwoWayTransformer:12, TwoWayAttentionBlock:152, Attention:265),
decoders.py (MaskDecoder:11) and sam.py (SAMModel).

TPU-native notes:
  * NHWC layout end-to-end; all matmuls/attention are einsum (MXU-friendly);
  * decomposed relative-position attention is two einsum adds on the logits —
    no gather in the hot loop (static window/grid sizes make Rh/Rw slices
    compile-time constants);
  * window partition is a static reshape/transpose (14x14 windows over the
    padded 70x70 grid), so XLA sees one fused executable per image size;
  * prompts are STATIC-shape: points padded with label -1 (the reference's own
    not-a-point convention), so one compiled decode serves any prompt count.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def _gelu_exact(x):
    # torch nn.GELU() is the exact erf form; flax nn.gelu defaults to tanh
    return nn.gelu(x, approximate=False)


class MLPBlock(nn.Module):
    """Two-layer MLP used inside ViT blocks (Linear-act-Linear)."""

    hidden: int
    out: int
    act: Any = _gelu_exact
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32, name="lin1")(x)
        x = self.act(x)
        return nn.Dense(self.out, dtype=self.dtype, param_dtype=jnp.float32, name="lin2")(x)


class MLP(nn.Module):
    """n-layer ReLU MLP (reference sam/modules MLP); optional sigmoid output."""

    hidden: int
    out: int
    num_layers: int = 3
    sigmoid_output: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32,
                                 name=f"l{i}")(x))
        x = nn.Dense(self.out, dtype=self.dtype, param_dtype=jnp.float32,
                     name=f"l{self.num_layers - 1}")(x)
        return jax.nn.sigmoid(x) if self.sigmoid_output else x


def _get_rel_pos(q_size: int, k_size: int, rel_pos):
    """Slice the (2*max-1, hd) rel-pos table to (q_size, k_size, hd).

    Reference blocks.py get_rel_pos; sizes are static so this is a constant
    gather folded at compile time.
    """
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        # linear interpolation of the table (static shapes)
        rel_pos = jax.image.resize(rel_pos, (max_rel_dist, rel_pos.shape[1]), "linear")
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


class RelPosAttention(nn.Module):
    """ViT attention with decomposed relative positions (reference REAttention:977).

    Operates on (B, H, W, C) windows; rel-pos is added to logits via two
    einsums over the H and W axes separately.
    """

    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    use_rel_pos: bool = False
    input_size: tuple = (14, 14)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        nh = self.num_heads
        hd = C // nh
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                       param_dtype=jnp.float32, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, nh, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]   # (B, N, nh, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        if self.use_rel_pos:
            rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * self.input_size[0] - 1, hd), jnp.float32)
            rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * self.input_size[1] - 1, hd), jnp.float32)
            Rh = _get_rel_pos(H, H, rel_h).astype(q.dtype)   # (H, H, hd)
            Rw = _get_rel_pos(W, W, rel_w).astype(q.dtype)   # (W, W, hd)
            rq = q.reshape(B, H, W, nh, hd)
            bias_h = jnp.einsum("bhwnd,hkd->bnhwk", rq, Rh)  # (B, nh, H, W, H)
            bias_w = jnp.einsum("bhwnd,wkd->bnhwk", rq, Rw)  # (B, nh, H, W, W)
            attn = (attn.reshape(B, nh, H, W, H, W) + bias_h[..., :, None] +
                    bias_w[..., None, :]).reshape(B, nh, H * W, H * W)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, H, W, C)
        return nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name="proj")(out)


def window_partition(x, window: int):
    """(B, H, W, C) -> (B*nW, window, window, C) with bottom-right padding."""
    B, H, W, C = x.shape
    ph = (window - H % window) % window
    pw = (window - W % window) % window
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // window, window, Wp // window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, C)
    return x, (Hp, Wp)


def window_unpartition(x, window: int, pad_hw, hw):
    """Inverse of window_partition; crops the padding."""
    Hp, Wp = pad_hw
    H, W = hw
    B = x.shape[0] // ((Hp // window) * (Wp // window))
    x = x.reshape(B, Hp // window, Wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


class ViTBlock(nn.Module):
    """Transformer block with optional window attention (reference Block:877)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    window_size: int = 0
    input_size: tuple = (64, 64)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm1")(x)
        hw = (x.shape[1], x.shape[2])
        if self.window_size > 0:
            x, pad_hw = window_partition(x, self.window_size)
            attn_size = (self.window_size, self.window_size)
        else:
            attn_size = self.input_size
        x = RelPosAttention(self.dim, self.num_heads, use_rel_pos=True,
                            input_size=attn_size, dtype=self.dtype, name="attn")(x)
        if self.window_size > 0:
            x = window_unpartition(x, self.window_size, pad_hw, hw)
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32,
                         name="norm2")(x)
        return x + MLPBlock(int(self.dim * self.mlp_ratio), self.dim,
                            dtype=self.dtype, name="mlp")(y)


class ImageEncoderViT(nn.Module):
    """SAM ViT image encoder (reference encoders.py:23): 16x16 patch embed,
    abs pos embed, windowed/global blocks, 1x1+3x3 conv neck to 256ch.

    Input (B, img, img, 3) normalized; output (B, img/16, img/16, 256) NHWC.
    """

    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    window_size: int = 14
    global_attn_indexes: tuple = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = x.shape[1] // self.patch_size
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=self.patch_size, dtype=self.dtype, param_dtype=jnp.float32,
                    name="patch_embed")(x)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, self.img_size // self.patch_size,
                          self.img_size // self.patch_size, self.embed_dim), jnp.float32)
        if pos.shape[1] != g:  # smaller eval sizes: static bilinear resize
            pos = jax.image.resize(pos, (1, g, g, self.embed_dim), "bilinear")
        x = x + pos.astype(x.dtype)
        for i in range(self.depth):
            x = ViTBlock(self.embed_dim, self.num_heads, self.mlp_ratio,
                         window_size=0 if i in self.global_attn_indexes else self.window_size,
                         input_size=(g, g), dtype=self.dtype, name=f"block_{i}")(x)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="neck_conv1")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32,
                         name="neck_ln1")(x)
        x = nn.Conv(self.out_chans, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="neck_conv2")(x)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32,
                            name="neck_ln2")(x)


class PositionEmbeddingRandom(nn.Module):
    """Random-Fourier positional encoding (reference blocks.py:813).

    The gaussian projection matrix is a (frozen-at-init) param so converted
    torch checkpoints restore the exact buffer.
    """

    num_pos_feats: int = 128
    scale: float = 1.0

    @nn.compact
    def __call__(self, coords):
        """coords in [0, 1], shape (..., 2) -> (..., 2*num_pos_feats)."""
        mat = self.param("gaussian_matrix",
                         lambda k, s, d: self.scale * jax.random.normal(k, s, d),
                         (2, self.num_pos_feats), jnp.float32)
        c = 2.0 * coords - 1.0
        c = (c @ mat) * (2.0 * math.pi)
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], -1)

    def grid(self, h: int, w: int):
        """Dense PE over an h x w grid -> (h, w, 2*num_pos_feats)."""
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        return self(jnp.stack([gx, gy], -1))


class PromptEncoder(nn.Module):
    """Sparse (points/boxes) + dense (mask) prompt embeddings
    (reference encoders.py:165).

    Point labels: -1 pad/not-a-point, 0 negative, 1 positive, 2/3 box corners.
    All label selection is one-hot matmul (static shapes, no boolean fancy
    indexing).
    """

    embed_dim: int = 256
    image_embedding_size: tuple = (64, 64)
    input_image_size: tuple = (1024, 1024)
    mask_in_chans: int = 16
    dtype: Dtype = jnp.float32

    def setup(self):
        self.pe_layer = PositionEmbeddingRandom(self.embed_dim // 2)
        # 4 point types + not_a_point, each a single learned vector
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0), (4, self.embed_dim),
            jnp.float32)
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (self.embed_dim,),
            jnp.float32)
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (self.embed_dim,), jnp.float32)
        ch = self.mask_in_chans
        self.mask_down = [
            nn.Conv(ch // 4, (2, 2), strides=2, dtype=self.dtype,
                    param_dtype=jnp.float32, name="mask_conv1"),
            nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32,
                         name="mask_ln1"),
            nn.Conv(ch, (2, 2), strides=2, dtype=self.dtype, param_dtype=jnp.float32,
                    name="mask_conv2"),
            nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32,
                         name="mask_ln2"),
            nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="mask_conv3"),
        ]

    def get_dense_pe(self):
        h, w = self.image_embedding_size
        return self.pe_layer.grid(h, w)[None]                 # (1, h, w, C)

    def embed_points(self, points, labels):
        """points (B, N, 2) in input-image pixels; labels (B, N) int."""
        coords = (points + 0.5) / jnp.asarray(
            [self.input_image_size[1], self.input_image_size[0]], jnp.float32)
        pe = self.pe_layer(coords)                            # (B, N, C)
        lbl = labels.astype(jnp.int32)
        pe = jnp.where((lbl == -1)[..., None], 0.0, pe)
        table = jnp.concatenate([self.not_a_point_embed[None], self.point_embeddings], 0)
        sel = jax.nn.one_hot(lbl + 1, 5) @ table              # (B, N, C)
        return pe + sel

    def embed_boxes(self, boxes):
        """boxes (B, 4) xyxy in input-image pixels -> (B, 2, C) corner tokens."""
        corners = (boxes.reshape(-1, 2, 2) + 0.5) / jnp.asarray(
            [self.input_image_size[1], self.input_image_size[0]], jnp.float32)
        pe = self.pe_layer(corners)
        return pe + self.point_embeddings[2:4][None]

    def embed_masks(self, masks):
        """masks (B, 4*eh, 4*ew, 1) -> dense (B, eh, ew, C)."""
        x = masks
        for i, layer in enumerate(self.mask_down):
            x = layer(x)
            if i in (1, 3):
                x = _gelu_exact(x)
        return x

    def no_mask_dense(self, bs: int):
        h, w = self.image_embedding_size
        return jnp.broadcast_to(self.no_mask_embed.reshape(1, 1, 1, -1),
                                (bs, h, w, self.embed_dim))

    def __call__(self, points=None, labels=None, boxes=None, masks=None):
        """Returns (sparse (B, Ns, C), dense (B, eh, ew, C))."""
        parts = []
        bs = 1
        if points is not None:
            if boxes is None:
                # reference pad point: points-only prompts always carry one
                # extra (0,0)/-1 not-a-point token (prompt_encoder.py
                # _embed_points pad=True) — trained SAM weights expect it
                points = jnp.concatenate(
                    [points, jnp.zeros((points.shape[0], 1, 2), points.dtype)], 1)
                labels = jnp.concatenate(
                    [labels, -jnp.ones((labels.shape[0], 1), labels.dtype)], 1)
            parts.append(self.embed_points(points, labels))
            bs = points.shape[0]
        if boxes is not None:
            parts.append(self.embed_boxes(boxes))
            bs = boxes.shape[0]
        sparse = (jnp.concatenate(parts, 1) if parts
                  else jnp.zeros((bs, 0, self.embed_dim)))
        dense = self.embed_masks(masks) if masks is not None else self.no_mask_dense(bs)
        return sparse, dense


class DownsampleAttention(nn.Module):
    """Decoder attention with internal channel downsampling
    (reference transformer.py Attention:265)."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        C = self.embedding_dim // self.downsample_rate
        nh = self.num_heads
        hd = C // nh
        dense = lambda n, d: nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32, name=n)
        qh = dense("q_proj", C)(q).reshape(*q.shape[:2], nh, hd)
        kh = dense("k_proj", C)(k).reshape(*k.shape[:2], nh, hd)
        vh = dense("v_proj", C)(v).reshape(*v.shape[:2], nh, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(hd)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(vh.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(*q.shape[:2], C)
        return dense("out_proj", self.embedding_dim)(out)


class TwoWayAttentionBlock(nn.Module):
    """Sparse self-attn, token->image cross, MLP, image->token cross
    (reference transformer.py:152)."""

    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    skip_first_layer_pe: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        ln = lambda n: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name=n)
        if self.skip_first_layer_pe:
            queries = DownsampleAttention(self.embedding_dim, self.num_heads,
                                          dtype=self.dtype, name="self_attn")(
                queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + DownsampleAttention(self.embedding_dim, self.num_heads,
                                                    dtype=self.dtype, name="self_attn")(
                q, q, queries)
        queries = ln("norm1")(queries)
        q = queries + query_pe
        k = keys + key_pe
        queries = queries + DownsampleAttention(self.embedding_dim, self.num_heads, 2,
                                                dtype=self.dtype,
                                                name="cross_attn_token_to_image")(q, k, keys)
        queries = ln("norm2")(queries)
        mlp = nn.Dense(self.mlp_dim, dtype=self.dtype, param_dtype=jnp.float32,
                       name="mlp_lin1")(queries)
        mlp = nn.Dense(self.embedding_dim, dtype=self.dtype, param_dtype=jnp.float32,
                       name="mlp_lin2")(nn.relu(mlp))
        queries = ln("norm3")(queries + mlp)
        q = queries + query_pe
        k = keys + key_pe
        keys = keys + DownsampleAttention(self.embedding_dim, self.num_heads, 2,
                                          dtype=self.dtype,
                                          name="cross_attn_image_to_token")(k, q, queries)
        keys = ln("norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    """Token<->image two-way transformer (reference transformer.py:12)."""

    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        """image_embedding/pe (B, h, w, C) NHWC; point_embedding (B, N, C)."""
        B, h, w, C = image_embedding.shape
        keys = image_embedding.reshape(B, h * w, C)
        key_pe = image_pe.reshape(image_pe.shape[0], h * w, C)
        queries = point_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                self.embedding_dim, self.num_heads, self.mlp_dim,
                skip_first_layer_pe=(i == 0), dtype=self.dtype,
                name=f"layer_{i}")(queries, keys, point_embedding, key_pe)
        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + DownsampleAttention(self.embedding_dim, self.num_heads, 2,
                                                dtype=self.dtype,
                                                name="final_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                               name="norm_final_attn")(queries)
        return queries, keys


class MaskDecoder(nn.Module):
    """Hypernetwork mask decoder (reference decoders.py:11).

    Returns (masks (B, 4, 4h, 4w) logits, iou_pred (B, 4)); callers slice
    [0:1] or [1:4] for single/multimask (done outside so one executable serves
    both modes).
    """

    transformer_dim: int = 256
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    # the reference injects a constructed TwoWayTransformer; these knobs cover
    # its (depth, num_heads, mlp_dim) configuration (transformer.py:41)
    transformer_depth: int = 2
    transformer_heads: int = 8
    transformer_mlp_dim: int = 2048
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt, dense_prompt):
        """image_embeddings (1 or B, h, w, C); prompts batched over B queries."""
        n_tokens = self.num_multimask_outputs + 1
        C = self.transformer_dim
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, C),
                               jnp.float32)
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (n_tokens, C), jnp.float32)
        B = sparse_prompt.shape[0]
        out_tokens = jnp.broadcast_to(
            jnp.concatenate([iou_token, mask_tokens], 0)[None], (B, 1 + n_tokens, C))
        tokens = jnp.concatenate([out_tokens, sparse_prompt.astype(out_tokens.dtype)], 1)

        src = jnp.broadcast_to(image_embeddings,
                               (B,) + image_embeddings.shape[1:]) + dense_prompt
        pos = jnp.broadcast_to(image_pe, (B,) + image_pe.shape[1:])
        h, w = src.shape[1:3]

        hs, src = TwoWayTransformer(depth=self.transformer_depth,
                                    num_heads=self.transformer_heads,
                                    mlp_dim=self.transformer_mlp_dim,
                                    dtype=self.dtype, embedding_dim=C,
                                    name="transformer")(src, pos, tokens)
        iou_out = hs[:, 0]
        mask_out = hs[:, 1:1 + n_tokens]                      # (B, 4, C)

        src = src.reshape(B, h, w, C)
        # transpose_kernel=True matches torch ConvTranspose2d orientation
        # (same recipe as nn/modules/conv.py ConvTranspose2d)
        up = nn.ConvTranspose(C // 4, (2, 2), strides=(2, 2), transpose_kernel=True,
                              dtype=self.dtype,
                              param_dtype=jnp.float32, name="upscale_conv1")(src)
        up = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, param_dtype=jnp.float32,
                          name="upscale_ln")(up)
        up = _gelu_exact(up)
        up = nn.ConvTranspose(C // 8, (2, 2), strides=(2, 2), transpose_kernel=True,
                              dtype=self.dtype,
                              param_dtype=jnp.float32, name="upscale_conv2")(up)
        up = _gelu_exact(up)                                  # (B, 4h, 4w, C/8)

        hyper = jnp.stack([MLP(C, C // 8, 3, dtype=self.dtype,
                               name=f"hyper_mlp_{i}")(mask_out[:, i])
                           for i in range(n_tokens)], 1)      # (B, 4, C/8)
        masks = jnp.einsum("bnc,bhwc->bnhw", hyper, up)
        iou_pred = MLP(self.iou_head_hidden_dim, n_tokens, self.iou_head_depth,
                       dtype=self.dtype, name="iou_head")(iou_out)
        return masks, iou_pred


class SAMModel(nn.Module):
    """SAM: promptable segmentation (reference modules/sam.py SAMModel).

    Methods are exposed via flax `method=` apply: `encode` for the heavy image
    tower (run once per image), `decode` for cheap per-prompt mask heads, and
    `__call__` for the fused path.
    """

    img_size: int = 1024
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    global_attn_indexes: tuple = (2, 5, 8, 11)
    prompt_embed_dim: int = 256
    decoder_heads: int = 8          # mask-decoder TwoWayTransformer heads
    encoder: str = "vit"            # "vit" | "tiny" (MobileSAM)
    tiny_cfg: Any = None            # TinyViT size overrides (tests / custom)
    dtype: Dtype = jnp.float32
    pixel_mean: tuple = (123.675, 116.28, 103.53)
    pixel_std: tuple = (58.395, 57.12, 57.375)

    def setup(self):
        if self.encoder == "tiny":
            from .tiny_vit import TinyViT
            self.image_encoder = TinyViT(out_chans=self.prompt_embed_dim,
                                         dtype=self.dtype,
                                         **(self.tiny_cfg or {}))
        else:
            self.image_encoder = ImageEncoderViT(
                img_size=self.img_size, embed_dim=self.embed_dim, depth=self.depth,
                num_heads=self.num_heads, global_attn_indexes=self.global_attn_indexes,
                out_chans=self.prompt_embed_dim, dtype=self.dtype)
        emb = self.img_size // 16
        self.prompt_encoder = PromptEncoder(
            embed_dim=self.prompt_embed_dim, image_embedding_size=(emb, emb),
            input_image_size=(self.img_size, self.img_size), dtype=self.dtype)
        self.mask_decoder = MaskDecoder(transformer_dim=self.prompt_embed_dim,
                                        transformer_heads=self.decoder_heads,
                                        dtype=self.dtype)

    def preprocess(self, x):
        """uint8/float (B, H, W, 3) RGB -> normalized float."""
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        return ((x.astype(jnp.float32) - mean) / std).astype(self.dtype)

    def encode(self, x, train: bool = False):
        """Image (B, S, S, 3) raw pixels -> embeddings (B, S/16, S/16, 256)."""
        return self.image_encoder(self.preprocess(x), train=train)

    def decode(self, embeddings, points=None, labels=None, boxes=None, masks=None):
        """Per-prompt decode. Prompt batch B rides embeddings of batch 1 (or B).

        Returns (low_res_masks (B, 4, 4h, 4w), iou_pred (B, 4)); slot 0 is the
        single-mask output, 1..3 the multimask outputs.
        """
        sparse, dense = self.prompt_encoder(points=points, labels=labels,
                                            boxes=boxes, masks=masks)
        pe = self.prompt_encoder.get_dense_pe()
        return self.mask_decoder(embeddings, pe.astype(embeddings.dtype),
                                 sparse, dense)

    def __call__(self, x, points=None, labels=None, boxes=None, masks=None,
                 train: bool = False):
        emb = self.encode(x, train=train)
        return self.decode(emb, points=points, labels=labels, boxes=boxes,
                           masks=masks)
