"""RT-DETR transformer modules: AIFI encoder, multiscale deformable attention,
deformable decoder, RTDETRDecoder head.

Capability parity with reference nn/modules/transformer.py (TransformerEncoderLayer:28,
AIFI:86, MSDeformAttn:218, DeformableTransformerDecoderLayer:313,
DeformableTransformerDecoder:374) and head.py RTDETRDecoder:438.

TPU-native notes:
  * the deformable bilinear sampling (CUDA grid_sample in torch land) is a
    vectorized gather: 4-corner take_along_axis per level with zero-padding
    masks — XLA fuses it into one kernel per level;
  * query selection uses static top-k (nq queries); contrastive denoising
    training (reference models/utils/ops.py get_cdn_group) builds G static
    groups of [M pos | M neg] noised-GT queries (M = padded max_labels), so the
    whole CDN path is one fixed-shape executable.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .conv import Conv

Dtype = Any


def sincos_pos_embed_2d(h: int, w: int, dim: int, temperature: float = 10000.0):
    """2D sine-cosine positional embedding (reference AIFI build_2d_sincos...).

    Computed host-side in float64 and rounded to f32: h/w/dim are static, so
    this is a true compile-time constant (XLA embeds it), and the f64 sin/cos
    avoids the ~1e-5 argument-reduction error of device f32 transcendentals.
    """
    import numpy as np
    grid_w = np.arange(w, dtype=np.float64)
    grid_h = np.arange(h, dtype=np.float64)
    gw, gh = np.meshgrid(grid_w, grid_h, indexing="ij")
    pos_dim = dim // 4
    omega = np.arange(pos_dim, dtype=np.float64) / pos_dim
    omega = 1.0 / (temperature ** omega)
    # NOTE: flattened w-major (no transpose) to match the reference exactly —
    # its grid is built over (w, h) and flattened as-is, while tokens flatten
    # h-major; the resulting pairing is part of the trained weights' contract
    out_w = gw.reshape(-1)[..., None] * omega[None]
    out_h = gh.reshape(-1)[..., None] * omega[None]
    pos = np.concatenate([np.sin(out_w), np.cos(out_w),
                          np.sin(out_h), np.cos(out_h)], axis=1)[None]
    return jnp.asarray(pos, jnp.float32)  # (1, h*w, dim)


class MultiHeadAttention(nn.Module):
    """Standard MHA over (B, N, C) with optional attention mask."""

    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, mask=None):
        C = q.shape[-1]
        h = self.num_heads
        hd = C // h
        dense = lambda name: nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name=name)
        qh = dense("q")(q).reshape(*q.shape[:2], h, hd)
        kh = dense("k")(k).reshape(*k.shape[:2], h, hd)
        vh = dense("v")(v).reshape(*v.shape[:2], h, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / jnp.sqrt(hd).astype(qh.dtype)
        if mask is not None:
            attn = jnp.where(mask, -1e9, attn)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(*q.shape[:2], C)
        return dense("out")(out)


class TransformerEncoderLayer(nn.Module):
    """Post-norm transformer encoder layer (reference transformer.py:28)."""

    c: int
    num_heads: int = 8
    cm: int = 2048
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos=None, train: bool = False):
        q = k = x + pos if pos is not None else x
        attn = MultiHeadAttention(self.num_heads, dtype=self.dtype, name="ma")(q, k, x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm1")(x + attn)
        ff = nn.Dense(self.cm, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(x)
        ff = nn.Dense(self.c, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(nn.gelu(ff, approximate=False))  # torch GELU is exact erf
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm2")(x + ff)


class AIFI(nn.Module):
    """Attention-based Intra-scale Feature Interaction on P5 (reference AIFI:86)."""

    cm: int = 1024
    num_heads: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        pos = sincos_pos_embed_2d(H, W, C).astype(x.dtype)
        tokens = x.reshape(B, H * W, C)
        tokens = TransformerEncoderLayer(C, self.num_heads, self.cm, dtype=self.dtype,
                                         name="enc")(tokens, pos, train)
        return tokens.reshape(B, H, W, C)


class MLP(nn.Module):
    """num_layers-deep ReLU MLP (reference transformer.py:174)."""

    hidden: int
    out: int
    num_layers: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32,
                                 name=f"l{i}")(x))
        return nn.Dense(self.out, dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"l{self.num_layers - 1}")(x)


def ms_deformable_attention(value, shapes, sampling_locations, attention_weights):
    """Multiscale deformable attention core (reference transformer.py:218 + the
    pytorch grid_sample path in utils.py multi_scale_deformable_attn_pytorch).

    value: (B, Lv, nh, hd) concatenated level tokens.
    shapes: [(H, W), ...] static.
    sampling_locations: (B, Q, nh, nl, np, 2) normalized [0, 1].
    attention_weights: (B, Q, nh, nl, np) softmaxed over nl*np.

    Returns (B, Q, nh*hd).
    """
    B, Lv, nh, hd = value.shape
    _, Q, _, nl, npts, _ = sampling_locations.shape
    out = jnp.zeros((B, Q, nh, hd), value.dtype)
    start = 0
    for l, (H, W) in enumerate(shapes):
        v = value[:, start:start + H * W]                      # (B, HW, nh, hd)
        loc = sampling_locations[:, :, :, l]                   # (B, Q, nh, np, 2)
        # grid_sample(align_corners=False) semantics
        x = loc[..., 0] * W - 0.5
        y = loc[..., 1] * H - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        dx = x - x0
        dy = y - y0

        def gather(xi, yi):
            inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            idx = (jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)).astype(jnp.int32)
            # (B, Q, nh, np) -> flatten Q*np per head for take_along_axis on axis 1
            idxf = idx.transpose(0, 1, 3, 2).reshape(B, Q * npts, nh)
            g = jnp.take_along_axis(v, idxf[..., None], axis=1)  # (B, Q*np, nh, hd)
            g = g.reshape(B, Q, npts, nh, hd).transpose(0, 1, 3, 2, 4)
            return g * inb[..., None]

        w00 = ((1 - dx) * (1 - dy))[..., None]
        w01 = (dx * (1 - dy))[..., None]
        w10 = ((1 - dx) * dy)[..., None]
        w11 = (dx * dy)[..., None]
        sampled = (gather(x0.astype(jnp.int32), y0.astype(jnp.int32)) * w00 +
                   gather(x0.astype(jnp.int32) + 1, y0.astype(jnp.int32)) * w01 +
                   gather(x0.astype(jnp.int32), y0.astype(jnp.int32) + 1) * w10 +
                   gather(x0.astype(jnp.int32) + 1, y0.astype(jnp.int32) + 1) * w11)
        out = out + (sampled * attention_weights[:, :, :, l, :, None]).sum(3)
        start += H * W
    return out.reshape(B, Q, nh * hd)


class MSDeformAttn(nn.Module):
    """Multiscale deformable attention (reference transformer.py:218)."""

    d_model: int = 256
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4
    shapes: tuple = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, refer_bbox, value, shapes):
        """query (B,Q,C); refer_bbox (B,Q,4) normalized cxcywh; value (B,Lv,C)."""
        B, Q, C = query.shape
        nh, nl, npts = self.n_heads, self.n_levels, self.n_points
        hd = C // nh
        v = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32,
                     name="value_proj")(value).reshape(B, -1, nh, hd)
        # sampling offsets initialised like the reference ring pattern
        def _offset_bias_init(key, shape, dtype=jnp.float32):
            thetas = jnp.arange(nh, dtype=jnp.float32) * (2.0 * math.pi / nh)
            grid = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], -1)
            grid = grid / jnp.abs(grid).max(-1, keepdims=True)
            grid = jnp.tile(grid[:, None, None, :], (1, nl, npts, 1))
            scale = jnp.arange(1, npts + 1, dtype=jnp.float32)[None, None, :, None]
            return (grid * scale).reshape(-1).astype(dtype)

        offsets = nn.Dense(nh * nl * npts * 2, dtype=self.dtype, param_dtype=jnp.float32,
                           kernel_init=nn.initializers.zeros, bias_init=_offset_bias_init,
                           name="sampling_offsets")(query).reshape(B, Q, nh, nl, npts, 2)
        attn = nn.Dense(nh * nl * npts, dtype=self.dtype, param_dtype=jnp.float32,
                        kernel_init=nn.initializers.zeros, name="attention_weights")(
            query).reshape(B, Q, nh, nl * npts)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(query.dtype)
        attn = attn.reshape(B, Q, nh, nl, npts)
        # refer_bbox has 4 coords: xy + wh scaling of offsets (reference :305)
        add = offsets / npts * refer_bbox[:, :, None, None, None, 2:] * 0.5
        loc = refer_bbox[:, :, None, None, None, :2] + add
        out = ms_deformable_attention(v, shapes, loc, attn)
        return nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32, name="output_proj")(out)


class DeformableTransformerDecoderLayer(nn.Module):
    """Self-attn + deformable cross-attn + FFN (reference transformer.py:313)."""

    d_model: int = 256
    n_heads: int = 8
    d_ffn: int = 1024
    n_levels: int = 3
    n_points: int = 4
    shapes: tuple = ()
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, embed, refer_bbox, feats, query_pos, train: bool = False,
                 attn_mask=None):
        q = k = embed + query_pos
        tgt = MultiHeadAttention(self.n_heads, dtype=self.dtype, name="self_attn")(
            q, k, embed, mask=attn_mask)
        embed = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                             name="norm1")(embed + tgt)
        tgt = MSDeformAttn(self.d_model, self.n_levels, self.n_heads, self.n_points,
                           shapes=self.shapes, dtype=self.dtype, name="cross_attn")(
            embed + query_pos, refer_bbox, feats, self.shapes)
        embed = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                             name="norm2")(embed + tgt)
        ff = nn.Dense(self.d_ffn, dtype=self.dtype, param_dtype=jnp.float32, name="linear1")(embed)
        ff = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32,
                      name="linear2")(nn.relu(ff))
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32, name="norm3")(embed + ff)


def inverse_sigmoid(x, eps: float = 1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


class RTDETRDecoder(nn.Module):
    """RT-DETR hybrid decoder head (reference head.py:438).

    Returns (dec_bboxes (ndl, B, nq, 4 sigmoid-normalized), dec_scores (ndl, B, nq, nc),
    enc_bboxes (B, nq, 4), enc_scores (B, nq, nc)). Training consumers take all
    layers; inference uses the last layer. When called with batch_gt during
    training a fifth element dn_meta {dn_bboxes, dn_scores, pos_flag, G} carries
    the contrastive-denoising branch for the loss.
    """

    nc: int = 80
    ch: tuple = (512, 1024, 2048)
    hd: int = 256
    nq: int = 300
    ndp: int = 4
    nh: int = 8
    ndl: int = 6
    d_ffn: int = 1024
    dtype: Dtype = jnp.float32

    def _cdn_group(self, batch_gt, num_dn: int = 100, cls_noise: float = 0.5,
                   box_noise: float = 1.0):
        """Contrastive denoising query group (reference models/utils/ops.py
        get_cdn_group): G groups of [M positives | M negatives] built from the
        padded GT; static shapes because M is the dataset's max_labels pad.

        Returns (dn_cls (B, DN) int, dn_bbox (B, DN, 4) normalized xywh,
        pos_flag (DN,), G).
        """
        gt_cls = batch_gt["cls"].astype(jnp.int32)
        gt_box = batch_gt["bboxes"].astype(jnp.float32)
        B, M = gt_cls.shape
        G = max(1, num_dn // max(2 * M, 1))
        DN = G * 2 * M
        rng = self.make_rng("dn")
        r_cls, r_sign, r_part, r_flip = jax.random.split(rng, 4)

        cls = jnp.tile(gt_cls, (1, 2 * G))                      # (B, DN)
        box = jnp.tile(gt_box, (1, 2 * G, 1))                   # (B, DN, 4)
        # pos/neg layout per group: [M pos | M neg]
        pos_flag = jnp.tile(jnp.concatenate([jnp.ones(M), jnp.zeros(M)]), G)  # (DN,)

        # class noise: flip to a random class on half*cls_noise of dn queries
        flip = jax.random.uniform(r_flip, (B, DN)) < cls_noise * 0.5
        rand_cls = jax.random.randint(r_cls, (B, DN), 0, self.nc)
        cls = jnp.where(flip, rand_cls, cls)

        # box noise on corners: pos within wh/2 * box_noise, neg pushed outside
        xy, wh = box[..., :2], box[..., 2:]
        corners = jnp.concatenate([xy - wh / 2, xy + wh / 2], -1)
        diff = jnp.concatenate([wh / 2, wh / 2], -1) * box_noise
        sign = jnp.where(jax.random.uniform(r_sign, corners.shape) < 0.5, -1.0, 1.0)
        part = jax.random.uniform(r_part, corners.shape)
        part = part + (1.0 - pos_flag)[None, :, None]           # negatives: (1, 2)
        corners = jnp.clip(corners + sign * part * diff, 0.0, 1.0)
        x1y1, x2y2 = corners[..., :2], corners[..., 2:]
        box = jnp.concatenate([(x1y1 + x2y2) / 2, x2y2 - x1y1], -1)
        return cls, box, pos_flag, G

    @nn.compact
    def __call__(self, xs, train: bool = False, batch_gt=None):
        B = xs[0].shape[0]
        shapes = tuple((x.shape[1], x.shape[2]) for x in xs)
        # input projection (conv1x1 + BN, reference head.py:494)
        feats = []
        for i, x in enumerate(xs):
            p = nn.Conv(self.hd, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"input_proj_{i}")(x)
            p = nn.BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-5,
                             dtype=self.dtype, param_dtype=jnp.float32,
                             name=f"input_proj_bn_{i}")(p)  # torch default eps (plain BatchNorm2d)
            feats.append(p.reshape(B, -1, self.hd))
        feats = jnp.concatenate(feats, 1)                     # (B, Lv, hd)

        # anchors over all level grids (reference _generate_anchors)
        anchors = []
        for i, (h, w) in enumerate(shapes):
            sy = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
            sx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
            gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
            xy = jnp.stack([gx, gy], -1).reshape(-1, 2)
            wh = jnp.full_like(xy, 0.05 * (2.0 ** i))
            anchors.append(jnp.concatenate([xy, wh], -1))
        anchors = jnp.concatenate(anchors, 0)[None]           # (1, Lv, 4)
        eps = 1e-2
        valid = ((anchors > eps) & (anchors < 1 - eps)).all(-1, keepdims=True)
        anchors_logit = jnp.where(valid, inverse_sigmoid(anchors), jnp.inf)

        # encoder head + static top-k query selection (nq clamped to token count)
        nq = min(self.nq, feats.shape[1])
        features = nn.Dense(self.hd, dtype=self.dtype, param_dtype=jnp.float32,
                            name="enc_output")(feats * valid.astype(feats.dtype))
        features = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32,
                                name="enc_norm")(features)
        enc_scores_all = nn.Dense(self.nc, dtype=self.dtype, param_dtype=jnp.float32,
                                  bias_init=nn.initializers.constant(-4.6),
                                  name="enc_score_head")(features)
        topk_val, topk_idx = jax.lax.top_k(
            jnp.where(valid.squeeze(-1), enc_scores_all.max(-1), -jnp.inf), nq)
        top_feats = jnp.take_along_axis(features, topk_idx[..., None], axis=1)
        top_anchor_logit = jnp.take_along_axis(
            jnp.broadcast_to(anchors_logit, (B, anchors_logit.shape[1], 4)),
            topk_idx[..., None], axis=1)

        enc_box_delta = MLP(self.hd, 4, 3, dtype=self.dtype, name="enc_bbox_head")(top_feats)
        refer_logit = enc_box_delta + top_anchor_logit
        enc_bboxes = jax.nn.sigmoid(refer_logit)
        enc_scores = jnp.take_along_axis(enc_scores_all, topk_idx[..., None], axis=1)

        embed = jax.lax.stop_gradient(top_feats) if train else top_feats
        refer_logit = jax.lax.stop_gradient(refer_logit) if train else refer_logit

        # contrastive denoising groups (reference models/utils/ops.py get_cdn_group):
        # DN queries are prepended; a block attention mask keeps groups blind to
        # each other and hides all DN slots from the matching queries.
        DN = 0
        attn_mask = None
        dn_meta = None
        if train and batch_gt is not None:
            dn_cls, dn_box, pos_flag, G = self._cdn_group(batch_gt)
            DN = dn_cls.shape[1]
            M2 = DN // G                                        # 2*M per group
            dn_embed = nn.Embed(self.nc, self.hd, dtype=self.dtype,
                                param_dtype=jnp.float32,
                                name="denoising_class_embed")(dn_cls)
            embed = jnp.concatenate([dn_embed.astype(embed.dtype), embed], 1)
            refer_logit = jnp.concatenate(
                [inverse_sigmoid(dn_box).astype(refer_logit.dtype), refer_logit], 1)
            T = DN + nq
            idx = jnp.arange(T)
            grp = jnp.where(idx < DN, idx // M2, G)             # matching = group G
            is_dn_col = (idx < DN)
            # rows attend cols: masked iff col is DN and in a different group
            attn_mask = (grp[:, None] != grp[None, :]) & is_dn_col[None, :]
            dn_meta = {"pos_flag": pos_flag, "G": G}

        pos_mlp = MLP(2 * self.hd, self.hd, 2, dtype=self.dtype, name="query_pos_head")

        refer = jax.nn.sigmoid(refer_logit)
        dec_bboxes, dec_scores = [], []
        out = embed
        for i in range(self.ndl):
            out = DeformableTransformerDecoderLayer(
                self.hd, self.nh, self.d_ffn, len(shapes), self.ndp, shapes=shapes,
                dtype=self.dtype, name=f"dec_layer_{i}")(out, refer, feats, pos_mlp(refer),
                                                         train, attn_mask=attn_mask)
            delta = MLP(self.hd, 4, 3, dtype=self.dtype, name=f"dec_bbox_head_{i}")(out)
            refined = jax.nn.sigmoid(delta + inverse_sigmoid(refer))
            score = nn.Dense(self.nc, dtype=self.dtype, param_dtype=jnp.float32,
                             bias_init=nn.initializers.constant(-4.6),
                             name=f"dec_score_head_{i}")(out)
            dec_bboxes.append(refined)
            dec_scores.append(score)
            refer = jax.lax.stop_gradient(refined) if train else refined
        dec_bboxes = jnp.stack(dec_bboxes)
        dec_scores = jnp.stack(dec_scores)
        if DN:
            dn_meta["dn_bboxes"] = dec_bboxes[:, :, :DN]
            dn_meta["dn_scores"] = dec_scores[:, :, :DN]
            dec_bboxes = dec_bboxes[:, :, DN:]
            dec_scores = dec_scores[:, :, DN:]
            return (dec_bboxes, dec_scores, enc_bboxes, enc_scores, dn_meta)
        return (dec_bboxes, dec_scores, enc_bboxes, enc_scores)
