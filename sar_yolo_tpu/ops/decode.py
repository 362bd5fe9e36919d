"""Prediction decode: raw head maps -> (B, N, 4 + nc + E) detections.

Functional equivalent of Detect._inference / JDE._inference
(reference nn/modules/head.py:100-131, 214-249): DFL softmax-expectation decode,
dist2bbox around anchor points, stride scaling, sigmoid on class (and state)
channels. Pure jnp — composes into one jit with the forward pass and NMS.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import dfl_decode, dist2bbox, make_anchors


def flatten_feats(feats):
    """[(B,H,W,C), ...] -> (B, sum(H*W), C) plus [(H,W), ...]."""
    hw = [(f.shape[1], f.shape[2]) for f in feats]
    B = feats[0].shape[0]
    C = feats[0].shape[-1]
    flat = jnp.concatenate([f.reshape(B, -1, C) for f in feats], axis=1)
    return flat, hw


def decode_detect(feats, strides, nc: int, reg_max: int = 16, extra_sigmoid: int = 0,
                  kpt_shape=None, split_extras: int = 0):
    """Decode detection head output.

    TPU layout note: all math happens PER LEVEL on the NHWC maps (channel axis
    stays the minor/lane dimension), and the (B, H*W, no) flatten+concat runs
    LAST on the already-decoded 4+nc+E channels — flattening the 144-channel
    raw maps first forces an expensive retiling relayout on TPU (~40% of the
    whole decode cost, measured).

    Args:
        feats: list of per-level (B, H, W, 4*reg_max + nc + E) maps.
        strides: per-level stride ints.
        nc: class count.
        extra_sigmoid: number of trailing extra channels to sigmoid (JDE states);
            extra channels before those (embeddings) pass through raw.
        kpt_shape: (K, D) when extras are pose keypoints — decoded to input
            pixels with sigmoided visibility.
        split_extras: number of leading extra channels (JDE embeddings) to
            RETURN SEPARATELY as a (B, N, split_extras) bank instead of
            concatenating into the predictions. Carrying 256 raw embedding
            channels through decode + NMS over all N anchors costs ~10x the
            whole detect decode in HBM traffic (measured 160 vs 14 us/img at
            B=128); the bank path gathers embeddings for the <= max_det kept
            anchors AFTER NMS (see ops/nms.py extras_bank).

    Returns:
        (B, N, 4 + nc + E): xywh boxes in input pixels, sigmoided class scores,
        extras (raw embeddings / decoded keypoints / mask coeffs, sigmoided states).
        With split_extras > 0: tuple of that array (without the embedding
        columns) and the (B, N, split_extras) raw embedding bank.
    """
    outs = []
    banks = []
    for f, s in zip(feats, strides):
        B, H, W, _ = f.shape
        box = f[..., : 4 * reg_max]
        cls = f[..., 4 * reg_max: 4 * reg_max + nc]
        extras = f[..., 4 * reg_max + nc:]

        sx = jnp.arange(W, dtype=jnp.float32) + 0.5
        sy = jnp.arange(H, dtype=jnp.float32) + 0.5
        anchors = jnp.stack(jnp.meshgrid(sx, sy, indexing="xy"), -1)  # (H, W, 2)

        dist = dfl_decode(box, reg_max)                      # (B, H, W, 4)
        dbox = dist2bbox(dist, anchors[None], xywh=True) * float(s)
        parts = [dbox, jax.nn.sigmoid(cls)]
        if extras.shape[-1]:
            if kpt_shape is not None:
                K, D = kpt_shape
                k = extras.reshape(B, H, W, K, D)
                kxy = (k[..., :2] * 2.0 + (anchors[None, :, :, None, :] - 0.5)) * float(s)
                if D == 3:
                    k = jnp.concatenate([kxy, jax.nn.sigmoid(k[..., 2:])], -1)
                else:
                    k = kxy
                parts.append(k.reshape(B, H, W, K * D))
            elif extra_sigmoid:
                mid = extras[..., :-extra_sigmoid]
                if split_extras:
                    # contiguous major-axis collapse: no relayout, channel stays minor
                    banks.append(mid[..., :split_extras].reshape(B, H * W, split_extras))
                    mid = mid[..., split_extras:]
                if mid.shape[-1]:
                    parts.append(mid)
                parts.append(jax.nn.sigmoid(extras[..., -extra_sigmoid:]))
            else:
                if split_extras:
                    banks.append(extras[..., :split_extras].reshape(B, H * W, split_extras))
                    extras = extras[..., split_extras:]
                if extras.shape[-1]:
                    parts.append(extras)
        no = sum(p.shape[-1] for p in parts)
        outs.append(jnp.concatenate(parts, -1).reshape(B, H * W, no))
    preds = jnp.concatenate(outs, axis=1)
    if split_extras:
        return preds, jnp.concatenate(banks, axis=1)
    return preds


def kpts_decode(anchor_points, pred_kpts):
    """Decode keypoint offsets to grid coordinates (reference head.py:332 kpts_decode).

    pred_kpts: (B, N, K, D) with D in {2, 3}; xy -> xy*2 + anchor - 0.5.
    """
    xy = pred_kpts[..., :2] * 2.0 + (anchor_points[None, :, None, :] - 0.5)
    return jnp.concatenate([xy, pred_kpts[..., 2:]], axis=-1)


def decode_obb(feats, strides, nc: int, reg_max: int = 16):
    """Decode OBB head output -> (B, N, 4 + nc + 1): xywh px, sigmoid cls, angle rad.

    Reference OBB.forward (head.py:289-301): angle = (sigmoid - 0.25) * pi,
    box decoded via dist2rbox around anchors.
    """
    from .boxes import dist2rbox

    x, hw = flatten_feats(feats)
    anchors, stride_t = make_anchors(hw, strides)
    box = x[..., : 4 * reg_max]
    cls = x[..., 4 * reg_max: 4 * reg_max + nc]
    angle = (jax.nn.sigmoid(x[..., 4 * reg_max + nc:]) - 0.25) * jnp.pi
    dist = dfl_decode(box, reg_max)
    rbox = dist2rbox(dist, angle[..., :1], anchors[None]) * stride_t[None]
    return jnp.concatenate([rbox, jax.nn.sigmoid(cls), angle[..., :1]], axis=-1)
