"""Test-time augmentation: multi-scale + flip inference with tail clipping.

Functional equivalent of the reference DetectionModel._predict_augment /
_descale_pred / _clip_augmented (reference nn/tasks.py:357-395) and scale_img
(reference utils/torch_utils.py:423). TPU-native shape: all three passes are
pure jnp at static shapes and compose into ONE jit with decode + NMS — no host
round-trips between passes.

Scales (1, 0.83, 0.67) x flips (none, lr, none); each pass resizes bilinearly
(half-pixel centers, no antialias — the same sampling as torch
F.interpolate(align_corners=False)), pads bottom/right to a stride multiple
with the ImageNet-mean gray 0.447, forwards, decodes, and maps boxes back to
the base image frame. The concatenated anchor set is then clipped: the
full-scale pass drops its coarsest-level (P5) anchors, the smallest-scale pass
drops its finest-level (P3) anchors — each detector scale keeps the passes
where its receptive field is best matched.

Detect-only, like the reference (it warns and falls back for every other head).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .decode import decode_detect

TTA_SCALES = (1.0, 0.83, 0.67)
TTA_FLIPS = (None, "lr", None)


def scale_pad_image(x: jnp.ndarray, ratio: float, gs: int = 32,
                    pad_value: float = 0.447) -> jnp.ndarray:
    """Resize (B, H, W, C) by `ratio` and pad bottom/right to a `gs` multiple.

    Mirrors reference scale_img (torch_utils.py:423): new size floor(d * ratio),
    pad target ceil(d * ratio / gs) * gs, fill 0.447.
    """
    if ratio == 1.0:
        return x
    B, H, W, C = x.shape
    nh, nw = int(H * ratio), int(W * ratio)
    xi = jax.image.resize(x, (B, nh, nw, C), method="bilinear", antialias=False)
    ph = math.ceil(H * ratio / gs) * gs
    pw = math.ceil(W * ratio / gs) * gs
    return jnp.pad(xi, ((0, 0), (0, ph - nh), (0, pw - nw), (0, 0)),
                   constant_values=pad_value)


def forward_tta(apply_fn, x: jnp.ndarray, strides, nc: int, reg_max: int = 16):
    """Three-pass augmented forward -> (B, N_clipped, 4 + nc) decoded preds.

    apply_fn: x -> list of per-level raw head maps (the plain Detect contract).
    x: (B, H, W, 3) preprocessed input. Boxes come back xywh in `x` pixels,
    directly consumable by non_max_suppression.
    """
    H, W = x.shape[1], x.shape[2]
    gs = int(max(strides))
    ys, level_counts = [], []
    for s, flip in zip(TTA_SCALES, TTA_FLIPS):
        xi = x[:, :, ::-1, :] if flip == "lr" else x
        xi = scale_pad_image(xi, s, gs)
        feats = apply_fn(xi)
        level_counts.append([f.shape[1] * f.shape[2] for f in feats])
        p = decode_detect(feats, strides, nc, reg_max)
        # descale (reference _descale_pred): boxes back to base-image pixels,
        # then un-flip the x center around the base width
        box = p[..., :4] / s
        bx = W - box[..., 0:1] if flip == "lr" else box[..., 0:1]
        ys.append(jnp.concatenate([bx, box[..., 1:4], p[..., 4:]], -1))
    # clip augmented tails (reference _clip_augmented with e=1): drop the
    # coarsest level from the full-scale pass and the finest level from the
    # smallest-scale pass — computed from real per-level counts instead of the
    # reference's N//21 geometric identity (equal for stride-multiple inputs)
    ys[0] = ys[0][:, : -level_counts[0][-1], :]
    ys[-1] = ys[-1][:, level_counts[-1][0]:, :]
    return jnp.concatenate(ys, axis=1)
