"""Box geometry ops: format conversion, IoU family, anchor grids, DFL decode.

Pure jnp functions (usable inside jit/pallas callers and in losses).
Capability parity: ultralytics/utils/tal.py (make_anchors, dist2bbox, bbox2dist),
ultralytics/utils/metrics.py:23-280 (bbox_iou incl. CIoU), ultralytics/utils/ops.py
(xywh2xyxy and friends).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xywh2xyxy(x):
    """(cx, cy, w, h) -> (x1, y1, x2, y2)."""
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy2xywh(x):
    """(x1, y1, x2, y2) -> (cx, cy, w, h)."""
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def make_anchors(feat_hw: list[tuple[int, int]], strides: list[int], grid_cell_offset: float = 0.5):
    """Anchor center points for each pyramid level.

    Args:
        feat_hw: [(H, W), ...] static per-level spatial dims.
        strides: per-level stride ints.

    Returns:
        anchor_points (N, 2) in feature-grid units, stride_tensor (N, 1).
    """
    points, strds = [], []
    for (h, w), s in zip(feat_hw, strides):
        sx = jnp.arange(w, dtype=jnp.float32) + grid_cell_offset
        sy = jnp.arange(h, dtype=jnp.float32) + grid_cell_offset
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        points.append(jnp.stack([gx, gy], axis=-1).reshape(-1, 2))
        strds.append(jnp.full((h * w, 1), float(s), dtype=jnp.float32))
    return jnp.concatenate(points, 0), jnp.concatenate(strds, 0)


def dist2bbox(distance, anchor_points, xywh: bool = True):
    """Decode (l, t, r, b) distances around anchor points into boxes."""
    lt, rb = jnp.split(distance, 2, axis=-1)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        return jnp.concatenate([c, wh], axis=-1)
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def bbox2dist(anchor_points, bbox, reg_max: float):
    """Encode xyxy boxes as clamped (l, t, r, b) distances (targets for DFL)."""
    x1y1, x2y2 = jnp.split(bbox, 2, axis=-1)
    dist = jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], axis=-1)
    return jnp.clip(dist, 0, reg_max - 0.01)


def dfl_decode(pred_dist, reg_max: int = 16):
    """Distribution Focal Loss decode: softmax over reg_max bins -> expected distance.

    pred_dist: (..., 4 * reg_max) -> (..., 4).
    """
    shape = pred_dist.shape
    proj = jnp.arange(reg_max, dtype=jnp.float32)
    p = pred_dist.reshape(*shape[:-1], 4, reg_max).astype(jnp.float32)
    p = jax.nn.softmax(p, axis=-1)
    return jnp.einsum("...r,r->...", p, proj).astype(pred_dist.dtype)


def bbox_iou(box1, box2, xywh: bool = False, GIoU: bool = False, DIoU: bool = False,
             CIoU: bool = False, eps: float = 1e-7):
    """IoU / GIoU / DIoU / CIoU between broadcastable box arrays (last dim 4)."""
    if xywh:
        box1, box2 = xywh2xyxy(box1), xywh2xyxy(box2)
    b1x1, b1y1, b1x2, b1y2 = jnp.split(box1, 4, axis=-1)
    b2x1, b2y1, b2x2, b2y2 = jnp.split(box2, 4, axis=-1)
    w1, h1 = b1x2 - b1x1, b1y2 - b1y1
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1

    inter = (jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1)).clip(0) * \
            (jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1)).clip(0)
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    if not (GIoU or DIoU or CIoU):
        return iou
    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
    if CIoU or DIoU:
        c2 = cw ** 2 + ch ** 2 + eps
        rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
        if CIoU:
            v = (4 / math.pi ** 2) * (jnp.arctan(w2 / (h2 + eps)) - jnp.arctan(w1 / (h1 + eps))) ** 2
            alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
            return iou - (rho2 / c2 + v * alpha)
        return iou - rho2 / c2
    c_area = cw * ch + eps
    return iou - (c_area - union) / c_area


def box_iou_pairwise(boxes1, boxes2, eps: float = 1e-7):
    """Pairwise IoU matrix: (N, 4) x (M, 4) -> (N, M), xyxy format."""
    a1 = boxes1[:, None, :2]
    a2 = boxes1[:, None, 2:]
    b1 = boxes2[None, :, :2]
    b2 = boxes2[None, :, 2:]
    inter = jnp.prod(jnp.clip(jnp.minimum(a2, b2) - jnp.maximum(a1, b1), 0, None), axis=-1)
    area1 = jnp.prod(boxes1[:, 2:] - boxes1[:, :2], axis=-1)
    area2 = jnp.prod(boxes2[:, 2:] - boxes2[:, :2], axis=-1)
    return inter / (area1[:, None] + area2[None, :] - inter + eps)
