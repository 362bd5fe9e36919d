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


# ---------------------------------------------------------------------------
# Rotated (OBB) geometry
# ---------------------------------------------------------------------------


def _obb_covariance(boxes):
    """Gaussian covariance terms (a, b, c) of xywhr boxes (reference metrics.py:181)."""
    w, h, r = boxes[..., 2:3], boxes[..., 3:4], boxes[..., 4:5]
    a = w ** 2 / 12.0
    b = h ** 2 / 12.0
    cos, sin = jnp.cos(r), jnp.sin(r)
    cos2, sin2 = cos ** 2, sin ** 2
    return a * cos2 + b * sin2, a * sin2 + b * cos2, (a - b) * cos * sin


def probiou(obb1, obb2, CIoU: bool = False, eps: float = 1e-7):
    """Probabilistic IoU between xywhr boxes (broadcastable), reference metrics.py:201."""
    x1, y1 = obb1[..., 0:1], obb1[..., 1:2]
    x2, y2 = obb2[..., 0:1], obb2[..., 1:2]
    a1, b1, c1 = _obb_covariance(obb1)
    a2, b2, c2 = _obb_covariance(obb2)
    denom = (a1 + a2) * (b1 + b2) - (c1 + c2) ** 2 + eps
    t1 = ((a1 + a2) * (y1 - y2) ** 2 + (b1 + b2) * (x1 - x2) ** 2) / denom * 0.25
    t2 = ((c1 + c2) * (x2 - x1) * (y1 - y2)) / denom * 0.5
    det1 = jnp.clip(a1 * b1 - c1 ** 2, 0)
    det2 = jnp.clip(a2 * b2 - c2 ** 2, 0)
    t3 = jnp.log(((a1 + a2) * (b1 + b2) - (c1 + c2) ** 2) /
                 (4 * jnp.sqrt(det1 * det2) + eps) + eps) * 0.5
    bd = jnp.clip(t1 + t2 + t3, eps, 100.0)
    hd = jnp.sqrt(1.0 - jnp.exp(-bd) + eps)
    iou = 1 - hd
    if CIoU:
        w1, h1 = obb1[..., 2:3], obb1[..., 3:4]
        w2, h2 = obb2[..., 2:3], obb2[..., 3:4]
        v = (4 / math.pi ** 2) * (jnp.arctan(w2 / (h2 + eps)) - jnp.arctan(w1 / (h1 + eps))) ** 2
        alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
        return iou - v * alpha
    return iou


def dist2rbox(pred_dist, pred_angle, anchor_points):
    """Decode rotated box: ltrb distances + angle -> (cx, cy, w, h), reference tal.py:399."""
    lt, rb = jnp.split(pred_dist, 2, axis=-1)
    cos, sin = jnp.cos(pred_angle), jnp.sin(pred_angle)
    xf, yf = jnp.split((rb - lt) / 2, 2, axis=-1)
    x = xf * cos - yf * sin
    y = xf * sin + yf * cos
    xy = jnp.concatenate([x, y], axis=-1) + anchor_points
    return jnp.concatenate([xy, lt + rb], axis=-1)


def xywhr2xyxyxyxy(boxes):
    """xywhr -> 4 corner points (..., 4, 2)."""
    cx, cy, w, h, r = (boxes[..., i] for i in range(5))
    cos, sin = jnp.cos(r), jnp.sin(r)
    dx1, dy1 = w / 2 * cos, w / 2 * sin
    dx2, dy2 = -h / 2 * sin, h / 2 * cos
    p1 = jnp.stack([cx + dx1 + dx2, cy + dy1 + dy2], -1)
    p2 = jnp.stack([cx + dx1 - dx2, cy + dy1 - dy2], -1)
    p3 = jnp.stack([cx - dx1 - dx2, cy - dy1 - dy2], -1)
    p4 = jnp.stack([cx - dx1 + dx2, cy - dy1 + dy2], -1)
    return jnp.stack([p1, p2, p3, p4], axis=-2)
