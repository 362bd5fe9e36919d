"""On-device batched class-aware NMS with fully static shapes.

Replaces the reference's per-image torchvision NMS python loop
(ultralytics/utils/ops.py:167 non_max_suppression) with an XLA-friendly design:

  1. score mask at conf_thres, fold class id via the class-offset trick
  2. top-k pre-selection (static `pre_topk` candidates per image)
  3. greedy suppression as `max_det` steps of (argmax -> record -> IoU mask)
     inside lax.fori_loop — O(max_det * pre_topk) IoU work, all on device
  4. vmap over the batch

No host round-trip between the forward pass and the final (B, max_det, 6+E)
output — this is the north-star requirement in BASELINE.json.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .boxes import xywh2xyxy


def _nms_single(boxes, scores, classes, extras, iou_thres: float, max_det: int,
                agnostic: bool = False):
    """Greedy NMS for one image.

    boxes: (N, 4) xyxy; scores: (N,); classes: (N,) float; extras: (N, E).
    Returns (max_det, 6 + E) rows [x1, y1, x2, y2, conf, cls, *extras]; unused
    rows have conf == 0.
    """
    N = boxes.shape[0]
    # Class-offset trick: boxes of different classes never overlap.
    if agnostic:
        off_boxes = boxes
    else:
        offset = classes[:, None] * 7680.0
        off_boxes = boxes + offset

    x1, y1, x2, y2 = off_boxes[:, 0], off_boxes[:, 1], off_boxes[:, 2], off_boxes[:, 3]
    areas = (x2 - x1) * (y2 - y1)

    def body(i, state):
        alive_scores, out = state
        j = jnp.argmax(alive_scores)
        best = alive_scores[j]
        row = jnp.concatenate([
            boxes[j], jnp.array([best]), classes[j][None], extras[j]])
        # conf<=0 rows are padding
        row = jnp.where(best > 0.0, row, jnp.zeros_like(row))
        out = out.at[i].set(row)
        # Suppress overlapping boxes of the same class (offset space)
        xx1 = jnp.maximum(x1[j], x1)
        yy1 = jnp.maximum(y1[j], y1)
        xx2 = jnp.minimum(x2[j], x2)
        yy2 = jnp.minimum(y2[j], y2)
        inter = jnp.clip(xx2 - xx1, 0) * jnp.clip(yy2 - yy1, 0)
        iou = inter / (areas[j] + areas - inter + 1e-7)
        suppress = iou > iou_thres
        suppress = suppress.at[j].set(True)
        alive_scores = jnp.where(suppress, -1.0, alive_scores)
        return alive_scores, out

    out0 = jnp.zeros((max_det, 6 + extras.shape[1]), dtype=boxes.dtype)
    _, out = jax.lax.fori_loop(0, max_det, body, (scores, out0))
    return out


@partial(jax.jit, static_argnames=("conf_thres", "iou_thres", "max_det", "pre_topk",
                                   "nc", "agnostic"))
def non_max_suppression(preds, conf_thres: float = 0.25, iou_thres: float = 0.7,
                        max_det: int = 300, pre_topk: int = 1024, nc: int = 80,
                        agnostic: bool = False):
    """Batched NMS over raw decoded predictions.

    Args:
        preds: (B, N, 4 + nc + E) — xywh boxes, per-class scores (already
            sigmoided), and E extra channels (e.g. JDE embeddings + states)
            carried through untouched.

    Returns:
        (B, max_det, 6 + E) float array [x1, y1, x2, y2, conf, cls, *extras];
        rows with conf == 0 are padding.
    """
    B, N, no = preds.shape
    ne = no - 4 - nc
    boxes = xywh2xyxy(preds[..., :4])
    cls_scores = preds[..., 4:4 + nc]
    extras = preds[..., 4 + nc:]

    conf = jnp.max(cls_scores, axis=-1)
    cls = jnp.argmax(cls_scores, axis=-1).astype(preds.dtype)
    conf = jnp.where(conf >= conf_thres, conf, 0.0)

    k = min(pre_topk, N)
    top_conf, top_idx = jax.lax.top_k(conf, k)  # (B, k)
    gather = jax.vmap(lambda a, i: a[i])
    top_boxes = gather(boxes, top_idx)
    top_cls = gather(cls, top_idx)
    top_extras = gather(extras, top_idx) if ne else jnp.zeros((B, k, 0), preds.dtype)

    return jax.vmap(lambda b, s, c, e: _nms_single(b, s, c, e, iou_thres, max_det, agnostic))(
        top_boxes, top_conf, top_cls, top_extras)
