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
    """Exact greedy NMS for one image via fixed-point suppression iteration.

    Candidates arrive sorted by score (descending). Greedy NMS is the unique
    fixed point of: alive[i] = no alive higher-scored same-class box overlaps i.
    Iterating that update converges in <= suppression-chain depth steps
    (boxes suppressed by boxes that are themselves suppressed get revived) —
    ~log-depth parallel sweeps over one (K, K) IoU matrix instead of max_det
    sequential argmax steps. Matches torchvision NMS output exactly.

    boxes: (K, 4) xyxy; scores: (K,) desc-sorted; classes: (K,); extras: (K, E).
    Returns (max_det, 6 + E) rows [x1, y1, x2, y2, conf, cls, *extras]; unused
    rows have conf == 0.
    """
    K = boxes.shape[0]
    if agnostic:
        off_boxes = boxes
    else:
        # class offset derived from the data (torchvision batched_nms style):
        # no fixed 7680px assumption on image size
        off = jnp.max(jnp.abs(boxes)) + 1.0
        off_boxes = boxes + classes[:, None] * off

    x1, y1, x2, y2 = off_boxes[:, 0], off_boxes[:, 1], off_boxes[:, 2], off_boxes[:, 3]
    areas = (x2 - x1) * (y2 - y1)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.clip(xx2 - xx1, 0) * jnp.clip(yy2 - yy1, 0)
    iou = inter / (areas[:, None] + areas[None, :] - inter + 1e-7)
    # overlap[i, j]: higher-ranked j (j < i, valid) overlaps i beyond threshold
    rank_i = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    rank_j = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    valid = scores > 0.0
    overlap = (iou > iou_thres) & (rank_j < rank_i) & valid[None, :]

    def cond(state):
        alive, changed = state
        return changed

    def body(state):
        alive, _ = state
        new_alive = ~jnp.any(overlap & alive[None, :], axis=1) & valid
        return new_alive, jnp.any(new_alive != alive)

    alive0 = valid
    alive, _ = jax.lax.while_loop(cond, body, (alive0, jnp.array(True)))

    # compact alive rows (stable order = score order) into max_det slots
    keep_rank = jnp.where(alive, jnp.cumsum(alive) - 1, K + max_det)  # target slot per row
    # rows.dtype (not boxes.dtype) so an f32 extras column — the anchor-index
    # channel of the extras-bank path — is not silently rounded back to bf16
    rows = jnp.concatenate([boxes, scores[:, None], classes[:, None], extras], axis=1)
    out = jnp.zeros((max_det + 1, rows.shape[1]), dtype=rows.dtype)
    out = out.at[jnp.clip(keep_rank, 0, max_det)].set(
        jnp.where(alive[:, None] & (keep_rank < max_det)[:, None], rows, 0.0),
        mode="drop")
    return out[:max_det]


@partial(jax.jit, static_argnames=("conf_thres", "iou_thres", "max_det", "pre_topk",
                                   "nc", "agnostic", "multi_label"))
def non_max_suppression(preds, conf_thres: float = 0.25, iou_thres: float = 0.7,
                        max_det: int = 300, pre_topk: int = 1024, nc: int = 80,
                        agnostic: bool = False, extras_bank=None,
                        multi_label: bool = False):
    """Batched NMS over raw decoded predictions.

    Args:
        preds: (B, N, 4 + nc + E) — xywh boxes, per-class scores (already
            sigmoided), and E extra channels (e.g. JDE states) carried
            through untouched.
        extras_bank: optional (B, N, Eb) per-anchor channels (JDE embeddings
            from decode_detect(split_extras=...)) gathered for the kept
            detections only, AFTER suppression — their columns are spliced in
            right after cls (before the inline extras), so the output layout
            matches the all-inline form. Keeps wide raw channels out of the
            (B, N)-sized decode/top-k/NMS traffic.
        multi_label: every (anchor, class) pair above conf_thres is its own
            candidate (reference val-time behavior, utils/ops.py
            non_max_suppression multi_label=True) instead of per-anchor argmax.
            Used by validators when nc > 1; candidates are the top `pre_topk`
            pairs by score (≙ the single-label path's pre-topk policy).

    Returns:
        (B, max_det, 6 + Eb + E) float array [x1, y1, x2, y2, conf, cls,
        *bank_extras, *extras]; rows with conf == 0 are padding.
    """
    B, N, no = preds.shape
    ne = no - 4 - nc
    boxes = xywh2xyxy(preds[..., :4])
    cls_scores = preds[..., 4:4 + nc]
    extras = preds[..., 4 + nc:]
    gather = jax.vmap(lambda a, i: a[i])

    if multi_label and nc > 1:
        flat = cls_scores.reshape(B, N * nc)
        k = min(pre_topk, N * nc)
        top_conf, top_flat = jax.lax.top_k(flat, k)      # (B, k) over pairs
        top_conf = jnp.where(top_conf >= conf_thres, top_conf, 0.0)
        top_idx = top_flat // nc                          # source anchor
        top_cls = (top_flat % nc).astype(preds.dtype)
        top_boxes = gather(boxes, top_idx)
        top_extras = gather(extras, top_idx) if ne else jnp.zeros((B, k, 0), preds.dtype)
    else:
        conf = jnp.max(cls_scores, axis=-1)
        cls = jnp.argmax(cls_scores, axis=-1).astype(preds.dtype)
        conf = jnp.where(conf >= conf_thres, conf, 0.0)

        k = min(pre_topk, N)
        top_conf, top_idx = jax.lax.top_k(conf, k)  # (B, k)
        top_boxes = gather(boxes, top_idx)
        top_cls = gather(cls, top_idx)
        top_extras = gather(extras, top_idx) if ne else jnp.zeros((B, k, 0), preds.dtype)
    if extras_bank is not None:
        # thread the source anchor index through suppression as one column —
        # FORCED f32 (exact for anchor counts < 2^24) even when serving bf16,
        # whose 8-bit significand would round indices > 256 onto neighboring
        # anchors and gather the wrong embeddings
        top_extras = jnp.concatenate(
            [top_extras.astype(jnp.float32),
             top_idx.astype(jnp.float32)[..., None]], axis=-1)

    out = jax.vmap(lambda b, s, c, e: _nms_single(b, s, c, e, iou_thres, max_det, agnostic))(
        top_boxes, top_conf, top_cls, top_extras)
    if extras_bank is None:
        return out
    kept_idx = out[..., -1].astype(jnp.int32)  # (B, max_det)
    kept = jnp.take_along_axis(extras_bank, kept_idx[..., None], axis=1)
    kept = jnp.where(out[..., 4:5] > 0, kept.astype(out.dtype), 0.0)  # zero padding rows
    return jnp.concatenate([out[..., :6], kept, out[..., 6:-1]], axis=-1)


def _nms_single_rotated(boxes5, scores, classes, iou_thres: float, max_det: int):
    """Fixed-point greedy NMS with probiou for rotated boxes (desc-sorted input)."""
    from .boxes import probiou

    K = boxes5.shape[0]
    off_val = jnp.max(jnp.abs(boxes5[:, :2])) + jnp.max(boxes5[:, 2:4]) + 1.0
    off = boxes5.at[:, :2].add(classes[:, None] * off_val)  # class offset on centers
    iou = probiou(off[:, None, :], off[None, :, :]).squeeze(-1)
    rank_i = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    rank_j = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    valid = scores > 0.0
    overlap = (iou > iou_thres) & (rank_j < rank_i) & valid[None, :]

    def cond(state):
        return state[1]

    def body(state):
        alive, _ = state
        new_alive = ~jnp.any(overlap & alive[None, :], axis=1) & valid
        return new_alive, jnp.any(new_alive != alive)

    alive, _ = jax.lax.while_loop(cond, body, (valid, jnp.array(True)))
    keep_rank = jnp.where(alive, jnp.cumsum(alive) - 1, K + max_det)
    rows = jnp.concatenate([boxes5, scores[:, None], classes[:, None]], axis=1)
    out = jnp.zeros((max_det + 1, rows.shape[1]), dtype=boxes5.dtype)
    out = out.at[jnp.clip(keep_rank, 0, max_det)].set(
        jnp.where(alive[:, None] & (keep_rank < max_det)[:, None], rows, 0.0), mode="drop")
    return out[:max_det]


@partial(jax.jit, static_argnames=("conf_thres", "iou_thres", "max_det", "pre_topk", "nc"))
def non_max_suppression_rotated(preds, conf_thres: float = 0.25, iou_thres: float = 0.7,
                                max_det: int = 300, pre_topk: int = 1024, nc: int = 80):
    """Rotated NMS (reference utils/ops.py nms_rotated:146).

    preds: (B, N, 4 + nc + 1) — xywh, class scores, angle (radians, last).
    Returns (B, max_det, 7): [cx, cy, w, h, r, conf, cls].
    """
    B, N, _ = preds.shape
    boxes5 = jnp.concatenate([preds[..., :4], preds[..., -1:]], -1)
    cls_scores = preds[..., 4:4 + nc]
    conf = jnp.max(cls_scores, axis=-1)
    cls = jnp.argmax(cls_scores, axis=-1).astype(preds.dtype)
    conf = jnp.where(conf >= conf_thres, conf, 0.0)
    k = min(pre_topk, N)
    top_conf, top_idx = jax.lax.top_k(conf, k)
    gather = jax.vmap(lambda a, i: a[i])
    return jax.vmap(lambda b, s, c: _nms_single_rotated(b, s, c, iou_thres, max_det))(
        gather(boxes5, top_idx), top_conf, gather(cls, top_idx))


@partial(jax.jit, static_argnames=("max_det", "conf_thres", "nc"))
def postprocess_end2end(preds, max_det: int = 300, conf_thres: float = 0.0,
                        nc: int = 80):
    """NMS-free postprocess for end-to-end (v10) heads.

    Reference Detect.postprocess (head.py:151): flatten (anchor, class) score
    pairs, take the global top max_det. One top_k, zero host sync, no NMS.

    preds: (B, N, 4 + nc) xywh + sigmoided scores.
    Returns (B, max_det, 6): [x1, y1, x2, y2, conf, cls]; conf==0 rows padding.
    """
    B, N, _ = preds.shape
    boxes = xywh2xyxy(preds[..., :4])
    scores = preds[..., 4:4 + nc]
    flat = scores.reshape(B, N * nc)
    k = min(max_det, N * nc)
    topv, topi = jax.lax.top_k(flat, k)
    anchor = topi // nc
    cls = (topi % nc).astype(preds.dtype)
    b = jnp.take_along_axis(boxes, anchor[..., None], axis=1)
    conf = jnp.where(topv >= conf_thres, topv, 0.0)
    b = jnp.where(conf[..., None] > 0, b, 0.0)
    out = jnp.concatenate([b, conf[..., None], cls[..., None]], -1)
    if k < max_det:  # keep the static (B, max_det, 6) contract
        out = jnp.pad(out, ((0, 0), (0, max_det - k), (0, 0)))
    return out
