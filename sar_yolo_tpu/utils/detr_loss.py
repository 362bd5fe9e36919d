"""DETR-family loss: Hungarian matching + VFL class + L1/GIoU box, with aux layers.

Capability parity with reference models/utils/loss.py (DETRLoss:13,
RTDETRDetectionLoss:291) and models/utils/ops.py (HungarianMatcher:12).

TPU-native: the Hungarian assignment runs inside jit via
optax.assignment.hungarian_algorithm vmapped over the batch; padded GT rows get
prohibitive cost and are masked out of every reduction (static shapes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from optax import assignment

from sar_yolo_tpu.ops.boxes import bbox_iou, xywh2xyxy

COST_GAIN = {"class": 2.0, "bbox": 5.0, "giou": 2.0}
LOSS_GAIN = {"class": 1.0, "bbox": 5.0, "giou": 2.0}


def _focal_cost(scores_sigmoid, alpha: float = 0.25, gamma: float = 2.0):
    """Per-class focal matching cost terms (reference HungarianMatcher:87)."""
    neg = (1 - alpha) * scores_sigmoid ** gamma * (-jnp.log(1 - scores_sigmoid + 1e-8))
    pos = alpha * (1 - scores_sigmoid) ** gamma * (-jnp.log(scores_sigmoid + 1e-8))
    return pos - neg


def hungarian_match(pred_boxes, pred_scores, gt_boxes, gt_cls, gt_mask):
    """Match one image's Q predictions to M (padded) ground truths.

    pred_boxes (Q, 4) normalized cxcywh; pred_scores (Q, nc) logits;
    gt_boxes (M, 4) normalized cxcywh; gt_cls (M,) int; gt_mask (M,).

    Returns (assign_q (M,): query index matched to each gt row, valid (M,)).
    """
    Q, nc = pred_scores.shape
    M = gt_boxes.shape[0]
    p = jax.nn.sigmoid(pred_scores)
    cost_cls = _focal_cost(p)[:, jnp.clip(gt_cls, 0, nc - 1)]            # (Q, M)
    cost_bbox = jnp.abs(pred_boxes[:, None, :] - gt_boxes[None, :, :]).sum(-1)
    giou = bbox_iou(xywh2xyxy(pred_boxes)[:, None, :], xywh2xyxy(gt_boxes)[None, :, :],
                    GIoU=True).squeeze(-1)
    cost = (COST_GAIN["class"] * cost_cls + COST_GAIN["bbox"] * cost_bbox +
            COST_GAIN["giou"] * (1 - giou))
    cost = jnp.where(jnp.isfinite(cost), cost, 1e6)
    cost = jnp.where(gt_mask[None, :] > 0, cost, 1e6)
    # rows = gts (M <= Q assumed), columns = queries
    gt_idx, q_idx = assignment.hungarian_algorithm(cost.T)               # over (M, Q)
    assign_q = jnp.zeros(M, jnp.int32).at[gt_idx].set(q_idx.astype(jnp.int32))
    return assign_q, gt_mask > 0


class DETRLossOut(NamedTuple):
    total: jnp.ndarray
    items: jnp.ndarray  # (3,) cls, bbox, giou (summed over layers)


def _bce_elem(logits, targets):
    return (jnp.maximum(logits, 0) - logits * targets +
            jnp.log1p(jnp.exp(-jnp.abs(logits))))


def _single_layer_terms(pred_boxes, pred_scores, gt_boxes, gt_cls, gt_mask,
                        assign_q, nc, use_vfl):
    """One image, one decoder layer: RAW loss sums + valid-gt count.

    The caller normalizes by the BATCH-total matched-gt count, matching the
    reference exactly (DETRLoss._get_loss, models/utils/loss.py:218, flattens
    the whole batch before dividing by len(gt_bboxes)) — a per-image mean
    would diverge whenever images carry different numbers of boxes.
    `use_vfl` is the reference's batch-level `num_gts and self.vfl` switch:
    VarifocalLoss when the batch has any gt, FocalLoss otherwise.
    """
    Q = pred_scores.shape[0]
    # reference detaches the iou used as the vfl target (loss.py:243)
    matched_iou = jax.lax.stop_gradient(
        bbox_iou(xywh2xyxy(jnp.take(pred_boxes, assign_q, axis=0)),
                 xywh2xyxy(gt_boxes)).squeeze(-1))                       # (M,)
    valid = gt_mask > 0
    tgt_scores = jnp.zeros((Q,))
    tgt_labels = jnp.full((Q,), nc, jnp.int32)
    tgt_scores = tgt_scores.at[assign_q].set(jnp.where(valid, jnp.clip(matched_iou, 0), 0.0))
    tgt_labels = tgt_labels.at[assign_q].set(jnp.where(valid, gt_cls, nc))

    onehot = jax.nn.one_hot(tgt_labels, nc)
    gt_score_map = onehot * tgt_scores[:, None]
    p = jax.nn.sigmoid(pred_scores)
    # VarifocalLoss (reference loss.py:114)
    vfl = _bce_elem(pred_scores, gt_score_map) * (
        0.75 * p ** 2.0 * (1 - onehot) + gt_score_map)
    # FocalLoss gamma=1.5 alpha=0.25 on the one-hot target (reference loss.py:138;
    # taken only when the whole batch has zero gts, loss.py:80)
    p_t = onehot * p + (1 - onehot) * (1 - p)
    fl = _bce_elem(pred_scores, onehot) * (1.0 - p_t) ** 1.5 * (
        onehot * 0.25 + (1 - onehot) * 0.75)
    cls_sum = jnp.where(use_vfl, vfl, fl).sum()

    pb = jnp.take(pred_boxes, assign_q, axis=0)                          # (M, 4)
    l1 = jnp.abs(pb - gt_boxes).sum(-1)
    giou = bbox_iou(xywh2xyxy(pb), xywh2xyxy(gt_boxes), GIoU=True).squeeze(-1)
    l1_sum = jnp.where(valid, l1, 0.0).sum()
    giou_sum = jnp.where(valid, 1 - giou, 0.0).sum()
    return cls_sum, l1_sum, giou_sum, valid.sum()


def dn_loss(dn_meta, batch, *, nc: int):
    """Contrastive-denoising branch loss (reference RTDETRDetectionLoss:291).

    The assignment is known by construction: in each of the G groups, query m of
    the positive half reconstructs gt row m; the negative half trains toward
    background. Each (layer, image, group) slice reuses _single_layer_loss with
    assign_q = arange(M).
    """
    dn_boxes = dn_meta["dn_bboxes"].astype(jnp.float32)   # (L, B, DN, 4)
    dn_scores = dn_meta["dn_scores"].astype(jnp.float32)  # (L, B, DN, nc)
    G = dn_meta["G"]
    L, B, DN, _ = dn_scores.shape
    M2 = DN // G
    M = M2 // 2
    gt_boxes = batch["bboxes"].astype(jnp.float32)
    gt_cls = batch["cls"].astype(jnp.int32)
    gt_mask = batch["mask"].astype(jnp.float32)
    assign_q = jnp.arange(M, dtype=jnp.int32)
    # reference normalizer: the dn branch matches every gt once PER GROUP, so
    # len(gt_bboxes) in DETRLoss._get_loss is G * total-valid-gt (loss.py:333)
    total_gt = (gt_mask > 0).sum()
    use_vfl = total_gt > 0
    denom = jnp.maximum(total_gt * G, 1).astype(jnp.float32)

    def per_group(pb, ps, gb, gc, gm):
        return _single_layer_terms(pb, ps, gb, gc, gm, assign_q, nc, use_vfl)

    def per_image(pb, ps, gb, gc, gm):
        cs, l1s, gs, _ = jax.vmap(lambda b, s: per_group(b, s, gb, gc, gm))(
            pb.reshape(G, M2, 4), ps.reshape(G, M2, nc))
        return cs.sum(), l1s.sum(), gs.sum()

    def per_layer(pb, ps):
        cs, l1s, gs = jax.vmap(per_image)(pb, ps, gt_boxes, gt_cls, gt_mask)
        return cs.sum() / denom, l1s.sum() / denom, gs.sum() / denom

    lc, lb, lg = jax.vmap(per_layer)(dn_boxes, dn_scores)
    has_gt = total_gt > 0
    return lc.sum(), jnp.where(has_gt, lb.sum(), 0.0), jnp.where(has_gt, lg.sum(), 0.0)


def detr_loss(outputs, batch, hyp, *, nc: int):
    """Total RT-DETR loss over all decoder layers + encoder aux (+ CDN branch).

    outputs: (dec_bboxes (L,B,Q,4), dec_scores (L,B,Q,nc), enc_bboxes, enc_scores
    [, dn_meta]).
    batch: padded {'cls' (B,M), 'bboxes' (B,M,4) normalized xywh, 'mask' (B,M)}.
    """
    dn_meta = outputs[4] if len(outputs) > 4 else None
    dec_bboxes, dec_scores, enc_bboxes, enc_scores = outputs[:4]
    L, B, Q, _ = dec_scores.shape
    gt_boxes = batch["bboxes"].astype(jnp.float32)
    gt_cls = batch["cls"].astype(jnp.int32)
    gt_mask = batch["mask"].astype(jnp.float32)

    all_boxes = jnp.concatenate([dec_bboxes, enc_bboxes[None]], 0)
    all_scores = jnp.concatenate([dec_scores, enc_scores[None]], 0)
    total_gt = (gt_mask > 0).sum()
    use_vfl = total_gt > 0
    denom = jnp.maximum(total_gt, 1).astype(jnp.float32)

    def layer_loss(boxes_l, scores_l):
        def per_image(pb, ps, gb, gc, gm):
            aq, _ = hungarian_match(pb, ps, gb, gc, gm)
            return _single_layer_terms(pb, ps, gb, gc, gm, aq, nc, use_vfl)
        cs, l1s, gs, _ = jax.vmap(per_image)(boxes_l, scores_l,
                                             gt_boxes, gt_cls, gt_mask)
        return cs.sum() / denom, l1s.sum() / denom, gs.sum() / denom

    lc, lb, lg = jax.vmap(layer_loss)(all_boxes, all_scores)
    has_gt = total_gt > 0
    lc = lc.sum()
    lb = jnp.where(has_gt, lb.sum(), 0.0)
    lg = jnp.where(has_gt, lg.sum(), 0.0)
    if dn_meta is not None:
        dc, db, dg = dn_loss(dn_meta, batch, nc=nc)
        lc, lb, lg = lc + dc, lb + db, lg + dg
    items = jnp.stack([
        LOSS_GAIN["class"] * lc,
        LOSS_GAIN["bbox"] * lb,
        LOSS_GAIN["giou"] * lg,
    ])
    # NOTE: unlike the v8-family losses, the reference does NOT scale the
    # RT-DETR total by batch size (nn/tasks.py:582 returns sum(loss.values()))
    # — the num_gts normalizer already tracks the batch.
    return DETRLossOut(items.sum(), jax.lax.stop_gradient(items))
