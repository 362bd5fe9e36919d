"""Training losses: v8 detection (BCE + CIoU + DFL) and v13 JDE (+ triplet embedding
+ class-balanced focal state loss).

Semantics parity with reference ultralytics/utils/loss.py (v8DetectionLoss:255,
BboxLoss:189, DFLoss:163, v13JDELoss:360, MetricLearningLoss:19-112). Redesigned
for XLA: every reduction is a masked sum over static shapes — no boolean
indexing, no data-dependent shapes, no host sync. The fork's class-balanced EMA
state counts become explicit functional state threaded through the train step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sar_yolo_tpu.ops.boxes import bbox2dist, bbox_iou, dfl_decode, dist2bbox, make_anchors, xywh2xyxy
from sar_yolo_tpu.ops.decode import flatten_feats
from sar_yolo_tpu.utils.tal import task_aligned_assigner


def _bce_logits(logits, targets):
    """Elementwise binary cross-entropy on logits (== torch BCEWithLogitsLoss none)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _df_loss(pred_dist, target, reg_max: int):
    """Distribution focal loss per anchor (reference DFLoss:163).

    pred_dist: (..., 4, reg_max) logits; target: (..., 4) continuous in [0, reg_max-1).
    Returns (...,) mean over the 4 sides.
    """
    target = jnp.clip(target, 0, reg_max - 1 - 0.01)
    tl = jnp.floor(target).astype(jnp.int32)
    tr = tl + 1
    wl = tr.astype(target.dtype) - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist.astype(jnp.float32), axis=-1)
    # one-hot weighted reduce instead of take_along_axis: a gather over the
    # 16-wide MINOR axis serializes on the TPU lane dimension (measured 82 ms
    # vs 3 ms per loss step at B=64 N=8400, tools/topk_bench.py) and its bwd
    # is a minor-axis scatter; the iota-compare form fuses into dense VPU ops
    w = (jax.nn.one_hot(tl, reg_max, dtype=logp.dtype) * wl[..., None] +
         jax.nn.one_hot(jnp.clip(tr, 0, reg_max - 1), reg_max, dtype=logp.dtype) * wr[..., None])
    return -(logp * w).sum(-1).mean(-1)


class DetLossOut(NamedTuple):
    total: jnp.ndarray
    items: jnp.ndarray  # (3,) box, cls, dfl (detached component values)


def detection_loss(feats, batch, hyp, *, nc: int, reg_max: int, strides, tal_topk: int = 10):
    """v8 detection loss over padded targets.

    Args:
        feats: list of per-level (B, H, W, 4*reg_max + nc) raw head maps.
        batch: dict with
            'cls'    (B, M) float/int class ids
            'bboxes' (B, M, 4) normalized xywh in [0,1]
            'mask'   (B, M) validity
        hyp: namespace with box/cls/dfl gains.

    Returns DetLossOut(total scaled by batch size, per-part values).
    """
    x, hw = flatten_feats(feats)
    B, N, _ = x.shape
    pred_distri = x[..., : 4 * reg_max].astype(jnp.float32)
    pred_scores = x[..., 4 * reg_max: 4 * reg_max + nc].astype(jnp.float32)

    anchor_points, stride_t = make_anchors(hw, strides)
    imgsz_h = hw[0][0] * strides[0]
    imgsz_w = hw[0][1] * strides[0]
    scale = jnp.array([imgsz_w, imgsz_h, imgsz_w, imgsz_h], jnp.float32)

    gt_labels = batch["cls"].astype(jnp.int32)
    gt_bboxes = xywh2xyxy(batch["bboxes"].astype(jnp.float32) * scale)
    mask_gt = batch["mask"].astype(jnp.float32) * (gt_bboxes.sum(-1) > 0)

    pred_dist4 = pred_distri.reshape(B, N, 4, reg_max)
    pred_bboxes = dist2bbox(dfl_decode(pred_distri, reg_max), anchor_points[None], xywh=False)

    assign = task_aligned_assigner(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pred_bboxes) * stride_t[None],
        anchor_points * stride_t,
        gt_labels, gt_bboxes, mask_gt,
        topk=tal_topk, num_classes=nc, alpha=0.5, beta=6.0)

    target_scores = assign.target_scores
    target_scores_sum = jnp.maximum(target_scores.sum(), 1.0)
    fg = assign.fg_mask.astype(jnp.float32)

    # cls: BCE over all anchors
    loss_cls = _bce_logits(pred_scores, target_scores).sum() / target_scores_sum

    # box: CIoU weighted by assigned score, fg only
    target_bboxes = assign.target_bboxes / stride_t[None]
    weight = target_scores.sum(-1) * fg
    iou = bbox_iou(pred_bboxes, target_bboxes, xywh=False, CIoU=True).squeeze(-1)
    loss_box = ((1.0 - iou) * weight).sum() / target_scores_sum

    # dfl
    target_ltrb = bbox2dist(anchor_points[None], target_bboxes, reg_max - 1)
    loss_dfl = (_df_loss(pred_dist4, target_ltrb, reg_max) * weight).sum() / target_scores_sum

    items = jnp.stack([loss_box * hyp.box, loss_cls * hyp.cls, loss_dfl * hyp.dfl])
    return DetLossOut(items.sum() * B, jax.lax.stop_gradient(items))


# ---------------------------------------------------------------------------
# JDE: detection + metric-learning embedding + class-balanced focal state loss
# ---------------------------------------------------------------------------


def triplet_embedding_loss(embeds, tags, conf, valid, *, margin: float = 0.075,
                           conf_fraction: float = 0.5, n_total=None):
    """Hard-positive / semi-hard-negative triplet loss over fixed-size candidates.

    Faithful to the reference MetricLearningLoss (reference utils/loss.py:19-41:
    pytorch_metric_learning BatchEasyHardMiner(pos='hard', neg='semihard') +
    TripletMarginLoss(margin=0.075) + top-50%-confidence gating), re-derived
    in fixed shapes. The library semantics matter and are matched exactly
    (pinned by tests/test_loss_crosscheck.py::test_triplet_embed_loss_*):

      * LpDistance defaults to normalize_embeddings=True — distances are L2
        on UNIT-normalized embeddings even though the reference passes
        normalize=False (that flag only guards an extra explicit F.normalize).
      * neg_strategy='semihard': an anchor with NO negative farther than its
        hardest positive is DROPPED (the library has no hardest-negative
        fallback; that fallback exists only in the unused MetricLearningLoss1).
      * TripletMarginLoss's default reducer is AvgNonZeroReducer: the mean runs
        over triplets with loss > 0 only; 0 when none.
      * gating: top_k = int(0.5 * n_fg) — derived from the TOTAL foreground
        count (pass `n_total`), so the static-K gather stays exact for
        n_fg <= 2*K.

    Args:
        embeds: (K, D) candidate embeddings (already gathered fg/top-conf).
        tags:   (K,) int person ids.
        conf:   (K,) detection confidence of each candidate.
        valid:  (K,) candidate validity mask.
        n_total: scalar total fg count before the top-K gather (defaults to
            valid.sum()); the gating keep-count is floor(conf_fraction * it).
    """
    K = embeds.shape[0]
    n_valid = valid.sum()
    # keep = min(floor(frac * n_fg_TOTAL), n_valid): the fraction is taken of
    # the FULL fg count first (reference: int(0.5 * len(confidences))), THEN
    # clamped to the candidates actually gathered — exact whenever
    # floor(frac*n_fg) <= K. (Clamping n_total before the fraction would halve
    # the kept set for K < n_fg <= 2K — round-5 review finding.)
    nt = n_total if n_total is not None else n_valid
    keep = jnp.floor(conf_fraction * nt).astype(jnp.int32)
    keep = jnp.minimum(keep, n_valid)
    conf_m = jnp.where(valid, conf, -jnp.inf)
    sc = jnp.sort(conf_m)[::-1]
    thresh = sc[jnp.clip(keep - 1, 0, K - 1)]
    sel = valid & (conf_m >= thresh) & (keep > 0)

    # LpDistance(normalize_embeddings=True): pairwise L2 on the unit sphere
    e = embeds / jnp.maximum(
        jnp.linalg.norm(embeds, axis=-1, keepdims=True), 1e-12)
    sq = jnp.sum((e[:, None, :] - e[None, :, :]) ** 2, -1)
    # safe sqrt: zero-distance pairs (diagonal, collapsed embeddings) get zero
    # gradient instead of the 1/sqrt(eps) explosion
    d = jnp.sqrt(jnp.where(sq > 1e-12, sq, 1e-12))
    same = (tags[:, None] == tags[None, :])
    pair_ok = sel[:, None] & sel[None, :]
    eye = jnp.eye(K, dtype=bool)

    pos_mask = same & ~eye & pair_ok
    neg_mask = ~same & pair_ok

    BIG = 1e9
    hard_pos = jnp.max(jnp.where(pos_mask, d, -BIG), axis=1)           # (K,)
    has_pos = pos_mask.any(axis=1)
    # semihard: closest negative STRICTLY farther than the hardest positive;
    # no fallback — anchors without one produce no triplet (library semantics)
    semi = neg_mask & (d > hard_pos[:, None])
    semi_min = jnp.min(jnp.where(semi, d, BIG), axis=1)
    has_semi = semi.any(axis=1)

    anchor_ok = sel & has_pos & has_semi
    per_anchor = jnp.maximum(hard_pos - semi_min + margin, 0.0)
    # AvgNonZeroReducer: mean over VIOLATING triplets only
    nz = anchor_ok & (per_anchor > 0)
    denom = jnp.maximum(nz.sum(), 1)
    return jnp.where(nz, per_anchor, 0.0).sum() / denom


class JDELossOut(NamedTuple):
    total: jnp.ndarray
    items: jnp.ndarray        # (5,) box, cls, dfl, emb, state
    cb_counts: jnp.ndarray    # updated class-balanced EMA counts (state_classes,)


def jde_loss_components(feats, batch, hyp, *, nc: int, reg_max: int, strides,
                        embed_dim: int, state_classes: int, cb_counts,
                        tal_topk: int = 10, triplet_k: int = 128):
    """Raw (ungained) JDE loss components; see jde_loss."""
    x, hw = flatten_feats(feats)
    B, N, _ = x.shape
    c0 = 4 * reg_max
    pred_distri = x[..., :c0].astype(jnp.float32)
    pred_scores = x[..., c0:c0 + nc].astype(jnp.float32)
    pred_embeds = x[..., c0 + nc:c0 + nc + embed_dim].astype(jnp.float32)
    pred_states = x[..., c0 + nc + embed_dim:].astype(jnp.float32)

    anchor_points, stride_t = make_anchors(hw, strides)
    imgsz_h = hw[0][0] * strides[0]
    imgsz_w = hw[0][1] * strides[0]
    scale = jnp.array([imgsz_w, imgsz_h, imgsz_w, imgsz_h], jnp.float32)

    gt_labels = batch["cls"].astype(jnp.int32)
    gt_bboxes = xywh2xyxy(batch["bboxes"].astype(jnp.float32) * scale)
    mask_gt = batch["mask"].astype(jnp.float32) * (gt_bboxes.sum(-1) > 0)
    gt_tags = batch["tags"].astype(jnp.int32)

    pred_dist4 = pred_distri.reshape(B, N, 4, reg_max)
    pred_bboxes = dist2bbox(dfl_decode(pred_distri, reg_max), anchor_points[None], xywh=False)

    assign = task_aligned_assigner(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pred_bboxes) * stride_t[None],
        anchor_points * stride_t,
        gt_labels, gt_bboxes, mask_gt, gt_tags,
        topk=tal_topk, num_classes=nc, alpha=0.5, beta=6.0)

    target_scores = assign.target_scores
    tss = jnp.maximum(target_scores.sum(), 1.0)
    fg = assign.fg_mask.astype(jnp.float32)

    loss_cls = _bce_logits(pred_scores, target_scores).sum() / tss

    target_bboxes = assign.target_bboxes / stride_t[None]
    weight = target_scores.sum(-1) * fg
    iou = bbox_iou(pred_bboxes, target_bboxes, xywh=False, CIoU=True).squeeze(-1)
    loss_box = ((1.0 - iou) * weight).sum() / tss
    target_ltrb = bbox2dist(anchor_points[None], target_bboxes, reg_max - 1)
    loss_dfl = (_df_loss(pred_dist4, target_ltrb, reg_max) * weight).sum() / tss

    # ---- embedding triplet loss on fg anchors, top-conf gated, fixed K candidates
    conf_all = (jax.nn.sigmoid(pred_scores).max(-1) * fg).reshape(-1)   # (B*N,)
    k = min(triplet_k, conf_all.shape[0])
    top_conf, top_idx = jax.lax.top_k(conf_all, k)
    emb_flat = pred_embeds.reshape(-1, embed_dim)[top_idx]
    tag_flat = assign.target_tags.reshape(-1)[top_idx]
    valid = top_conf > 0
    # gating keep-count derives from the TOTAL fg count (reference
    # MetricLearningLoss takes int(0.5*n_fg) of ALL fg anchors): exact vs the
    # reference whenever floor(0.5*n_fg) <= triplet_k
    loss_emb = triplet_embedding_loss(emb_flat, tag_flat, top_conf, valid,
                                      n_total=assign.fg_mask.sum())

    # ---- state loss: focal CE with class-balanced EMA weights over fg anchors
    # (reference uses target tags clamped into state range as state labels)
    st_target = jnp.clip(assign.target_tags, 0, state_classes - 1)
    onehot = jax.nn.one_hot(st_target, state_classes, dtype=jnp.float32)
    logp = jax.nn.log_softmax(pred_states, axis=-1)
    ce = -(onehot * logp).sum(-1)                                       # (B, N)
    p_t = jnp.exp(-ce)
    gamma = getattr(hyp, "state_focal_gamma", 2.0)
    focal_w = (1.0 - p_t) ** gamma

    use_cb = getattr(hyp, "use_state_cb", True)
    cb_beta = getattr(hyp, "state_cb_beta", 0.999)
    batch_counts = (onehot * fg[..., None]).sum((0, 1))                 # (state_classes,)
    new_counts = cb_beta * cb_counts + (1.0 - cb_beta) * batch_counts
    if use_cb:
        eps = 1e-8
        # 1 - beta^n computed as -expm1(n*log(beta)): exact for tiny n, and immune
        # to the XLA reassociation (1.0 + eps) - pow(...) that collapses to 0 in f32
        one_minus_beta_n = -jnp.expm1(new_counts * jnp.log(cb_beta))
        cb_raw = (1.0 - cb_beta) / jnp.maximum(one_minus_beta_n, eps)
        # normalize over OBSERVED classes only: a never-seen state has weight
        # ~1/eps, and including it in the mean crushes the weights of classes
        # that actually occur to ~1e-3 x CE (latent bug in the reference
        # loss.py:541-546 whenever some posture states are absent from data)
        seen = (new_counts > 1e-6).astype(jnp.float32)
        seen_mean = (cb_raw * seen).sum() / jnp.maximum(seen.sum(), 1.0)
        cb_w = jnp.where(seen > 0, cb_raw / (seen_mean + eps), 1.0)
        sample_w = (onehot * cb_w[None, None, :]).sum(-1)
    else:
        sample_w = jnp.ones_like(ce)
    n_fg = jnp.maximum(fg.sum(), 1.0)
    loss_state = (sample_w * focal_w * ce * fg).sum() / n_fg

    return {"box": loss_box, "cls": loss_cls, "dfl": loss_dfl, "emb": loss_emb,
            "state": loss_state, "cb_counts": new_counts, "batch_size": B}


def jde_loss(feats, batch, hyp, *, nc: int, reg_max: int, strides, embed_dim: int,
             state_classes: int, cb_counts, tal_topk: int = 10,
             triplet_k: int = 128):
    """v13 JDE loss: box + cls + dfl + triplet embedding + CB-focal state.

    batch additionally carries 'tags' (B, M) person ids; padded rows tag 0.
    cb_counts: (state_classes,) EMA class-sample counts (functional state).
    """
    c = jde_loss_components(feats, batch, hyp, nc=nc, reg_max=reg_max, strides=strides,
                            embed_dim=embed_dim, state_classes=state_classes,
                            cb_counts=cb_counts, tal_topk=tal_topk, triplet_k=triplet_k)
    items = jnp.stack([
        c["box"] * hyp.box,
        c["cls"] * hyp.cls,
        c["dfl"] * hyp.dfl,
        c["emb"] * getattr(hyp, "clr", 0.5),
        c["state"] * getattr(hyp, "state", 1.0),
    ])
    return JDELossOut(items.sum() * c["batch_size"], jax.lax.stop_gradient(items),
                      jax.lax.stop_gradient(c["cb_counts"]))


# ---------------------------------------------------------------------------
# Pose: detection + OKS keypoint regression + visibility
# ---------------------------------------------------------------------------

# COCO 17-keypoint OKS sigmas (public COCO eval constants, already /10 form —
# reference metrics.py:17 stores [0.26, ...] / 10.0; these ARE those quotients)
OKS_SIGMA = jnp.array([0.026, 0.025, 0.025, 0.035, 0.035, 0.079, 0.079, 0.072, 0.072,
                       0.062, 0.062, 0.107, 0.107, 0.087, 0.087, 0.089, 0.089])


class PoseLossOut(NamedTuple):
    total: jnp.ndarray
    items: jnp.ndarray  # (5,) box, pose, kobj, cls, dfl


def pose_loss(feats, batch, hyp, *, nc: int, reg_max: int, strides, kpt_shape=(17, 3),
              tal_topk: int = 10):
    """v8 pose loss (reference v8PoseLoss:984): det loss + OKS kpt + visibility BCE.

    batch adds 'keypoints' (B, M, K, 3) normalized xy + visibility.
    """
    from sar_yolo_tpu.ops.decode import kpts_decode

    x, hw = flatten_feats(feats)
    B, N, _ = x.shape
    K, kdim = kpt_shape
    nk = K * kdim
    pred_distri = x[..., : 4 * reg_max].astype(jnp.float32)
    pred_scores = x[..., 4 * reg_max: 4 * reg_max + nc].astype(jnp.float32)
    pred_kpts_raw = x[..., 4 * reg_max + nc:].astype(jnp.float32).reshape(B, N, K, kdim)

    anchor_points, stride_t = make_anchors(hw, strides)
    imgsz_h = hw[0][0] * strides[0]
    imgsz_w = hw[0][1] * strides[0]
    scale = jnp.array([imgsz_w, imgsz_h, imgsz_w, imgsz_h], jnp.float32)

    gt_labels = batch["cls"].astype(jnp.int32)
    gt_bboxes = xywh2xyxy(batch["bboxes"].astype(jnp.float32) * scale)
    mask_gt = batch["mask"].astype(jnp.float32) * (gt_bboxes.sum(-1) > 0)

    pred_dist4 = pred_distri.reshape(B, N, 4, reg_max)
    pred_bboxes = dist2bbox(dfl_decode(pred_distri, reg_max), anchor_points[None], xywh=False)
    pred_kpts = kpts_decode(anchor_points, pred_kpts_raw)  # grid units

    assign = task_aligned_assigner(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pred_bboxes) * stride_t[None],
        anchor_points * stride_t,
        gt_labels, gt_bboxes, mask_gt,
        topk=tal_topk, num_classes=nc, alpha=0.5, beta=6.0)

    target_scores = assign.target_scores
    tss = jnp.maximum(target_scores.sum(), 1.0)
    fg = assign.fg_mask.astype(jnp.float32)

    loss_cls = _bce_logits(pred_scores, target_scores).sum() / tss
    target_bboxes = assign.target_bboxes / stride_t[None]
    weight = target_scores.sum(-1) * fg
    iou = bbox_iou(pred_bboxes, target_bboxes, xywh=False, CIoU=True).squeeze(-1)
    loss_box = ((1.0 - iou) * weight).sum() / tss
    target_ltrb = bbox2dist(anchor_points[None], target_bboxes, reg_max - 1)
    loss_dfl = (_df_loss(pred_dist4, target_ltrb, reg_max) * weight).sum() / tss

    # ---- keypoints: gather per-anchor gt kpts, scale to grid units
    gt_kpts = batch["keypoints"].astype(jnp.float32)  # (B, M, K, 3) normalized
    gt_kpts = gt_kpts.at[..., 0].multiply(imgsz_w).at[..., 1].multiply(imgsz_h)
    sel = jnp.take_along_axis(gt_kpts, assign.target_gt_idx[:, :, None, None], axis=1)
    sel = sel.at[..., :2].divide(stride_t[None, :, :, None])  # (B, N, K, 3)

    kpt_mask = (sel[..., 2] != 0).astype(jnp.float32) if kdim == 3 else jnp.ones(sel.shape[:3])
    area = (target_bboxes[..., 2] - target_bboxes[..., 0]) * \
           (target_bboxes[..., 3] - target_bboxes[..., 1])  # grid units (B, N)
    sigmas = OKS_SIGMA if K == 17 else jnp.ones(K) / K
    d = ((pred_kpts[..., 0] - sel[..., 0]) ** 2 + (pred_kpts[..., 1] - sel[..., 1]) ** 2)
    e = d / ((2 * sigmas[None, None, :]) ** 2 * (area[..., None] + 1e-9) * 2)
    kpt_loss_factor = K / (kpt_mask.sum(-1, keepdims=True) + 1e-9)  # (B, N, 1)
    per_kpt = kpt_loss_factor * (1 - jnp.exp(-e)) * kpt_mask
    n_fg_k = jnp.maximum(fg.sum() * K, 1.0)
    loss_pose = (per_kpt * fg[..., None]).sum() / n_fg_k

    if kdim == 3:
        vis_bce = _bce_logits(pred_kpts[..., 2], kpt_mask)
        loss_kobj = (vis_bce * fg[..., None]).sum() / n_fg_k
    else:
        loss_kobj = jnp.zeros(())

    items = jnp.stack([
        loss_box * hyp.box,
        loss_pose * getattr(hyp, "pose", 12.0),
        loss_kobj * getattr(hyp, "kobj", 1.0),
        loss_cls * hyp.cls,
        loss_dfl * hyp.dfl,
    ])
    return PoseLossOut(items.sum() * B, jax.lax.stop_gradient(items))


# ---------------------------------------------------------------------------
# Segmentation: detection + prototype mask BCE
# ---------------------------------------------------------------------------


class SegLossOut(NamedTuple):
    total: jnp.ndarray
    items: jnp.ndarray  # (4,) box, seg, cls, dfl


def segmentation_loss(feats_and_proto, batch, hyp, *, nc: int, reg_max: int, strides,
                      nm: int = 32, tal_topk: int = 10, mask_topk: int = 64):
    """v8 segmentation loss (reference v8SegmentationLoss:801).

    feats_and_proto: (list of level maps with nm coeff channels, protos NHWC).
    batch adds 'masks' (B, mh, mw) overlap-encoded instance masks (0=bg, i+1=gt i).

    Static-shape design: instead of looping over dynamic fg anchors per image
    (reference :966-985), the top `mask_topk` anchors by assigned score compute
    mask BCE, weighted by their fg validity — bounded compute, no host sync.
    """
    from sar_yolo_tpu.ops.masks import crop_mask

    feats, protos = feats_and_proto
    x, hw = flatten_feats(feats)
    B, N, _ = x.shape
    mh, mw = protos.shape[1:3]
    pred_distri = x[..., : 4 * reg_max].astype(jnp.float32)
    pred_scores = x[..., 4 * reg_max: 4 * reg_max + nc].astype(jnp.float32)
    pred_coeffs = x[..., 4 * reg_max + nc:].astype(jnp.float32)  # (B, N, nm)

    anchor_points, stride_t = make_anchors(hw, strides)
    imgsz_h = hw[0][0] * strides[0]
    imgsz_w = hw[0][1] * strides[0]
    scale = jnp.array([imgsz_w, imgsz_h, imgsz_w, imgsz_h], jnp.float32)

    gt_labels = batch["cls"].astype(jnp.int32)
    gt_bboxes = xywh2xyxy(batch["bboxes"].astype(jnp.float32) * scale)
    mask_gt = batch["mask"].astype(jnp.float32) * (gt_bboxes.sum(-1) > 0)

    pred_dist4 = pred_distri.reshape(B, N, 4, reg_max)
    pred_bboxes = dist2bbox(dfl_decode(pred_distri, reg_max), anchor_points[None], xywh=False)

    assign = task_aligned_assigner(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        jax.lax.stop_gradient(pred_bboxes) * stride_t[None],
        anchor_points * stride_t,
        gt_labels, gt_bboxes, mask_gt,
        topk=tal_topk, num_classes=nc, alpha=0.5, beta=6.0)

    target_scores = assign.target_scores
    tss = jnp.maximum(target_scores.sum(), 1.0)
    fg = assign.fg_mask.astype(jnp.float32)

    loss_cls = _bce_logits(pred_scores, target_scores).sum() / tss
    target_bboxes_g = assign.target_bboxes / stride_t[None]
    weight = target_scores.sum(-1) * fg
    iou = bbox_iou(pred_bboxes, target_bboxes_g, xywh=False, CIoU=True).squeeze(-1)
    loss_box = ((1.0 - iou) * weight).sum() / tss
    target_ltrb = bbox2dist(anchor_points[None], target_bboxes_g, reg_max - 1)
    loss_dfl = (_df_loss(pred_dist4, target_ltrb, reg_max) * weight).sum() / tss

    # ---- mask loss on top-K anchors per image
    K = min(mask_topk, N)
    sel_w, sel_idx = jax.lax.top_k(weight, K)                     # (B, K)
    sel_valid = (sel_w > 0).astype(jnp.float32)
    coeffs = jnp.take_along_axis(pred_coeffs, sel_idx[..., None], axis=1)  # (B, K, nm)
    gt_idx = jnp.take_along_axis(assign.target_gt_idx, sel_idx, axis=1)    # (B, K)
    tb = jnp.take_along_axis(assign.target_bboxes, sel_idx[..., None], axis=1)  # pixels

    gt_masks = batch["masks"].astype(jnp.float32)                 # (B, mh', mw')
    if gt_masks.shape[1:] != (mh, mw):
        gt_masks = jax.image.resize(gt_masks, (B, mh, mw), method="nearest")
    inst = (gt_masks[:, None, :, :] == (gt_idx[..., None, None] + 1.0)).astype(jnp.float32)

    pred_m = jnp.einsum("bkc,bhwc->bkhw", coeffs, protos.astype(jnp.float32))
    bce = _bce_logits(pred_m, inst)                               # (B, K, mh, mw)
    norm = jnp.array([imgsz_w, imgsz_h, imgsz_w, imgsz_h], jnp.float32)
    tb_n = tb / norm
    mxyxy = tb_n * jnp.array([mw, mh, mw, mh], jnp.float32)
    area = jnp.maximum((tb_n[..., 2] - tb_n[..., 0]) * (tb_n[..., 3] - tb_n[..., 1]), 1e-4)
    cropped = jax.vmap(crop_mask)(bce, mxyxy)
    per_anchor = cropped.mean((-1, -2)) / area                    # (B, K)
    loss_seg = (per_anchor * sel_valid).sum() / jnp.maximum(fg.sum(), 1.0)

    items = jnp.stack([
        loss_box * hyp.box,
        loss_seg * hyp.box,
        loss_cls * hyp.cls,
        loss_dfl * hyp.dfl,
    ])
    return SegLossOut(items.sum() * B, jax.lax.stop_gradient(items))


# ---------------------------------------------------------------------------
# OBB: rotated detection (probiou + DFL + angle via dist2rbox)
# ---------------------------------------------------------------------------


class OBBLossOut(NamedTuple):
    total: jnp.ndarray
    items: jnp.ndarray  # (3,) box, cls, dfl


def obb_loss(feats, batch, hyp, *, nc: int, reg_max: int, strides, ne: int = 1,
             tal_topk: int = 10):
    """v8 OBB loss (reference v8OBBLoss:1150): rotated assigner + probiou box loss.

    batch['bboxes'] is (B, M, 5) normalized xywhr (angle in radians, unnormalized).
    Head extras carry ne angle logits; angle = (sigmoid - 0.25) * pi.
    """
    from sar_yolo_tpu.ops.boxes import dist2rbox, probiou

    x, hw = flatten_feats(feats)
    B, N, _ = x.shape
    pred_distri = x[..., : 4 * reg_max].astype(jnp.float32)
    pred_scores = x[..., 4 * reg_max: 4 * reg_max + nc].astype(jnp.float32)
    angle_logits = x[..., 4 * reg_max + nc:].astype(jnp.float32)
    pred_angle = (jax.nn.sigmoid(angle_logits) - 0.25) * jnp.pi  # (B, N, ne)

    anchor_points, stride_t = make_anchors(hw, strides)
    imgsz_h = hw[0][0] * strides[0]
    imgsz_w = hw[0][1] * strides[0]
    scale = jnp.array([imgsz_w, imgsz_h, imgsz_w, imgsz_h], jnp.float32)

    gt_labels = batch["cls"].astype(jnp.int32)
    gb = batch["bboxes"].astype(jnp.float32)
    gt_bboxes = jnp.concatenate([gb[..., :4] * scale, gb[..., 4:5]], -1)  # xywhr pixels
    # filter degenerate rboxes (reference: rw/rh >= 2px)
    size_ok = (gt_bboxes[..., 2] >= 2) & (gt_bboxes[..., 3] >= 2)
    mask_gt = batch["mask"].astype(jnp.float32) * size_ok

    pred_dist4 = pred_distri.reshape(B, N, 4, reg_max)
    dist = dfl_decode(pred_distri, reg_max)
    pred_rbox = dist2rbox(dist, pred_angle[..., :1], anchor_points[None])  # grid units
    pred_bboxes = jnp.concatenate([pred_rbox, pred_angle[..., :1]], -1)   # (B, N, 5)

    assign_boxes = jax.lax.stop_gradient(
        jnp.concatenate([pred_rbox * stride_t[None], pred_angle[..., :1]], -1))
    assign = task_aligned_assigner(
        jax.lax.stop_gradient(jax.nn.sigmoid(pred_scores)),
        assign_boxes, anchor_points * stride_t,
        gt_labels, gt_bboxes, mask_gt,
        topk=tal_topk, num_classes=nc, alpha=0.5, beta=6.0, rotated=True)

    target_scores = assign.target_scores
    tss = jnp.maximum(target_scores.sum(), 1.0)
    fg = assign.fg_mask.astype(jnp.float32)

    loss_cls = _bce_logits(pred_scores, target_scores).sum() / tss

    tb = assign.target_bboxes
    tb = jnp.concatenate([tb[..., :4] / stride_t[None], tb[..., 4:5]], -1)
    weight = target_scores.sum(-1) * fg
    iou = probiou(pred_bboxes, tb).squeeze(-1)
    loss_box = ((1.0 - iou) * weight).sum() / tss
    # DFL on the axis-aligned hull of the rotated target (reference RotatedBboxLoss
    # encodes xywh2xyxy(target[...,:4]))
    target_xyxy = xywh2xyxy(tb[..., :4])
    target_ltrb = bbox2dist(anchor_points[None], target_xyxy, reg_max - 1)
    loss_dfl = (_df_loss(pred_dist4, target_ltrb, reg_max) * weight).sum() / tss

    items = jnp.stack([loss_box * hyp.box, loss_cls * hyp.cls, loss_dfl * hyp.dfl])
    return OBBLossOut(items.sum() * B, jax.lax.stop_gradient(items))


# ---------------------------------------------------------------------------
# Classify: plain softmax cross-entropy
# ---------------------------------------------------------------------------


class ClsLossOut(NamedTuple):
    total: jnp.ndarray
    items: jnp.ndarray  # (1,)


def classification_loss(logits, batch):
    """Mean softmax CE (reference v8ClassificationLoss, utils/loss.py:1139:
    F.cross_entropy(preds, batch['cls'], reduction='mean'))."""
    import optax

    labels = batch["cls"].astype(jnp.int32).reshape(-1)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels).mean()
    return ClsLossOut(ce, jax.lax.stop_gradient(jnp.stack([ce])))
