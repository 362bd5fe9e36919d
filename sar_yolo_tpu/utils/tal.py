"""Task-Aligned Assigner — fully vectorized, static-shape JAX implementation.

Semantics match reference TaskAlignedAssigner (ultralytics/utils/tal.py:14-330):
align metric s^alpha * CIoU^beta, in-gt candidate gating, per-gt top-k selection
with duplicate suppression, multi-gt anchor resolution by max overlap, and the
fork's `use_tags` extension returning per-anchor person-id targets (tal.py:41,
137-140, 214, 268-272).

Design: no boolean fancy-indexing or data-dependent shapes — everything is
one-hot / take_along_axis / where, so the whole assignment is one fused XLA
program inside the loss jit (it dominates loss-step cost in the reference;
here it compiles into batched matmul-shaped ops on the MXU/VPU).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sar_yolo_tpu.ops.boxes import bbox_iou, probiou


class AssignResult(NamedTuple):
    target_labels: jnp.ndarray   # (B, N) int32
    target_bboxes: jnp.ndarray   # (B, N, 4) xyxy
    target_scores: jnp.ndarray   # (B, N, nc) float
    fg_mask: jnp.ndarray         # (B, N) bool
    target_gt_idx: jnp.ndarray   # (B, N) int32
    target_tags: jnp.ndarray     # (B, N) int32 (zeros when tags not provided)


def task_aligned_assigner(pd_scores, pd_bboxes, anc_points, gt_labels, gt_bboxes,
                          mask_gt, gt_tags=None, *, topk: int = 10, num_classes: int = 80,
                          alpha: float = 0.5, beta: float = 6.0, eps: float = 1e-9,
                          rotated: bool = False):
    """Assign GTs to anchors by the task-aligned metric.

    Args:
        pd_scores: (B, N, nc) sigmoided class scores (stop-gradient upstream).
        pd_bboxes: (B, N, 4) decoded boxes, xyxy, image units.
        anc_points: (N, 2) anchor centers, image units.
        gt_labels: (B, M) int class ids.
        gt_bboxes: (B, M, 4) xyxy image units (padded rows are zeros).
        mask_gt: (B, M) validity mask (1 for real GT rows).
        gt_tags: optional (B, M) person-id tags (jde).
    """
    B, N, nc = pd_scores.shape
    M = gt_bboxes.shape[1]
    dtype = pd_scores.dtype
    mask_gt_f = mask_gt.astype(dtype)

    # ---- candidates whose center lies inside the gt box: (B, M, N)
    if rotated:
        # rotate anchors into each gt frame: inside iff |d| < (w, h)/2
        # (equivalent to the reference's corner cross-product test,
        #  RotatedTaskAlignedAssigner.select_candidates_in_gts tal.py:340)
        delta = anc_points[None, None, :, :] - gt_bboxes[:, :, None, :2]   # (B,M,N,2)
        r = gt_bboxes[:, :, None, 4]
        cos, sin = jnp.cos(r), jnp.sin(r)
        dx = delta[..., 0] * cos + delta[..., 1] * sin
        dy = -delta[..., 0] * sin + delta[..., 1] * cos
        mask_in_gts = ((jnp.abs(dx) < gt_bboxes[:, :, None, 2] / 2 - eps) &
                       (jnp.abs(dy) < gt_bboxes[:, :, None, 3] / 2 - eps)).astype(dtype)
    else:
        lt = anc_points[None, None, :, :] - gt_bboxes[:, :, None, :2]
        rb = gt_bboxes[:, :, None, 2:] - anc_points[None, None, :, :]
        mask_in_gts = (jnp.minimum(lt.min(-1), rb.min(-1)) > eps).astype(dtype)

    # ---- alignment metric: score of the gt class at each anchor x CIoU
    # gather per-gt-class scores: (B, M, N)
    gl = jnp.clip(gt_labels, 0, nc - 1).astype(jnp.int32)
    bbox_scores = jnp.take_along_axis(
        pd_scores.transpose(0, 2, 1), gl[:, :, None], axis=1)
    valid = (mask_in_gts * mask_gt_f[:, :, None]).astype(bool)
    if rotated:
        overlaps = probiou(gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :]).squeeze(-1)
    else:
        overlaps = bbox_iou(gt_bboxes[:, :, None, :], pd_bboxes[:, None, :, :],
                            xywh=False, CIoU=True).squeeze(-1)
    overlaps = jnp.where(valid, jnp.clip(overlaps, 0.0), 0.0).astype(dtype)
    bbox_scores = jnp.where(valid, bbox_scores, 0.0)
    align_metric = bbox_scores ** alpha * overlaps ** beta

    # ---- per-gt top-k anchors as `topk` argmax-and-mask rounds.
    # Selects the identical anchor set as lax.top_k (ties broken by lower
    # index in both) but ~4x faster on TPU: top_k lowers to a full sort of the
    # (B, M, N) metric (39.9 ms at B=64 N=8400) while each round here is two
    # fused VPU passes (9.9 ms total) — and the mask comes out directly, so
    # the reference's scatter_add duplicate-count trick (tal.py:152-160) is
    # subsumed: argmax-with-masking cannot pick an index twice.
    # NOTE: picks are kept for every valid gt even when the align metric is
    # tiny (score^0.5 * IoU^6 underflows toward 0 at init) — the reference's
    # topk_mask is mask_gt alone; strictly-zero picks are culled by the
    # `> 0` guard (matching its later mask_in_gts cull).
    mask_topk = jnp.zeros_like(align_metric)
    work = align_metric
    for _ in range(topk):
        idx = jnp.argmax(work, axis=-1)                              # (B, M)
        val = jnp.max(work, axis=-1, keepdims=True)                  # (B, M, 1)
        pick = jax.nn.one_hot(idx, N, dtype=dtype) * (val > 0).astype(dtype)
        mask_topk = mask_topk + pick
        work = jnp.where(pick > 0, -1.0, work)
    mask_topk = mask_topk * mask_gt_f[:, :, None]

    mask_pos = mask_topk * mask_in_gts * mask_gt_f[:, :, None]       # (B, M, N)

    # ---- resolve anchors matched to multiple gts: keep max-overlap gt
    fg_counts = mask_pos.sum(-2)                                     # (B, N)
    mask_multi = (fg_counts > 1)[:, None, :]                         # (B, 1, N)
    max_overlap_idx = jnp.argmax(overlaps, axis=1)                   # (B, N)
    is_max = jax.nn.one_hot(max_overlap_idx, M, dtype=dtype).transpose(0, 2, 1)
    mask_pos = jnp.where(mask_multi, is_max, mask_pos)
    fg_mask = mask_pos.sum(-2) > 0                                   # (B, N)
    target_gt_idx = jnp.argmax(mask_pos, axis=-2).astype(jnp.int32)  # (B, N)

    # ---- gather targets
    target_labels = jnp.take_along_axis(gl, target_gt_idx, axis=1)
    target_bboxes = jnp.take_along_axis(gt_bboxes, target_gt_idx[..., None], axis=1)
    target_scores = jax.nn.one_hot(target_labels, nc, dtype=dtype) * fg_mask[..., None].astype(dtype)
    if gt_tags is not None:
        tt = jnp.take_along_axis(gt_tags.astype(jnp.int32), target_gt_idx, axis=1)
        target_tags = jnp.where(fg_mask, tt, 0)
    else:
        target_tags = jnp.zeros_like(target_labels)

    # ---- normalize scores by per-gt max metric (reference tal.py:129-135)
    align_metric = align_metric * mask_pos
    pos_align = align_metric.max(-1, keepdims=True)                  # (B, M, 1)
    pos_overlap = (overlaps * mask_pos).max(-1, keepdims=True)
    norm = (align_metric * pos_overlap / (pos_align + eps)).max(-2)  # (B, N)
    target_scores = target_scores * norm[..., None]

    return AssignResult(target_labels, target_bboxes, target_scores, fg_mask,
                        target_gt_idx, target_tags)
