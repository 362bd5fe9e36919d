"""Automatic mask generation helpers (reference models/sam/amg.py).

All mask-statistics run on-device over the LOW-RES (256x256) logits so AMG
never materializes full-resolution masks for rejected candidates.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def build_point_grid(n_per_side: int) -> np.ndarray:
    """(n^2, 2) normalized [0,1] xy grid (reference amg.py:72)."""
    offset = 1.0 / (2 * n_per_side)
    pts = np.linspace(offset, 1.0 - offset, n_per_side, dtype=np.float32)
    gx, gy = np.meshgrid(pts, pts)
    return np.stack([gx.reshape(-1), gy.reshape(-1)], -1)


def stability_score(mask_logits, threshold: float = 0.0, offset: float = 1.0):
    """IoU between masks binarized at threshold±offset (reference amg.py:95).

    mask_logits (..., h, w) -> (...,).
    """
    hi = (mask_logits > (threshold + offset)).sum((-1, -2)).astype(jnp.float32)
    lo = (mask_logits > (threshold - offset)).sum((-1, -2)).astype(jnp.float32)
    return hi / jnp.maximum(lo, 1.0)


def batched_mask_to_box(masks):
    """Binary masks (..., h, w) -> xyxy boxes (..., 4); empty mask -> zeros
    (reference amg.py:282). Pure min/max reductions — no dynamic shapes.
    """
    h, w = masks.shape[-2:]
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    any_row = masks.any(-1)                                  # (..., h)
    any_col = masks.any(-2)                                  # (..., w)
    big = 1e9
    y1 = jnp.min(jnp.where(any_row, ys, big), -1)
    y2 = jnp.max(jnp.where(any_row, ys, -big), -1)
    x1 = jnp.min(jnp.where(any_col, xs, big), -1)
    x2 = jnp.max(jnp.where(any_col, xs, -big), -1)
    empty = ~masks.any((-1, -2))
    box = jnp.stack([x1, y1, x2 + 1, y2 + 1], -1)
    return jnp.where(empty[..., None], 0.0, box)


def remove_small_regions(mask: np.ndarray, area_thresh: float, mode: str):
    """Remove small disconnected regions or holes (reference amg.py:181).

    mode 'holes' fills holes smaller than area_thresh; 'islands' removes
    small connected components. Returns (mask, modified).
    """
    import cv2

    correct_holes = mode == "holes"
    working = (correct_holes ^ mask).astype(np.uint8)
    n_labels, regions, stats, _ = cv2.connectedComponentsWithStats(working, 8)
    sizes = stats[:, -1][1:]
    small = [i + 1 for i, s in enumerate(sizes) if s < area_thresh]
    if not small:
        return mask, False
    fill = [0] + small
    if not correct_holes:
        fill = [i for i in range(n_labels) if i not in fill] or [
            int(np.argmax(sizes)) + 1]
    return np.isin(regions, fill), True
