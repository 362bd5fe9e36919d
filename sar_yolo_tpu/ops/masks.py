"""Mask ops for segmentation: crop, prototype composition, postprocess.

Capability parity: reference utils/ops.py (crop_mask:608, process_mask:663).
Pure jnp; inference postprocess stays on device with the rest of predict.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def crop_mask(masks, boxes):
    """Zero mask values outside boxes.

    masks: (N, H, W); boxes: (N, 4) xyxy in mask-pixel coords.
    """
    N, H, W = masks.shape
    x1, y1, x2, y2 = jnp.split(boxes[:, :, None], 4, axis=1)  # each (N,1,1)
    c = jax.lax.broadcasted_iota(jnp.float32, (1, 1, W), 2)
    r = jax.lax.broadcasted_iota(jnp.float32, (1, H, 1), 1)
    keep = (c >= x1) & (c < x2) & (r >= y1) & (r < y2)
    return masks * keep


def process_mask(protos, coeffs, boxes, img_hw, upsample: bool = False):
    """Compose instance masks from prototypes at inference.

    protos: (mh, mw, nm) NHWC single image; coeffs: (n, nm); boxes: (n, 4) xyxy
    in input-image pixels; img_hw: (H, W) of the network input.

    Returns (n, H, W) bool masks if upsample else (n, mh, mw).
    """
    mh, mw, nm = protos.shape
    H, W = img_hw
    masks = jax.nn.sigmoid(jnp.einsum("nc,hwc->nhw", coeffs, protos))
    scale = jnp.array([mw / W, mh / H, mw / W, mh / H], masks.dtype)
    masks = crop_mask(masks, boxes * scale[None])
    if upsample:
        masks = jax.image.resize(masks, (masks.shape[0], H, W), method="bilinear")
    return masks > 0.5
