"""Device-side fused preprocessing: letterbox resize + pad + normalize (+HSV/flip
for training) on uint8 NHWC batches.

North-star requirement (BASELINE.json): the reference letterboxes with cv2 on
CPU workers then uploads float tensors (engine/predictor.py:116-162,
data/augment.py LetterBox:1493); here raw uint8 frames upload once and the
whole pixel pipeline runs on-device inside the same jit as the model, so HBM
sees one uint8 copy instead of a 4x-larger float one.

Shapes are static per (H, W) source signature; XLA caches one executable per
camera/video geometry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _resize_weights(n_out: int, n_in: int):
    """Dense (n_out, n_in) 2-tap bilinear weight matrix, cv2 coordinate map."""
    import numpy as np
    x = (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5
    x = np.clip(x, 0.0, n_in - 1.0)
    lo = np.floor(x).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    f = (x - lo).astype(np.float32)
    w = np.zeros((n_out, n_in), np.float32)
    w[np.arange(n_out), lo] += 1.0 - f
    w[np.arange(n_out), hi] += f
    return w


def _resize_bilinear_cv2(img: jnp.ndarray, new_h: int, new_w: int) -> jnp.ndarray:
    """2-tap bilinear resize with cv2 INTER_LINEAR semantics (NO antialiasing on
    downscale — unlike jax.image.resize) so device preprocessing is pixel-
    compatible with the reference's cv2 path.

    Formulated as two dense matmuls with 2-nonzeros-per-row weight matrices so
    the resize rides the MXU instead of scalar gathers (~15x faster on TPU; the
    zero entries contribute exactly 0 so numerics match the gather+lerp form).
    """
    H, W = img.shape[:2]
    wh = jnp.asarray(_resize_weights(new_h, H), img.dtype)
    ww = jnp.asarray(_resize_weights(new_w, W), img.dtype)
    t = jnp.einsum("hH,HWc->hWc", wh, img, precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("wW,hWc->hwc", ww, t, precision=jax.lax.Precision.HIGHEST)


def letterbox_device(img: jnp.ndarray, imgsz: int, pad_value: int = 114,
                     scaleup: bool = True, dtype=jnp.float32):
    """Letterbox a uint8 (H, W, 3) image to (imgsz, imgsz, 3) on device.

    Returns (out, r, (dw, dh)) with `out` in `dtype` (0..255 range) — r/dw/dh
    are static python floats for the given H/W, so XLA bakes the scale
    constants into one executable per source geometry.

    When r == 1 (source already fits, e.g. 480x640 -> 640) the resize is the
    identity — exactly like cv2's `if r != 1: resize` short-circuit — so the
    image stays uint8 through the pad and only the final cast touches `dtype`:
    no dense matmuls, no float image materialization (the cast fuses into the
    consumer). `dtype=bfloat16` is exact for integer pixel values (<=255 fits
    bf16's 8-bit mantissa); fractional-r resizes in bf16 carry ~0.4% weight
    rounding — use the f32 default where cv2 parity matters.
    """
    H, W = img.shape[:2]
    r = min(imgsz / H, imgsz / W)
    if not scaleup:
        r = min(r, 1.0)
    new_h, new_w = round(H * r), round(W * r)
    dh, dw = imgsz - new_h, imgsz - new_w
    top, left = dh // 2, dw // 2
    if (new_h, new_w) == (H, W):  # identity resize: pad in uint8, cast last
        out = jnp.full((imgsz, imgsz, 3), pad_value, img.dtype)
        out = jax.lax.dynamic_update_slice(out, img, (top, left, 0))
        return out.astype(dtype), r, (left, top)
    resized = _resize_bilinear_cv2(img.astype(dtype), new_h, new_w)
    out = jnp.full((imgsz, imgsz, 3), jnp.asarray(pad_value, dtype), dtype)
    out = jax.lax.dynamic_update_slice(out, resized, (top, left, 0))
    return out, r, (left, top)


def preprocess_batch(imgs_u8: jnp.ndarray, dtype=jnp.float32):
    """uint8 NHWC batch -> normalized float batch (fused into the consumer jit)."""
    return imgs_u8.astype(dtype) / jnp.asarray(255.0, dtype)


def hsv_flip_batch(imgs_u8: jnp.ndarray, rng: jax.Array, hgain: float = 0.015,
                   sgain: float = 0.7, vgain: float = 0.4, fliplr: float = 0.5):
    """Device-side train-time color jitter + horizontal flip on a uint8 batch.

    HSV jitter matches the reference's cv2 LUT semantics within rounding: convert
    to HSV in float, scale H/S/V by per-image random gains, convert back.
    """
    B = imgs_u8.shape[0]
    k1, k2 = jax.random.split(rng)
    gains = 1.0 + jax.random.uniform(k1, (B, 3), minval=-1.0, maxval=1.0) * \
        jnp.array([hgain, sgain, vgain])
    x = imgs_u8.astype(jnp.float32) / 255.0

    mx = x.max(-1)
    mn = x.min(-1)
    diff = mx - mn + 1e-12
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    h = jnp.where(mx == r, (g - b) / diff % 6.0,
                  jnp.where(mx == g, (b - r) / diff + 2.0, (r - g) / diff + 4.0)) / 6.0
    s = jnp.where(mx > 0, diff / (mx + 1e-12), 0.0)
    v = mx

    h = (h * gains[:, None, None, 0]) % 1.0
    s = jnp.clip(s * gains[:, None, None, 1], 0, 1)
    v = jnp.clip(v * gains[:, None, None, 2], 0, 1)

    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    out = jnp.stack([r2, g2, b2], -1)

    do_flip = jax.random.uniform(k2, (B,)) < fliplr
    out = jnp.where(do_flip[:, None, None, None], out[:, :, ::-1, :], out)
    return (out * 255.0 + 0.5).astype(jnp.uint8), do_flip
