"""Device-side training augmentation: mosaic4 + affine + HSV + flips + mixup as
one fused XLA program inside the train step.

North-star requirement (BASELINE.json): the reference runs mosaic/affine/HSV/
flip in CPU dataloader workers with cv2 (ultralytics/data/augment.py Mosaic:490,
RandomPerspective:966, RandomHSV:1319, RandomFlip:1399) and uploads float
tensors. Here the host only decodes + letterboxes raw frames; the whole
augmentation pipeline runs on-device on the uint8 batch, fused into the same
jit as the forward/backward pass — the host stays out of the hot loop and HBM
sees one uint8 copy per image.

TPU-native design — no gathers, no dynamic shapes:
  * Mosaic placement AND the affine scale/translate warp are expressed as TWO
    batched dense matmuls per tile row (out = Wy @ img @ Wx^T) where Wy/Wx are
    per-sample bilinear interpolation weight matrices built on the fly from the
    random draw. Bilinear resampling along an axis is a 2-tap linear map, so
    the weight matrix has 2 nonzeros per row and the matmul is numerically
    identical to gather+lerp — but it rides the MXU instead of scattering.
  * The 4 mosaic quadrant masks are separable (row-indicator x col-indicator
    at the mosaic center) and are folded INTO the weight matrices; the gray 114
    background is `1 - coverage` where coverage is the product of the masked
    weight row-sums. The 2x-canvas composite image is never materialized.
  * Per-sample randomness comes from one jax PRNG key; a host-side helper
    (`draw_params`) exposes the exact draws for tests.

Semantics deviations from the reference host path (documented, statistical):
  * Source tiles enter the mosaic as centered letterboxed squares (the host
    anchors the unpadded image at the mosaic center). The random center/scale/
    translate jitter subsumes the placement difference.
  * degrees/shear/perspective are not supported on-device (the warp must stay
    axis-separable for the matmul form). The default hyp has all three at 0;
    the trainer falls back to the host pipeline when any is nonzero.
  * HSV jitter runs in float RGB<->HSV (cv2 uses uint8 LUTs) — differences are
    sub-LSB rounding.
  * Mosaic quadrant seams: an output pixel whose sample position straddles the
    seam blends the in-tile tap with gray 114 (the neighbor tile's tap is
    masked out), where cv2 warps the composited canvas and blends the two
    tiles. Effect: a <=1px 50%-gray-tinted band along each seam — statistical
    noise at training scale, but a known visual difference.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class AugParams(NamedTuple):
    """Random draws for one batch (all shapes (B,) unless noted)."""
    sel: jnp.ndarray        # (B, 3) int32 partner indices for mosaic tiles 1..3
    yc: jnp.ndarray         # mosaic center rows in 2S canvas coords
    xc: jnp.ndarray         # mosaic center cols
    scale: jnp.ndarray      # affine scale s ~ U(1-scale, 1+scale)
    ty: jnp.ndarray         # affine translation (output px)
    tx: jnp.ndarray
    fliplr: jnp.ndarray     # bool
    flipud: jnp.ndarray     # bool
    hsv_gains: jnp.ndarray  # (B, 3) multiplicative h/s/v gains
    mix: jnp.ndarray        # bool: blend with batch-rolled partner (mixup)
    mix_r: jnp.ndarray      # beta(32,32) blend ratio


def draw_params(key: jax.Array, B: int, S: int, hyp: dict, mosaic: bool,
                partner_span: int | None = None) -> AugParams:
    """Draw all augmentation randomness for a batch.

    hyp keys used: scale, translate, fliplr, flipud, hsv_h, hsv_s, hsv_v, mixup.
    partner_span: restrict mosaic partners to contiguous index groups of this
    size (= the per-device sub-batch under dp sharding, so the partner gather
    never forces a cross-shard all-gather of the image batch); identical
    statistics when span == B.
    """
    ks = jax.random.split(key, 8)
    span = int(partner_span or B)
    base = (jnp.arange(B)[:, None] // span) * span
    sel = base + (jnp.arange(B)[:, None] - base
                  + jax.random.randint(ks[0], (B, 3), 0, span)) % span
    if mosaic:
        # reference Mosaic: center ~ U(S/2, 3S/2) in the 2S canvas (augment.py:560)
        c = jax.random.uniform(ks[1], (B, 2), minval=0.5 * S, maxval=1.5 * S)
    else:
        c = jnp.full((B, 2), 0.5 * S)
    sc = float(hyp.get("scale", 0.5))
    tr = float(hyp.get("translate", 0.1))
    scale = jax.random.uniform(ks[2], (B,), minval=1.0 - sc, maxval=1.0 + sc)
    t = jax.random.uniform(ks[3], (B, 2), minval=0.5 - tr, maxval=0.5 + tr) * S
    u = jax.random.uniform(ks[4], (B, 2))
    fliplr = u[:, 0] < float(hyp.get("fliplr", 0.5))
    flipud = u[:, 1] < float(hyp.get("flipud", 0.0))
    g = jax.random.uniform(ks[5], (B, 3), minval=-1.0, maxval=1.0)
    hsv_gains = 1.0 + g * jnp.array([float(hyp.get("hsv_h", 0.015)),
                                     float(hyp.get("hsv_s", 0.7)),
                                     float(hyp.get("hsv_v", 0.4))])
    mixup_p = float(hyp.get("mixup", 0.0)) if mosaic else 0.0
    mix = jax.random.uniform(ks[6], (B,)) < mixup_p
    mix_r = jax.random.beta(ks[7], 32.0, 32.0, (B,))
    return AugParams(sel, c[:, 0], c[:, 1], scale, t[:, 0], t[:, 1],
                     fliplr, flipud, hsv_gains, mix, mix_r)


def _axis_weights(pos: jnp.ndarray, S: int, lo: jnp.ndarray, hi: jnp.ndarray,
                  dtype) -> jnp.ndarray:
    """(B, S_out, S) bilinear weight matrices sampling tile coords `pos` (B, S_out),
    with rows zeroed where the sampled canvas coordinate is outside [lo, hi)
    (the quadrant interval, in the same units as pos' canvas origin: pos is
    tile-local, lo/hi are bounds ON pos).

    w[b, i, j] = max(0, 1 - |pos[b,i] - j|) * [lo <= pos < hi]
    """
    j = jnp.arange(S, dtype=pos.dtype)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, :, None] - j[None, None, :]))
    valid = (pos >= lo[:, None]) & (pos < hi[:, None])
    return (w * valid[:, :, None]).astype(dtype)


def _hsv_jitter(x: jnp.ndarray, gains: jnp.ndarray) -> jnp.ndarray:
    """Float RGB [0,1] -> HSV jitter by per-image gains (B,3) -> RGB [0,1]."""
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
    sel = [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5]
    return jnp.stack([jnp.select(sel, [v, q, p, p, t, v]),
                      jnp.select(sel, [t, v, v, q, p, p]),
                      jnp.select(sel, [p, p, t, v, v, q])], -1)


def device_train_augment(batch: dict, key: jax.Array, hyp: dict, *,
                         mosaic: bool = True, max_labels: int | None = None,
                         partner_span: int | None = None,
                         dtype=jnp.float32) -> dict:
    """Fused on-device train augmentation. Call INSIDE the jitted train step.

    batch: img (B,S,S,3) uint8 letterboxed raw tiles; cls (B,M); bboxes (B,M,4)
    normalized xywh; mask (B,M); optional tags (B,M), keypoints (B,M,K,kd).
    Returns the same structure with img replaced by normalized float [0,1]
    (dtype) and labels transformed; label count stays M (static shapes) —
    when a crowded mosaic yields more than M surviving labels, a RANDOM
    M-subset is kept (a stable cut would systematically drop partner-tile
    objects). partner_span: see draw_params (dp-local mosaic partners).
    """
    img = batch["img"]
    B, S = img.shape[0], img.shape[1]
    M = batch["bboxes"].shape[1]
    Mout = max_labels or M
    # fold_in (not split) so draw_params sees the caller's key unchanged —
    # tests recompute the draws via draw_params(key)
    kshuf = jax.random.fold_in(key, 0x5151)
    p = draw_params(key, B, S, hyp, mosaic, partner_span=partner_span)
    n_tiles = 4 if mosaic else 1

    # --- gather source tiles + labels -----------------------------------
    if mosaic:
        idx = jnp.concatenate([jnp.arange(B)[:, None], p.sel], 1)  # (B, 4)
    else:
        idx = jnp.arange(B)[:, None]
    tiles = img[idx].astype(dtype)                         # (B, T, S, S, 3)
    cls_t = batch["cls"][idx]                              # (B, T, M)
    box_t = batch["bboxes"][idx]                           # (B, T, M, 4)
    msk_t = batch["mask"][idx]
    tag_t = batch["tags"][idx] if "tags" in batch else None
    kpt_t = batch["keypoints"][idx] if "keypoints" in batch else None

    # --- affine sampling grid -------------------------------------------
    # canvas->output: y' = s*(u - C) + T  =>  u(y') = (y' - T)/s + C
    C = float(S) if mosaic else 0.5 * S                    # canvas center shift
    yo = jnp.arange(S, dtype=jnp.float32)
    u_y = (yo[None, :] - p.ty[:, None]) / p.scale[:, None] + C   # (B, S) canvas rows
    u_x = (yo[None, :] - p.tx[:, None]) / p.scale[:, None] + C   # (B, S) canvas cols

    if mosaic:
        # tile k placement offsets in canvas coords: rows {yc-S, yc}, cols {xc-S, xc}
        oy = jnp.stack([p.yc - S, p.yc - S, p.yc, p.yc], 1)      # (B, 4)
        ox = jnp.stack([p.xc - S, p.xc, p.xc - S, p.xc], 1)
        # quadrant bounds expressed on tile-local coords pos = u - o:
        #   top rows:    u < yc  ->  pos < yc - oy = S ; and pos >= 0 covers u >= yc-S
        #   bottom rows: u >= yc ->  pos >= 0 ; pos < S covers u < yc+S (canvas edge
        #   2S > yc+S always holds since yc > S/2... yc+S vs 2S: yc < 3S/2 < 2S yes)
        row_lo = jnp.stack([jnp.zeros(B), jnp.zeros(B)], 1)      # (B, 2) [top, bot]
        row_hi = jnp.stack([jnp.full((B,), float(S)), jnp.minimum(2 * S - p.yc, S)], 1)
        col_lo = jnp.stack([jnp.zeros(B), jnp.zeros(B)], 1)
        col_hi = jnp.stack([jnp.full((B,), float(S)), jnp.minimum(2 * S - p.xc, S)], 1)
        # clip the top/left tiles at the canvas edge too: pos >= oy*(-1)... top tile
        # valid canvas rows are [max(yc-S,0), yc) -> pos in [max(-oy,0), S)
        row_lo = row_lo.at[:, 0].set(jnp.maximum(-(p.yc - S), 0.0))
        col_lo = col_lo.at[:, 0].set(jnp.maximum(-(p.xc - S), 0.0))
        Wy = jnp.stack([
            _axis_weights(u_y - oy[:, 0][:, None], S, row_lo[:, 0], row_hi[:, 0], dtype),
            _axis_weights(u_y - oy[:, 2][:, None], S, row_lo[:, 1], row_hi[:, 1], dtype),
        ], 1)                                              # (B, 2, S, S) [top, bot]
        Wx = jnp.stack([
            _axis_weights(u_x - ox[:, 0][:, None], S, col_lo[:, 0], col_hi[:, 0], dtype),
            _axis_weights(u_x - ox[:, 1][:, None], S, col_lo[:, 1], col_hi[:, 1], dtype),
        ], 1)                                              # (B, 2, S, S) [left, right]
        row_of = jnp.array([0, 0, 1, 1])                   # tile -> row-weight id
        col_of = jnp.array([0, 1, 0, 1])
        Wy4 = Wy[:, row_of]                                # (B, 4, S, S)
        Wx4 = Wx[:, col_of]
    else:
        oy = jnp.zeros((B, 1))
        ox = jnp.zeros((B, 1))
        Wy4 = _axis_weights(u_y, S, jnp.full((B,), -1e9), jnp.full((B,), 1e9), dtype)[:, None]
        Wx4 = _axis_weights(u_x, S, jnp.full((B,), -1e9), jnp.full((B,), 1e9), dtype)[:, None]

    # --- warp + composite as two batched matmuls ------------------------
    t = jnp.einsum("bkij,bkjwc->bkiwc", Wy4, tiles)        # rows resampled
    out = jnp.einsum("bkxw,bkiwc->bixc", Wx4, t)           # cols + sum over tiles
    # gray fill where nothing was sampled: coverage is separable per tile
    cov = jnp.einsum("bki,bkx->bix", Wy4.sum(-1), Wx4.sum(-1))
    out = out + jnp.asarray(114.0, dtype) * jnp.maximum(1.0 - cov, 0.0)[..., None]

    # --- labels ----------------------------------------------------------
    # tile-normalized xywh -> canvas px -> output px (corners map directly:
    # axis-aligned scale+translate)
    cxy = box_t[..., :2] * S + jnp.stack([ox, oy], -1)[:, :, None, :]  # (B,T,M,2)
    wh0 = box_t[..., 2:] * S
    x1y1 = cxy - wh0 / 2
    x2y2 = cxy + wh0 / 2
    sca = p.scale[:, None, None, None]
    toff = jnp.stack([p.tx, p.ty], -1)[:, None, None, :]
    x1y1 = sca * (x1y1 - C) + toff
    x2y2 = sca * (x2y2 - C) + toff
    x1y1c = jnp.clip(x1y1, 0, S)
    x2y2c = jnp.clip(x2y2, 0, S)
    wh2 = x2y2c - x1y1c
    # box_candidates (reference augment.py:1240): min size 2px, aspect < 100,
    # clipped/pre-affine area ratio > 0.1 (pre-affine box scaled by s)
    wh1 = wh0 * sca
    ar = jnp.maximum(wh2[..., 0] / (wh2[..., 1] + 1e-16),
                     wh2[..., 1] / (wh2[..., 0] + 1e-16))
    keep = ((wh2 > 2).all(-1) & (ar < 100) &
            (wh2[..., 0] * wh2[..., 1] / (wh1[..., 0] * wh1[..., 1] + 1e-16) > 0.1))
    valid = (msk_t > 0) & keep                             # (B, T, M)

    new_box = jnp.concatenate([(x1y1c + x2y2c) / 2, wh2], -1) / S  # xywh norm
    pool = {
        "bboxes": new_box.reshape(B, n_tiles * M, 4),
        "cls": cls_t.reshape(B, n_tiles * M),
        "mask": valid.reshape(B, n_tiles * M).astype(batch["mask"].dtype),
    }
    if tag_t is not None:
        pool["tags"] = tag_t.reshape(B, n_tiles * M)
    if kpt_t is not None:
        k = kpt_t                                           # (B, T, M, K, kd)
        kxy = k[..., :2] * S + jnp.stack([ox, oy], -1)[:, :, None, None, :]
        kxy = sca[..., None] * (kxy - C) + toff[..., None, :]
        inside = ((kxy >= 0) & (kxy <= S)).all(-1)
        parts = [kxy / S]
        if k.shape[-1] == 3:
            parts.append(jnp.where(inside, k[..., 2], 0.0)[..., None])
        kk = jnp.concatenate(parts, -1)
        pool["keypoints"] = kk.reshape(B, n_tiles * M, *kk.shape[3:])

    # --- mixup (reference MixUp:879): blend with the batch-rolled partner -
    if mosaic and float(hyp.get("mixup", 0.0)) > 0:
        r = jnp.where(p.mix, p.mix_r, 1.0).astype(dtype)[:, None, None, None]
        # span-local roll: under dp sharding a global roll would shift one
        # sample across every shard boundary each step
        span = int(partner_span or B)
        i = jnp.arange(B)
        ridx = (i // span) * span + (i + 1) % span
        out = out * r + out[ridx] * (1.0 - r)
        rolled = {k2: v[ridx] for k2, v in pool.items()}
        rolled["mask"] = rolled["mask"] * p.mix[:, None]
        pool = {k2: jnp.concatenate([pool[k2], rolled[k2]], 1) for k2 in pool}

    # --- compress valid labels to the first Mout slots -------------------
    # shuffle slots first: when >Mout labels can survive, the cut keeps a
    # RANDOM subset instead of always favoring tile-0 (the sample's own)
    # labels; skipped when no truncation is possible (slot order preserved)
    P = pool["mask"].shape[1]
    if P > Mout:
        shuf = jnp.argsort(jax.random.uniform(kshuf, (B, P)), axis=1)
        pool = {k2: jnp.take_along_axis(
            v, shuf.reshape(B, -1, *([1] * (v.ndim - 2))), axis=1)
            for k2, v in pool.items()}
    order = jnp.argsort(pool["mask"] <= 0, axis=1, stable=True)[:, :min(Mout, P)]
    comp = {k2: jnp.take_along_axis(
        v, order.reshape(B, -1, *([1] * (v.ndim - 2))), axis=1) for k2, v in pool.items()}
    if Mout > P:  # pad back up (mosaic off with Mout > M never happens, but be safe)
        comp = {k2: jnp.pad(v, [(0, 0), (0, Mout - P)] + [(0, 0)] * (v.ndim - 2))
                for k2, v in comp.items()}

    # --- flips -----------------------------------------------------------
    out = jnp.where(p.fliplr[:, None, None, None], out[:, :, ::-1, :], out)
    out = jnp.where(p.flipud[:, None, None, None], out[:, ::-1, :, :], out)
    fl = p.fliplr[:, None]
    fu = p.flipud[:, None]
    bx = comp["bboxes"]
    bx = bx.at[..., 0].set(jnp.where(fl, 1.0 - bx[..., 0], bx[..., 0]))
    bx = bx.at[..., 1].set(jnp.where(fu, 1.0 - bx[..., 1], bx[..., 1]))
    comp["bboxes"] = bx
    if "keypoints" in comp:
        kk = comp["keypoints"]
        kk = kk.at[..., 0].set(jnp.where(fl[..., None], 1.0 - kk[..., 0], kk[..., 0]))
        kk = kk.at[..., 1].set(jnp.where(fu[..., None], 1.0 - kk[..., 1], kk[..., 1]))
        flip_idx = hyp.get("flip_idx")
        if flip_idx is not None:  # keypoint lr-symmetry permutation
            kk = jnp.where(fl[..., None, None], kk[:, :, jnp.asarray(flip_idx)], kk)
        comp["keypoints"] = kk

    # --- HSV + normalize --------------------------------------------------
    x01 = jnp.clip(out.astype(jnp.float32) / 255.0, 0.0, 1.0)
    if any(float(hyp.get(k2, 0.0)) for k2 in ("hsv_h", "hsv_s", "hsv_v")):
        x01 = _hsv_jitter(x01, p.hsv_gains)

    result = dict(batch)
    result["img"] = x01.astype(dtype)
    result.update(comp)
    return result
