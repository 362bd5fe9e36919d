"""Device-side fused augmentation (data/device_augment.py): identity semantics,
mosaic box math vs an independent numpy recompute of the same random draw,
flips, label compression, and mixup label pooling."""

import jax
import jax.numpy as jnp
import numpy as np

from sar_yolo_tpu.data.device_augment import device_train_augment, draw_params

S = 64
M = 8


def _batch(B=4, with_kpts=False):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8)
    cls = np.zeros((B, M), np.float32)
    boxes = np.zeros((B, M, 4), np.float32)
    mask = np.zeros((B, M), np.float32)
    for b in range(B):
        boxes[b, 0] = [0.5, 0.5, 0.4, 0.3]
        boxes[b, 1] = [0.25, 0.3, 0.2, 0.2]
        cls[b, :2] = [1, 2]
        mask[b, :2] = 1
    out = {"img": jnp.asarray(img), "cls": jnp.asarray(cls),
           "bboxes": jnp.asarray(boxes), "mask": jnp.asarray(mask)}
    if with_kpts:
        k = np.zeros((B, M, 3, 3), np.float32)
        k[:, :2, :, 2] = 2.0
        k[:, 0, 0, :2] = [0.5, 0.5]
        k[:, 0, 1, :2] = [0.4, 0.45]
        k[:, 1, 0, :2] = [0.25, 0.3]
        out["keypoints"] = jnp.asarray(k)
    return out


IDENTITY_HYP = {"scale": 0.0, "translate": 0.0, "fliplr": 0.0, "flipud": 0.0,
                "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0, "mixup": 0.0}


def test_identity_no_mosaic():
    batch = _batch()
    out = device_train_augment(batch, jax.random.PRNGKey(0), IDENTITY_HYP, mosaic=False)
    np.testing.assert_allclose(np.asarray(out["img"]),
                               np.asarray(batch["img"], np.float32) / 255.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["bboxes"][:, :2]),
                               np.asarray(batch["bboxes"][:, :2]), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out["mask"]), np.asarray(batch["mask"]))


def test_mosaic_boxes_match_numpy_recompute():
    """Valid output boxes must equal the affine-transformed source boxes computed
    independently in numpy from the same PRNG draw."""
    B = 4
    batch = _batch(B)
    key = jax.random.PRNGKey(42)
    hyp = {"scale": 0.4, "translate": 0.1, "fliplr": 0.0, "flipud": 0.0,
           "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0, "mixup": 0.0}
    p = jax.tree.map(np.asarray, draw_params(key, B, S, hyp, mosaic=True))
    out = device_train_augment(batch, key, hyp, mosaic=True)
    boxes_in = np.asarray(batch["bboxes"])
    got_boxes = np.asarray(out["bboxes"])
    got_mask = np.asarray(out["mask"])
    got_cls = np.asarray(out["cls"])

    for b in range(B):
        tiles = [b] + list(p.sel[b])
        yc, xc, s, ty, tx = p.yc[b], p.xc[b], p.scale[b], p.ty[b], p.tx[b]
        expected = []
        for k, t in enumerate(tiles):
            oy = yc - S if k in (0, 1) else yc
            ox = xc - S if k in (0, 2) else xc
            for m in range(2):
                cx, cy, w, h = boxes_in[t, m] * S
                x1, y1 = cx - w / 2 + ox, cy - h / 2 + oy
                x2, y2 = cx + w / 2 + ox, cy + h / 2 + oy
                x1, x2 = s * (x1 - S) + tx, s * (x2 - S) + tx
                y1, y2 = s * (y1 - S) + ty, s * (y2 - S) + ty
                x1c, y1c = np.clip([x1, y1], 0, S)
                x2c, y2c = np.clip([x2, y2], 0, S)
                w2, h2 = x2c - x1c, y2c - y1c
                keep = (w2 > 2 and h2 > 2 and
                        max(w2 / (h2 + 1e-16), h2 / (w2 + 1e-16)) < 100 and
                        w2 * h2 / (w * s * h * s + 1e-16) > 0.1)
                if keep:
                    expected.append(((x1c + x2c) / 2 / S, (y1c + y2c) / 2 / S,
                                     w2 / S, h2 / S, boxes_in[t, m][0] * 0 + (m + 1)))
        n_valid = int(got_mask[b].sum())
        assert n_valid == len(expected), (b, n_valid, len(expected))
        # compare as SETS: survivors are slot-shuffled on purpose so crowded
        # mosaics truncate a random subset (not always partner-tile labels)
        got_rows = sorted(
            tuple(np.round(np.append(got_boxes[b, j], got_cls[b, j]), 4))
            for j in range(n_valid))
        exp_rows = sorted(tuple(np.round(np.asarray(r), 4)) for r in expected)
        for g, e in zip(got_rows, exp_rows):
            np.testing.assert_allclose(g, e, atol=2e-4, err_msg=f"b={b}")


def test_mosaic_image_quadrant_colors():
    """Solid-color tiles: the output pixel at a valid transformed box center must
    be the source tile's color (no cross-tile bleed)."""
    B = 4
    colors = np.array([[200, 30, 30], [30, 200, 30], [30, 30, 200], [200, 200, 30]],
                      np.uint8)
    img = np.broadcast_to(colors[:, None, None, :], (B, S, S, 3)).copy()
    batch = _batch(B)
    batch["img"] = jnp.asarray(img)
    key = jax.random.PRNGKey(7)
    hyp = {"scale": 0.3, "translate": 0.1, "fliplr": 0.0, "flipud": 0.0,
           "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0, "mixup": 0.0}
    p = jax.tree.map(np.asarray, draw_params(key, B, S, hyp, mosaic=True))
    out = device_train_augment(batch, key, hyp, mosaic=True)
    imgs = np.asarray(out["img"])
    boxes = np.asarray(out["bboxes"])
    mask = np.asarray(out["mask"])
    cls = np.asarray(out["cls"])
    for b in range(B):
        tiles = [b] + list(p.sel[b])
        n_valid = int(mask[b].sum())
        for j in range(n_valid):
            # cls encodes source slot (1 or 2); recover source tile by order:
            # boxes appear tile-major, so count how many precede
            cx, cy, w, h = boxes[b, j]
            # interior point of the box, avoiding seams: use the center
            px = int(np.clip(cx * S, 1, S - 2))
            py = int(np.clip(cy * S, 1, S - 2))
            pix = imgs[b, py, px] * 255.0
            d = np.abs(colors[tiles].astype(np.float32) - pix).sum(1)
            src = int(np.argmin(d))
            # box j belongs to tile (j // per-tile valid count) — weaker check:
            # pixel must match ONE of the 4 source tile colors almost exactly
            assert d[src] < 20.0, (b, j, pix, colors[tiles])


def test_fliplr_flips_boxes_and_image():
    batch = _batch()
    hyp = dict(IDENTITY_HYP, fliplr=1.0)
    out = device_train_augment(batch, jax.random.PRNGKey(0), hyp, mosaic=False)
    np.testing.assert_allclose(
        np.asarray(out["img"]),
        np.asarray(batch["img"], np.float32)[:, :, ::-1, :] / 255.0, atol=1e-5)
    got = np.asarray(out["bboxes"][:, 0])
    exp = np.asarray(batch["bboxes"][:, 0])
    np.testing.assert_allclose(got[:, 0], 1.0 - exp[:, 0], atol=1e-5)
    np.testing.assert_allclose(got[:, 1:], exp[:, 1:], atol=1e-5)


def test_keypoints_transform_and_visibility():
    batch = _batch(with_kpts=True)
    hyp = dict(IDENTITY_HYP, fliplr=1.0)
    out = device_train_augment(batch, jax.random.PRNGKey(0), hyp, mosaic=False)
    k_in = np.asarray(batch["keypoints"])
    k_out = np.asarray(out["keypoints"])
    np.testing.assert_allclose(k_out[:, 0, 0, 0], 1.0 - k_in[:, 0, 0, 0], atol=1e-5)
    np.testing.assert_allclose(k_out[:, 0, 0, 1], k_in[:, 0, 0, 1], atol=1e-5)
    assert (k_out[:, 0, :2, 2] == 2.0).all()


def test_mixup_pools_partner_labels():
    B = 4
    batch = _batch(B)
    hyp = dict(IDENTITY_HYP, mixup=1.0, scale=0.0, translate=0.0)
    out = device_train_augment(batch, jax.random.PRNGKey(3), hyp, mosaic=True)
    # with mixup forced on, each sample pools its own 4-tile labels + partner's
    mask = np.asarray(out["mask"])
    assert mask.shape[1] == M
    assert (mask.sum(1) >= 2).all()
    # blended image: no pixel outside [0, 1]
    img = np.asarray(out["img"])
    assert img.min() >= 0.0 and img.max() <= 1.0


def test_hsv_changes_pixels_keeps_range():
    batch = _batch()
    hyp = dict(IDENTITY_HYP, hsv_h=0.015, hsv_s=0.7, hsv_v=0.4)
    out = device_train_augment(batch, jax.random.PRNGKey(5), hyp, mosaic=False)
    img = np.asarray(out["img"])
    base = np.asarray(batch["img"], np.float32) / 255.0
    assert img.min() >= 0.0 and img.max() <= 1.0
    assert np.abs(img - base).max() > 0.01  # jitter happened
    # boxes untouched by color jitter
    np.testing.assert_allclose(np.asarray(out["bboxes"][:, :2]),
                               np.asarray(batch["bboxes"][:, :2]), atol=1e-5)
