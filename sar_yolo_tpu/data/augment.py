"""Host-side image augmentations (numpy/cv2) with reference-pipeline semantics.

Capability parity with ultralytics/data/augment.py (Mosaic:490, RandomPerspective:966,
RandomHSV:1319, RandomFlip:1399, LetterBox:1493) including the fork's `tags`
propagation through mosaic/affine (augment.py:846-873, 1240, 1274).

Labels flow as dicts: {img uint8 HWC, cls (n,), bboxes (n,4) xyxy pixels, tags (n,)}.
The heavy per-pixel work (HSV LUTs, letterbox pad, normalize) also has a fused
device-side path in ops/preprocess.py; these numpy versions feed the training
dataloader workers where cv2's SIMD warpAffine is still the right tool.
"""

from __future__ import annotations

import math

import cv2
import numpy as np


def letterbox(img: np.ndarray, new_shape=(640, 640), color=(114, 114, 114),
              scaleup: bool = True, center: bool = True):
    """Resize + pad to new_shape keeping aspect ratio. Returns img, ratio, (dw, dh)."""
    shape = img.shape[:2]
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    if not scaleup:
        r = min(r, 1.0)
    new_unpad = (round(shape[1] * r), round(shape[0] * r))
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    if center:
        dw /= 2
        dh /= 2
    if shape[::-1] != new_unpad:
        img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = round(dh - 0.1), round(dh + 0.1)
    left, right = round(dw - 0.1), round(dw + 0.1)
    img = cv2.copyMakeBorder(img, top, bottom, left, right, cv2.BORDER_CONSTANT, value=color)
    return img, r, (left, top)


def augment_hsv(img: np.ndarray, hgain=0.015, sgain=0.7, vgain=0.4, rng=None):
    """In-place HSV jitter in uint8 LUT space (matches cv2-based reference)."""
    rng = rng or np.random.default_rng()
    if hgain or sgain or vgain:
        r = rng.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1
        hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
        x = np.arange(0, 256, dtype=r.dtype)
        lut_hue = ((x * r[0]) % 180).astype(img.dtype)
        lut_sat = np.clip(x * r[1], 0, 255).astype(img.dtype)
        lut_val = np.clip(x * r[2], 0, 255).astype(img.dtype)
        im_hsv = cv2.merge((cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat), cv2.LUT(val, lut_val)))
        cv2.cvtColor(im_hsv, cv2.COLOR_HSV2BGR, dst=img)
    return img


def random_flip(labels: dict, fliplr=0.5, flipud=0.0, rng=None, flip_idx=None):
    """Horizontal/vertical flip of image + boxes + keypoints + polygons.

    flip_idx: optional keypoint permutation for left/right-symmetric skeletons
    (reference RandomFlip augment.py:1399-1459).
    """
    rng = rng or np.random.default_rng()
    img = labels["img"]
    h, w = img.shape[:2]
    boxes = labels["bboxes"]
    kpts = labels.get("keypoints")
    polys = labels.get("polygons")
    if flipud and rng.random() < flipud:
        labels["img"] = np.flipud(img).copy()
        if len(boxes):
            boxes[:, [1, 3]] = h - boxes[:, [3, 1]]
        if kpts is not None and len(kpts):
            kpts[..., 1] = h - kpts[..., 1]
        if polys:
            for p in polys:
                p[:, 1] = h - p[:, 1]
    img = labels["img"]
    if fliplr and rng.random() < fliplr:
        labels["img"] = np.fliplr(img).copy()
        if len(boxes):
            boxes[:, [0, 2]] = w - boxes[:, [2, 0]]
        if kpts is not None and len(kpts):
            kpts[..., 0] = w - kpts[..., 0]
            if flip_idx is not None:
                kpts[:] = kpts[:, list(flip_idx)]
        if polys:
            for p in polys:
                p[:, 0] = w - p[:, 0]
    labels["bboxes"] = boxes
    return labels


def _box_candidates(box1, box2, wh_thr=2, ar_thr=100, area_thr=0.1, eps=1e-16):
    """Keep boxes that survived the affine transform (reference augment.py:1240)."""
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return (w2 > wh_thr) & (h2 > wh_thr) & (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr)


def random_perspective(labels: dict, degrees=0.0, translate=0.1, scale=0.5, shear=0.0,
                       perspective=0.0, border=(0, 0), rng=None):
    """Random affine/perspective warp of image + boxes (+tags kept aligned)."""
    rng = rng or np.random.default_rng()
    img = labels["img"]
    h = img.shape[0] + border[0] * 2
    w = img.shape[1] + border[1] * 2

    # build combined transform (center -> perspective -> rotate/scale -> shear -> translate)
    C = np.eye(3)
    C[0, 2] = -img.shape[1] / 2
    C[1, 2] = -img.shape[0] / 2
    P = np.eye(3)
    P[2, 0] = rng.uniform(-perspective, perspective)
    P[2, 1] = rng.uniform(-perspective, perspective)
    R = np.eye(3)
    a = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)
    S = np.eye(3)
    S[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    T = np.eye(3)
    T[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * w
    T[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * h
    M = T @ S @ R @ P @ C

    if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
        if perspective:
            img = cv2.warpPerspective(img, M, dsize=(w, h), borderValue=(114, 114, 114))
        else:
            img = cv2.warpAffine(img, M[:2], dsize=(w, h), borderValue=(114, 114, 114))

    def warp_points(pts):
        """(k, 2) -> transformed (k, 2)."""
        xy1 = np.ones((len(pts), 3))
        xy1[:, :2] = pts
        xy1 = xy1 @ M.T
        return xy1[:, :2] / xy1[:, 2:3] if perspective else xy1[:, :2]

    boxes = labels["bboxes"]
    n = len(boxes)
    if n:
        polys = labels.get("polygons")
        if polys:
            # segment labels: boxes re-derived from the warped polygons
            # (reference RandomPerspective.apply_segments augment.py:1098)
            new_polys = [warp_points(p) for p in polys]
            new = np.array([[p[:, 0].min(), p[:, 1].min(), p[:, 0].max(), p[:, 1].max()]
                            for p in new_polys], np.float32)
        else:
            xy = warp_points(boxes[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(n * 4, 2)).reshape(n, 8)
            x = xy[:, [0, 2, 4, 6]]
            y = xy[:, [1, 3, 5, 7]]
            new = np.stack([x.min(1), y.min(1), x.max(1), y.max(1)], axis=1)
        new[:, [0, 2]] = new[:, [0, 2]].clip(0, w)
        new[:, [1, 3]] = new[:, [1, 3]].clip(0, h)
        keep = _box_candidates(boxes.T * s, new.T, area_thr=0.01 if polys else 0.1)
        labels["bboxes"] = new[keep]
        labels["cls"] = labels["cls"][keep]
        if "tags" in labels:
            labels["tags"] = labels["tags"][keep]
        kpts = labels.get("keypoints")
        if kpts is not None and len(kpts):
            # (n, K, 2|3): warp xy, zero visibility outside the canvas
            # (reference RandomPerspective.apply_keypoints augment.py:1124)
            K = kpts.shape[1]
            xy = warp_points(kpts[..., :2].reshape(n * K, 2)).reshape(n, K, 2)
            if kpts.shape[-1] == 3:
                outside = (xy[..., 0] < 0) | (xy[..., 0] > w) | \
                          (xy[..., 1] < 0) | (xy[..., 1] > h)
                vis = np.where(outside, 0.0, kpts[..., 2])
                kpts = np.concatenate([xy, vis[..., None]], -1)
            else:
                kpts = xy
            labels["keypoints"] = kpts[keep].astype(np.float32)
        if polys:
            labels["polygons"] = [np.clip(p, [0, 0], [w, h]).astype(np.float32)
                                  for p, k in zip(new_polys, keep) if k]
    labels["img"] = img
    return labels


def mosaic4(items: list[dict], imgsz: int, rng=None) -> dict:
    """4-image mosaic composition (reference Mosaic:490); tags concatenated like
    boxes (fork augment.py:846-873)."""
    rng = rng or np.random.default_rng()
    s = imgsz
    yc = int(rng.uniform(s // 2, 2 * s - s // 2))
    xc = int(rng.uniform(s // 2, 2 * s - s // 2))
    img4 = np.full((s * 2, s * 2, 3), 114, dtype=np.uint8)
    cls4, boxes4, tags4, kpts4, polys4 = [], [], [], [], []
    has_tags = "tags" in items[0]
    has_kpts = "keypoints" in items[0]
    has_polys = "polygons" in items[0]
    for i, it in enumerate(items):
        img = it["img"]
        h, w = img.shape[:2]
        if i == 0:
            x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
            x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
        elif i == 1:
            x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, s * 2), yc
            x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
        elif i == 2:
            x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(s * 2, yc + h)
            x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
        else:
            x1a, y1a, x2a, y2a = xc, yc, min(xc + w, s * 2), min(s * 2, yc + h)
            x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
        img4[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
        padw, padh = x1a - x1b, y1a - y1b
        b = it["bboxes"].copy()
        if len(b):
            b[:, [0, 2]] += padw
            b[:, [1, 3]] += padh
        boxes4.append(b)
        cls4.append(it["cls"])
        if has_tags:
            tags4.append(it["tags"])
        if has_kpts:
            k = it["keypoints"].copy()
            if len(k):
                k[..., 0] += padw
                k[..., 1] += padh
            kpts4.append(k)
        if has_polys:
            polys4 += [p + np.array([padw, padh], np.float32) for p in it["polygons"]]
    out = {
        "img": img4,
        "cls": np.concatenate(cls4) if cls4 else np.zeros(0),
        "bboxes": np.concatenate(boxes4) if boxes4 else np.zeros((0, 4)),
        "mosaic_border": (-s // 2, -s // 2),
    }
    if has_tags:
        out["tags"] = np.concatenate(tags4)
    if has_kpts:
        out["keypoints"] = np.concatenate(kpts4) if kpts4 else np.zeros((0, 1, 3), np.float32)
    if has_polys:
        out["polygons"] = polys4
    out["bboxes"][:, [0, 2]] = out["bboxes"][:, [0, 2]].clip(0, 2 * s)
    out["bboxes"][:, [1, 3]] = out["bboxes"][:, [1, 3]].clip(0, 2 * s)
    return out


def mixup(item1: dict, item2: dict, rng=None) -> dict:
    """MixUp two samples: beta(32,32) image blend, label concat (reference MixUp:879).

    Fork behavior: tags concatenate alongside boxes (augment.py:961-962).
    """
    rng = rng or np.random.default_rng()
    r = rng.beta(32.0, 32.0)
    out = {
        "img": (item1["img"].astype(np.float32) * r +
                item2["img"].astype(np.float32) * (1 - r)).astype(np.uint8),
        "cls": np.concatenate([item1["cls"], item2["cls"]]),
        "bboxes": np.concatenate([item1["bboxes"], item2["bboxes"]]),
    }
    if "tags" in item1:
        out["tags"] = np.concatenate([item1["tags"], item2.get("tags", np.zeros(len(item2["cls"])))])
    if "keypoints" in item1:
        out["keypoints"] = np.concatenate([item1["keypoints"], item2["keypoints"]])
    if "polygons" in item1:
        out["polygons"] = list(item1["polygons"]) + list(item2.get("polygons", []))
    return out


def copy_paste(labels: dict, p: float = 0.1, ioa_thres: float = 0.30, rng=None) -> dict:
    """Copy-Paste augmentation (reference CopyPaste augment.py:1650, 'flip' mode):
    each instance is, with probability p, duplicated at its left-right mirrored
    location when the mirrored box overlaps existing boxes by IoA < ioa_thres.

    Works on pixel-space labels (img, bboxes xyxy, cls [, tags, keypoints,
    polygons]); pasted pixels are the lr-flipped patch (polygon-masked when
    polygons are available, full rect otherwise).
    """
    rng = rng or np.random.default_rng()
    boxes = labels["bboxes"]
    n = len(boxes)
    if n == 0 or p <= 0:
        return labels
    img = labels["img"]
    h, w = img.shape[:2]
    polys = labels.get("polygons")
    kpts = labels.get("keypoints")
    new_boxes, new_cls, new_tags, new_kpts, new_polys = [], [], [], [], []
    for j in range(n):
        if rng.random() >= p:
            continue
        x1, y1, x2, y2 = boxes[j]
        fx1, fx2 = w - x2, w - x1
        cand = np.array([fx1, y1, fx2, y2])
        # IoA of the mirrored box with every existing box
        ix1 = np.maximum(cand[0], boxes[:, 0])
        iy1 = np.maximum(cand[1], boxes[:, 1])
        ix2 = np.minimum(cand[2], boxes[:, 2])
        iy2 = np.minimum(cand[3], boxes[:, 3])
        inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
        area = np.maximum((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]), 1e-9)
        if (inter / area).max() >= ioa_thres:
            continue
        xi1, yi1, xi2, yi2 = int(x1), int(y1), int(np.ceil(x2)), int(np.ceil(y2))
        fxi1 = w - xi2
        fxi2 = w - xi1
        if xi2 <= xi1 or yi2 <= yi1 or fxi1 < 0 or fxi2 > w:
            continue
        patch = img[yi1:yi2, xi1:xi2][:, ::-1]
        if polys:
            mask = np.zeros(patch.shape[:2], np.uint8)
            rel = polys[j] - np.array([xi1, yi1], np.float32)
            rel[:, 0] = (xi2 - xi1) - rel[:, 0]  # mirror inside the patch
            cv2.fillPoly(mask, [np.round(rel).astype(np.int32)], 1)
            region = img[yi1:yi2, fxi1:fxi2]
            img[yi1:yi2, fxi1:fxi2] = np.where(mask[..., None] > 0, patch, region)
            flipped_poly = polys[j].copy()
            flipped_poly[:, 0] = w - flipped_poly[:, 0]
            new_polys.append(flipped_poly)
        else:
            img[yi1:yi2, fxi1:fxi2] = patch
        new_boxes.append(cand)
        new_cls.append(labels["cls"][j])
        if "tags" in labels:
            new_tags.append(labels["tags"][j])
        if kpts is not None and len(kpts):
            k = kpts[j].copy()
            k[..., 0] = w - k[..., 0]
            new_kpts.append(k)
    if new_boxes:
        labels["img"] = img
        labels["bboxes"] = np.concatenate([boxes, np.stack(new_boxes)]).astype(np.float32)
        labels["cls"] = np.concatenate([labels["cls"], np.array(new_cls, np.float32)])
        if "tags" in labels:
            labels["tags"] = np.concatenate([labels["tags"], np.array(new_tags, np.float32)])
        if kpts is not None and len(kpts):
            labels["keypoints"] = np.concatenate([kpts, np.stack(new_kpts)]).astype(np.float32)
        if polys is not None:
            labels["polygons"] = list(polys) + new_polys
    return labels


def mosaic9(items: list[dict], imgsz: int, rng=None) -> dict:
    """9-image mosaic (reference Mosaic._mosaic9 augment.py:700-770): 3x3 grid
    around a center tile, cropped to (2s, 2s) with a random border offset."""
    rng = rng or np.random.default_rng()
    s = imgsz
    img9 = np.full((s * 3, s * 3, 3), 114, dtype=np.uint8)
    hp = wp = -1
    cls9, boxes9, tags9, kpts9, polys9 = [], [], [], [], []
    has_tags = "tags" in items[0]
    has_kpts = "keypoints" in items[0]
    has_polys = "polygons" in items[0]
    for i, it in enumerate(items):
        img = it["img"]
        h, w = img.shape[:2]
        if i == 0:  # center
            c = s, s, s + w, s + h
        elif i == 1:  # top
            c = s, s - h, s + w, s
        elif i == 2:  # top right
            c = s + wp, s - h, s + wp + w, s
        elif i == 3:  # right
            c = s + w0, s, s + w0 + w, s + h
        elif i == 4:  # bottom right
            c = s + w0, s + hp, s + w0 + w, s + hp + h
        elif i == 5:  # bottom
            c = s + w0 - w, s + h0, s + w0, s + h0 + h
        elif i == 6:  # bottom left
            c = s + w0 - wp - w, s + h0, s + w0 - wp, s + h0 + h
        elif i == 7:  # left
            c = s - w, s + h0 - h, s, s + h0
        else:  # top left
            c = s - w, s + h0 - hp - h, s, s + h0 - hp
        padw, padh = c[:2]
        x1, y1, x2, y2 = (max(v, 0) for v in c)
        img9[y1:y2, x1:x2] = img[y1 - padh:, x1 - padw:][: y2 - y1, : x2 - x1]
        if i == 0:
            h0, w0 = h, w
        hp, wp = h, w
        b = it["bboxes"].copy()
        if len(b):
            b[:, [0, 2]] += padw
            b[:, [1, 3]] += padh
        boxes9.append(b)
        cls9.append(it["cls"])
        if has_tags:
            tags9.append(it["tags"])
        if has_kpts:
            k = it["keypoints"].copy()
            if len(k):
                k[..., 0] += padw
                k[..., 1] += padh
            kpts9.append(k)
        if has_polys:
            polys9 += [pp + np.array([padw, padh], np.float32) for pp in it["polygons"]]
    # crop to the final (2s, 2s) canvas with a random offset
    yc, xc = (int(rng.uniform(0, s)) for _ in range(2))
    out_img = img9[yc:yc + 2 * s, xc:xc + 2 * s]
    boxes = np.concatenate(boxes9) if boxes9 else np.zeros((0, 4), np.float32)
    if len(boxes):
        boxes[:, [0, 2]] -= xc
        boxes[:, [1, 3]] -= yc
        boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, 2 * s)
        boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, 2 * s)
    out = {"img": out_img, "cls": np.concatenate(cls9) if cls9 else np.zeros(0),
           "bboxes": boxes.astype(np.float32), "mosaic_border": (-s // 2, -s // 2)}
    if has_tags:
        out["tags"] = np.concatenate(tags9)
    if has_kpts:
        k = np.concatenate(kpts9) if kpts9 else np.zeros((0, 1, 3), np.float32)
        if len(k):
            k[..., 0] -= xc
            k[..., 1] -= yc
        out["keypoints"] = k
    if has_polys:
        out["polygons"] = [pp - np.array([xc, yc], np.float32) for pp in polys9]
    return out


class Albumentations:
    """Optional pixel-level Albumentations augmentations (reference
    data/augment.py:1749): Blur/MedianBlur/ToGray/CLAHE + brightness-contrast/
    gamma/compression at the reference's default probabilities. Import-gated —
    a silent no-op when the library is absent (it is not baked into the TPU
    image). The default list is pixel-only, so boxes/masks/kpts are untouched
    (the reference routes spatial transforms through a different path too).
    """

    def __init__(self, p: float = 1.0):
        self.p = p
        self.transform = None
        try:
            import albumentations as A
            self.transform = A.Compose([
                A.Blur(p=0.01),
                A.MedianBlur(p=0.01),
                A.ToGray(p=0.01),
                A.CLAHE(p=0.01),
                A.RandomBrightnessContrast(p=0.0),
                A.RandomGamma(p=0.0),
                A.ImageCompression(quality_range=(75, 100), p=0.0),
            ])
        except ImportError:
            pass
        except Exception as e:  # noqa: BLE001 - any albumentations init issue
            from sar_yolo_tpu.utils import LOGGER
            LOGGER.info(f"albumentations disabled: {e}")

    def __call__(self, item: dict, rng=None) -> dict:
        if self.transform is None:
            return item
        rng = rng or np.random.default_rng()
        if rng.random() > self.p:
            return item
        # albumentations draws from python/np global random state — seed both
        # from the pipeline's threaded rng so runs stay seed-reproducible like
        # every other augment here
        import random
        random.seed(int(rng.integers(0, 2**31)))
        np.random.seed(int(rng.integers(0, 2**31)))
        item["img"] = self.transform(image=item["img"])["image"]
        return item
