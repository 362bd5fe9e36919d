"""Plotting: training curves, PR curves, confusion matrix, labeled batch mosaics.

Capability parity with reference utils/plotting.py (plot_results, plot_images,
plot_pr_curve) and utils/metrics.py ConfusionMatrix:297.
"""

from __future__ import annotations

import csv
from pathlib import Path

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

PALETTE = np.array([
    [56, 56, 255], [31, 112, 255], [29, 178, 255], [49, 210, 207], [10, 249, 72],
    [23, 204, 146], [134, 219, 61], [52, 147, 26], [187, 212, 0], [168, 153, 44],
], dtype=np.uint8)


def plot_results(csv_path, save_path=None):
    """Training curves from results.csv (reference plot_results)."""
    csv_path = Path(csv_path)
    if not csv_path.exists():
        return None
    with csv_path.open() as f:
        rows = list(csv.DictReader(f))
    if not rows:
        return None
    keys = [k for k in rows[0] if k not in ("epoch",)]
    epochs = [int(r["epoch"]) for r in rows]
    n = len(keys)
    cols = min(4, n)
    rows_n = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows_n, cols, figsize=(4 * cols, 3 * rows_n), squeeze=False)
    for i, k in enumerate(keys):
        ax = axes[i // cols][i % cols]
        vals = [float(r[k]) if r[k] not in ("", "None") else np.nan for r in rows]
        ax.plot(epochs, vals, marker=".")
        ax.set_title(k, fontsize=9)
        ax.grid(alpha=0.3)
    for j in range(n, rows_n * cols):
        axes[j // cols][j % cols].axis("off")
    fig.tight_layout()
    out = Path(save_path or csv_path.with_name("results.png"))
    fig.savefig(out, dpi=120)
    plt.close(fig)
    return out


def plot_pr_curve(recall_grid, precisions, names=None, save_path="pr_curve.png"):
    """PR curves per class + mean (reference plot_pr_curve)."""
    fig, ax = plt.subplots(figsize=(6, 5))
    precisions = np.atleast_2d(precisions)
    for i, p in enumerate(precisions):
        label = (names or {}).get(i, str(i))
        ax.plot(recall_grid, p, alpha=0.6, label=label)
    ax.plot(recall_grid, precisions.mean(0), "b-", lw=2, label="mean")
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1.02)
    if len(precisions) <= 12:
        ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(save_path, dpi=120)
    plt.close(fig)
    return save_path


class ConfusionMatrix:
    """Detection confusion matrix (reference metrics.py:297): nc+1 x nc+1 with
    background row/col, IoU-0.45-matched."""

    def __init__(self, nc: int, conf: float = 0.25, iou_thres: float = 0.45):
        self.nc = nc
        self.conf = conf
        self.iou_thres = iou_thres
        self.matrix = np.zeros((nc + 1, nc + 1), np.int64)

    def process_batch(self, dets, gt_boxes, gt_cls):
        """dets (n, >=6) [x1 y1 x2 y2 conf cls]; gt xyxy + cls."""
        from sar_yolo_tpu.utils.metrics import box_iou_np
        if dets is not None and len(dets):
            dets = dets[dets[:, 4] >= self.conf]
        if len(gt_cls) == 0:
            for d in (dets if dets is not None else []):
                self.matrix[int(d[5]), self.nc] += 1  # false positive
            return
        if dets is None or len(dets) == 0:
            for c in gt_cls:
                self.matrix[self.nc, int(c)] += 1  # missed
            return
        iou = box_iou_np(gt_boxes, dets[:, :4])
        matched_g, matched_p = set(), set()
        gi, pi = np.nonzero(iou >= self.iou_thres)
        order = iou[gi, pi].argsort()[::-1]
        for g, p in zip(gi[order], pi[order]):
            if g in matched_g or p in matched_p:
                continue
            matched_g.add(g)
            matched_p.add(p)
            self.matrix[int(dets[p, 5]), int(gt_cls[g])] += 1
        for g in range(len(gt_cls)):
            if g not in matched_g:
                self.matrix[self.nc, int(gt_cls[g])] += 1
        for p in range(len(dets)):
            if p not in matched_p:
                self.matrix[int(dets[p, 5]), self.nc] += 1

    def plot(self, save_path="confusion_matrix.png", names=None):
        fig, ax = plt.subplots(figsize=(6, 5))
        m = self.matrix / np.maximum(self.matrix.sum(0, keepdims=True), 1)
        im = ax.imshow(m, cmap="Blues", vmin=0, vmax=1)
        labels = [(names or {}).get(i, str(i)) for i in range(self.nc)] + ["background"]
        ax.set_xticks(range(self.nc + 1))
        ax.set_yticks(range(self.nc + 1))
        ax.set_xticklabels(labels, rotation=90, fontsize=7)
        ax.set_yticklabels(labels, fontsize=7)
        ax.set_xlabel("True")
        ax.set_ylabel("Predicted")
        fig.colorbar(im)
        fig.tight_layout()
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
        return save_path


def plot_labels(boxes, cls, names=None, save_dir="."):
    """Dataset label statistics figure (reference plot_labels, plotting.py:~500):
    class histogram, normalized xy center heatmap, wh scatter, and a sample of
    box geometries. boxes: (N, 4) normalized cxcywh; cls: (N,) ids."""
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    cls = np.asarray(cls).reshape(-1).astype(int)
    fig, axes = plt.subplots(2, 2, figsize=(10, 8))
    nc = int(cls.max()) + 1 if len(cls) else 1
    counts = np.bincount(cls, minlength=nc)
    axes[0][0].bar(range(nc), counts,
                   color=[PALETTE[i % len(PALETTE)] / 255.0 for i in range(nc)])
    axes[0][0].set_ylabel("instances")
    if names and nc <= 30:
        axes[0][0].set_xticks(range(nc))
        axes[0][0].set_xticklabels([str((names or {}).get(i, i)) for i in range(nc)],
                                   rotation=90, fontsize=7)
    if len(boxes):
        axes[0][1].hist2d(boxes[:, 0], boxes[:, 1], bins=50, cmap="Blues")
        axes[0][1].set_xlabel("x")
        axes[0][1].set_ylabel("y")
        axes[1][0].scatter(boxes[:, 2], boxes[:, 3], s=2, alpha=0.3)
        axes[1][0].set_xlabel("width")
        axes[1][0].set_ylabel("height")
        # sample of up to 500 box outlines centered at (0.5, 0.5)
        ax = axes[1][1]
        for b, c in list(zip(boxes, cls))[:500]:
            w2, h2 = b[2] / 2, b[3] / 2
            col = PALETTE[int(c) % len(PALETTE)] / 255.0
            ax.add_patch(plt.Rectangle((0.5 - w2, 0.5 - h2), b[2], b[3],
                                       fill=False, edgecolor=col, lw=0.5, alpha=0.5))
        ax.set_xlim(0, 1)
        ax.set_ylim(0, 1)
        ax.set_title("box shapes", fontsize=9)
    fig.tight_layout()
    out = Path(save_dir) / "labels.jpg"
    fig.savefig(out, dpi=120)
    plt.close(fig)
    # correlogram: pairwise xywh densities (reference labels_correlogram.jpg,
    # seaborn pairplot there; pure-matplotlib hist2d matrix here)
    if len(boxes):
        dims = ["x", "y", "width", "height"]
        fig, axes = plt.subplots(4, 4, figsize=(9, 9))
        for i in range(4):
            for j in range(4):
                ax = axes[i][j]
                if i == j:
                    ax.hist(boxes[:, i], bins=50, color="#3070ff")
                else:
                    ax.hist2d(boxes[:, j], boxes[:, i], bins=50, cmap="Blues")
                if i == 3:
                    ax.set_xlabel(dims[j], fontsize=8)
                if j == 0:
                    ax.set_ylabel(dims[i], fontsize=8)
                ax.tick_params(labelsize=6)
        fig.tight_layout()
        fig.savefig(Path(save_dir) / "labels_correlogram.jpg", dpi=120)
        plt.close(fig)
    return out


# COCO 17-keypoint skeleton (reference plotting.py Annotator.kpts skeleton)
COCO_SKELETON = [(15, 13), (13, 11), (16, 14), (14, 12), (11, 12), (5, 11),
                 (6, 12), (5, 6), (5, 7), (6, 8), (7, 9), (8, 10), (1, 2),
                 (0, 1), (0, 2), (1, 3), (2, 4), (3, 5), (4, 6)]


def _blend_mask(img, mask, color, alpha=0.45):
    """Alpha-blend a boolean instance mask (any resolution) onto img in place."""
    import cv2
    h, w = img.shape[:2]
    m = np.asarray(mask)
    if m.shape != (h, w):
        m = cv2.resize(m.astype(np.uint8), (w, h),
                       interpolation=cv2.INTER_NEAREST).astype(bool)
    else:
        m = m.astype(bool)
    img[m] = (img[m] * (1 - alpha) + np.asarray(color, np.float32) * alpha
              ).astype(np.uint8)


def _draw_kpts(img, kpts, color, kpt_conf=0.25):
    """Draw a (K, 2|3) keypoint set with the COCO skeleton when K==17."""
    import cv2
    kpts = np.asarray(kpts, np.float32)
    K = len(kpts)
    vis = kpts[:, 2] > kpt_conf if kpts.shape[1] > 2 else np.ones(K, bool)
    for (x, y), v in zip(kpts[:, :2], vis):
        if v and x > 0 and y > 0:
            cv2.circle(img, (int(x), int(y)), 2, color, -1)
    if K == 17:
        for a, b in COCO_SKELETON:
            if vis[a] and vis[b] and kpts[a, :2].min() > 0 and kpts[b, :2].min() > 0:
                cv2.line(img, (int(kpts[a, 0]), int(kpts[a, 1])),
                         (int(kpts[b, 0]), int(kpts[b, 1])), color, 1)


def _rbox_corners(cx, cy, w, h, r):
    """4 corner points of a rotated box (cxcywh + radians, reference xywhr)."""
    cos, sin = np.cos(r), np.sin(r)
    dx = np.array([w / 2, w / 2, -w / 2, -w / 2])
    dy = np.array([h / 2, -h / 2, -h / 2, h / 2])
    xs = cx + dx * cos - dy * sin
    ys = cy + dx * sin + dy * cos
    return np.stack([xs, ys], -1).astype(np.int32)


def plot_predictions(imgs, dets, save_path="val_batch_pred.png", names=None,
                     max_images: int = 16, conf: float = 0.25, masks=None,
                     kpts=None, rotated: bool = False):
    """Prediction-overlay mosaic for val batches (reference plot_images with
    preds, used by BaseValidator.plot_predictions). dets: list per image of
    (n, >=6) [x1 y1 x2 y2 conf cls] in letterbox pixel space, or — with
    rotated=True — (n, 7) [cx cy w h r conf cls] rows.

    Optional overlays (reference utils/plotting.py:393-560 capability):
      masks: list per image of (n, mh, mw) bool instance masks aligned with
             det rows (any resolution — resized to the image).
      kpts:  list per image of (n, K, 2|3) keypoints in letterbox pixels.
    """
    import cv2
    imgs = np.asarray(imgs)
    if imgs.dtype != np.uint8:
        imgs = (imgs * 255).clip(0, 255).astype(np.uint8)
    B = min(len(imgs), max_images)
    s = imgs.shape[1]
    cols = int(np.ceil(np.sqrt(B)))
    rows = int(np.ceil(B / cols))
    canvas = np.full((rows * s, cols * s, 3), 255, np.uint8)
    conf_c, cls_c = (5, 6) if rotated else (4, 5)
    for b in range(B):
        # copy, not ascontiguousarray: a contiguous view would alias the
        # caller's batch and the overlay draws would mutate it
        img = imgs[b].copy()
        d = np.asarray(dets[b]) if b < len(dets) and dets[b] is not None else np.zeros((0, 6))
        for ri, row in enumerate(d):
            if row[conf_c] < conf:
                continue
            c = int(row[cls_c])
            color = tuple(int(v) for v in PALETTE[c % len(PALETTE)])
            if rotated:
                pts = _rbox_corners(*(float(v) for v in row[:5]))
                cv2.polylines(img, [pts], isClosed=True, color=color, thickness=1)
                tx, ty = int(row[0]), max(10, int(row[1]) - 2)
            else:
                cv2.rectangle(img, (int(row[0]), int(row[1])),
                              (int(row[2]), int(row[3])), color, 1)
                tx, ty = int(row[0]), max(10, int(row[1]) - 2)
            if masks is not None and b < len(masks) and masks[b] is not None \
                    and ri < len(masks[b]):
                _blend_mask(img, masks[b][ri], PALETTE[ri % len(PALETTE)])
            if kpts is not None and b < len(kpts) and kpts[b] is not None \
                    and ri < len(kpts[b]):
                _draw_kpts(img, kpts[b][ri], color)
            label = f"{(names or {}).get(c, c)} {row[conf_c]:.2f}"
            cv2.putText(img, label, (tx, ty),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.35, color, 1)
        r, col = divmod(b, cols)
        canvas[r * s:(r + 1) * s, col * s:(col + 1) * s] = img
    cv2.imwrite(str(save_path), canvas[..., ::-1])
    return save_path


def plot_images(batch, save_path="train_batch.png", max_images: int = 16, names=None):
    """Labeled image mosaic of a training batch (reference plot_images).

    Ground-truth overlays beyond boxes (reference utils/plotting.py:393-560):
      batch["masks"]     (B, mh, mw) instance-id overlap map -> alpha-blended
                         per-instance masks;
      batch["keypoints"] (B, M, K, 2|3) normalized -> dots + COCO skeleton;
      5-column bboxes    (cx cy w h r) -> rotated box polylines (OBB).
    """
    import cv2
    imgs = batch["img"]
    if imgs.dtype != np.uint8:
        imgs = (np.asarray(imgs) * 255).clip(0, 255).astype(np.uint8)
    B = min(len(imgs), max_images)
    s = imgs.shape[1]
    cols = int(np.ceil(np.sqrt(B)))
    rows = int(np.ceil(B / cols))
    canvas = np.full((rows * s, cols * s, 3), 255, np.uint8)
    for b in range(B):
        img = imgs[b].copy()
        h, w = img.shape[:2]
        mask = np.asarray(batch["mask"][b]) > 0
        boxes = np.asarray(batch["bboxes"][b])[mask]
        cls = np.asarray(batch["cls"][b])[mask]
        rotated = boxes.shape[-1] == 5 if boxes.ndim == 2 else False
        if "masks" in batch:  # instance-id overlap map (segment GT)
            overlap = np.asarray(batch["masks"][b])
            for ii, gi in enumerate(np.nonzero(mask)[0]):
                _blend_mask(img, overlap == gi + 1, PALETTE[ii % len(PALETTE)])
        for ii, (box, c) in enumerate(zip(boxes, cls)):
            color = tuple(int(v) for v in PALETTE[int(c) % len(PALETTE)])
            if rotated:
                cx, cy, bw, bh = box[0] * w, box[1] * h, box[2] * w, box[3] * h
                pts = _rbox_corners(cx, cy, bw, bh, float(box[4]))
                cv2.polylines(img, [pts], isClosed=True, color=color, thickness=1)
            else:
                cx, cy, bw, bh = box[:4] * [w, h, w, h]
                cv2.rectangle(img, (int(cx - bw / 2), int(cy - bh / 2)),
                              (int(cx + bw / 2), int(cy + bh / 2)), color, 1)
        if "keypoints" in batch:
            kpts = np.asarray(batch["keypoints"][b])[mask]  # (G, K, 2|3) normalized
            for ii, kp in enumerate(kpts):
                kp = kp.copy().astype(np.float32)
                kp[..., 0] *= w
                kp[..., 1] *= h
                _draw_kpts(img, kp, tuple(int(v) for v in PALETTE[ii % len(PALETTE)]))
        r, col = divmod(b, cols)
        canvas[r * s:(r + 1) * s, col * s:(col + 1) * s] = img
    cv2.imwrite(str(save_path), canvas[..., ::-1])
    return save_path
