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
    return out


def plot_predictions(imgs, dets, save_path="val_batch_pred.png", names=None,
                     max_images: int = 16, conf: float = 0.25):
    """Prediction-overlay mosaic for val batches (reference plot_images with
    preds, used by BaseValidator.plot_predictions). dets: list per image of
    (n, >=6) [x1 y1 x2 y2 conf cls] in letterbox pixel space."""
    import cv2
    imgs = np.asarray(imgs)
    if imgs.dtype != np.uint8:
        imgs = (imgs * 255).clip(0, 255).astype(np.uint8)
    B = min(len(imgs), max_images)
    s = imgs.shape[1]
    cols = int(np.ceil(np.sqrt(B)))
    rows = int(np.ceil(B / cols))
    canvas = np.full((rows * s, cols * s, 3), 255, np.uint8)
    for b in range(B):
        img = np.ascontiguousarray(imgs[b])
        d = np.asarray(dets[b]) if b < len(dets) and dets[b] is not None else np.zeros((0, 6))
        for row in d:
            if row[4] < conf:
                continue
            c = int(row[5])
            color = tuple(int(v) for v in PALETTE[c % len(PALETTE)])
            cv2.rectangle(img, (int(row[0]), int(row[1])), (int(row[2]), int(row[3])),
                          color, 1)
            label = f"{(names or {}).get(c, c)} {row[4]:.2f}"
            cv2.putText(img, label, (int(row[0]), max(10, int(row[1]) - 2)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.35, color, 1)
        r, col = divmod(b, cols)
        canvas[r * s:(r + 1) * s, col * s:(col + 1) * s] = img
    cv2.imwrite(str(save_path), canvas[..., ::-1])
    return save_path


def plot_images(batch, save_path="train_batch.png", max_images: int = 16, names=None):
    """Labeled image mosaic of a training batch (reference plot_images)."""
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
        for box, c in zip(boxes, cls):
            cx, cy, bw, bh = box * [w, h, w, h]
            color = tuple(int(v) for v in PALETTE[int(c) % len(PALETTE)])
            cv2.rectangle(img, (int(cx - bw / 2), int(cy - bh / 2)),
                          (int(cx + bw / 2), int(cy + bh / 2)), color, 1)
        r, col = divmod(b, cols)
        canvas[r * s:(r + 1) * s, col * s:(col + 1) * s] = img
    cv2.imwrite(str(save_path), canvas[..., ::-1])
    return save_path
