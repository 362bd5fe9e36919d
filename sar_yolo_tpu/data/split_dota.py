"""DOTA tiling: split huge aerial images into overlapping crops with remapped
OBB labels.

Capability parity with reference data/split_dota.py (get_windows:97,
get_window_obj:141, crop_and_save:155, split_trainval:230, split_test:260).
Redesigned IoF: the reference calls shapely per polygon pair; a window is an
axis-aligned rectangle, so polygon∩window is four Sutherland-Hodgman half-plane
clips — implemented here as vectorized numpy over all (polygon, window) pairs
at once, no geometry library needed.

Labels are DOTA-OBB rows `class x1 y1 x2 y2 x3 y3 x4 y4` (normalized).
"""

from __future__ import annotations

from glob import glob
from math import ceil
from pathlib import Path

import cv2
import numpy as np

from sar_yolo_tpu.utils import LOGGER

from .dataset import _image_shape, img2label_paths


def _clip_poly_halfplane(pts, valid_mask, axis, bound, keep_leq):
    """One Sutherland-Hodgman pass clipping (N, V, 2) polygons against
    `coord <= bound` (keep_leq) or `coord >= bound`.

    Ragged vertex counts are carried as (pts, valid_mask); clipped polygons
    gain at most one vertex per pass, so V grows by 1 each call.
    """
    N, V, _ = pts.shape
    out_pts = np.zeros((N, V + 1, 2), pts.dtype)
    out_valid = np.zeros((N, V + 1), bool)
    for n in range(N):
        verts = pts[n][valid_mask[n]]
        if len(verts) == 0:
            continue
        res = []
        for i in range(len(verts)):
            cur, nxt = verts[i], verts[(i + 1) % len(verts)]
            cin = cur[axis] <= bound if keep_leq else cur[axis] >= bound
            nin = nxt[axis] <= bound if keep_leq else nxt[axis] >= bound
            if cin:
                res.append(cur)
            if cin != nin:  # edge crosses the bound: add intersection
                t = (bound - cur[axis]) / (nxt[axis] - cur[axis])
                res.append(cur + t * (nxt - cur))
        k = min(len(res), V + 1)
        if k:
            out_pts[n, :k] = np.stack(res[:k])
            out_valid[n, :k] = True
    return out_pts, out_valid


def _poly_area(pts, valid_mask):
    """Shoelace area of ragged polygons (N, V, 2)."""
    areas = np.zeros(len(pts), np.float64)
    for n in range(len(pts)):
        v = pts[n][valid_mask[n]]
        if len(v) < 3:
            continue
        x, y = v[:, 0], v[:, 1]
        areas[n] = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    return areas


def bbox_iof(polygons: np.ndarray, windows: np.ndarray, eps: float = 1e-6) -> np.ndarray:
    """IoF of quad polygons vs axis-aligned windows.

    polygons: (n, 8) [x1 y1 ... x4 y4]; windows: (m, 4) xyxy.
    Returns (n, m): area(poly ∩ window) / area(poly).
    """
    n, m = len(polygons), len(windows)
    if n == 0 or m == 0:
        return np.zeros((n, m))
    quads = polygons.reshape(n, 1, 4, 2).repeat(m, 1).reshape(n * m, 4, 2)
    wins = np.broadcast_to(windows, (n, m, 4)).reshape(n * m, 4)
    pts = quads.astype(np.float64)
    valid = np.ones(pts.shape[:2], bool)
    # 4 half-plane clips: x>=x1, x<=x2, y>=y1, y<=y2 — per-pair bounds, so do
    # pairs with identical windows in one call via grouping on the flat index
    for axis, col, keep_leq in ((0, 0, False), (0, 2, True), (1, 1, False), (1, 3, True)):
        new_pts = np.zeros((pts.shape[0], pts.shape[1] + 1, 2))
        new_valid = np.zeros((pts.shape[0], pts.shape[1] + 1), bool)
        for b in np.unique(wins[:, col]):
            sel = wins[:, col] == b
            p, v = _clip_poly_halfplane(pts[sel], valid[sel], axis, b, keep_leq)
            new_pts[sel], new_valid[sel] = p, v
        pts, valid = new_pts, new_valid
    inter = _poly_area(pts, valid)
    full = _poly_area(quads.astype(np.float64), np.ones(quads.shape[:2], bool))
    return (inter / np.clip(full, eps, None)).reshape(n, m)


def load_yolo_dota(data_root, split="train"):
    """Read `images/<split>` + `labels/<split>` into [{ori_size, label, filepath}]."""
    assert split in {"train", "val"}, f"split must be train or val, not {split}"
    im_dir = Path(data_root) / "images" / split
    assert im_dir.exists(), f"missing {im_dir}"
    im_files = sorted(glob(str(im_dir / "*")))
    lb_files = img2label_paths(im_files)
    annos = []
    for im_file, lb_file in zip(im_files, lb_files):
        shape = _image_shape(im_file)
        if shape is None:
            continue
        h, w = shape
        rows = []
        if Path(lb_file).is_file():
            rows = [ln.split() for ln in Path(lb_file).read_text().splitlines() if ln.strip()]
        lb = np.array(rows, np.float32) if rows else np.zeros((0, 9), np.float32)
        annos.append({"ori_size": (h, w), "label": lb, "filepath": im_file})
    return annos


def get_windows(im_size, crop_sizes=(1024,), gaps=(200,), im_rate_thr=0.6, eps=0.01):
    """Sliding-window tile coordinates (reference get_windows:97), xyxy int64.

    Windows whose in-image area fraction <= im_rate_thr are dropped unless no
    window passes, in which case the best ones are kept.
    """
    h, w = im_size

    def axis_origins(extent: int, crop: int, step: int) -> np.ndarray:
        """Tile origins along one axis: a regular grid at `step`, with the last
        origin pulled back so the final tile ends at the image edge."""
        n = max(ceil((extent - crop) / step) + 1, 1) if extent > crop else 1
        org = np.arange(n, dtype=np.int64) * step
        if n > 1 and org[-1] + crop > extent:
            org[-1] = extent - crop
        return org

    grids = []
    for crop_size, gap in zip(crop_sizes, gaps):
        assert crop_size > gap, f"invalid crop_size/gap pair [{crop_size} {gap}]"
        step = crop_size - gap
        gx, gy = np.meshgrid(axis_origins(w, crop_size, step),
                             axis_origins(h, crop_size, step), indexing="ij")
        tl = np.stack([gx.ravel(), gy.ravel()], axis=1)
        grids.append(np.concatenate([tl, tl + crop_size], axis=1))
    windows = np.concatenate(grids, axis=0).astype(np.int64)
    clipped = windows.copy()
    clipped[:, 0::2] = clipped[:, 0::2].clip(0, w)
    clipped[:, 1::2] = clipped[:, 1::2].clip(0, h)
    im_areas = (clipped[:, 2] - clipped[:, 0]) * (clipped[:, 3] - clipped[:, 1])
    win_areas = (windows[:, 2] - windows[:, 0]) * (windows[:, 3] - windows[:, 1])
    rates = im_areas / win_areas
    if not (rates > im_rate_thr).any():
        rates[np.abs(rates - rates.max()) < eps] = 1
    return windows[rates > im_rate_thr]


def get_window_obj(anno, windows, iof_thr=0.7):
    """Per-window label subsets: polygons with IoF >= iof_thr vs the window.

    Returns labels in ORIGINAL-image pixels (crop_and_save re-maps them).
    """
    h, w = anno["ori_size"]
    label = anno["label"].copy()
    if not len(label):
        return [np.zeros((0, 9), np.float32) for _ in range(len(windows))]
    label[:, 1::2] *= w
    label[:, 2::2] *= h
    iofs = bbox_iof(label[:, 1:], windows.astype(np.float64))
    return [label[iofs[:, i] >= iof_thr] for i in range(len(windows))]


def crop_and_save(anno, windows, window_objs, im_dir, lb_dir,
                  allow_background_images=True):
    """Write `<stem>__<size>__<x>___<y>.jpg` crops + renormalized label txts."""
    im = cv2.imread(anno["filepath"])
    name = Path(anno["filepath"]).stem
    for i, window in enumerate(windows):
        x_start, y_start, x_stop, y_stop = window.tolist()
        new_name = f"{name}__{x_stop - x_start}__{x_start}___{y_start}"
        patch = im[y_start:y_stop, x_start:x_stop]
        ph, pw = patch.shape[:2]
        label = window_objs[i].copy()
        if len(label) or allow_background_images:
            cv2.imwrite(str(Path(im_dir) / f"{new_name}.jpg"), patch)
        if len(label):
            label[:, 1::2] = (label[:, 1::2] - x_start) / pw
            label[:, 2::2] = (label[:, 2::2] - y_start) / ph
            lines = [f"{int(lb[0])} " + " ".join(f"{c:.6g}" for c in lb[1:])
                     for lb in label]
            (Path(lb_dir) / f"{new_name}.txt").write_text("\n".join(lines) + "\n")


def split_images_and_labels(data_root, save_dir, split="train", crop_sizes=(1024,),
                            gaps=(200,)):
    """Tile one split's images + labels into save_dir (reference layout)."""
    im_dir = Path(save_dir) / "images" / split
    lb_dir = Path(save_dir) / "labels" / split
    im_dir.mkdir(parents=True, exist_ok=True)
    lb_dir.mkdir(parents=True, exist_ok=True)
    annos = load_yolo_dota(data_root, split=split)
    for anno in annos:
        windows = get_windows(anno["ori_size"], crop_sizes, gaps)
        window_objs = get_window_obj(anno, windows)
        crop_and_save(anno, windows, window_objs, str(im_dir), str(lb_dir))
    LOGGER.info(f"split {len(annos)} {split} images into {im_dir}")


def split_trainval(data_root, save_dir, crop_size=1024, gap=200, rates=(1.0,)):
    """Tile DOTA train+val at one or more zoom rates (reference split_dota.py:230)."""
    crop_sizes = [int(crop_size / r) for r in rates]
    gaps = [int(gap / r) for r in rates]
    for split in ("train", "val"):
        split_images_and_labels(data_root, save_dir, split, crop_sizes, gaps)


def split_test(data_root, save_dir, crop_size=1024, gap=200, rates=(1.0,)):
    """Tile the unlabeled DOTA test split (reference split_dota.py:260)."""
    crop_sizes = [int(crop_size / r) for r in rates]
    gaps = [int(gap / r) for r in rates]
    out = Path(save_dir) / "images" / "test"
    out.mkdir(parents=True, exist_ok=True)
    im_dir = Path(data_root) / "images" / "test"
    assert im_dir.exists(), f"missing {im_dir}"
    for im_file in sorted(glob(str(im_dir / "*"))):
        shape = _image_shape(im_file)
        if shape is None:
            continue
        windows = get_windows(shape, crop_sizes, gaps)
        im = cv2.imread(im_file)
        name = Path(im_file).stem
        for window in windows:
            x_start, y_start, x_stop, y_stop = window.tolist()
            patch = im[y_start:y_stop, x_start:x_stop]
            cv2.imwrite(str(out / f"{name}__{x_stop - x_start}__{x_start}___{y_start}.jpg"),
                        patch)
