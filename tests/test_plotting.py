"""Overlay rendering: masks (alpha blend), keypoints (skeleton), rotated boxes
in plot_predictions / plot_images — reference utils/plotting.py:393-560
capability (VERDICT r4 item 8). Each overlay must change pixels vs the
box-only render (non-trivial diff) and stay inside the instance's region.
"""

import numpy as np
import pytest

from sar_yolo_tpu.utils.plotting import plot_images, plot_predictions


def _imread(p):
    import cv2
    return cv2.imread(str(p))


@pytest.fixture
def img_batch():
    rng = np.random.default_rng(0)
    return rng.integers(0, 128, (1, 96, 96, 3), np.uint8)


def test_mask_overlay_changes_pixels(tmp_path, img_batch):
    dets = [np.array([[10, 10, 60, 60, 0.9, 0]], np.float32)]
    base = _imread(plot_predictions(img_batch, dets, tmp_path / "box.png"))
    mask = np.zeros((24, 24), bool)
    mask[4:14, 4:14] = True  # proto-resolution mask, resized by the renderer
    over = _imread(plot_predictions(img_batch, dets, tmp_path / "m.png",
                                    masks=[np.stack([mask])]))
    diff = (base != over).any(-1)
    assert diff.sum() > 100, "mask overlay produced no meaningful pixel change"
    # blended region sits inside the upscaled mask area (plus box/label pixels)
    ys, xs = np.nonzero(diff)
    assert xs.max() < 96 and ys.max() < 96


def test_kpt_overlay_draws_skeleton(tmp_path, img_batch):
    dets = [np.array([[5, 5, 90, 90, 0.9, 0]], np.float32)]
    base = _imread(plot_predictions(img_batch, dets, tmp_path / "box.png"))
    rng = np.random.default_rng(1)
    kp = np.concatenate([rng.uniform(10, 85, (17, 2)),
                         np.ones((17, 1))], 1).astype(np.float32)
    over = _imread(plot_predictions(img_batch, dets, tmp_path / "k.png",
                                    kpts=[kp[None]]))
    assert (base != over).any(-1).sum() > 50, "keypoint overlay drew nothing"


def test_rotated_box_render(tmp_path, img_batch):
    # [cx cy w h r conf cls] rows
    dets = [np.array([[48, 48, 40, 16, 0.6, 0.9, 0]], np.float32)]
    out = _imread(plot_predictions(img_batch, dets, tmp_path / "r.png",
                                   rotated=True))
    blank = _imread(plot_predictions(img_batch, [np.zeros((0, 7))],
                                     tmp_path / "b.png", rotated=True))
    assert (out != blank).any(-1).sum() > 30, "rotated box drew nothing"
    # a rotated 40x16 box at 0.6 rad must paint pixels OFF the axis-aligned
    # rectangle edges of the same geometry — i.e. differ from rotated=False
    axis = _imread(plot_predictions(
        img_batch, [np.array([[28, 40, 68, 56, 0.9, 0]], np.float32)],
        tmp_path / "a.png"))
    assert (out != axis).any(-1).sum() > 30


def test_plot_images_gt_overlays(tmp_path, img_batch):
    base_batch = {
        "img": img_batch,
        "bboxes": np.array([[[0.5, 0.5, 0.5, 0.3]]], np.float32),
        "cls": np.array([[0]]),
        "mask": np.array([[1]], np.float32),
    }
    base = _imread(plot_images(base_batch, tmp_path / "gt.png"))

    seg_batch = dict(base_batch)
    overlap = np.zeros((1, 24, 24), np.uint8)
    overlap[0, 6:18, 6:18] = 1  # instance id 1
    seg_batch["masks"] = overlap
    seg = _imread(plot_images(seg_batch, tmp_path / "gt_m.png"))
    assert (base != seg).any(-1).sum() > 100

    pose_batch = dict(base_batch)
    rng = np.random.default_rng(2)
    pose_batch["keypoints"] = np.concatenate(
        [rng.uniform(0.2, 0.8, (1, 1, 17, 2)), np.ones((1, 1, 17, 1))],
        -1).astype(np.float32)
    pose = _imread(plot_images(pose_batch, tmp_path / "gt_k.png"))
    assert (base != pose).any(-1).sum() > 50

    obb_batch = dict(base_batch)
    obb_batch["bboxes"] = np.array([[[0.5, 0.5, 0.5, 0.2, 0.7]]], np.float32)
    obb = _imread(plot_images(obb_batch, tmp_path / "gt_r.png"))
    assert (base != obb).any(-1).sum() > 30


def test_plot_labels_and_correlogram(tmp_path):
    """plot_labels writes labels.jpg + labels_correlogram.jpg (reference
    plot_labels + seaborn correlogram capability)."""
    rng = np.random.default_rng(3)
    boxes = np.clip(rng.normal(0.5, 0.15, (200, 4)), 0.05, 0.95)
    cls = rng.integers(0, 3, 200)
    from sar_yolo_tpu.utils.plotting import plot_labels
    out = plot_labels(boxes, cls, names={0: "a", 1: "b", 2: "c"},
                      save_dir=tmp_path)
    assert out.exists() and out.stat().st_size > 0
    corr = tmp_path / "labels_correlogram.jpg"
    assert corr.exists() and corr.stat().st_size > 0


def test_xlsx_writer_roundtrip(tmp_path):
    """Dependency-free xlsx writer (JDE consolidated workbook, reference
    jde/val.py:935 openpyxl analog): write -> valid zip parts -> read back."""
    import zipfile

    from sar_yolo_tpu.utils.xlsx import read_xlsx, write_xlsx
    rows = [{"timestamp": "2026-08-20T12:00:00", "model": "a.yaml",
             "mAP50-95(B)": "0.51234", "state_acc": "0.91000"},
            {"timestamp": "2026-08-20T13:00:00", "model": "b & c.yaml",
             "mAP50-95(B)": "0.52000", "state_acc": "0.92"}]
    p = write_xlsx(tmp_path / "res.xlsx", rows)
    with zipfile.ZipFile(p) as z:  # structurally a valid xlsx package
        assert "[Content_Types].xml" in z.namelist()
        assert "xl/worksheets/sheet1.xml" in z.namelist()
    back = read_xlsx(p)
    assert len(back) == 2
    assert back[0]["timestamp"] == "2026-08-20T12:00:00"
    assert back[1]["model"] == "b & c.yaml"  # XML escaping round-trips
    assert float(back[1]["mAP50-95(B)"]) == 0.52
