"""Sliced (SAHI-style) inference: grid coverage, duplicate merge, e2e smoke."""

import numpy as np

from sar_yolo_tpu.ops.slicing import merge_tile_detections, sliced_predict, tile_grid


def test_tile_grid_covers_image_exactly():
    for h, w, t, ov in [(1080, 1920, 512, 0.2), (500, 500, 512, 0.2),
                        (513, 1025, 512, 0.25), (2000, 3000, 640, 0.1)]:
        offs = tile_grid(h, w, t, ov)
        cov = np.zeros((h, w), bool)
        for oy, ox in offs:
            assert oy >= 0 and ox >= 0
            if h > t:
                assert oy + t <= h  # right/bottom aligned, never out of range
            if w > t:
                assert ox + t <= w
            cov[oy:oy + t, ox:ox + t] = True
        assert cov.all(), f"uncovered pixels for {(h, w, t, ov)}"


def test_merge_dedups_cross_tile_duplicates():
    # the same physical object (global 10,10..50,50) seen by two tiles: the
    # second tile starts at x=100... use overlapping tiles at x=0 and x=8
    a = np.array([[10, 10, 50, 50, 0.9, 0]], np.float32)   # in tile (0, 0)
    b = np.array([[2, 10, 42, 50, 0.8, 0]], np.float32)    # same box in tile (0, 8)
    merged = merge_tile_detections([a, b], [(0, 0), (0, 8)], iou_thres=0.5)
    assert merged.shape[0] == 1
    assert merged[0, 4] == 0.9  # the higher-confidence copy survives
    # different classes at the same location are NOT merged
    c = a.copy()
    c[0, 5] = 1
    merged = merge_tile_detections([a, c], [(0, 0), (0, 0)], iou_thres=0.5)
    assert merged.shape[0] == 2


def test_merge_shifts_to_global_coords():
    det = np.array([[5, 6, 20, 30, 0.7, 2]], np.float32)
    out = merge_tile_detections([det], [(100, 200)])
    assert np.allclose(out[0, :4], [205, 106, 220, 130])


def test_sliced_predict_e2e_smoke():
    import jax

    from sar_yolo_tpu import YOLO

    model = YOLO("tinydet.yaml", task="detect")
    img = (np.random.default_rng(0).uniform(0, 255, (160, 220, 3))).astype(np.uint8)
    out = sliced_predict(model, img, tile=96, overlap=0.2, conf=0.01)
    assert out.ndim == 2 and out.shape[1] >= 6
    if len(out):  # any detection must lie inside the full image
        assert (out[:, [0, 2]] <= 220 + 1e-3).all()
        assert (out[:, [1, 3]] <= 160 + 1e-3).all()
