"""Solutions demo apps over synthetic track streams (reference tests/test_solutions.py)."""

import numpy as np

from sar_yolo_tpu.solutions import Heatmap, ObjectCounter, RegionCounter, SpeedEstimator


def _track_row(x1, y1, x2, y2, tid):
    return [x1, y1, x2, y2, 0.9, 0.0, tid]


def test_object_counter_line_crossing():
    oc = ObjectCounter(region=((50, 0), (50, 100)))
    for x in range(30, 80, 5):  # track 1 crosses left->right
        oc.update(np.array([_track_row(x, 40, x + 10, 60, 1)]))
    res = oc.update(np.array([_track_row(80, 40, 90, 60, 1)]))
    assert res["in"] + res["out"] == 1


def test_region_counter():
    rc = RegionCounter({"zone": [(0, 0), (100, 0), (100, 100), (0, 100)]})
    boxes = np.array([[10, 10, 30, 30, 0.9, 0], [200, 200, 220, 220, 0.9, 0]])
    counts = rc.update(boxes)
    assert counts["zone"] == 1


def test_heatmap_accumulates():
    hm = Heatmap((64, 64))
    for _ in range(3):
        hm.update(np.array([[10, 10, 20, 20, 0.9, 0]]))
    assert hm.map[15, 15] > hm.map[40, 40]
    assert hm.render().shape == (64, 64, 3)


def test_speed_estimator():
    se = SpeedEstimator(fps=10, pixels_per_meter=10)
    speeds = {}
    for t in range(12):
        speeds = se.update(np.array([_track_row(10 + 10 * t, 10, 30 + 10 * t, 30, 7)]))
    assert 7 in speeds and speeds[7] > 0


def test_coco_converter(tmp_path):
    import json
    from sar_yolo_tpu.data.converter import convert_coco
    ann = {
        "images": [{"id": 1, "file_name": "img1.jpg", "width": 100, "height": 100}],
        "annotations": [{"image_id": 1, "category_id": 1, "bbox": [10, 20, 30, 40],
                         "iscrowd": 0}],
        "categories": [{"id": 1, "name": "person"}],
    }
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))
    out = convert_coco(p, save_dir=tmp_path / "conv")
    txt = (out / "labels" / "img1.txt").read_text().split()
    assert txt[0] == "0"
    assert abs(float(txt[1]) - 0.25) < 1e-5  # cx = (10+15)/100


def test_plotting(tmp_path):
    from sar_yolo_tpu.utils.plotting import ConfusionMatrix, plot_results
    csvf = tmp_path / "results.csv"
    csvf.write_text("epoch,train/box,lr\n0,5.0,0.01\n1,4.0,0.009\n")
    out = plot_results(csvf)
    assert out is not None and out.exists()
    cm = ConfusionMatrix(nc=2)
    dets = np.array([[10, 10, 30, 30, 0.9, 0]])
    cm.process_batch(dets, np.array([[11, 11, 29, 29]]), np.array([0]))
    assert cm.matrix[0, 0] == 1
    cm.plot(tmp_path / "cm.png")
    assert (tmp_path / "cm.png").exists()


def test_checks():
    from sar_yolo_tpu.utils.checks import check_imgsz, check_version, parse_version
    assert parse_version("1.2.3rc1") == (1, 2, 3)
    assert check_version("1.2.0", ">=1.0")
    assert not check_version("0.9", ">=1.0")
    assert check_imgsz(100, stride=32) == 128
    assert check_imgsz([640, 640]) == [640, 640]


def test_instances():
    from sar_yolo_tpu.utils.instance import Bboxes, Instances
    b = Bboxes(np.array([[10, 10, 30, 50]]), "xyxy")
    assert np.allclose(b.areas(), [800])
    b.convert("xywh")
    assert np.allclose(b.bboxes, [[20, 30, 20, 40]])
    inst = Instances(np.array([[0.5, 0.5, 0.2, 0.2]]), bbox_format="xywh", normalized=True)
    inst.denormalize(100, 100)
    assert np.allclose(inst.bboxes, [[50, 50, 20, 20]])
