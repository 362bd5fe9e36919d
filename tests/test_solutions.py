"""Solutions demo apps over synthetic track streams (reference tests/test_solutions.py)."""

import numpy as np
import pytest

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


def test_plot_labels_and_predictions(tmp_path):
    from sar_yolo_tpu.utils.plotting import plot_labels, plot_predictions
    rng = np.random.default_rng(0)
    boxes = np.clip(rng.normal(0.5, 0.15, (40, 4)), 0.05, 0.95).astype(np.float32)
    cls = rng.integers(0, 3, 40)
    out = plot_labels(boxes, cls, names={0: "a", 1: "b", 2: "c"}, save_dir=tmp_path)
    assert out.exists()
    imgs = np.full((2, 64, 64, 3), 100, np.uint8)
    dets = [np.array([[5, 5, 30, 30, 0.9, 0], [10, 10, 50, 50, 0.1, 1]]),
            np.zeros((0, 6))]
    p = plot_predictions(imgs, dets, tmp_path / "pred.jpg", names={0: "a"}, conf=0.25)
    assert (tmp_path / "pred.jpg").exists()


def test_val_plots_artifacts(tmp_path):
    """plots=True during val writes GT/pred overlays + confusion matrix
    (reference BaseValidator plot_val_samples/plot_predictions)."""
    from sar_yolo_tpu import YOLO
    m = YOLO("tinydet.yaml")
    m.val(data="synthetic", imgsz=64, batch=4, workers=1, plots=True,
          mesh_shape=[1], project=str(tmp_path), name="v")
    d = tmp_path / "detect" / "v"
    assert (d / "val_batch0_labels.jpg").exists()
    assert (d / "val_batch0_pred.jpg").exists()
    assert (d / "confusion_matrix.png").exists()


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


def test_aigym_rep_counting():
    from sar_yolo_tpu.solutions import AIGym
    gym = AIGym(kpts_idx=(0, 1, 2))
    straight = np.array([[[0, 0], [50, 0], [100, 0]]], np.float32)   # 180 deg (up)
    bent = np.array([[[0, 0], [50, 0], [50, -50]]], np.float32)      # 90->down at <90? 90 not <90
    very_bent = np.array([[[0, 0], [50, 0], [10, -20]]], np.float32)  # acute angle (down)
    for kp in (straight, very_bent, straight, very_bent, straight):
        res = gym.update(kp, track_ids=[7])
    assert res["count"][7] == 2
    assert res["stage"][7] == "up"
    assert abs(AIGym.joint_angle([0, 0], [50, 0], [100, 0]) - 180.0) < 1e-3
    assert abs(AIGym.joint_angle([0, 0], [50, 0], [50, -50]) - 90.0) < 1e-3


def test_analytics_series_and_render(tmp_path):
    from sar_yolo_tpu.solutions import Analytics
    an = Analytics(names={0: "person", 1: "car"})
    an.update(np.array([[0, 0, 10, 10, 0.9, 0], [0, 0, 10, 10, 0.9, 1]]))
    an.update(np.array([[0, 0, 10, 10, 0.9, 0]]))
    line = an.chart("line")
    assert line["series"]["person"] == [1, 1] and line["series"]["car"] == [1, 0]
    pie = an.chart("pie")
    assert dict(zip(pie["labels"], pie["values"])) == {"person": 2, "car": 1}
    out = an.render(tmp_path / "chart.png", "bar")
    assert out.exists()


def test_distance_calculation():
    from sar_yolo_tpu.solutions import DistanceCalculation
    dc = DistanceCalculation(pixels_per_meter=10.0)
    dc.select(1)
    dc.select(2)
    tracks = np.array([_track_row(0, 0, 10, 10, 1), _track_row(30, 0, 40, 10, 2)])
    res = dc.update(tracks)
    assert abs(res["pixels"] - 30.0) < 1e-6 and abs(res["meters"] - 3.0) < 1e-6
    dc.select(1)  # deselect -> measurement unavailable
    assert dc.update(tracks) is None


def test_parking_and_queue_and_trackzone():
    from sar_yolo_tpu.solutions import ParkingManagement, QueueManager, TrackZone
    slots = [[(0, 0), (20, 0), (20, 20), (0, 20)], [(30, 0), (50, 0), (50, 20), (30, 20)]]
    pm = ParkingManagement(slots)
    res = pm.update(np.array([[5, 5, 15, 15, 0.9, 0]]))
    assert res == {"occupied": 1, "available": 1, "slots": [True, False]}
    qm = QueueManager(region=[(0, 0), (100, 0), (100, 100), (0, 100)])
    r1 = qm.update(np.array([_track_row(10, 10, 20, 20, 1), _track_row(200, 200, 210, 210, 2)]))
    assert r1["queue"] == 1
    tz = TrackZone(region=[(0, 0), (100, 0), (100, 100), (0, 100)])
    kept = tz.update(np.array([_track_row(10, 10, 20, 20, 1), _track_row(200, 200, 210, 210, 2)]))
    assert len(kept) == 1 and int(kept[0][6]) == 1


def test_security_alarm_fires_once_per_episode():
    from sar_yolo_tpu.solutions import SecurityAlarm
    fired = []
    sa = SecurityAlarm(threshold=2, notifier=fired.append)
    sa.update(np.zeros((1, 6)), 0)   # below threshold
    sa.update(np.zeros((3, 6)), 1)   # breach -> fire
    sa.update(np.zeros((4, 6)), 2)   # still breached -> no refire
    sa.update(np.zeros((0, 6)), 3)   # reset
    sa.update(np.zeros((2, 6)), 4)   # new breach -> fire
    assert len(fired) == 2 and len(sa.events) == 2


def test_files_utils(tmp_path):
    from sar_yolo_tpu.utils.files import (WorkingDirectory, file_age, file_date,
                                          file_size, get_latest_run, increment_path)
    d = tmp_path / "exp"
    d.mkdir()
    assert increment_path(d) == tmp_path / "exp2"
    assert increment_path(d, exist_ok=True) == d
    f = tmp_path / "a.txt"
    f.write_bytes(b"x" * 2048)
    assert 0.001 < file_size(f) < 0.01
    assert file_age(f) == 0 and "-" in file_date(f)
    (tmp_path / "runs" / "last").mkdir(parents=True)
    assert get_latest_run(tmp_path).endswith("last")
    import os
    cwd = os.getcwd()
    with WorkingDirectory(tmp_path):
        assert os.getcwd() == str(tmp_path)
    assert os.getcwd() == cwd


def test_downloads_registry(tmp_path, monkeypatch):
    from sar_yolo_tpu.utils.downloads import (GITHUB_ASSETS_NAMES, asset_url,
                                              attempt_download_asset)
    from sar_yolo_tpu.utils.errors import ModelNotFoundError
    assert "yolov8n.pt" in GITHUB_ASSETS_NAMES and "sam2_b.pt" in GITHUB_ASSETS_NAMES
    assert asset_url("yolov8n.pt").startswith("https://github.com/")
    local = tmp_path / "w.pt"
    local.write_bytes(b"ok")
    assert attempt_download_asset(local) == str(local)
    # zero-egress default: known asset but absent locally -> actionable error
    monkeypatch.delenv("SARYOLO_ALLOW_DOWNLOADS", raising=False)
    try:
        attempt_download_asset("yolov8n.pt")
        raise AssertionError("expected ModelNotFoundError")
    except ModelNotFoundError as e:
        assert "Pre-stage" in str(e)


def test_dota_converter(tmp_path):
    import cv2
    from sar_yolo_tpu.data.converter import convert_dota_to_yolo_obb
    root = tmp_path / "dota"
    (root / "images" / "train").mkdir(parents=True)
    (root / "labels" / "train_original").mkdir(parents=True)
    cv2.imwrite(str(root / "images" / "train" / "P0001.png"),
                np.zeros((100, 200, 3), np.uint8))
    (root / "labels" / "train_original" / "P0001.txt").write_text(
        "imagesource:GoogleEarth\ngsd:0.1\n"
        "20 10 180 10 180 90 20 90 plane 0\n"
        "0 0 10 0 10 10 0 10 small-vehicle 1\n"
        "5 5 6 5 6 6 5 6 unknown-thing 0\n")
    convert_dota_to_yolo_obb(root)
    out = (root / "labels" / "train" / "P0001.txt").read_text().splitlines()
    assert len(out) == 2  # unknown class dropped, headers skipped
    r0 = out[0].split()
    assert r0[0] == "0"  # plane
    assert abs(float(r0[1]) - 0.1) < 1e-6 and abs(float(r0[2]) - 0.1) < 1e-6
    assert abs(float(r0[3]) - 0.9) < 1e-6  # x2/w = 180/200
    assert out[1].split()[0] == str(10)  # small vehicle -> index 10


def test_check_requirements():
    from sar_yolo_tpu.utils.checks import check_requirements
    assert check_requirements("numpy>=1.0")
    assert check_requirements(["numpy>=1.0", "jax"])
    assert not check_requirements("numpy>=999.0")
    assert not check_requirements("not-a-real-package-xyz")
    try:
        check_requirements("not-a-real-package-xyz", hard=True)
        raise AssertionError("expected ModuleNotFoundError")
    except ModuleNotFoundError:
        pass


def test_solution_process_with_model():
    """BaseSolution frame-in path: app owns the model + tracker and returns
    annotated SolutionResults (reference solutions/solutions.py:12)."""
    from sar_yolo_tpu import YOLO
    from sar_yolo_tpu.solutions import ObjectCounter, TrackZone

    model = YOLO("tinydet.yaml", task="detect")
    frames = [(np.full((96, 96, 3), 40 + 20 * i, np.uint8)) for i in range(2)]

    oc = ObjectCounter(region=((48, 0), (48, 96)), model=model, imgsz=96,
                       conf=0.0)
    res = oc.process(frames[0])
    assert res.plot_im.shape == frames[0].shape
    assert set(res.data) == {"in", "out"}

    tz = TrackZone(region=[(0, 0), (96, 0), (96, 96), (0, 96)], model=model,
                   imgsz=96, conf=0.0)
    res2 = tz(frames[1])  # __call__ alias
    assert res2.plot_im.shape == frames[1].shape
    assert res2.n == len(res2.tracks)


def test_solution_update_without_model_raises_on_process():
    from sar_yolo_tpu.solutions import QueueManager

    qm = QueueManager(region=[(0, 0), (10, 0), (10, 10), (0, 10)])
    out = qm.update(np.array([[2, 2, 6, 6, 0.9, 0, 1]]))
    assert out["queue"] == 1
    with pytest.raises(ValueError):
        qm.process(np.zeros((32, 32, 3), np.uint8))


def test_parking_json_and_alarm_episode():
    import json as _json

    from sar_yolo_tpu.solutions import ParkingManagement, SecurityAlarm

    slots = [{"points": [[0, 0], [10, 0], [10, 10], [0, 10]]},
             {"points": [[20, 0], [30, 0], [30, 10], [20, 10]]}]
    import tempfile, os
    fd, path = tempfile.mkstemp(suffix=".json")
    with os.fdopen(fd, "w") as f:
        _json.dump(slots, f)
    pm = ParkingManagement(json_file=path)
    out = pm.update(np.array([[1, 1, 8, 8, 0.9, 0]]))
    os.unlink(path)
    assert out == {"occupied": 1, "available": 1, "slots": [True, False]}

    fired = []
    sa = SecurityAlarm(threshold=2, notifier=fired.append)
    sa.update(np.zeros((2, 6)))   # breach
    sa.update(np.zeros((2, 6)))   # still breached -> no second fire
    sa.update(np.zeros((1, 6)))   # reset
    sa.update(np.zeros((3, 6)))   # second episode
    assert len(fired) == 2 and len(sa.events) == 2
