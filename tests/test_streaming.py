"""Streaming sources, callback-based tracking, media writer, Results API.

Covers reference data/loaders.py (LoadStreams/LoadImagesAndVideos/LoadPilAndNumpy/
LoadTensor), trackers/track.py:18-90 (per-frame callback tracking + persist),
and engine/results.py typed wrappers (save_txt/save_crop/tojson).
"""

import numpy as np
import pytest

from sar_yolo_tpu.data.loaders import (LoadImagesAndVideos, LoadPilAndNumpy,
                                       LoadStreams, LoadTensor,
                                       load_inference_source)
from sar_yolo_tpu.engine.results import Results
from sar_yolo_tpu.trackers import register_tracker
from sar_yolo_tpu.utils import IterableSimpleNamespace


def _write_video(path, n_frames=8, size=(64, 48)):
    import cv2
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"), 10, size)
    for i in range(n_frames):
        frame = np.full((size[1], size[0], 3), 20, np.uint8)
        x = 5 + i * 2
        frame[10:30, x:x + 14] = (0, 0, 255)
        w.write(frame)
    w.release()
    return path


def test_load_images_and_videos(tmp_path):
    import cv2
    cv2.imwrite(str(tmp_path / "a.jpg"), np.zeros((32, 32, 3), np.uint8))
    _write_video(tmp_path / "v.avi", n_frames=5)
    items = list(LoadImagesAndVideos(str(tmp_path)))
    assert len(items) == 6  # 1 image + 5 frames
    vids = [m for _, _, m in items if m.get("video")]
    assert len(vids) == 5 and vids[0]["frames"] == 5 and vids[0]["fps"] == 10


def test_load_pil_and_numpy():
    from PIL import Image
    pil = Image.new("RGB", (16, 16), (255, 0, 0))
    arr = np.zeros((16, 16, 3), np.uint8)
    items = list(LoadPilAndNumpy([pil, arr]))
    assert len(items) == 2
    # PIL red (RGB) -> BGR: channel 2 is red
    assert items[0][1][0, 0, 2] == 255 and items[0][1][0, 0, 0] == 0


def test_grey_and_rgba_sources_normalize_to_3ch():
    """Grey (H,W)/(H,W,1) and 4-channel arrays are accepted like the reference
    (its test_python.py:138 grey/4-ch cases)."""
    grey = np.full((16, 16), 7, np.uint8)
    rgba = np.zeros((16, 16, 4), np.uint8)
    for src in (grey, grey[..., None], rgba):
        items = list(LoadPilAndNumpy(src))
        assert items[0][1].shape == (16, 16, 3)
    t = np.zeros((2, 16, 16, 4), np.uint8)  # RGBA batch through LoadTensor
    items = list(LoadTensor(t))
    assert items[0][1].shape == (16, 16, 3)


def test_load_tensor_nchw_float():
    t = np.random.rand(2, 3, 16, 16).astype(np.float32)
    items = list(LoadTensor(t))
    assert len(items) == 2
    assert items[0][1].shape == (16, 16, 3) and items[0][1].dtype == np.uint8


def test_load_streams_over_file(tmp_path):
    """LoadStreams machinery (threads, buffering) driven by a file-backed cap."""
    v = _write_video(tmp_path / "v.avi", n_frames=6)
    s = LoadStreams(str(v), buffer=True)
    frames = list(s)
    assert len(frames) >= 5  # first frame consumed by the open-probe read
    assert all(m["stream"] for _, _, m in frames)


def test_load_inference_source_dispatch(tmp_path):
    import cv2
    cv2.imwrite(str(tmp_path / "a.jpg"), np.zeros((32, 32, 3), np.uint8))
    _, st = load_inference_source(str(tmp_path / "a.jpg"))
    assert not (st.stream or st.tensor or st.from_img)
    _, st = load_inference_source(np.zeros((8, 8, 3), np.uint8))
    assert st.from_img
    _, st = load_inference_source(np.random.rand(1, 3, 8, 8).astype(np.float32))
    assert st.tensor


class _FakePredictor:
    """Duck-typed predictor core for exercising the tracker callback protocol."""

    def __init__(self):
        self.callbacks = {"on_predict_start": [], "on_predict_batch_start": [],
                          "on_predict_postprocess_end": [], "on_predict_end": []}
        self.trackers = {}
        self.batch = None
        self.results = None

    add_callback = __import__("sar_yolo_tpu.engine.predictor", fromlist=["BasePredictor"]
                              ).BasePredictor.add_callback
    run_callbacks = __import__("sar_yolo_tpu.engine.predictor", fromlist=["BasePredictor"]
                               ).BasePredictor.run_callbacks


def _frame_result(x):
    img = np.zeros((64, 64, 3), np.uint8)
    boxes = np.array([[x, 10, x + 14, 30, 0.9, 0.0]], np.float32)
    return Results(img, "v.avi", {0: "person"}, boxes=boxes)


def test_callback_tracking_stable_ids():
    pred = _FakePredictor()
    register_tracker(pred, tracker="bytetrack.yaml", persist=False)
    ids = []
    pred.run_callbacks("on_predict_start")
    for f in range(6):
        pred.batch = ("v.avi", None, {"video": True, "frame": f, "fps": 10})
        pred.results = [_frame_result(5 + f * 2)]
        pred.run_callbacks("on_predict_postprocess_end")
        r = pred.results[0]
        if r.boxes is not None and len(r.boxes) and r.boxes.id is not None:
            ids.append(int(r.boxes.id[0]))
    assert len(ids) >= 4
    assert len(set(ids)) == 1, f"track id changed across frames: {ids}"


def test_callback_tracking_persist_semantics():
    pred = _FakePredictor()
    register_tracker(pred, tracker="bytetrack.yaml", persist=False)

    def run_once():
        pred.run_callbacks("on_predict_start")
        for f in range(3):
            pred.batch = ("v.avi", None, {"video": True, "frame": f, "fps": 10})
            pred.results = [_frame_result(5 + f * 2)]
            pred.run_callbacks("on_predict_postprocess_end")

    run_once()
    t1 = pred.trackers.get("v.avi")
    assert t1 is not None
    # persist off: second call resets trackers
    pred._tracker_persist = False
    run_once()
    assert pred.trackers.get("v.avi") is not t1
    # persist on: tracker instance survives
    pred._tracker_persist = True
    t2 = pred.trackers.get("v.avi")
    run_once()
    assert pred.trackers.get("v.avi") is t2


def test_results_api(tmp_path):
    img = np.zeros((100, 200, 3), np.uint8)
    boxes = np.array([[20, 10, 60, 50, 0.8, 0.0, 7.0]], np.float32)  # with track id
    r = Results(img, "img.jpg", {0: "person"}, boxes=boxes)
    assert r.boxes.is_track and r.boxes.id[0] == 7
    np.testing.assert_allclose(r.boxes.xywhn[0], [0.2, 0.3, 0.2, 0.4], atol=1e-6)
    # save_txt round trip
    p = r.save_txt(tmp_path / "labels.txt")
    line = p.read_text().strip().split()
    assert line[0] == "0" and line[-1] == "7"
    # save_crop
    r.save_crop(tmp_path / "crops")
    crops = list((tmp_path / "crops" / "person").glob("*.jpg"))
    assert len(crops) == 1
    # json summary
    import json
    js = json.loads(r.to_json())
    assert js[0]["name"] == "person" and js[0]["track_id"] == 7
    assert "person" in r.verbose()


def test_predict_save_video(tmp_path):
    """save=True writes an annotated video through the real predictor surface."""
    from sar_yolo_tpu import YOLO
    v = _write_video(tmp_path / "in.avi", n_frames=3)
    m = YOLO("tinydet.yaml")
    res = m.predict(str(v), imgsz=32, save=True, project=str(tmp_path), name="out",
                    exist_ok=True)
    assert len(res) == 3
    assert res[0].frame == 0 and res[2].frame == 2
    vids = list((tmp_path / "detect" / "out").glob("*.avi"))
    assert len(vids) == 1


def test_track_streaming_api(tmp_path):
    """YOLO.track(stream=True) yields per-frame Results via callbacks."""
    from sar_yolo_tpu import YOLO
    v = _write_video(tmp_path / "in.avi", n_frames=3)
    m = YOLO("tinydet.yaml")
    gen = m.track(str(v), imgsz=32, stream=True)
    out = list(gen)
    assert len(out) == 3
    # tracker registered exactly once and reused on a second call
    p1 = m._predictor_cache[1]
    assert p1._tracking_registered
    out2 = m.track(str(v), imgsz=32, stream=False, persist=True)
    assert m._predictor_cache[1] is p1


def test_results_conversions_and_update():
    """Results to_df/to_csv/to_xml/new/update (reference results.py:310-906)."""
    from sar_yolo_tpu.engine.results import Results

    img = np.zeros((64, 64, 3), np.uint8)
    r = Results(img, "x.jpg", {0: "person"},
                boxes=np.array([[1, 2, 20, 30, 0.9, 0]], np.float32))
    assert '"name": "person"' in r.tojson()
    df = r.to_df()
    assert len(df) == 1 and "confidence" in df.columns
    assert r.to_csv().startswith("name,")
    assert r.to_xml().startswith("<?xml")
    r2 = r.new()
    assert len(r2) == 0 and r2.names == r.names
    r2.update(boxes=np.array([[3, 3, 9, 9, 0.5, 0]], np.float32))
    assert len(r2) == 1
