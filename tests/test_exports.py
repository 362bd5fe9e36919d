"""Export round-trips: export -> AutoBackend reload -> same boxes.

Mirrors reference tests/test_exports.py:52-117 (every format reloads through
AutoBackend and must reproduce predictions).
"""

import numpy as np
import pytest

from sar_yolo_tpu import YOLO


def _image():
    img = np.full((72, 96, 3), 30, np.uint8)
    img[20:50, 30:70] = (210, 60, 40)
    return img


def _boxes(results):
    r = results[0]
    return r.boxes.data[:, :6] if r.boxes is not None else np.zeros((0, 6))


@pytest.fixture(scope="module")
def native():
    m = YOLO("tinydet.yaml")
    img = _image()
    res = m.predict(img, imgsz=64, conf=0.01)
    return m, img, _boxes(res)


def _roundtrip(native, fmt, tmp_path, **export_kw):
    m, img, ref_boxes = native
    path = m.export(format=fmt, imgsz=64, project=str(tmp_path), **export_kw)
    m2 = YOLO(path)
    res = m2.predict(img, conf=0.01)
    got = _boxes(res)
    assert got.shape[0] == ref_boxes.shape[0], \
        f"{fmt}: {got.shape[0]} boxes vs native {ref_boxes.shape[0]}"
    if len(got):
        # sort both by conf desc for a stable comparison
        a = ref_boxes[np.argsort(-ref_boxes[:, 4])]
        b = got[np.argsort(-got[:, 4])]
        np.testing.assert_allclose(a[:, :4], b[:, :4], atol=1.5)  # px
        np.testing.assert_allclose(a[:, 4], b[:, 4], atol=5e-3)   # conf
        np.testing.assert_array_equal(a[:, 5], b[:, 5])           # cls
    return path


def test_stablehlo_roundtrip(native, tmp_path):
    path = _roundtrip(native, "stablehlo", tmp_path)
    assert path.endswith(".stablehlo")


@pytest.mark.slow
def test_saved_model_roundtrip(native, tmp_path):
    path = _roundtrip(native, "saved_model", tmp_path)
    assert path.endswith("_saved_model")


@pytest.mark.slow
def test_tflite_roundtrip(native, tmp_path):
    path = _roundtrip(native, "tflite", tmp_path)
    assert path.endswith(".tflite")


@pytest.mark.slow
def test_tflite_int8_calibrated_roundtrip(native, tmp_path):
    """int8=True runs post-training quantization with representative-frame
    calibration (reference export_tflite int8, exporter.py:1055). Quantization
    moves values, so only box geometry parity is asserted (loose px atol)."""
    from sar_yolo_tpu.nn.autobackend import AutoBackend
    m, img, _ = native
    path = m.export(format="tflite", imgsz=64, int8=True, project=str(tmp_path))
    import json as _json
    meta = _json.loads((tmp_path / "tinydet.tflite.json").read_text())
    assert meta.get("int8") is True
    # compare raw prediction tensors against the float jax forward on the same
    # letterboxed frame: quantization noise must stay small and correlated
    from sar_yolo_tpu.data.augment import letterbox
    lb, _, _ = letterbox(img, 64, scaleup=False)
    x = np.ascontiguousarray(lb[..., ::-1])[None]
    q = np.asarray(AutoBackend(path)(x), np.float32).ravel()
    ref = np.asarray(
        AutoBackend(m.export(format="stablehlo", imgsz=64, project=str(tmp_path)))(x),
        np.float32).ravel()
    assert q.shape == ref.shape
    corr = np.corrcoef(q, ref)[0, 1]
    assert corr > 0.99, f"int8 output decorrelated from float: corr={corr}"


def test_stablehlo_with_embedded_nms(native, tmp_path):
    m, img, ref_boxes = native
    path = m.export(format="stablehlo", imgsz=64, nms=True, project=str(tmp_path))
    m2 = YOLO(path)
    assert m2.backend.with_nms
    res = m2.predict(img, conf=0.25)
    assert res[0].boxes is not None  # artifact runs end-to-end incl. NMS


def test_autobackend_warmup_and_meta(native, tmp_path):
    from sar_yolo_tpu.nn.autobackend import AutoBackend
    m, img, _ = native
    path = m.export(format="stablehlo", imgsz=64, project=str(tmp_path))
    ab = AutoBackend(path).warmup()
    assert ab.meta["imgsz"] == 64 and not ab.with_nms
    out = ab(np.zeros((1, 64, 64, 3), np.uint8))
    assert out.ndim == 3 and out.shape[0] == 1


def test_onnx_roundtrip(native, tmp_path):
    """Native jaxpr->ONNX export reloads through AutoBackend (numpy reference
    runtime) and reproduces predictions (≙ reference test_exports onnx rows)."""
    path = _roundtrip(native, "onnx", tmp_path)
    assert path.endswith(".onnx")


def test_onnx_embedded_nms_gated_actionable(tmp_path):
    """nms=True has no ONNX mapping (fixed-point suppression loop) and must
    error actionably, pointing at nms=False / stablehlo."""
    import pytest
    from sar_yolo_tpu import YOLO
    from sar_yolo_tpu.utils.errors import ExportError
    m = YOLO("tinydet.yaml")
    with pytest.raises(ExportError, match="nms=False"):
        m.export(format="onnx", imgsz=64, nms=True, project=str(tmp_path))


def test_profile_models_sweep(tmp_path):
    """ProfileModels (reference utils/benchmarks.py:315): yaml list -> per-model
    {params, GFLOPs, mean/std ms} dicts via the deploy-fused jitted forward."""
    from sar_yolo_tpu.utils.benchmarks import ProfileModels
    prof = ProfileModels(["tinydet.yaml"], num_timed_runs=3, num_warmup_runs=1,
                         min_time=0.0, imgsz=32, half=False)
    out = prof.profile()
    assert len(out) == 1
    r = out[0]
    assert r["model/name"] == "tinydet"
    assert r["model/parameters"] > 0
    assert r["model/GFLOPs"] > 0
    assert r["model/speed_JAX(ms)"] > 0


def test_profile_models_sigma_clipping():
    from sar_yolo_tpu.utils.benchmarks import ProfileModels
    data = [1.0, 1.1, 0.9, 1.05, 0.95, 1.02, 0.98, 1.08, 0.92, 1.0, 50.0]
    clipped = ProfileModels.iterative_sigma_clipping(data, sigma=2, max_iters=3)
    assert 50.0 not in clipped and len(clipped) == len(data) - 1


def test_rf100_local_benchmark(tmp_path, monkeypatch):
    """RF100Benchmark local-dataset path (reference utils/benchmarks.py:180):
    registered yamls -> per-dataset mAP50 + appended eval log."""
    from sar_yolo_tpu.utils.benchmarks import RF100Benchmark

    class FakeModel:
        def val(self, data=None, imgsz=640, **kw):
            return {"metrics/mAP50(B)": 0.5 if "dsa" in data else 0.25}

    ya, yb = tmp_path / "dsa" / "a.yaml", tmp_path / "dsb" / "b.yaml"
    for y in (ya, yb):
        y.parent.mkdir()
        y.write_text("train: train/images\nval: x\nnames: {0: p}\n")
    rb = RF100Benchmark()
    names, cfgs = rb.add_local_datasets([ya, yb])
    assert names == ["dsa", "dsb"]
    log = tmp_path / "eval.txt"
    res = rb.benchmark(FakeModel(), eval_log_file=log)
    assert res == {"dsa": 0.5, "dsb": 0.25}
    assert log.read_text() == "dsa: 0.5\ndsb: 0.25\n"
    # fix_yaml normalizes val path
    RF100Benchmark.fix_yaml(yb)
    import yaml
    assert yaml.safe_load(yb.read_text())["val"] == "valid/images"


def test_pb_roundtrip(tmp_path):
    """Frozen GraphDef export + AutoBackend reload (reference export_pb +
    autobackend wrap_frozen_graph path)."""
    import numpy as np

    from sar_yolo_tpu import YOLO

    m = YOLO("tinydet.yaml", task="detect")
    path = m.export(format="pb", imgsz=64, project=str(tmp_path))
    assert path.endswith(".pb")
    m2 = YOLO(path)
    img = (np.random.default_rng(0).uniform(0, 255, (1, 64, 64, 3))).astype(np.uint8)
    r = m2.predict(img, imgsz=64, verbose=False)
    assert r[0].boxes is not None


def test_dynamic_batch_export(tmp_path):
    """dynamic=True: batch-polymorphic stablehlo + saved_model artifacts serve
    any batch size from one export (reference dynamic export arg)."""
    import jax
    import numpy as np

    from sar_yolo_tpu import YOLO

    m = YOLO("tinydet.yaml", task="detect")
    p = m.export(format="stablehlo", imgsz=64, dynamic=True, project=str(tmp_path))
    exported = jax.export.deserialize(open(p, "rb").read())
    for B in (1, 3):
        out = exported.call(np.zeros((B, 64, 64, 3), np.uint8))
        assert out.shape[0] == B


@pytest.mark.slow
def test_onnx_segment_multi_output_roundtrip(tmp_path):
    """Segment ONNX artifact (preds + protos, 2 outputs) exports via the
    constant-folded ConvTranspose path (r4 advisor finding) and reloads
    through AutoBackend's multi-output branch, producing masks end-to-end."""
    m = YOLO("tinyseg.yaml", task="segment")
    m._ensure_variables(64)
    path = m.export(format="onnx", imgsz=64, project=str(tmp_path))
    assert path.endswith(".onnx")
    from sar_yolo_tpu.nn.autobackend import AutoBackend
    ab = AutoBackend(path)
    outs = ab(np.zeros((1, 64, 64, 3), np.uint8))
    assert isinstance(outs, (tuple, list)) and len(outs) == 2, \
        "segment artifact must return (preds, protos)"
    preds, protos = outs
    assert preds.ndim == 3 and protos.ndim == 4
    # full predict path: raw-preds artifact -> NMS + prototype mask compose
    img = np.full((64, 64, 3), 30, np.uint8)
    img[10:50, 10:50] = (220, 40, 40)
    res = YOLO(path).predict(img)
    assert res[0].masks is None or res[0].masks.data.ndim == 3
