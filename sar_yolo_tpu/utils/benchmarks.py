"""Benchmark harness: format x {size, mAP, latency, FPS} table.

Capability parity with reference utils/benchmarks.py (benchmark:50, table :164):
every exported format is reloaded through AutoBackend and gets REAL predict
latency and a REAL mAP50-95 evaluated on the same dataset as the native path —
not just a file size.
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np

from sar_yolo_tpu.utils import LOGGER


def _dataset_for(model, data, imgsz):
    from sar_yolo_tpu.data import SyntheticDataset
    if data in (None, "synthetic"):
        return SyntheticDataset(n=8, imgsz=imgsz, nc=min(model.meta["nc"], 3),
                                max_labels=16, seed=1)
    from sar_yolo_tpu.data import YOLODataset, check_det_dataset
    info = check_det_dataset(data)
    return YOLODataset(info.get("val") or info["train"], imgsz=imgsz, augment=False,
                       max_labels=64)


def _map_over_dataset(predict_fn, dataset, imgsz):
    """mAP50-95 of a predict callable over a padded-label dataset."""
    from sar_yolo_tpu.utils.metrics import DetMetrics, match_predictions
    dm = DetMetrics()
    for i in range(len(dataset)):
        s = dataset[i]
        img = np.ascontiguousarray(s["img"][..., ::-1])  # RGB -> BGR frame
        res = predict_fn(img)
        d = res[0].boxes.data[:, :6] if res[0].boxes is not None else np.zeros((0, 6))
        gm = s["mask"] > 0
        h, w = img.shape[:2]
        gb = s["bboxes"][gm] * np.array([w, h, w, h])
        gt = np.stack([gb[:, 0] - gb[:, 2] / 2, gb[:, 1] - gb[:, 3] / 2,
                       gb[:, 0] + gb[:, 2] / 2, gb[:, 1] + gb[:, 3] / 2], 1) \
            if len(gb) else np.zeros((0, 4), np.float32)
        gc = s["cls"][gm]
        tp = match_predictions(d[:, :4], d[:, 5], gt, gc)
        dm.update(tp, d[:, 4], d[:, 5], gc)
    r = dm.process()
    return r.get("metrics/mAP50-95(B)")


def _size_mb(path):
    p = Path(path)
    if p.is_file():
        return p.stat().st_size / 1e6
    if p.is_dir():
        return sum(f.stat().st_size for f in p.rglob("*") if f.is_file()) / 1e6
    return None


def benchmark(model, imgsz: int = 640, data: str | None = None, n_iter: int = 10,
              formats=("stablehlo", "saved_model", "tflite"), verbose: bool = True,
              half: bool = False, int8: bool = False, device=None):
    """Export to every format, reload, and measure latency + mAP per format.

    Mirrors reference benchmark() (utils/benchmarks.py:50-178): rows
    [format, size_mb, mAP50-95, ms_per_image, fps]; a failing format degrades
    to an error row instead of aborting the table.
    """
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (imgsz, imgsz, 3), dtype=np.uint8)
    dataset = _dataset_for(model, data, imgsz)
    rows = []

    def time_predict(m):
        m.predict(img, imgsz=imgsz)  # warm/compile
        t0 = time.perf_counter()
        for _ in range(n_iter):
            m.predict(img, imgsz=imgsz)
        return (time.perf_counter() - t0) / n_iter

    # native jax path
    dt = time_predict(model)
    rows.append({"format": "jax", "size_mb": None, "ms_per_image": dt * 1e3,
                 "fps": 1.0 / dt,
                 "mAP50-95": _map_over_dataset(
                     lambda im: model.predict(im, imgsz=imgsz, conf=0.01), dataset, imgsz)})

    for fmt in formats:
        try:
            from sar_yolo_tpu import YOLO
            path = model.export(format=fmt, imgsz=imgsz)
            m2 = YOLO(path)
            dt = time_predict(m2)
            rows.append({"format": fmt, "size_mb": _size_mb(path),
                         "ms_per_image": dt * 1e3, "fps": 1.0 / dt,
                         "mAP50-95": _map_over_dataset(
                             lambda im: m2.predict(im, conf=0.01), dataset, imgsz)})
        except Exception as e:  # noqa: BLE001 — benchmark rows degrade gracefully
            rows.append({"format": fmt, "error": str(e)[:120]})

    if verbose:
        LOGGER.info(f"{'Format':<12} {'Size(MB)':>9} {'mAP50-95':>9} "
                    f"{'ms/im':>8} {'FPS':>8}")
        for r in rows:
            if "error" in r:
                LOGGER.info(f"{r['format']:<12} ERROR: {r['error']}")
            else:
                LOGGER.info(
                    f"{r['format']:<12} "
                    f"{(f'{r['size_mb']:.1f}' if r['size_mb'] else '-'):>9} "
                    f"{(f'{r['mAP50-95']:.3f}' if r['mAP50-95'] is not None else '-'):>9} "
                    f"{r['ms_per_image']:>8.1f} {r['fps']:>8.1f}")
    return rows
