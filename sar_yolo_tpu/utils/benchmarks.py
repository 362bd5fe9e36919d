"""Benchmark harness: format x {size, mAP, latency, FPS} table.

Capability parity with reference utils/benchmarks.py (benchmark:50, table :164).
"""

from __future__ import annotations

import time
from pathlib import Path

import numpy as np

from sar_yolo_tpu.utils import LOGGER


def benchmark(model, imgsz: int = 640, data: str | None = None, n_iter: int = 10,
              verbose: bool = True):
    """Time end-to-end predict for the native JAX path (exported formats: size only).

    Returns a list of row dicts [{format, size_mb, ms_per_image, fps, mAP50-95}].
    """
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (imgsz, imgsz, 3), dtype=np.uint8)
    rows = []

    # native jax path
    _ = model.predict(img, imgsz=imgsz)  # warm/compile
    t0 = time.perf_counter()
    for _ in range(n_iter):
        model.predict(img, imgsz=imgsz)
    dt = (time.perf_counter() - t0) / n_iter
    map_val = None
    if data is not None:
        metrics = model.val(data=data, imgsz=imgsz)
        map_val = metrics.get("metrics/mAP50-95(B)")
    rows.append({"format": "jax", "size_mb": None, "ms_per_image": dt * 1e3,
                 "fps": 1.0 / dt, "mAP50-95": map_val})

    for fmt in ("stablehlo",):
        try:
            path = model.export(format=fmt, imgsz=imgsz)
            size_mb = Path(path).stat().st_size / 1e6 if Path(path).is_file() else None
            rows.append({"format": fmt, "size_mb": size_mb, "ms_per_image": None,
                         "fps": None, "mAP50-95": None})
        except Exception as e:  # noqa: BLE001 — benchmark rows degrade gracefully
            rows.append({"format": fmt, "error": str(e)[:80]})

    if verbose:
        for r in rows:
            LOGGER.info(str(r))
    return rows
