"""Run an exported TFLite detector from plain Python.

Counterpart of the reference's examples/YOLOv8-TFLite-Python (its runner uses
the tflite interpreter directly): here AutoBackend reloads the artifact that
`model.export(format="tflite")` produced — including the int8-calibrated
variant — and the standard predict pipeline (letterbox -> interp -> NMS) runs
around it.

    python - <<'PY'
    from sar_yolo_tpu import YOLO
    YOLO("yolov8n.yaml").export(format="tflite")  # writes exports/yolov8n.tflite
    PY
    python examples/tflite-python/detect_tflite.py exports/yolov8n.tflite image.jpg
"""

from __future__ import annotations

import sys

import numpy as np


def main(artifact: str, image: str, conf: float = 0.25):
    from PIL import Image

    from sar_yolo_tpu import YOLO

    model = YOLO(artifact)  # AutoBackend picks the tflite runtime by suffix
    img = np.asarray(Image.open(image).convert("RGB"))
    results = model.predict(img, conf=conf, verbose=False)
    r = results[0]
    print(f"{len(r.boxes.data)} detections")
    for b in np.asarray(r.boxes.data):
        name = r.names.get(int(b[5]), int(b[5])) if r.names else int(b[5])
        print(f"  {name:>12}  conf={b[4]:.3f}  xyxy=({b[0]:.0f},{b[1]:.0f},{b[2]:.0f},{b[3]:.0f})")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit("usage: detect_tflite.py ARTIFACT.tflite IMAGE [conf]")
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]) if len(sys.argv) > 3 else 0.25)
