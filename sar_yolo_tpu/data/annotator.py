"""Auto-annotation: detect with YOLO, segment each box with SAM, write YOLO
polygon labels (reference data/annotator.py auto_annotate:8)."""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np

from sar_yolo_tpu.utils import LOGGER


def auto_annotate(data, det_model="yolov8n.yaml", sam_model="sam_b", conf=0.25,
                  iou=0.45, imgsz=640, max_det=300, classes=None, output_dir=None,
                  det_weights=None, sam_weights=None):
    """Detect objects in every image under `data`, prompt SAM with the boxes,
    and save per-image .txt files of `cls x1 y1 x2 y2 ...` normalized polygons.
    """
    from sar_yolo_tpu.engine.model import YOLO
    from sar_yolo_tpu.models.sam import SAM

    det = YOLO(det_weights or det_model)
    sam = SAM(sam_model, weights=sam_weights)

    data = Path(data)
    out = Path(output_dir or data.parent / f"{data.stem}_auto_annotate_labels")
    out.mkdir(parents=True, exist_ok=True)

    results = det.predict(str(data), stream=True, conf=conf, iou=iou, imgsz=imgsz,
                          max_det=max_det)
    n = 0
    for r in results:
        if r.boxes is None or len(r.boxes) == 0:
            continue
        cls = r.boxes.cls.astype(int)
        boxes = r.boxes.xyxy
        if classes is not None:
            keep = np.isin(cls, classes)
            cls, boxes = cls[keep], boxes[keep]
        if len(boxes) == 0:
            continue
        seg = sam(r.orig_img, bboxes=boxes)[0]
        h, w = r.orig_shape
        lines = []
        for c, m in zip(cls, seg.masks.data):
            contours, _ = cv2.findContours(m.astype(np.uint8), cv2.RETR_EXTERNAL,
                                           cv2.CHAIN_APPROX_SIMPLE)
            if not contours:
                continue
            poly = max(contours, key=cv2.contourArea).reshape(-1, 2).astype(np.float32)
            poly /= np.asarray([w, h], np.float32)
            coords = " ".join(f"{v:.6f}" for v in poly.reshape(-1))
            lines.append(f"{int(c)} {coords}")
        if lines:
            stem = Path(str(r.path)).stem
            (out / f"{stem}.txt").write_text("\n".join(lines) + "\n")
            n += 1
    LOGGER.info(f"auto_annotate: wrote {n} label files to {out}")
    return out
