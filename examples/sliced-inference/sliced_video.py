"""Sliced (SAHI-style) detection over a video or large images.

Counterpart of the reference's examples/YOLOv8-SAHI-Inference-Video
(yolov8_sahi.py — sahi.get_sliced_prediction with 512x512 slices), built on
sar_yolo_tpu.ops.slicing instead of the sahi lib: every frame's tiles run as
ONE device batch and per-tile results merge with a global class-aware NMS.

    python examples/sliced-inference/sliced_video.py input.mp4 \
        --model yolov8n.yaml --tile 512 --overlap 0.2 --save out.mp4
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("source", help="video file or image path")
    ap.add_argument("--model", default="yolov8n.yaml")
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--overlap", type=float, default=0.2)
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--save", default=None, help="annotated output video path")
    args = ap.parse_args()

    import cv2
    import numpy as np

    from sar_yolo_tpu import YOLO
    from sar_yolo_tpu.ops.slicing import sliced_predict

    model = YOLO(args.model)
    cap = cv2.VideoCapture(args.source)
    writer = None
    frame_i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        dets = sliced_predict(model, frame, tile=args.tile,
                              overlap=args.overlap, conf=args.conf)
        print(f"frame {frame_i}: {len(dets)} detections")
        if args.save:
            for x1, y1, x2, y2, cf, cls, *_ in np.asarray(dets):
                cv2.rectangle(frame, (int(x1), int(y1)), (int(x2), int(y2)),
                              (0, 255, 0), 2)
                cv2.putText(frame, f"{int(cls)}:{cf:.2f}", (int(x1), int(y1) - 4),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1)
            if writer is None:
                writer = cv2.VideoWriter(args.save, cv2.VideoWriter_fourcc(*"mp4v"),
                                         cap.get(cv2.CAP_PROP_FPS) or 30,
                                         (frame.shape[1], frame.shape[0]))
            writer.write(frame)
        frame_i += 1
    if writer is not None:
        writer.release()


if __name__ == "__main__":
    main()
