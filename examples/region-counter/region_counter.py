"""Count tracked objects inside user-defined polygon regions of a video.

Counterpart of the reference's examples/YOLOv8-Region-Counter: runs
track-mode over a video and reports per-region live counts using the
RegionCounter solution (sar_yolo_tpu/solutions).

    python examples/region-counter/region_counter.py video.mp4 \
        --model yolov8n.yaml --regions "100,100 400,100 400,400 100,400"
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("source")
    ap.add_argument("--model", default="yolov8n.yaml")
    ap.add_argument("--regions", nargs="+", required=True,
                    help="each region: 'x1,y1 x2,y2 ...' (>=3 points)")
    ap.add_argument("--conf", type=float, default=0.25)
    args = ap.parse_args()

    from sar_yolo_tpu import YOLO
    from sar_yolo_tpu.solutions import RegionCounter

    regions = {}
    for i, spec in enumerate(args.regions):
        regions[f"region_{i}"] = [tuple(float(v) for v in p.split(","))
                                  for p in spec.split()]
    counter = RegionCounter(regions)
    model = YOLO(args.model)
    for frame_i, r in enumerate(model.track(args.source, conf=args.conf,
                                            stream=True, verbose=False)):
        boxes = np.asarray(r.boxes.data) if r.boxes is not None else np.zeros((0, 6))
        print(f"frame {frame_i}: {counter.update(boxes)}")


if __name__ == "__main__":
    main()
