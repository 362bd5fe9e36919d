"""Dataset converters: COCO json -> YOLO txt labels.

Capability parity with reference data/converter.py:221 convert_coco (no
pycocotools dependency — plain json parsing).
"""

from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path

from sar_yolo_tpu.utils import LOGGER

# COCO 91-index -> contiguous 80-class mapping (public COCO convention)
COCO80_MAP = {}
_skip = {12, 26, 29, 30, 45, 66, 68, 69, 71, 83}
_idx = 0
for _i in range(1, 91):
    if _i in _skip:
        continue
    COCO80_MAP[_i] = _idx
    _idx += 1


def convert_coco(annotations_json, save_dir="coco_converted", use_segments: bool = False,
                 cls91to80: bool = True):
    """Convert a COCO annotation json into YOLO txt labels under save_dir/labels."""
    save_dir = Path(save_dir)
    (save_dir / "labels").mkdir(parents=True, exist_ok=True)
    data = json.loads(Path(annotations_json).read_text())
    images = {im["id"]: im for im in data["images"]}
    per_image = defaultdict(list)
    for ann in data.get("annotations", []):
        if ann.get("iscrowd"):
            continue
        per_image[ann["image_id"]].append(ann)

    n = 0
    for img_id, anns in per_image.items():
        im = images[img_id]
        w, h = im["width"], im["height"]
        lines = []
        for ann in anns:
            cid = ann["category_id"]
            cls = COCO80_MAP.get(cid, cid - 1) if cls91to80 else cid - 1
            if use_segments and ann.get("segmentation"):
                seg = ann["segmentation"][0]
                pts = [f"{x / (w if i % 2 == 0 else h):.6f}" for i, x in enumerate(seg)]
                lines.append(" ".join([str(cls), *pts]))
            else:
                x, y, bw, bh = ann["bbox"]
                cx, cy = (x + bw / 2) / w, (y + bh / 2) / h
                lines.append(f"{cls} {cx:.6f} {cy:.6f} {bw / w:.6f} {bh / h:.6f}")
        out = save_dir / "labels" / (Path(im["file_name"]).stem + ".txt")
        out.write_text("\n".join(lines))
        n += 1
    LOGGER.info(f"convert_coco: wrote {n} label files to {save_dir / 'labels'}")
    return save_dir
