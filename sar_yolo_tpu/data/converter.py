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


DOTA_CLASSES = (
    "plane", "ship", "storage tank", "baseball diamond", "tennis court",
    "basketball court", "ground track field", "harbor", "bridge",
    "large vehicle", "small vehicle", "helicopter", "roundabout",
    "soccer ball field", "swimming pool", "container crane", "airport",
    "helipad")  # DOTA v1.0 (15) + v1.5/v2.0 extras (reference converter.py:360)


def convert_dota_to_yolo_obb(dota_root, version: str = "1.0"):
    """DOTA annotations -> YOLO-OBB labels (reference data/converter.py:360).

    Expects `dota_root/images/{train,val}/*.png|jpg` and original annotations at
    `dota_root/labels/{train,val}_original/*.txt` (rows:
    `x1 y1 x2 y2 x3 y3 x4 y4 class_name difficulty`). Writes normalized
    `cls x1 y1 ... x4 y4` rows to `dota_root/labels/{train,val}/`.
    """
    import cv2

    root = Path(dota_root)
    nv = {"1.0": 15, "1.5": 16, "2.0": 18}.get(str(version), 15)
    cls_map = {name: i for i, name in enumerate(DOTA_CLASSES[:nv])}
    n = 0
    for split in ("train", "val"):
        orig = root / "labels" / f"{split}_original"
        if not orig.is_dir():
            continue
        out_dir = root / "labels" / split
        out_dir.mkdir(parents=True, exist_ok=True)
        img_dir = root / "images" / split
        for lf in sorted(orig.glob("*.txt")):
            img = next((p for ext in ("png", "jpg", "jpeg", "bmp", "tif")
                        for p in [img_dir / f"{lf.stem}.{ext}"] if p.is_file()), None)
            if img is None:
                LOGGER.warning(f"convert_dota: no image for {lf.stem}, skipped")
                continue
            im = cv2.imread(str(img))
            if im is None:
                LOGGER.warning(f"convert_dota: unreadable image {img}, skipped")
                continue
            h, w = im.shape[:2]
            lines = []
            for row in lf.read_text().splitlines():
                parts = row.split()
                if len(parts) < 9:
                    continue  # header lines (imagesource/gsd) or malformed
                try:
                    coords = [float(v) for v in parts[:8]]
                except ValueError:
                    continue
                name = " ".join(parts[8:-1]) if parts[-1].lstrip("-").isdigit() \
                    else " ".join(parts[8:])
                name = name.replace("-", " ")
                if name not in cls_map:
                    LOGGER.warning(f"convert_dota: unknown class '{name}' in {lf.name}")
                    continue
                norm = [coords[i] / (w if i % 2 == 0 else h) for i in range(8)]
                lines.append(" ".join([str(cls_map[name])] +
                                      [f"{v:.6g}" for v in norm]))
            (out_dir / lf.name).write_text("\n".join(lines))
            n += 1
    LOGGER.info(f"convert_dota_to_yolo_obb: wrote {n} label files under {root / 'labels'}")
    return root


def coco80_to_coco91_class() -> list:
    """Contiguous 80-class index -> paper 91-index category id (reference
    data/converter.py:122): the i-th entry is the COCO json category_id of
    model class i."""
    return sorted(COCO80_MAP)
