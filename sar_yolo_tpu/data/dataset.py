"""Datasets: YOLO-format detection datasets (5-col) + fork's 6-col jde tags,
plus a synthetic dataset for tests/benchmarks.

Capability parity: ultralytics/data/base.py (BaseDataset:21), data/dataset.py
(YOLODataset:46, tags :63-117), data/utils.py (verify_image_label :102-173 with
col-6 person_id tags at :134). Redesigned: labels are padded to a static
`max_labels` per image at collate time so the whole batch pipeline feeds XLA
static shapes (reference pads dynamically per-batch via list collate).
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import cv2
import numpy as np

from sar_yolo_tpu.utils import LOGGER, yaml_load
from .augment import (Albumentations, augment_hsv, copy_paste, letterbox, mixup,
                      mosaic4, mosaic9, random_flip, random_perspective)

IMG_FORMATS = {"bmp", "dng", "jpeg", "jpg", "mpo", "png", "tif", "tiff", "webp", "pfm"}


def _image_shape(path) -> tuple[int, int] | None:
    """(h, w) of an image, or None if unreadable/corrupt.

    Header-only read via PIL when available (fast); cv2 full-decode fallback.
    ≙ reference verify_image_label's Image.open + im.verify (data/utils.py:112).
    """
    try:
        from PIL import Image
        with Image.open(path) as im:
            im.verify()
            return im.size[1], im.size[0]
    except ImportError:
        img = cv2.imread(str(path))
        return None if img is None else img.shape[:2]
    except Exception:
        return None


def img2label_paths(img_paths):
    """images/xxx.jpg -> labels/xxx.txt (ultralytics convention)."""
    out = []
    for p in img_paths:
        p = Path(p)
        parts = list(p.parts)
        for i in range(len(parts) - 1, -1, -1):
            if parts[i] == "images":
                parts[i] = "labels"
                break
        out.append(str(Path(*parts).with_suffix(".txt")))
    return out


def check_det_dataset(data) -> dict:
    """Parse a dataset yaml: {path, train, val, names, nc, [person_states]}."""
    d = yaml_load(data) if isinstance(data, (str, Path)) else dict(data)
    root = Path(d.get("path", Path(data).parent if isinstance(data, (str, Path)) else "."))
    if not root.is_absolute() and isinstance(data, (str, Path)):
        root = (Path(data).parent / root).resolve()
    def _resolve(v):
        p = Path(v)
        return str(p if p.is_absolute() else root / p)

    for split in ("train", "val", "test"):
        if d.get(split):
            # VOC/GlobalWheat-style yamls list several dirs per split
            # (reference check_det_dataset handles both forms)
            d[split] = [_resolve(v) for v in d[split]] \
                if isinstance(d[split], (list, tuple)) else _resolve(d[split])
    names = d.get("names", {})
    if isinstance(names, list):
        names = dict(enumerate(names))
    d["names"] = names
    d["nc"] = d.get("nc", len(names))
    return d


class YOLODataset:
    """Detection dataset over an image dir/list file with YOLO txt labels.

    Each label row: `class cx cy w h [person_id]` (normalized). The optional
    6th column becomes `tags` when use_tags=True (jde task).
    """

    def __init__(self, img_path, imgsz=640, augment=False, hyp=None, use_tags=False,
                 max_labels=128, single_cls=False, fraction=1.0, rect=False,
                 task="detect", kpt_shape=(17, 3), cache=False, flip_idx=None,
                 device_augment=False):
        self.imgsz = imgsz
        # device_augment: host yields raw letterboxed tiles (scaleup like train)
        # and the fused on-device pipeline (data/device_augment.py) does
        # mosaic/affine/HSV/flip inside the train step
        self.device_augment = device_augment and augment
        self.scaleup = augment  # train letterbox upscales (reference LetterBox)
        self.augment = augment and not self.device_augment
        self.hyp = hyp
        self.use_tags = use_tags or task == "jde"
        self.max_labels = max_labels
        self.single_cls = single_cls
        self.task = task
        self.kpt_shape = tuple(kpt_shape)
        self.flip_idx = flip_idx  # keypoint lr-symmetry permutation (pose yaml)
        # full geometric augmentation for every task: mosaic/affine/flip carry
        # boxes, tags, keypoints AND polygons (reference augment.py:966-1318)
        self.mosaic_enabled = bool(self.augment and hyp is not None and getattr(hyp, "mosaic", 0) > 0)
        # optional pixel-level albumentations (no-op unless the lib is present)
        self.albumentations = Albumentations(p=1.0) if self.augment else None
        self.im_files = self._scan_images(img_path)
        self.fraction = fraction
        if fraction < 1.0 and self.im_files:
            self.im_files = self.im_files[: max(1, int(len(self.im_files) * fraction))]
        self.label_files = img2label_paths(self.im_files)
        self.shapes = None  # (n, 2) h,w per image; populated by the verify cache
        self._load_or_build_cache()
        # per-sample augmentation RNG key base: the training seed flows in from
        # hyp (trainer args) so different seeds draw different augmentations
        # (≙ reference seed_worker, data/build.py:38)
        self.seed = int(getattr(hyp, "seed", 0) or 0) if hyp is not None else 0
        self.epoch = 0  # set by DataLoader.set_epoch; keys per-sample RNG
        self.rng = np.random.default_rng(0)  # legacy; __getitem__ uses _item_rng
        # image cache: 'ram' / True keeps decoded arrays in memory; 'disk' saves
        # .npy sidecars next to the images (reference BaseDataset cache modes)
        self.cache = bool(cache) and str(cache).lower() != "disk"
        self.cache_disk = str(cache).lower() == "disk"
        self._im_cache: dict[int, np.ndarray] = {}
        # rect mode state (init_rect)
        self.rect = False
        self.batch_shapes = None
        self.batch_index = None

    # ---- label cache + verification -------------------------------------
    def _cache_path(self) -> Path:
        lp = Path(self.label_files[0]).parent if self.label_files else Path(".")
        return lp.with_suffix(".cache.npz")

    def _cache_hash(self) -> str:
        h = hashlib.sha1()
        h.update(f"{self.task}|{self.kpt_shape}|{len(self.im_files)}".encode())
        for im, lf in zip(self.im_files, self.label_files):
            st = Path(lf).stat() if Path(lf).is_file() else None
            h.update(f"{im}|{lf}|{st.st_mtime_ns if st else 0}|{st.st_size if st else 0}".encode())
        return h.hexdigest()

    def _load_or_build_cache(self):
        """Parse+verify labels once; persist to labels/../<split>.cache.npz.

        Capability parity with the reference's *.cache files + verify_image_label
        (data/utils.py:102-173, data/base.py cache_labels): corrupt images are
        dropped with a warning, image shapes are recorded for rect batching.
        """
        cache_file = self._cache_path()
        want = self._cache_hash()
        if cache_file.is_file():
            try:
                z = np.load(cache_file, allow_pickle=True)
                if str(z["hash"]) == want:
                    self.im_files = list(z["im_files"])
                    self.label_files = list(z["label_files"])
                    self.labels = list(z["labels"])
                    self.shapes = z["shapes"]
                    return
            except Exception:
                pass  # stale/unreadable cache: rebuild
        keep_im, keep_lf, labels, shapes, dropped = [], [], [], [], 0
        for im, lf in zip(self.im_files, self.label_files):
            shape = _image_shape(im)
            if shape is None or min(shape) < 10:
                dropped += 1
                continue
            try:
                lb = self._load_label(lf)
            except Exception as e:
                LOGGER.warning(f"corrupt label {lf}: {e}")
                dropped += 1
                continue
            keep_im.append(im)
            keep_lf.append(lf)
            labels.append(lb)
            shapes.append(shape)
        if dropped:
            LOGGER.warning(f"dropped {dropped} corrupt images/labels from {len(self.im_files)}")
        if not keep_im:
            raise FileNotFoundError("all images failed verification")
        self.im_files, self.label_files, self.labels = keep_im, keep_lf, labels
        self.shapes = np.array(shapes, np.int64)
        try:
            np.savez_compressed(
                cache_file, hash=want, im_files=np.array(self.im_files, object),
                label_files=np.array(self.label_files, object),
                labels=np.array(self.labels, object), shapes=self.shapes)
        except OSError:
            pass  # read-only dataset dir: verification still ran, just not persisted

    # ---- rect batching ---------------------------------------------------
    def init_rect(self, batch_size: int, stride: int = 32, pad: float = 0.5,
                  quant: int = 64):
        """Rectangular eval batching, executable-bounded for XLA.

        Reference semantics (data/base.py set_rectangle): sort by aspect ratio,
        give each batch the tightest stride-multiple shape covering its images.
        TPU redesign: the variable dimension is additionally rounded up to a
        multiple of `quant` (64), so the number of distinct batch shapes — and
        thus jit executables — is bounded by imgsz/quant instead of imgsz/stride.
        """
        n = len(self.im_files)
        ar = self.shapes[:, 0] / self.shapes[:, 1]  # h/w
        order = np.argsort(ar)
        self.im_files = [self.im_files[i] for i in order]
        self.label_files = [self.label_files[i] for i in order]
        self.labels = [self.labels[i] for i in order]
        self.shapes = self.shapes[order]
        ar = ar[order]
        nb = (n + batch_size - 1) // batch_size
        self.batch_index = np.floor(np.arange(n) / batch_size).astype(int)
        shapes = []
        for b in range(nb):
            arb = ar[self.batch_index == b]
            mini, maxi = float(arb.min()), float(arb.max())
            sh = [1.0, 1.0]
            if maxi < 1:
                sh = [maxi, 1.0]
            elif mini > 1:
                sh = [1.0, 1.0 / mini]
            hq = int(np.ceil(sh[0] * self.imgsz / stride + pad) * stride)
            wq = int(np.ceil(sh[1] * self.imgsz / stride + pad) * stride)
            # bound the executable count: round the short side up to `quant`
            if hq < wq:
                hq = min(int(np.ceil(hq / quant) * quant), wq)
            elif wq < hq:
                wq = min(int(np.ceil(wq / quant) * quant), hq)
            shapes.append((min(hq, self.imgsz + stride), min(wq, self.imgsz + stride)))
        self.batch_shapes = shapes
        self.rect = True
        self.rect_batch_size = batch_size
        LOGGER.info(f"rect val: {nb} batches over {len(set(shapes))} distinct shapes "
                    f"{sorted(set(shapes))}")

    @staticmethod
    def _scan_images(img_path):
        files = []
        for p in ([img_path] if isinstance(img_path, (str, Path)) else img_path):
            p = Path(p)
            if p.is_dir():
                files += sorted(str(f) for f in p.rglob("*") if f.suffix[1:].lower() in IMG_FORMATS)
            elif p.is_file() and p.suffix == ".txt":
                base = p.parent
                for line in p.read_text().splitlines():
                    line = line.strip()
                    if line:
                        q = Path(line)
                        files.append(str(q if q.is_absolute() else base / q))
            elif p.is_file():
                files.append(str(p))
        if not files:
            raise FileNotFoundError(f"No images found in {img_path}")
        return files

    def _load_label(self, lf):
        """Read one label txt -> dict(cls, bboxes normalized xywh, tags[, keypoints, polygons]).

        Formats (all normalized, reference data/utils.py:102-173):
          detect: class cx cy w h
          jde:    class cx cy w h person_id          (fork 6-column)
          pose:   class cx cy w h x1 y1 v1 ... xK yK vK
          segment: class x1 y1 x2 y2 ... (polygon -> bbox + rasterized mask)
        """
        lines = []
        if Path(lf).is_file():
            lines = [ln.split() for ln in Path(lf).read_text().splitlines() if ln.strip()]
        K, kd = self.kpt_shape
        cls, boxes, tags, kpts, polys = [], [], [], [], []
        for parts in lines:
            vals = [float(x) for x in parts]
            if self.task == "segment" and len(vals) > 5 and (len(vals) - 1) % 2 == 0:
                poly = np.array(vals[1:], np.float32).reshape(-1, 2)
                x1, y1 = poly.min(0)
                x2, y2 = poly.max(0)
                boxes.append([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1])
                polys.append(poly)
                cls.append(vals[0])
                tags.append(0.0)
            elif self.task == "pose" and len(vals) >= 5 + K * kd:
                cls.append(vals[0])
                boxes.append(vals[1:5])
                kpts.append(np.array(vals[5:5 + K * kd], np.float32).reshape(K, kd))
                tags.append(0.0)
            elif len(vals) >= 5:
                cls.append(vals[0])
                boxes.append(vals[1:5])
                tags.append(vals[5] if len(vals) > 5 else 0.0)
        n = len(cls)
        out = {
            "cls": np.zeros(n, np.float32) if self.single_cls else np.array(cls, np.float32),
            "bboxes": np.array(boxes, np.float32).reshape(n, 4),
            "tags": np.array(tags, np.float32),
        }
        if self.task == "pose":
            out["keypoints"] = np.stack(kpts) if kpts else np.zeros((0, K, kd), np.float32)
        if self.task == "segment":
            out["polygons"] = polys
        return out

    def __len__(self):
        return len(self.im_files)

    def _load_item(self, i, target_size=None):
        """Load image i resized so the long side == target (keeps ratio), labels in pixels xyxy."""
        img = self._im_cache.get(i) if self.cache else None
        if img is None and self.cache_disk:
            npy = Path(self.im_files[i]).with_suffix(".npy")
            if npy.is_file():
                img = np.load(npy)
        if img is None:
            img = cv2.imread(self.im_files[i])
            if img is None:
                raise FileNotFoundError(self.im_files[i])
            if self.cache:
                self._im_cache[i] = img
            elif self.cache_disk:
                try:
                    np.save(Path(self.im_files[i]).with_suffix(".npy"), img)
                except OSError:
                    pass  # read-only dataset dir
        img = img.copy() if self.cache else img
        h0, w0 = img.shape[:2]
        size = target_size or self.imgsz
        r = size / max(h0, w0)
        if r != 1:
            img = cv2.resize(img, (round(w0 * r), round(h0 * r)), interpolation=cv2.INTER_LINEAR)
        h, w = img.shape[:2]
        lb = self.labels[i]
        boxes = lb["bboxes"].copy()
        if len(boxes):
            # normalized xywh -> pixel xyxy at current size
            cx, cy, bw, bh = boxes[:, 0] * w, boxes[:, 1] * h, boxes[:, 2] * w, boxes[:, 3] * h
            boxes = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], 1)
        item = {"img": img, "cls": lb["cls"].copy(), "bboxes": boxes.astype(np.float32),
                "ori_shape": np.array([h0, w0], np.float32), "r0": float(r),
                "im_file": self.im_files[i]}
        if self.use_tags:
            item["tags"] = lb["tags"].copy()
        if self.task == "pose" and "keypoints" in lb:
            k = lb["keypoints"].copy()
            if len(k):
                k[..., 0] *= w
                k[..., 1] *= h
            item["keypoints"] = k
        if self.task == "segment":
            item["polygons"] = [p * np.array([w, h], np.float32) for p in lb.get("polygons", [])]
        return item

    def _item_rng(self, i):
        """Per-sample RNG keyed by (seed, epoch, index): deterministic regardless
        of dataloader worker count, and safe under concurrent __getitem__."""
        return np.random.default_rng((self.seed, self.epoch, i))

    def __getitem__(self, i):
        hyp = self.hyp
        rng = self._item_rng(i)
        if self.augment and self.mosaic_enabled and rng.random() < getattr(hyp, "mosaic", 1.0):
            def one_mosaic():
                use9 = getattr(hyp, "mosaic9", 0) and rng.random() < hyp.mosaic9
                n_extra = 8 if use9 else 3
                idxs = [i] + list(rng.integers(0, len(self), n_extra))
                items = [self._load_item(j) for j in idxs]
                it = (mosaic9 if use9 else mosaic4)(items, self.imgsz, rng=rng)
                border = it.pop("mosaic_border")
                if getattr(hyp, "copy_paste", 0):
                    it = copy_paste(it, p=hyp.copy_paste, rng=rng)
                return random_perspective(it, degrees=hyp.degrees, translate=hyp.translate,
                                          scale=hyp.scale, shear=hyp.shear,
                                          perspective=hyp.perspective, border=border,
                                          rng=rng)
            item = one_mosaic()
            if getattr(hyp, "mixup", 0) and rng.random() < hyp.mixup:
                item = mixup(item, one_mosaic(), rng=rng)
        else:
            item = self._load_item(i)
            shape = self.batch_shapes[self.batch_index[i]] if self.rect else self.imgsz
            img, r, (padx, pady) = letterbox(item["img"], shape, scaleup=self.scaleup)
            if not self.augment and not self.device_augment:
                # original-image mapping for COCO-comparable predictions.json
                # (reference detect/val.py pred_to_json + scale_boxes): total
                # resize ratio and letterbox pad back to native pixels — val
                # batches ONLY. device_augment train batches must stay numeric
                # end to end (im_file strings can't cross device_put)
                item["ratio_pad"] = np.array([item["r0"] * r, padx, pady], np.float32)
            if len(item["bboxes"]):
                item["bboxes"] = item["bboxes"] * r
                item["bboxes"][:, [0, 2]] += padx
                item["bboxes"][:, [1, 3]] += pady
            if "keypoints" in item and len(item["keypoints"]):
                item["keypoints"][..., 0] = item["keypoints"][..., 0] * r + padx
                item["keypoints"][..., 1] = item["keypoints"][..., 1] * r + pady
            if "polygons" in item:
                item["polygons"] = [p * r + np.array([padx, pady], np.float32)
                                    for p in item["polygons"]]
            item["img"] = img
            if self.augment:
                if getattr(hyp, "copy_paste", 0):
                    item = copy_paste(item, p=hyp.copy_paste, rng=rng)
                item = random_perspective(item, degrees=hyp.degrees, translate=hyp.translate,
                                          scale=hyp.scale, shear=hyp.shear,
                                          perspective=hyp.perspective, rng=rng)
        if self.augment:
            if self.albumentations is not None:
                item = self.albumentations(item, rng=rng)
            augment_hsv(item["img"], hyp.hsv_h, hyp.hsv_s, hyp.hsv_v, rng=rng)
            item = random_flip(item, fliplr=hyp.fliplr, flipud=hyp.flipud, rng=rng,
                               flip_idx=self.flip_idx)
        return self._format(item)

    def _format(self, item):
        """To training arrays: img uint8 HWC-RGB, padded labels (normalized xywh)."""
        img = item["img"]
        h, w = img.shape[:2]
        img = np.ascontiguousarray(img[..., ::-1])  # BGR -> RGB
        M = self.max_labels
        n = min(len(item["bboxes"]), M)
        cls = np.zeros(M, np.float32)
        boxes = np.zeros((M, 4), np.float32)
        mask = np.zeros(M, np.float32)
        tags = np.zeros(M, np.float32)
        if n:
            b = item["bboxes"][:n]
            cx = (b[:, 0] + b[:, 2]) / 2 / w
            cy = (b[:, 1] + b[:, 3]) / 2 / h
            bw = (b[:, 2] - b[:, 0]) / w
            bh = (b[:, 3] - b[:, 1]) / h
            boxes[:n] = np.stack([cx, cy, bw, bh], 1)
            cls[:n] = item["cls"][:n]
            mask[:n] = 1.0
            if self.use_tags:
                tags[:n] = item["tags"][:n]
        out = {"img": img, "cls": cls, "bboxes": boxes, "mask": mask}
        if "ratio_pad" in item:  # val path: native-space mapping metadata
            out["ratio_pad"] = item["ratio_pad"]
            out["ori_shape"] = item["ori_shape"]
            out["im_file"] = item["im_file"]
        if self.use_tags:
            out["tags"] = tags
        if self.task == "pose":
            K, kd = self.kpt_shape
            kp = np.zeros((M, K, kd), np.float32)
            if n and "keypoints" in item and len(item["keypoints"]):
                kk = item["keypoints"][:n].copy()
                kk[..., 0] /= w
                kk[..., 1] /= h
                kp[:n] = kk
            out["keypoints"] = kp
        if self.task == "segment":
            ms = self.imgsz // 4
            seg = np.zeros((ms, ms), np.float32)
            for j, poly in enumerate(item.get("polygons", [])[:n]):
                cv2.fillPoly(seg, [np.round(poly / 4).astype(np.int32)], float(j + 1))
            out["masks"] = seg
        return out


class GroundingDataset(YOLODataset):
    """Grounding-annotation detection dataset (caption-derived classes).

    Capability parity with reference data/dataset.py:306 GroundingDataset:
    labels come from ONE COCO-style json whose per-image `caption` plus each
    annotation's `tokens_positive` spans name the category. Per-image category
    vocabularies are independent; the phrase list is kept on every label dict
    as `texts` (list of [phrase]) for open-vocabulary training.

    Detect-only like the reference. Shapes come from the json height/width so
    verification needs no image decode pass.
    """

    def __init__(self, img_path, json_file, task="detect", **kwargs):
        assert task == "detect", "GroundingDataset only supports task='detect'"
        self.json_file = json_file
        super().__init__(img_path, task=task, **kwargs)

    def _scan_images(self, img_path):
        self._img_root = Path(img_path)
        return []  # populated from the json in _load_or_build_cache

    def _load_or_build_cache(self):
        import json
        from collections import defaultdict

        with open(self.json_file) as f:
            ann_json = json.load(f)
        images = {int(x["id"]): x for x in ann_json["images"]}
        by_img = defaultdict(list)
        for ann in ann_json["annotations"]:
            by_img[int(ann["image_id"])].append(ann)

        self.im_files, self.label_files, self.labels, shapes = [], [], [], []
        for img_id, anns in by_img.items():
            img = images[img_id]
            h, w = img["height"], img["width"]
            im_file = self._img_root / img["file_name"]
            if not im_file.exists():
                continue
            caption = img.get("caption", "")
            cat2id, texts, rows, tags = {}, [], [], []
            for ann in anns:
                if ann.get("iscrowd"):
                    continue
                x, y, bw, bh = (float(v) for v in ann["bbox"])  # xywh top-left px
                box = np.array([(x + bw / 2) / w, (y + bh / 2) / h, bw / w, bh / h],
                               np.float32)
                if box[2] <= 0 or box[3] <= 0:
                    continue
                phrase = " ".join(caption[t0:t1] for t0, t1 in
                                  ann.get("tokens_positive", [])) or "object"
                if phrase not in cat2id:
                    cat2id[phrase] = len(cat2id)
                    texts.append([phrase])
                row = [float(cat2id[phrase]), *box.tolist()]
                if row not in rows:  # reference dedups exact duplicates
                    rows.append(row)
            lb = np.array(rows, np.float32) if rows else np.zeros((0, 5), np.float32)
            self.im_files.append(str(im_file))
            self.label_files.append(str(self.json_file))
            self.labels.append({"cls": lb[:, 0], "bboxes": lb[:, 1:5],
                                "tags": np.zeros(len(lb), np.float32),
                                "texts": texts})
            shapes.append((h, w))
        if not self.im_files:
            raise FileNotFoundError(f"no images from {self.json_file} exist under "
                                    f"{self._img_root}")
        if getattr(self, "fraction", 1.0) < 1.0:
            # the base-class slice ran before the json populated im_files —
            # apply it here so fraction subsampling actually works
            k = max(1, int(len(self.im_files) * self.fraction))
            self.im_files, self.label_files = self.im_files[:k], self.label_files[:k]
            self.labels, shapes = self.labels[:k], shapes[:k]
        self.shapes = np.array(shapes, np.int64)


class SyntheticDataset:
    """Procedural detection dataset (colored rectangles on noise) for tests/bench.

    Deterministic per index; no downloads needed. Class = color bin.
    task='pose' adds 5 keypoints (corners + center); task='segment' adds
    overlap-encoded instance masks at 1/4 resolution.
    """

    def __init__(self, n=64, imgsz=640, nc=3, max_labels=128, use_tags=False, seed=0,
                 task="detect", kpt_shape=(5, 3), min_size=0.1, max_size=0.3):
        self.n = n
        self.imgsz = imgsz
        self.nc = nc
        self.max_labels = max_labels
        self.use_tags = use_tags or task == "jde"
        self.seed = seed
        self.task = task
        self.kpt_shape = kpt_shape
        self.min_size = min_size
        self.max_size = max_size

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(self.seed * 100003 + i)
        s = self.imgsz
        img = (rng.uniform(0, 60, (s, s, 3))).astype(np.uint8)
        if self.task == "classify":
            c = int(rng.integers(0, self.nc))
            colors = [(220, 40, 40), (40, 220, 40), (40, 40, 220)]
            img[s // 4: 3 * s // 4, s // 4: 3 * s // 4] = colors[c % 3]
            return {"img": img, "cls": np.float32(c)}
        M = self.max_labels
        n_obj = int(rng.integers(1, 6))
        cls = np.zeros(M, np.float32)
        if self.task == "obb":
            import cv2
            boxes5 = np.zeros((M, 5), np.float32)
            mask = np.zeros(M, np.float32)
            colors = [(220, 40, 40), (40, 220, 40), (40, 40, 220)]
            for j in range(n_obj):
                c = int(rng.integers(0, self.nc))
                w = rng.uniform(0.12, 0.3) * s
                h = rng.uniform(0.12, 0.3) * s
                cx = rng.uniform(0.25, 0.75) * s
                cy = rng.uniform(0.25, 0.75) * s
                r = rng.uniform(-np.pi / 4, 3 * np.pi / 4)
                cos, sin = np.cos(r), np.sin(r)
                pts = np.array([[-w/2, -h/2], [w/2, -h/2], [w/2, h/2], [-w/2, h/2]])
                rot = pts @ np.array([[cos, sin], [-sin, cos]])
                corners = (rot + [cx, cy]).astype(np.int32)
                cv2.fillPoly(img, [corners], colors[c % 3])
                boxes5[j] = [cx / s, cy / s, w / s, h / s, r]
                cls[j] = c
                mask[j] = 1.0
            return {"img": img, "cls": cls, "bboxes": boxes5, "mask": mask}
        boxes = np.zeros((M, 4), np.float32)
        mask = np.zeros(M, np.float32)
        tags = np.zeros(M, np.float32)
        K, kd = self.kpt_shape
        kpts = np.zeros((M, K, kd), np.float32)
        ms = s // 4
        seg_masks = np.zeros((ms, ms), np.float32)
        colors = [(220, 40, 40), (40, 220, 40), (40, 40, 220), (220, 220, 40), (220, 40, 220)]
        for j in range(n_obj):
            c = int(rng.integers(0, self.nc))
            w = rng.uniform(self.min_size, self.max_size) * s
            h = rng.uniform(self.min_size, self.max_size) * s
            cx = rng.uniform(w / 2, s - w / 2)
            cy = rng.uniform(h / 2, s - h / 2)
            x1, y1, x2, y2 = int(cx - w / 2), int(cy - h / 2), int(cx + w / 2), int(cy + h / 2)
            tag = j % 4
            # jde: appearance keyed by identity tag so ReID/state heads have signal
            color_key = tag if self.task == "jde" else c
            img[y1:y2, x1:x2] = colors[color_key % len(colors)]
            boxes[j] = [cx / s, cy / s, w / s, h / s]
            cls[j] = c
            mask[j] = 1.0
            tags[j] = tag
            if self.task == "pose":
                pts = [(x1, y1), (x2, y1), (x2, y2), (x1, y2), (cx, cy)][:K]
                for ki, (px, py) in enumerate(pts):
                    kpts[j, ki] = [px / s, py / s, 2.0][:kd]
            if self.task == "segment":
                seg_masks[y1 // 4:y2 // 4, x1 // 4:x2 // 4] = j + 1
        out = {"img": img, "cls": cls, "bboxes": boxes, "mask": mask}
        if self.use_tags:
            out["tags"] = tags
        if self.task == "pose":
            out["keypoints"] = kpts
        if self.task == "segment":
            out["masks"] = seg_masks
        return out


class ClassificationDataset:
    """ImageNet-folder-style classification dataset (reference data/dataset.py:412
    ClassificationDataset): root/<class_name>/*.jpg, class ids are the sorted
    folder order.

    Train augment: random-resized-crop + lr-flip + HSV jitter; val: resize
    shorter side then center crop (torchvision-classic semantics).
    """

    def __init__(self, root, imgsz=224, augment=False, hyp=None, seed=0):
        self.root = Path(root)
        self.imgsz = imgsz
        self.augment = augment
        self.hyp = hyp
        classes = sorted(d.name for d in self.root.iterdir() if d.is_dir())
        if not classes:
            raise FileNotFoundError(f"no class folders under {root}")
        self.names = dict(enumerate(classes))
        self.samples = []
        for ci, cname in enumerate(classes):
            for f in sorted((self.root / cname).rglob("*")):
                if f.suffix[1:].lower() in IMG_FORMATS:
                    self.samples.append((str(f), ci))
        if not self.samples:
            raise FileNotFoundError(f"no images under {root}")
        self.seed = seed
        self.epoch = 0
        self.rng = np.random.default_rng(seed)  # legacy; __getitem__ uses per-item rng

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i):
        rng = np.random.default_rng((self.seed, self.epoch, i))
        path, ci = self.samples[i]
        img = cv2.imread(path)
        if img is None:
            raise FileNotFoundError(path)
        s = self.imgsz
        h, w = img.shape[:2]
        if self.augment:
            # random resized crop: area 0.25-1.0, ratio 3/4-4/3
            for _ in range(10):
                area = rng.uniform(0.25, 1.0) * h * w
                ratio = np.exp(rng.uniform(np.log(3 / 4), np.log(4 / 3)))
                cw = int(round(np.sqrt(area * ratio)))
                ch = int(round(np.sqrt(area / ratio)))
                if cw <= w and ch <= h:
                    x0 = int(rng.integers(0, w - cw + 1))
                    y0 = int(rng.integers(0, h - ch + 1))
                    img = img[y0:y0 + ch, x0:x0 + cw]
                    break
            img = cv2.resize(img, (s, s), interpolation=cv2.INTER_LINEAR)
            if rng.random() < 0.5:
                img = np.fliplr(img).copy()
            if self.hyp is not None:
                augment_hsv(img, getattr(self.hyp, "hsv_h", 0.015),
                            getattr(self.hyp, "hsv_s", 0.7),
                            getattr(self.hyp, "hsv_v", 0.4), rng=rng)
        else:
            r = s / min(h, w)
            img = cv2.resize(img, (round(w * r), round(h * r)),
                             interpolation=cv2.INTER_LINEAR)
            hh, ww = img.shape[:2]
            y0 = (hh - s) // 2
            x0 = (ww - s) // 2
            img = img[y0:y0 + s, x0:x0 + s]
        return {"img": np.ascontiguousarray(img[..., ::-1]), "cls": np.float32(ci)}
