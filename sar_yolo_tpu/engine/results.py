"""Typed inference results (capability parity: reference engine/results.py:188,
Boxes:945, Embeddings:1165, Masks:1210, Keypoints:1308, Probs:1432, OBB:1573;
fork args person_states/embeds :231,269-270).

Numpy-backed: arrays arrive once from device as one fixed-size block per batch.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


class _TensorLike:
    """Shared base: .data + orig_shape, len/iter/index (reference BaseTensor)."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = data
        self.orig_shape = orig_shape

    def __len__(self):
        return len(self.data)

    def __getitem__(self, i):
        return type(self)(self.data[i][None] if np.isscalar(i) or isinstance(i, int)
                          else self.data[i], self.orig_shape)

    def cpu(self):
        return self

    def numpy(self):
        return self


class Boxes(_TensorLike):
    """Detection boxes: data rows [x1, y1, x2, y2, conf, cls] (+track id col 6)."""

    @property
    def xyxy(self):
        return self.data[:, :4]

    @property
    def conf(self):
        return self.data[:, 4]

    @property
    def cls(self):
        return self.data[:, 5]

    @property
    def xywh(self):
        b = self.data[:, :4]
        return np.stack([(b[:, 0] + b[:, 2]) / 2, (b[:, 1] + b[:, 3]) / 2,
                         b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]], 1)

    @property
    def xyxyn(self):
        h, w = self.orig_shape
        return self.xyxy / np.array([w, h, w, h])

    @property
    def xywhn(self):
        h, w = self.orig_shape
        return self.xywh / np.array([w, h, w, h])

    @property
    def id(self):
        """Track ids when assigned by a tracker (column 6 if present)."""
        return self.data[:, 6] if self.data.shape[1] > 6 else None

    @property
    def is_track(self):
        return self.data.shape[1] > 6


class Masks(_TensorLike):
    """Instance masks (n, H, W) bool/float (reference Masks:1210)."""

    @property
    def xy(self):
        """Per-instance mask contours in pixels (list of (k, 2) arrays)."""
        import cv2
        out = []
        for m in self.data:
            cs, _ = cv2.findContours(m.astype(np.uint8), cv2.RETR_EXTERNAL,
                                     cv2.CHAIN_APPROX_SIMPLE)
            out.append(max(cs, key=cv2.contourArea).reshape(-1, 2).astype(np.float32)
                       if cs else np.zeros((0, 2), np.float32))
        return out

    @property
    def xyn(self):
        h, w = self.orig_shape
        return [c / np.array([w, h], np.float32) for c in self.xy]


class Keypoints(_TensorLike):
    """Pose keypoints (n, K, 2|3) (reference Keypoints:1308)."""

    @property
    def xy(self):
        return self.data[..., :2]

    @property
    def xyn(self):
        h, w = self.orig_shape
        return self.data[..., :2] / np.array([w, h])

    @property
    def conf(self):
        return self.data[..., 2] if self.data.shape[-1] == 3 else None


class Probs(_TensorLike):
    """Classification probabilities (reference Probs:1432)."""

    def __init__(self, data, orig_shape=None):
        super().__init__(np.asarray(data).reshape(-1), orig_shape)

    @property
    def top1(self):
        return int(self.data.argmax())

    @property
    def top5(self):
        return np.argsort(-self.data)[:5].tolist()

    @property
    def top1conf(self):
        return float(self.data.max())

    @property
    def top5conf(self):
        return self.data[self.top5]


class OBB(_TensorLike):
    """Rotated boxes: rows [cx, cy, w, h, r, conf, cls] (reference OBB:1573)."""

    @property
    def xywhr(self):
        return self.data[:, :5]

    @property
    def conf(self):
        return self.data[:, 5]

    @property
    def cls(self):
        return self.data[:, 6]

    @property
    def xyxyxyxy(self):
        """Corner form (n, 4, 2)."""
        cx, cy, w, h, r = (self.data[:, i] for i in range(5))
        cos, sin = np.cos(r), np.sin(r)
        dx = np.stack([w / 2, w / 2, -w / 2, -w / 2], 1)
        dy = np.stack([h / 2, -h / 2, -h / 2, h / 2], 1)
        x = cx[:, None] + dx * cos[:, None] - dy * sin[:, None]
        y = cy[:, None] + dx * sin[:, None] + dy * cos[:, None]
        return np.stack([x, y], -1)

    @property
    def xyxy(self):
        """Axis-aligned envelope of each rotated box."""
        c = self.xyxyxyxy
        return np.concatenate([c.min(1), c.max(1)], 1)


class Embeddings(_TensorLike):
    """ReID embeddings (n, E) — fork addition (reference Embeddings:1165)."""

    @property
    def normalized(self):
        n = np.linalg.norm(self.data, axis=1, keepdims=True) + 1e-9
        return self.data / n


class Results:
    """Per-image result: boxes (+ jde embeddings & posture states, masks,
    keypoints, probs, obb)."""

    def __init__(self, orig_img, path, names, boxes=None, masks=None, probs=None,
                 keypoints=None, embeds=None, person_states=None, speed=None,
                 obb=None):
        self.orig_img = orig_img
        self.orig_shape = orig_img.shape[:2]
        self.path = path
        self.names = names
        self.boxes = Boxes(boxes, self.orig_shape) if boxes is not None else None
        self.masks = Masks(np.asarray(masks), self.orig_shape) if masks is not None else None
        self.probs = Probs(probs) if probs is not None else None
        self.keypoints = Keypoints(np.asarray(keypoints), self.orig_shape) \
            if keypoints is not None else None
        self._obb_data = None
        if obb is not None:
            self.obb = obb
        self.embeds = embeds              # (n, embed_dim) ReID embeddings (jde)
        self.person_states = person_states  # (n,) argmax posture state ids (jde)
        self.speed = speed or {}
        self.frame = None

    @property
    def obb(self):
        return self._obb_data

    @obb.setter
    def obb(self, value):
        self._obb_data = OBB(np.asarray(value), self.orig_shape) \
            if value is not None and not isinstance(value, OBB) else value

    def __len__(self):
        for attr in (self.boxes, self._obb_data, self.masks, self.keypoints):
            if attr is not None:
                return len(attr)
        return 0

    def plot(self, line_width=None, font_scale=0.5):
        """Draw boxes/labels (+track ids, states, kpts, masks) on a copy (BGR)."""
        import cv2
        img = self.orig_img.copy()
        lw = line_width or max(2, round(min(self.orig_shape) / 320))
        palette = [(56, 56, 255), (31, 112, 255), (29, 178, 255), (49, 210, 207),
                   (10, 249, 72), (23, 204, 146), (134, 219, 61), (52, 147, 26)]
        if self.masks is not None and len(self.masks):
            overlay = img.copy()
            for i, m in enumerate(self.masks.data):
                color = palette[i % len(palette)]
                mm = m.astype(bool)
                if mm.shape != img.shape[:2]:
                    mm = cv2.resize(m.astype(np.uint8), img.shape[:2][::-1]) > 0
                overlay[mm] = color
            img = cv2.addWeighted(img, 0.6, overlay, 0.4, 0)
        if self._obb_data is not None and len(self._obb_data):
            for i, corners in enumerate(self._obb_data.xyxyxyxy):
                cv2.polylines(img, [corners.astype(np.int32)], True,
                              palette[i % len(palette)], lw)
        if self.boxes is not None:
            ids = self.boxes.id
            for i, row in enumerate(self.boxes.data):
                x1, y1, x2, y2, conf, cls = row[:6]
                c = int(cls)
                color = palette[(int(ids[i]) if ids is not None else c) % len(palette)]
                cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)), color, lw)
                label = f"{self.names.get(c, c)} {conf:.2f}"
                if ids is not None:
                    label = f"id:{int(ids[i])} " + label
                if self.person_states is not None:
                    label += f" s{int(self.person_states[i])}"
                cv2.putText(img, label, (int(x1), max(int(y1) - 3, 10)),
                            cv2.FONT_HERSHEY_SIMPLEX, font_scale, color, max(lw - 1, 1))
        if self.keypoints is not None:
            for kp in self.keypoints.data:
                for k in kp:
                    if len(k) < 3 or k[2] > 0.5:
                        cv2.circle(img, (int(k[0]), int(k[1])), max(lw, 2),
                                   (0, 255, 255), -1)
        if self.probs is not None:
            label = f"{self.names.get(self.probs.top1, self.probs.top1)} " \
                    f"{self.probs.top1conf:.2f}"
            cv2.putText(img, label, (8, 24), cv2.FONT_HERSHEY_SIMPLEX, 0.8,
                        (255, 255, 255), 2)
        return img

    def save(self, filename):
        import cv2
        Path(filename).parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(filename), self.plot())
        return filename

    def save_txt(self, txt_file, save_conf: bool = True):
        """YOLO-format label rows (reference Results.save_txt:700)."""
        lines = []
        h, w = self.orig_shape
        if self.probs is not None:
            lines.append(f"{self.probs.top1conf:.2f} {self.probs.top1}")
        elif self.boxes is not None:
            ids = self.boxes.id
            for i, row in enumerate(self.boxes.data):
                cx, cy, bw, bh = self.boxes.xywhn[i]
                line = f"{int(row[5])} {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}"
                if save_conf:
                    line += f" {row[4]:.4f}"
                if ids is not None:
                    line += f" {int(ids[i])}"
                lines.append(line)
        p = Path(txt_file)
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text("\n".join(lines) + ("\n" if lines else ""))
        return p

    def save_crop(self, save_dir, file_name: str | None = None):
        """Crop each detection into save_dir/<class>/ (reference save_crop:741)."""
        import cv2
        if self.boxes is None:
            return
        stem = file_name or Path(str(self.path)).stem
        h, w = self.orig_shape
        for i, row in enumerate(self.boxes.data):
            x1, y1, x2, y2 = (int(np.clip(v, 0, lim)) for v, lim in
                              zip(row[:4], (w, h, w, h)))
            if x2 <= x1 or y2 <= y1:
                continue
            name = self.names.get(int(row[5]), str(int(row[5])))
            d = Path(save_dir) / str(name)
            d.mkdir(parents=True, exist_ok=True)
            cv2.imwrite(str(d / f"{stem}_{i}.jpg"), self.orig_img[y1:y2, x1:x2])

    def to_json(self, normalize: bool = False):
        """JSON summary string (reference Results.tojson:830)."""
        import json
        return json.dumps(self.summary(normalize=normalize))

    tojson = to_json

    def to_df(self, normalize: bool = False):
        """pandas DataFrame of the summary (reference Results.to_df:828)."""
        import pandas as pd
        return pd.json_normalize(self.summary(normalize=normalize))

    def to_csv(self, normalize: bool = False, **kwargs) -> str:
        """CSV string of the summary (reference Results.to_csv:853)."""
        return self.to_df(normalize=normalize).to_csv(index=False, **kwargs)

    def to_xml(self, normalize: bool = False) -> str:
        """XML string of the summary (reference Results.to_xml:879)."""
        df = self.to_df(normalize=normalize)
        return "<?xml version='1.0' encoding='utf-8'?>\n<root></root>" if df.empty \
            else df.to_xml(parser="etree")

    def new(self) -> "Results":
        """Empty Results carrying the same image/names (reference :435)."""
        return Results(orig_img=self.orig_img, path=self.path, names=self.names)

    def update(self, boxes=None, masks=None, probs=None, obb=None):
        """Replace result tensors in place (reference Results.update:310)."""
        if boxes is not None:
            self.boxes = Boxes(np.asarray(boxes), self.orig_shape)
        if masks is not None:
            self.masks = Masks(np.asarray(masks), self.orig_shape)
        if probs is not None:
            self.probs = Probs(np.asarray(probs))
        if obb is not None:
            self.obb = obb  # property setter wraps into OBB
        return self

    def summary(self, normalize: bool = False):
        out = []
        if self.probs is not None:
            return [{"name": str(self.names.get(self.probs.top1, self.probs.top1)),
                     "class": self.probs.top1, "confidence": self.probs.top1conf}]
        if self.boxes is None:
            return out
        h, w = self.orig_shape
        ids = self.boxes.id
        for i, row in enumerate(self.boxes.data):
            box = row[:4] / np.array([w, h, w, h]) if normalize else row[:4]
            item = {"name": str(self.names.get(int(row[5]), int(row[5]))),
                    "class": int(row[5]), "confidence": float(row[4]),
                    "box": {k: float(v) for k, v in zip("x1 y1 x2 y2".split(), box)}}
            if ids is not None:
                item["track_id"] = int(ids[i])
            if self.person_states is not None:
                item["person_state"] = int(self.person_states[i])
            out.append(item)
        return out

    def verbose(self):
        """One-line summary, e.g. '3 persons, 1 dog' (reference verbose:661)."""
        if self.probs is not None:
            return f"{self.names.get(self.probs.top1, self.probs.top1)} " \
                   f"{self.probs.top1conf:.2f}"
        if self.boxes is None or len(self.boxes) == 0:
            return "(no detections)"
        cls, counts = np.unique(self.boxes.cls.astype(int), return_counts=True)
        return ", ".join(f"{n} {self.names.get(int(c), c)}{'s' * int(n > 1)}"
                         for c, n in zip(cls, counts))

    def cpu(self):
        return self

    def numpy(self):
        return self
