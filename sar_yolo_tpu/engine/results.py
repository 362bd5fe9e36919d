"""Typed inference results (capability parity: reference engine/results.py:188,
Boxes:945, Embeddings:1165; fork args person_states/embeds :231,269-270).

Numpy-backed: arrays arrive once from device as one fixed-size block per batch.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


class Boxes:
    """Detection boxes: data rows [x1, y1, x2, y2, conf, cls]."""

    def __init__(self, data: np.ndarray, orig_shape):
        self.data = data
        self.orig_shape = orig_shape

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
    def id(self):
        """Track ids when assigned by a tracker (column 6 if present)."""
        return self.data[:, 6] if self.data.shape[1] > 6 else None

    def __len__(self):
        return len(self.data)


class Results:
    """Per-image result: boxes (+ jde embeddings & posture states, masks, keypoints)."""

    def __init__(self, orig_img, path, names, boxes=None, masks=None, probs=None,
                 keypoints=None, embeds=None, person_states=None, speed=None):
        self.orig_img = orig_img
        self.orig_shape = orig_img.shape[:2]
        self.path = path
        self.names = names
        self.boxes = Boxes(boxes, self.orig_shape) if boxes is not None else None
        self.masks = masks
        self.probs = probs
        self.keypoints = keypoints
        self.embeds = embeds              # (n, embed_dim) ReID embeddings (jde)
        self.person_states = person_states  # (n,) argmax posture state ids (jde)
        self.speed = speed or {}

    def __len__(self):
        return len(self.boxes) if self.boxes is not None else 0

    def plot(self, line_width=None, font_scale=0.5):
        """Draw boxes/labels on a copy of the original image (BGR)."""
        import cv2
        img = self.orig_img.copy()
        if self.boxes is None:
            return img
        lw = line_width or max(2, round(min(self.orig_shape) / 320))
        palette = [(56, 56, 255), (31, 112, 255), (29, 178, 255), (49, 210, 207),
                   (10, 249, 72), (23, 204, 146), (134, 219, 61), (52, 147, 26)]
        for i, row in enumerate(self.boxes.data):
            x1, y1, x2, y2, conf, cls = row[:6]
            c = int(cls)
            color = palette[c % len(palette)]
            cv2.rectangle(img, (int(x1), int(y1)), (int(x2), int(y2)), color, lw)
            label = f"{self.names.get(c, c)} {conf:.2f}"
            if self.person_states is not None:
                label += f" s{int(self.person_states[i])}"
            cv2.putText(img, label, (int(x1), max(int(y1) - 3, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, font_scale, color, max(lw - 1, 1))
        return img

    def save(self, filename):
        import cv2
        Path(filename).parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(filename), self.plot())
        return filename

    def cpu(self):
        return self

    def numpy(self):
        return self
