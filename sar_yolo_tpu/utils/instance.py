"""Vectorized box/instance containers (capability parity: reference utils/instance.py).

Numpy-backed; used by augmentation pipelines and external tooling.
"""

from __future__ import annotations

import numpy as np

_FORMATS = ("xyxy", "xywh", "ltwh")


def _xyxy2xywh(x):
    y = x.copy()
    y[..., 0] = (x[..., 0] + x[..., 2]) / 2
    y[..., 1] = (x[..., 1] + x[..., 3]) / 2
    y[..., 2] = x[..., 2] - x[..., 0]
    y[..., 3] = x[..., 3] - x[..., 1]
    return y


def _xywh2xyxy(x):
    y = x.copy()
    y[..., 0] = x[..., 0] - x[..., 2] / 2
    y[..., 1] = x[..., 1] - x[..., 3] / 2
    y[..., 2] = x[..., 0] + x[..., 2] / 2
    y[..., 3] = x[..., 1] + x[..., 3] / 2
    return y


def _ltwh2xyxy(x):
    y = x.copy()
    y[..., 2] = x[..., 0] + x[..., 2]
    y[..., 3] = x[..., 1] + x[..., 3]
    return y


def _xyxy2ltwh(x):
    y = x.copy()
    y[..., 2] = x[..., 2] - x[..., 0]
    y[..., 3] = x[..., 3] - x[..., 1]
    return y


class Bboxes:
    """Boxes in one of xyxy/xywh/ltwh formats with conversion + area/scale ops."""

    def __init__(self, bboxes: np.ndarray, format: str = "xyxy"):
        assert format in _FORMATS, f"format must be one of {_FORMATS}"
        self.bboxes = np.asarray(bboxes, np.float32).reshape(-1, 4)
        self.format = format

    def convert(self, format: str):
        assert format in _FORMATS
        if format == self.format:
            return self
        as_xyxy = {"xyxy": lambda b: b, "xywh": _xywh2xyxy, "ltwh": _ltwh2xyxy}[self.format]
        from_xyxy = {"xyxy": lambda b: b, "xywh": _xyxy2xywh, "ltwh": _xyxy2ltwh}[format]
        self.bboxes = from_xyxy(as_xyxy(self.bboxes))
        self.format = format
        return self

    def areas(self):
        b = Bboxes(self.bboxes.copy(), self.format).convert("xyxy").bboxes
        return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

    def mul(self, scale):
        sx, sy = (scale, scale) if np.isscalar(scale) else scale[:2]
        self.bboxes[:, [0, 2]] *= sx
        self.bboxes[:, [1, 3]] *= sy
        return self

    def add(self, offset):
        ox, oy = (offset, offset) if np.isscalar(offset) else offset[:2]
        self.bboxes[:, [0, 2]] += ox
        self.bboxes[:, [1, 3]] += oy
        return self

    def __len__(self):
        return len(self.bboxes)


class Instances:
    """Boxes + optional segments/keypoints moving together through transforms."""

    def __init__(self, bboxes, segments=None, keypoints=None, bbox_format="xywh",
                 normalized=True):
        self._bboxes = Bboxes(bboxes, bbox_format)
        self.segments = segments
        self.keypoints = keypoints
        self.normalized = normalized

    @property
    def bboxes(self):
        return self._bboxes.bboxes

    def convert_bbox(self, format):
        self._bboxes.convert(format)
        return self

    def scale(self, sx, sy, bbox_only=False):
        self._bboxes.mul((sx, sy))
        if not bbox_only:
            if self.segments is not None:
                for s in self.segments:
                    s[:, 0] *= sx
                    s[:, 1] *= sy
            if self.keypoints is not None:
                self.keypoints[..., 0] *= sx
                self.keypoints[..., 1] *= sy
        return self

    def denormalize(self, w, h):
        if self.normalized:
            self.scale(w, h)
            self.normalized = False
        return self

    def normalize(self, w, h):
        if not self.normalized:
            self.scale(1 / w, 1 / h)
            self.normalized = True
        return self

    def add_padding(self, padw, padh):
        assert not self.normalized, "pad in pixel space"
        self._bboxes.add((padw, padh))
        if self.keypoints is not None:
            self.keypoints[..., 0] += padw
            self.keypoints[..., 1] += padh
        return self

    def clip(self, w, h):
        b = self._bboxes.convert("xyxy").bboxes
        b[:, [0, 2]] = b[:, [0, 2]].clip(0, w)
        b[:, [1, 3]] = b[:, [1, 3]].clip(0, h)
        return self

    def __len__(self):
        return len(self._bboxes)
