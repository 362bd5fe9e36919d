"""Solutions: demo applications over predict/track results.

Capability parity (core subset) with reference solutions/ (ObjectCounter,
RegionCounter, Heatmap, SpeedEstimator of the 14 demo apps; the rest are
UI variations over the same Results/track stream).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np


class ObjectCounter:
    """Count objects crossing a line (reference solutions/object_counter.py).

    region: ((x1, y1), (x2, y2)) counting line. Feed per-frame tracked boxes
    (rows [x1, y1, x2, y2, conf, cls, track_id]).
    """

    def __init__(self, region):
        (self.x1, self.y1), (self.x2, self.y2) = region
        self.in_count = 0
        self.out_count = 0
        self._last_side: dict[int, float] = {}
        self.counted: set[int] = set()

    def _side(self, px, py):
        return np.sign((self.x2 - self.x1) * (py - self.y1) -
                       (self.y2 - self.y1) * (px - self.x1))

    def update(self, tracks: np.ndarray):
        for row in tracks:
            if len(row) < 7:
                continue
            tid = int(row[6])
            cx = (row[0] + row[2]) / 2
            cy = (row[1] + row[3]) / 2
            side = self._side(cx, cy)
            prev = self._last_side.get(tid)
            if side == 0:
                continue  # exactly on the line: keep last decisive side
            if prev is not None and side != prev and tid not in self.counted:
                if side > prev:
                    self.in_count += 1
                else:
                    self.out_count += 1
                self.counted.add(tid)
            self._last_side[tid] = side
        return {"in": self.in_count, "out": self.out_count}


class RegionCounter:
    """Count objects currently inside polygonal regions (solutions/region_counter.py)."""

    def __init__(self, regions: dict):
        """regions: {name: [(x, y), ...] polygon}."""
        self.regions = {k: np.asarray(v, np.float32) for k, v in regions.items()}

    @staticmethod
    def _inside(poly, px, py):
        # ray casting
        n = len(poly)
        inside = False
        j = n - 1
        for i in range(n):
            xi, yi = poly[i]
            xj, yj = poly[j]
            if (yi > py) != (yj > py) and px < (xj - xi) * (py - yi) / (yj - yi + 1e-9) + xi:
                inside = not inside
            j = i
        return inside

    def update(self, boxes: np.ndarray) -> dict:
        counts = {k: 0 for k in self.regions}
        for row in boxes:
            cx = (row[0] + row[2]) / 2
            cy = (row[1] + row[3]) / 2
            for name, poly in self.regions.items():
                if self._inside(poly, cx, cy):
                    counts[name] += 1
        return counts


class Heatmap:
    """Accumulate detection-center heat over frames (reference solutions/heatmap.py)."""

    def __init__(self, shape, decay: float = 0.99):
        self.map = np.zeros(shape, np.float32)
        self.decay = decay

    def update(self, boxes: np.ndarray):
        self.map *= self.decay
        h, w = self.map.shape
        for row in boxes:
            x1, y1, x2, y2 = (int(np.clip(v, 0, lim - 1)) for v, lim in
                              zip(row[:4], (w, h, w, h)))
            self.map[y1:y2 + 1, x1:x2 + 1] += 1.0
        return self.map

    def render(self):
        import cv2
        m = self.map / (self.map.max() + 1e-9)
        return cv2.applyColorMap((m * 255).astype(np.uint8), cv2.COLORMAP_JET)


class SpeedEstimator:
    """Per-track speed from displacement over frames (solutions/speed_estimation.py)."""

    def __init__(self, fps: float = 30.0, pixels_per_meter: float = 10.0):
        self.fps = fps
        self.ppm = pixels_per_meter
        self.history: dict[int, list] = defaultdict(list)

    def update(self, tracks: np.ndarray) -> dict:
        speeds = {}
        for row in tracks:
            if len(row) < 7:
                continue
            tid = int(row[6])
            cx = (row[0] + row[2]) / 2
            cy = (row[1] + row[3]) / 2
            self.history[tid].append((cx, cy))
            hist = self.history[tid][-int(self.fps):]
            if len(hist) >= 2:
                d = np.hypot(hist[-1][0] - hist[0][0], hist[-1][1] - hist[0][1])
                dt = (len(hist) - 1) / self.fps
                speeds[tid] = (d / self.ppm) / dt * 3.6  # km/h
        return speeds


__all__ = ["ObjectCounter", "RegionCounter", "Heatmap", "SpeedEstimator"]
