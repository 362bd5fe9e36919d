"""Solutions: applications over predict/track results.

Capability parity with reference solutions/ (object_counter, region_counter,
heatmap, speed_estimation, ai_gym, analytics, distance_calculation,
parking_management, queue_management, security_alarm, trackzone,
streamlit_inference). Every app works two ways:

- ``update(rows)`` — pure host-side geometry over precomputed per-frame rows
  [x1, y1, x2, y2, conf, cls(, track_id)] from predict()/track(); no model.
- ``process(frame)`` / ``app(frame)`` — own YOLO model + tracker (pass
  ``model=``): runs track on the raw frame, updates, and returns a
  SolutionResults with the annotated frame (reference BaseSolution contract,
  solutions/solutions.py:12).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from sar_yolo_tpu.utils import LOGGER

from .base import DEFAULT_REGION, BaseSolution, SolutionResults

_point_in_poly = BaseSolution.point_in_polygon


class ObjectCounter(BaseSolution):
    """Count objects crossing a line or region boundary (reference
    solutions/object_counter.py).

    region: ((x1, y1), (x2, y2)) counting line. Feed per-frame tracked boxes
    (rows [x1, y1, x2, y2, conf, cls, track_id]) to update(), or raw frames
    to process() when built with model=.
    """

    def __init__(self, region=None, show_in: bool = True, show_out: bool = True,
                 **kw):
        super().__init__(**kw)
        region = region if region is not None else DEFAULT_REGION[:2]
        (self.x1, self.y1), (self.x2, self.y2) = region
        self.show_in, self.show_out = show_in, show_out
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

    def _annotate(self, im, rows, out):
        self.draw_region(im, [(self.x1, self.y1), (self.x2, self.y2)])
        self.draw_boxes(im, rows, labels=[self._label(r) for r in rows])
        self.draw_trails(im)
        parts = ([f"In: {out['in']}"] if self.show_in else []) + \
                ([f"Out: {out['out']}"] if self.show_out else [])
        return self.draw_banner(im, "  ".join(parts) or "counting")


class RegionCounter(BaseSolution):
    """Count objects currently inside polygonal regions (solutions/region_counter.py)."""

    def __init__(self, regions: dict | None = None, **kw):
        """regions: {name: [(x, y), ...] polygon}."""
        super().__init__(**kw)
        regions = regions if regions is not None else {"region_1": DEFAULT_REGION}
        self.regions = {k: np.asarray(v, np.float32) for k, v in regions.items()}

    _inside = staticmethod(_point_in_poly)

    def update(self, boxes: np.ndarray) -> dict:
        counts = {k: 0 for k in self.regions}
        for row in boxes:
            cx = (row[0] + row[2]) / 2
            cy = (row[1] + row[3]) / 2
            for name, poly in self.regions.items():
                if self._inside(poly, cx, cy):
                    counts[name] += 1
        return counts

    def _annotate(self, im, rows, out):
        self.draw_boxes(im, rows, labels=[self._label(r) for r in rows])
        for i, (name, poly) in enumerate(self.regions.items()):
            self.draw_region(im, poly)
            x, y = poly.mean(0).astype(int)
            self.draw_banner(im, f"{name}: {out[name]}", org=(int(x), int(y)))
        return im


class Heatmap(BaseSolution):
    """Accumulate detection heat over frames (reference solutions/heatmap.py)."""

    def __init__(self, shape=None, decay: float = 0.99, colormap=None, **kw):
        super().__init__(**kw)
        self.map = np.zeros(shape, np.float32) if shape is not None else None
        self.decay = decay
        self.colormap = colormap

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
        cmap = self.colormap if self.colormap is not None else cv2.COLORMAP_JET
        return cv2.applyColorMap((m * 255).astype(np.uint8), cmap)

    def process(self, im0) -> SolutionResults:
        if self.map is None:
            self.map = np.zeros(im0.shape[:2], np.float32)
        return super().process(im0)

    def _annotate(self, im, rows, out):
        import cv2
        im = cv2.addWeighted(im, 0.5, self.render(), 0.5, 0)
        return self.draw_boxes(im, rows)


class SpeedEstimator(BaseSolution):
    """Per-track speed from displacement over frames (solutions/speed_estimation.py)."""

    def __init__(self, fps: float = 30.0, pixels_per_meter: float = 10.0, **kw):
        super().__init__(**kw)
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

    def _annotate(self, im, rows, out):
        labels = [f"{out[int(r[6])]:.0f} km/h" if len(r) > 6 and int(r[6]) in out
                  else self._label(r) for r in rows]
        self.draw_boxes(im, rows, labels=labels)
        return self.draw_trails(im)

    def process(self, im0) -> SolutionResults:
        rows = self.extract_tracks(im0)
        speeds = self.update(rows)
        im = self._annotate(np.ascontiguousarray(im0), rows, speeds)
        self.display_output(im)
        return SolutionResults(plot_im=im, speeds=speeds)


class AIGym(BaseSolution):
    """Workout repetition counter from pose keypoints (reference solutions/ai_gym.py).

    kpts_idx: three keypoint indices (e.g. shoulder-elbow-wrist for pushups);
    the joint angle at the middle point drives an up/down stage machine and a
    rep counter per track id. With model= (a pose model), process(frame) pulls
    the keypoints itself.
    """

    def __init__(self, kpts_idx=(6, 8, 10), up_angle: float = 145.0,
                 down_angle: float = 90.0, **kw):
        super().__init__(**kw)
        self.kpts_idx = tuple(kpts_idx)
        self.up_angle = up_angle
        self.down_angle = down_angle
        self.count: dict[int, int] = defaultdict(int)
        self.stage: dict[int, str] = {}

    @staticmethod
    def joint_angle(a, b, c) -> float:
        """Angle ABC in degrees between keypoints a-b-c ((x, y) each)."""
        a, b, c = (np.asarray(p, np.float32)[:2] for p in (a, b, c))
        ang = np.degrees(np.arctan2(c[1] - b[1], c[0] - b[0]) -
                         np.arctan2(a[1] - b[1], a[0] - b[0]))
        ang = abs(ang)
        return 360.0 - ang if ang > 180.0 else float(ang)

    def update(self, keypoints: np.ndarray, track_ids=None) -> dict:
        """keypoints: (n, K, 2|3) per-person keypoints for one frame."""
        ids = track_ids if track_ids is not None else range(len(keypoints))
        for tid, kpts in zip(ids, keypoints):
            i, j, k = self.kpts_idx
            ang = self.joint_angle(kpts[i], kpts[j], kpts[k])
            tid = int(tid)
            if ang > self.up_angle:
                if self.stage.get(tid) == "down":
                    self.count[tid] += 1
                self.stage[tid] = "up"
            elif ang < self.down_angle:
                self.stage[tid] = "down"
        return {"count": dict(self.count), "stage": dict(self.stage)}

    def process(self, im0) -> SolutionResults:
        rows = self.extract_tracks(im0)
        kobj = self.last_results[0].keypoints
        if kobj is None:
            out = {"count": dict(self.count), "stage": dict(self.stage)}
        else:
            ids = rows[:, 6].astype(int) if len(rows) else None
            out = self.update(np.asarray(kobj.data), ids)
        im = np.ascontiguousarray(im0)
        self.draw_boxes(im, rows, labels=[
            f"#{int(r[6])} {self.stage.get(int(r[6]), '-')} "
            f"x{self.count.get(int(r[6]), 0)}" for r in rows])
        self.display_output(im)
        return SolutionResults(plot_im=im, **out)


class Analytics(BaseSolution):
    """Per-frame class-count series for line/bar/pie/area charts (reference
    solutions/analytics.py). Accumulates host-side; `chart()` returns the data
    ready for any plotting frontend, `render()` draws a PNG via matplotlib."""

    def __init__(self, names: dict | None = None, analytics_type: str = "line",
                 **kw):
        super().__init__(**kw)
        if names:
            self.names = names
        self.analytics_type = analytics_type
        self.frames: list[dict] = []

    def update(self, boxes: np.ndarray) -> dict:
        counts: dict = defaultdict(int)
        for row in boxes:
            c = int(row[5]) if len(row) > 5 else 0
            name = self.names.get(c, str(c)) if isinstance(self.names, dict) else str(c)
            counts[name] += 1
        self.frames.append(dict(counts))
        return self.frames[-1]

    def chart(self, kind: str | None = None) -> dict:
        kind = kind or self.analytics_type
        keys = sorted({k for f in self.frames for k in f})
        if kind in ("line", "area"):
            return {"x": list(range(len(self.frames))),
                    "series": {k: [f.get(k, 0) for f in self.frames] for k in keys}}
        totals = {k: sum(f.get(k, 0) for f in self.frames) for k in keys}
        return {"labels": keys, "values": [totals[k] for k in keys]}

    def render(self, path, kind: str | None = None):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        kind = kind or self.analytics_type
        data = self.chart(kind)
        fig, ax = plt.subplots(figsize=(8, 4))
        if kind in ("line", "area"):
            for k, ys in data["series"].items():
                (ax.fill_between if kind == "area" else ax.plot)(data["x"], ys, label=k)
            ax.legend()
            ax.set_xlabel("frame")
            ax.set_ylabel("count")
        elif kind == "bar":
            ax.bar(data["labels"], data["values"])
        else:  # pie
            ax.pie(data["values"], labels=data["labels"], autopct="%1.0f%%")
        fig.savefig(path, bbox_inches="tight")
        plt.close(fig)
        return path

    def _annotate(self, im, rows, out):
        self.draw_boxes(im, rows)
        txt = "  ".join(f"{k}: {v}" for k, v in sorted(out.items())) or "no objects"
        return self.draw_banner(im, txt)


class DistanceCalculation(BaseSolution):
    """Distance between two selected tracks (reference
    solutions/distance_calculation.py): select two track ids, update() returns
    their centroid distance in pixels and meters."""

    def __init__(self, pixels_per_meter: float = 10.0, **kw):
        super().__init__(**kw)
        self.ppm = pixels_per_meter
        self.selected: list[int] = []

    def select(self, track_id: int):
        """Toggle a track id in/out of the measured pair (max 2, FIFO)."""
        if track_id in self.selected:
            self.selected.remove(track_id)
        else:
            self.selected.append(track_id)
            self.selected = self.selected[-2:]

    def update(self, tracks: np.ndarray) -> dict | None:
        if len(self.selected) != 2:
            return None
        cents = {}
        for row in tracks:
            if len(row) >= 7 and int(row[6]) in self.selected:
                cents[int(row[6])] = ((row[0] + row[2]) / 2, (row[1] + row[3]) / 2)
        if len(cents) != 2:
            return None
        (x1, y1), (x2, y2) = cents.values()
        px = float(np.hypot(x2 - x1, y2 - y1))
        return {"pixels": px, "meters": px / self.ppm,
                "centroids": {k: tuple(map(float, v)) for k, v in cents.items()}}

    def _annotate(self, im, rows, out):
        self.draw_boxes(im, rows, labels=[self._label(r) for r in rows])
        if out:
            import cv2
            (p1, p2) = [tuple(map(int, v)) for v in out["centroids"].values()]
            cv2.line(im, p1, p2, (255, 0, 255), self.line_width)
            self.draw_banner(im, f"{out['meters']:.2f} m")
        return im


class ParkingManagement(BaseSolution):
    """Occupied/free counts over polygonal parking slots (reference
    solutions/parking_management.py). slots: list of polygons [(x, y), ...],
    or json_file= with [{"points": [[x, y], ...]}] (reference json format)."""

    def __init__(self, slots: list | None = None, json_file: str | None = None,
                 **kw):
        super().__init__(**kw)
        if slots is None and json_file:
            import json
            with open(json_file) as f:
                slots = [e["points"] for e in json.load(f)]
        self.slots = [np.asarray(s, np.float32) for s in (slots or [])]
        self._occupied: list[bool] = [False] * len(self.slots)

    def update(self, boxes: np.ndarray) -> dict:
        occupied = [False] * len(self.slots)
        for row in boxes:
            cx = (row[0] + row[2]) / 2
            cy = (row[1] + row[3]) / 2
            for si, poly in enumerate(self.slots):
                if not occupied[si] and _point_in_poly(poly, cx, cy):
                    occupied[si] = True
        self._occupied = occupied
        n_occ = sum(occupied)
        return {"occupied": n_occ, "available": len(self.slots) - n_occ,
                "slots": occupied}

    def _annotate(self, im, rows, out):
        self.draw_boxes(im, rows)
        for poly, occ in zip(self.slots, out["slots"]):
            self.draw_region(im, poly, color=(0, 0, 255) if occ else (0, 255, 0))
        return self.draw_banner(
            im, f"Occupied: {out['occupied']}  Free: {out['available']}")


class QueueManager(BaseSolution):
    """Queue length inside a polygon region over time (reference
    solutions/queue_management.py). Only counts tracked objects so transient
    false positives don't inflate the queue."""

    def __init__(self, region: list | None = None, **kw):
        super().__init__(**kw)
        self.region = np.asarray(region if region is not None else DEFAULT_REGION,
                                 np.float32)
        self.history: list[int] = []

    def update(self, tracks: np.ndarray) -> dict:
        n = 0
        for row in tracks:
            cx = (row[0] + row[2]) / 2
            cy = (row[1] + row[3]) / 2
            if _point_in_poly(self.region, cx, cy):
                n += 1
        self.history.append(n)
        return {"queue": n, "max": max(self.history), "avg": float(np.mean(self.history))}

    def _annotate(self, im, rows, out):
        self.draw_region(im, self.region)
        self.draw_boxes(im, rows)
        return self.draw_banner(im, f"Queue: {out['queue']}")


class SecurityAlarm(BaseSolution):
    """Fire a callback when detections exceed a threshold (reference
    solutions/security_alarm.py sends an email; here the notifier is
    pluggable — email/webhook/log — and fires once per breach episode)."""

    def __init__(self, threshold: int = 1, notifier=None, **kw):
        super().__init__(**kw)
        self.threshold = threshold
        self.notifier = notifier or (lambda msg: LOGGER.warning(msg))
        self.breached = False
        self.events: list[dict] = []
        self._frame = -1

    def update(self, boxes: np.ndarray, frame_idx: int = -1) -> bool:
        if frame_idx == -1:
            self._frame += 1
            frame_idx = self._frame
        n = len(boxes)
        if n >= self.threshold and not self.breached:
            self.breached = True
            event = {"frame": frame_idx, "objects": int(n)}
            self.events.append(event)
            self.notifier(f"Security alert: {n} objects detected (frame {frame_idx})")
        elif n < self.threshold:
            self.breached = False
        return self.breached

    def _annotate(self, im, rows, out):
        self.draw_boxes(im, rows)
        if out:
            self.draw_banner(im, "ALERT", bg=(0, 0, 255), color=(255, 255, 255))
        return im


class TrackZone(BaseSolution):
    """Restrict tracking to a polygonal zone (reference solutions/trackzone.py):
    update() filters track rows to those whose centroid is inside the zone."""

    def __init__(self, region: list | None = None, **kw):
        super().__init__(**kw)
        self.region = np.asarray(region if region is not None else DEFAULT_REGION,
                                 np.float32)

    def update(self, tracks: np.ndarray) -> np.ndarray:
        keep = [i for i, row in enumerate(tracks)
                if _point_in_poly(self.region, (row[0] + row[2]) / 2,
                                  (row[1] + row[3]) / 2)]
        return tracks[keep] if len(keep) else tracks[:0]

    def process(self, im0) -> SolutionResults:
        rows = self.extract_tracks(im0)
        kept = self.update(rows)
        im = np.ascontiguousarray(im0)
        self.draw_region(im, self.region)
        self.draw_boxes(im, kept, labels=[self._label(r) for r in kept])
        self.display_output(im)
        return SolutionResults(plot_im=im, tracks=kept, n=len(kept))


def streamlit_inference(model_path: str = "yolov8n.yaml"):
    """Launch a live webcam inference UI (reference solutions/streamlit_inference.py).

    Requires `streamlit` (not bundled); raises with install guidance otherwise.
    """
    try:
        import streamlit as st
    except ImportError as e:
        raise ImportError("streamlit_inference requires `pip install streamlit`") from e
    from sar_yolo_tpu import YOLO
    st.title("SAR-YOLO-TPU live inference")
    source = st.sidebar.text_input("source", "0")
    conf = st.sidebar.slider("confidence", 0.0, 1.0, 0.25)
    if st.sidebar.button("run"):
        model = YOLO(model_path)
        frame_slot = st.empty()
        for res in model.predict(int(source) if source.isdigit() else source,
                                 conf=conf, stream=True):
            frame_slot.image(res.plot()[..., ::-1], channels="RGB")


__all__ = ["BaseSolution", "SolutionResults", "ObjectCounter", "RegionCounter",
           "Heatmap", "SpeedEstimator", "AIGym", "Analytics",
           "DistanceCalculation", "ParkingManagement", "QueueManager",
           "SecurityAlarm", "TrackZone", "streamlit_inference"]
