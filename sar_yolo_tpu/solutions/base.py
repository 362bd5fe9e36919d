"""Frame-in, annotated-frame-out runtime for the solution apps.

Mirrors the capability of the reference's BaseSolution
(solutions/solutions.py:12): each app can own a YOLO model + tracker, accept
raw BGR frames, and return a SolutionResults with the annotated frame —
while the array-based ``update(rows)`` API stays usable without any model
(pure host-side geometry over precomputed track rows).

No shapely dependency: the region geometry these apps need (point-in-polygon,
side-of-line) is a few lines of numpy, kept in this package.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from sar_yolo_tpu.utils import LOGGER

# default region matching the reference (solutions/solutions.py:152)
DEFAULT_REGION = [(20, 400), (1080, 400), (1080, 360), (20, 360)]


class SolutionResults:
    """Per-frame output: annotated frame + app-specific fields (reference
    SolutionResults analog). Access fields as attributes; ``data`` holds the
    raw dict."""

    def __init__(self, plot_im=None, **data):
        self.plot_im = plot_im
        self.data = data
        for k, v in data.items():
            setattr(self, k, v)

    def __repr__(self):
        return f"SolutionResults({', '.join(f'{k}={v}' for k, v in self.data.items())})"


class BaseSolution:
    """Owns an optional YOLO model + tracker and the annotation toolkit.

    Subclasses implement ``update(rows, ...)`` (host-side geometry, always
    available) and optionally override ``process(im0)`` / ``_annotate`` for
    app-specific drawing. ``rows`` are [x1, y1, x2, y2, conf, cls(, track_id)].
    """

    def __init__(self, model=None, line_width: int = 2, show: bool = False,
                 conf: float = 0.25, iou: float = 0.7, classes=None,
                 tracker: str = "bytetrack.yaml", imgsz: int = 640, **kwargs):
        self.model = None
        self.names = kwargs.pop("names", {})
        self._track_kw = dict(conf=conf, iou=iou, classes=classes,
                              tracker=tracker, imgsz=imgsz, verbose=False)
        if model is not None:
            from sar_yolo_tpu import YOLO
            self.model = model if hasattr(model, "track") else YOLO(model)
            self.names = getattr(self.model, "names", None) or self.names
        self.line_width = int(line_width)
        self.show = show
        self.track_history: dict[int, list] = defaultdict(list)
        self.last_results = None
        self._warned_imshow = False

    # -- tracking ----------------------------------------------------------
    def extract_tracks(self, im0) -> np.ndarray:
        """Run model.track on one frame; returns (n, 7) rows
        [x1, y1, x2, y2, conf, cls, track_id] (reference extract_tracks,
        solutions/solutions.py:101)."""
        if self.model is None:
            raise ValueError("this solution was built without a model= — feed "
                             "precomputed track rows to update() instead")
        kw = {k: v for k, v in self._track_kw.items() if v is not None}
        res = self.model.track(im0, persist=True, **kw)
        self.last_results = res
        boxes = res[0].boxes
        if boxes is None or len(boxes.data) == 0:
            return np.zeros((0, 7), np.float32)
        rows = np.asarray(boxes.data, np.float32)
        if rows.shape[1] < 7:  # no ids assigned yet -> synthesize -1
            rows = np.concatenate(
                [rows, -np.ones((len(rows), 1), np.float32)], 1)
        for r in rows:
            self.store_tracking_history(int(r[6]), r[:4])
        return rows

    def store_tracking_history(self, track_id: int, box):
        """Append the box center to the track trail, capped at 30 points
        (reference store_tracking_history, solutions/solutions.py:128)."""
        line = self.track_history[track_id]
        line.append(((box[0] + box[2]) / 2, (box[1] + box[3]) / 2))
        if len(line) > 30:
            line.pop(0)

    # -- geometry ----------------------------------------------------------
    @staticmethod
    def point_in_polygon(poly, px, py) -> bool:
        poly = np.asarray(poly, np.float32)
        n = len(poly)
        inside = False
        j = n - 1
        for i in range(n):
            xi, yi = poly[i]
            xj, yj = poly[j]
            if (yi > py) != (yj > py) and \
                    px < (xj - xi) * (py - yi) / (yj - yi + 1e-9) + xi:
                inside = not inside
            j = i
        return inside

    # -- drawing -----------------------------------------------------------
    def _cv2(self):
        import cv2
        return cv2

    def draw_region(self, im, pts, color=(255, 0, 255)):
        cv2 = self._cv2()
        pts = np.asarray(pts, np.int32)
        if len(pts) == 2:
            cv2.line(im, tuple(pts[0]), tuple(pts[1]), color, self.line_width * 2)
        else:
            cv2.polylines(im, [pts.reshape(-1, 1, 2)], True, color,
                          self.line_width * 2)
        return im

    def draw_boxes(self, im, rows, labels=None, color=(57, 204, 112)):
        cv2 = self._cv2()
        for i, r in enumerate(rows):
            p1, p2 = (int(r[0]), int(r[1])), (int(r[2]), int(r[3]))
            cv2.rectangle(im, p1, p2, color, self.line_width)
            if labels is not None and labels[i]:
                cv2.putText(im, str(labels[i]), (p1[0], max(p1[1] - 5, 12)),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1, cv2.LINE_AA)
        return im

    def draw_trails(self, im, color=(230, 100, 30)):
        cv2 = self._cv2()
        for line in self.track_history.values():
            if len(line) > 1:
                cv2.polylines(im, [np.asarray(line, np.int32).reshape(-1, 1, 2)],
                              False, color, self.line_width)
        return im

    def draw_banner(self, im, text, org=(10, 28), color=(0, 0, 0),
                    bg=(255, 255, 255)):
        cv2 = self._cv2()
        (tw, th), _ = cv2.getTextSize(text, cv2.FONT_HERSHEY_SIMPLEX, 0.7, 2)
        x, y = org
        cv2.rectangle(im, (x - 5, y - th - 8), (x + tw + 5, y + 8), bg, -1)
        cv2.putText(im, text, (x, y), cv2.FONT_HERSHEY_SIMPLEX, 0.7, color, 2,
                    cv2.LINE_AA)
        return im

    def display_output(self, im0):
        """Show the annotated frame when show=True and a display exists
        (reference display_output, solutions/solutions.py:155)."""
        if not self.show:
            return
        cv2 = self._cv2()
        try:
            cv2.imshow(type(self).__name__, im0)
            if cv2.waitKey(1) & 0xFF == ord("q"):
                self.show = False
        except cv2.error:
            if not self._warned_imshow:
                LOGGER.warning("display unsupported in this environment; "
                               "show=True ignored")
                self._warned_imshow = True

    def _label(self, row) -> str:
        c = int(row[5]) if len(row) > 5 else 0
        name = self.names.get(c, str(c)) if isinstance(self.names, dict) else str(c)
        tid = f"#{int(row[6])} " if len(row) > 6 and row[6] >= 0 else ""
        return f"{tid}{name} {row[4]:.2f}"

    # -- per-frame template -------------------------------------------------
    def process(self, im0) -> SolutionResults:
        """frame -> track -> update() -> annotate. Subclasses override
        ``_annotate`` (and update()'s signature drives what gets passed)."""
        rows = self.extract_tracks(im0)
        out = self.update(rows)
        im = self._annotate(np.ascontiguousarray(im0), rows, out)
        self.display_output(im)
        data = out if isinstance(out, dict) else {"result": out}
        return SolutionResults(plot_im=im, **data)

    def __call__(self, im0) -> SolutionResults:
        return self.process(im0)  # dynamic dispatch — subclasses override process

    def _annotate(self, im, rows, out):
        return self.draw_boxes(im, rows, labels=[self._label(r) for r in rows])
