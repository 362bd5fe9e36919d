"""Inference source loaders: streams (RTSP/HTTP/webcam), screenshots, images,
videos, PIL/numpy arrays, device tensors.

Capability parity with reference data/loaders.py (LoadStreams:51,
LoadScreenshots:213, LoadImagesAndVideos:284, LoadPilAndNumpy:451,
LoadTensor:516, SourceTypes:25). SAR is a UAV-video use case: the stream
reader keeps a daemon thread per source holding only the latest frame, so
inference always runs on fresh video (dropped frames, not growing lag).

Every loader yields (path, frame_bgr_uint8, meta) triples; batching happens in
the predictor (device pipeline is per-frame jit with static geometry).
"""

from __future__ import annotations

import math
import threading
import time
from dataclasses import dataclass
from pathlib import Path

import cv2
import numpy as np

IMG_FORMATS = {"bmp", "dng", "jpeg", "jpg", "mpo", "png", "tif", "tiff", "webp", "pfm"}
VID_FORMATS = {"asf", "avi", "gif", "m4v", "mkv", "mov", "mp4", "mpeg", "mpg", "ts",
               "wmv", "webm"}


@dataclass
class SourceTypes:
    """Flags describing what kind of source the predictor was given
    (reference data/loaders.py:25)."""
    stream: bool = False
    screenshot: bool = False
    from_img: bool = False
    tensor: bool = False


def is_stream_source(source) -> bool:
    s = str(source)
    return (s.isnumeric() or s.lower().startswith(("rtsp://", "rtmp://", "http://",
                                                   "https://", "tcp://"))
            or s.endswith(".streams"))


class LoadStreams:
    """Threaded reader over N live sources (webcam index, RTSP/HTTP URL, or a
    .streams text file listing one source per line).

    Reference LoadStreams (data/loaders.py:51): daemon thread per stream reads
    continuously; the consumer always receives the most recent frame. Iteration
    ends when all streams die (or `close()` is called).
    """

    def __init__(self, sources="0", buffer: bool = False, max_rate: float = 0.0):
        self.buffer = buffer  # True: queue every frame; False: keep latest only
        src = str(sources)
        if src.endswith(".streams") and Path(src).is_file():
            items = [s.strip() for s in Path(src).read_text().splitlines() if s.strip()]
        else:
            items = [sources]
        self.sources = [str(s) for s in items]
        self.caps, self.threads = [], []
        self.frames = [None] * len(items)   # latest frame per source
        self.queues = [[] for _ in items]   # buffered mode
        self.running = True
        self.locks = [threading.Lock() for _ in items]
        self.max_rate = max_rate
        for i, s in enumerate(self.sources):
            cam = int(s) if s.isnumeric() else s
            cap = cv2.VideoCapture(cam)
            if not cap.isOpened():
                self.running = False
                for c in self.caps:
                    c.release()
                raise ConnectionError(f"failed to open stream {s}")
            self.caps.append(cap)
            ok, frame = cap.read()
            if not ok:
                raise ConnectionError(f"failed to read from stream {s}")
            self.frames[i] = frame
            t = threading.Thread(target=self._reader, args=(i,), daemon=True)
            t.start()
            self.threads.append(t)

    def _reader(self, i):
        cap = self.caps[i]
        while self.running and cap.isOpened():
            ok, frame = cap.read()
            if not ok:
                break
            with self.locks[i]:
                if self.buffer:
                    self.queues[i].append(frame)
                else:
                    self.frames[i] = frame
            if self.max_rate:
                time.sleep(1.0 / self.max_rate)
        with self.locks[i]:
            self.frames[i] = None  # signal EOF for file-backed "streams"

    def __iter__(self):
        frame_idx = 0
        while self.running:
            alive = False
            for i, s in enumerate(self.sources):
                with self.locks[i]:
                    if self.buffer and self.queues[i]:
                        frame = self.queues[i].pop(0)
                    else:
                        frame = self.frames[i]
                        if not self.buffer:
                            self.frames[i] = None  # consume latest-only slot
                if frame is None:
                    if self.threads[i].is_alive():
                        alive = True
                    continue
                alive = True
                yield s, frame, {"stream": True, "frame": frame_idx, "source_i": i}
            frame_idx += 1
            if not alive:
                break
            if not self.buffer:
                time.sleep(0.002)  # let readers refill latest-frame slots
        self.close()

    def close(self):
        self.running = False
        for t in self.threads:
            if t.is_alive():
                t.join(timeout=2)
        for c in self.caps:
            c.release()


class LoadScreenshots:
    """Continuous screen capture via mss (reference data/loaders.py:213).

    Gated: mss is not part of the baked environment; raises a clear error when
    unavailable.
    """

    def __init__(self, source="screen 0", n_frames: int | None = None):
        try:
            import mss  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "screenshot source requires the 'mss' package (not available in "
                "this environment)") from e
        parts = str(source).split()
        self.screen = int(parts[1]) if len(parts) > 1 else 0
        self.n_frames = n_frames

    def __iter__(self):
        import mss
        with mss.mss() as sct:
            mon = sct.monitors[self.screen]
            i = 0
            while self.n_frames is None or i < self.n_frames:
                img = np.asarray(sct.grab(mon))[..., :3]  # BGRA -> BGR
                yield f"screen{self.screen}_{i}.jpg", np.ascontiguousarray(img), \
                    {"screenshot": True, "frame": i}
                i += 1


class LoadImagesAndVideos:
    """Images, dirs, globs, and video files (reference data/loaders.py:284)."""

    def __init__(self, source):
        p = Path(source)
        self.files = []
        if "*" in str(source):
            self.files = sorted(Path().glob(str(source)))
        elif p.is_dir():
            self.files = sorted(f for f in p.rglob("*")
                                if f.suffix[1:].lower() in IMG_FORMATS | VID_FORMATS)
        elif p.is_file():
            self.files = [p]
        else:
            raise FileNotFoundError(f"source not found: {source}")

    def __iter__(self):
        for f in self.files:
            suffix = f.suffix[1:].lower()
            if suffix in VID_FORMATS:
                cap = cv2.VideoCapture(str(f))
                total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) or 0
                fps = cap.get(cv2.CAP_PROP_FPS) or 30
                i = 0
                while True:
                    ok, frame = cap.read()
                    if not ok:
                        break
                    yield str(f), frame, {"video": True, "frame": i, "frames": total,
                                          "fps": fps}
                    i += 1
                cap.release()
            else:
                img = cv2.imread(str(f))
                if img is not None:
                    yield str(f), img, {}


class LoadPilAndNumpy:
    """In-memory PIL images / numpy arrays (reference data/loaders.py:451)."""

    def __init__(self, source):
        self.items = source if isinstance(source, (list, tuple)) else [source]

    @staticmethod
    def _to_bgr(im):
        if im.__class__.__module__.startswith("PIL"):
            arr = np.asarray(im.convert("RGB"))[..., ::-1]
            return np.ascontiguousarray(arr)
        arr = np.asarray(im)
        if arr.dtype != np.uint8:
            arr = (arr.clip(0, 1) * 255).astype(np.uint8) if arr.max() <= 1.0 \
                else arr.clip(0, 255).astype(np.uint8)
        # grey (H, W)/(H, W, 1) and 4-channel (BGRA/RGBA) arrays normalize to
        # 3 channels like the reference accepts (its test_python.py:138)
        if arr.ndim == 2:
            arr = np.repeat(arr[..., None], 3, axis=-1)
        elif arr.shape[-1] == 1:
            arr = np.repeat(arr, 3, axis=-1)
        elif arr.shape[-1] == 4:
            arr = arr[..., :3]
        return np.ascontiguousarray(arr)

    def __iter__(self):
        for i, im in enumerate(self.items):
            yield f"image{i}.jpg", self._to_bgr(im), {"from_img": True}


class LoadTensor:
    """Device/np tensors, NHWC or NCHW, float [0,1] or uint8
    (reference data/loaders.py:516)."""

    def __init__(self, source):
        arr = np.asarray(source)
        if arr.ndim == 3:
            arr = arr[None]
        if arr.shape[1] in (1, 3) and arr.shape[-1] not in (1, 3):  # NCHW -> NHWC
            arr = arr.transpose(0, 2, 3, 1)
        if arr.dtype != np.uint8:
            if arr.max() > 1.0 + 1e-3:
                raise ValueError("float tensor source must be normalized to [0, 1]")
            arr = (arr * 255).astype(np.uint8)
        if arr.shape[-1] == 1:
            arr = np.repeat(arr, 3, -1)
        elif arr.shape[-1] == 4:  # RGBA batch: drop alpha
            arr = arr[..., :3]
        self.batch = arr[..., ::-1]  # RGB tensor convention -> BGR pipeline

    def __iter__(self):
        for i, im in enumerate(self.batch):
            yield f"tensor{i}.jpg", np.ascontiguousarray(im), {"tensor": True}


def load_inference_source(source):
    """Dispatch a user source to the right loader (reference data/build.py:182).

    Returns (loader, SourceTypes).
    """
    st = SourceTypes()
    if source is None:
        raise ValueError("source is required")
    if hasattr(source, "__module__") and "jax" in type(source).__module__:
        st.tensor = True
        return LoadTensor(np.asarray(source)), st
    if isinstance(source, np.ndarray):
        if source.ndim == 4 or source.dtype != np.uint8:
            st.tensor = True
            return LoadTensor(source), st
        st.from_img = True
        return LoadPilAndNumpy(source), st
    if source.__class__.__module__.startswith("PIL"):
        st.from_img = True
        return LoadPilAndNumpy(source), st
    if isinstance(source, (list, tuple)) and source and \
            not isinstance(source[0], (str, Path)):
        st.from_img = True
        return LoadPilAndNumpy(source), st
    s = str(source)
    if s.lower().startswith("screen"):
        st.screenshot = True
        return LoadScreenshots(s), st
    if is_stream_source(s):
        st.stream = True
        return LoadStreams(s), st
    if isinstance(source, (list, tuple)):
        # list of paths: chain image loaders
        class _Chain:
            def __init__(self, items):
                self.items = items
            def __iter__(self):
                for it in self.items:
                    yield from LoadImagesAndVideos(it)
        return _Chain(source), st
    return LoadImagesAndVideos(source), st
