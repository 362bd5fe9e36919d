"""Multi-object tracking: ByteTrack + BoT-SORT over predictor results.

Capability parity: reference trackers/ package + track.py callback wiring
(trackers/track.py:18,53,90). Here tracking is a post-predict pass over the
streamed Results (sequential per-frame host logic, correctly off-device).
"""

from __future__ import annotations

from pathlib import Path

from sar_yolo_tpu.utils import ROOT, yaml_load
from .bot_sort import BOTSORT
from .byte_tracker import BYTETracker

TRACKER_MAP = {"bytetrack": BYTETracker, "botsort": BOTSORT}


def make_tracker(tracker="bytetrack.yaml", frame_rate=30):
    """Build a tracker from a config yaml name/path."""
    name = Path(tracker).stem
    cfg_path = Path(tracker)
    if not cfg_path.exists():
        cfg_path = ROOT / "cfg" / "trackers" / f"{name}.yaml"
    cfg = yaml_load(cfg_path) if cfg_path.exists() else {}
    cls = TRACKER_MAP[cfg.get("tracker_type", name)]
    kwargs = dict(
        track_high_thresh=cfg.get("track_high_thresh", 0.5),
        track_low_thresh=cfg.get("track_low_thresh", 0.1),
        new_track_thresh=cfg.get("new_track_thresh", 0.6),
        track_buffer=cfg.get("track_buffer", 30),
        match_thresh=cfg.get("match_thresh", 0.8),
        fuse_score_flag=cfg.get("fuse_score", True),
        frame_rate=frame_rate,
    )
    if cls is BOTSORT:
        kwargs.update(proximity_thresh=cfg.get("proximity_thresh", 0.5),
                      appearance_thresh=cfg.get("appearance_thresh", 0.25),
                      with_reid=cfg.get("with_reid", True))
    return cls(**kwargs)


def track_results(results, tracker="bytetrack.yaml"):
    """Run a tracker over a sequence of Results; writes track ids into boxes col 6."""
    trk = make_tracker(tracker)
    for res in results:
        if res.boxes is None or len(res.boxes) == 0:
            continue
        dets = res.boxes.data[:, :6]
        extras = res.embeds if getattr(res, "embeds", None) is not None else None
        tracks = trk.update(dets, extras)
        if len(tracks):
            res.boxes.data = tracks  # [x1,y1,x2,y2,conf,cls,track_id]
    return results
