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
                      with_reid=cfg.get("with_reid", True),
                      gmc_method=cfg.get("gmc_method", "sparseOptFlow"))
    return cls(**kwargs)


def track_results(results, tracker="bytetrack.yaml"):
    """Run a tracker over a sequence of Results; writes track ids into boxes col 6."""
    trk = make_tracker(tracker)
    for res in results:
        if res.boxes is None or len(res.boxes) == 0:
            continue
        dets = res.boxes.data[:, :6]
        extras = res.embeds if getattr(res, "embeds", None) is not None else None
        tracks = trk.update(dets, extras, img=getattr(res, "orig_img", None))
        if len(tracks):
            res.boxes.data = tracks  # [x1,y1,x2,y2,conf,cls,track_id]
    return results


def register_tracker(predictor, tracker="bytetrack.yaml", persist: bool = False):
    """Attach per-frame tracking to a predictor via its callback bus.

    Capability parity with reference trackers/track.py:18 (on_predict_start:
    tracker instances per source), :53 (on_predict_postprocess_end: Kalman
    update each frame), :90 (register_tracker). One tracker per source (video
    path / stream index); `persist=False` resets trackers at the start of each
    predict call, `persist=True` keeps identities across calls.
    """

    def on_predict_start(pred):
        # persist can be toggled per call via predictor._tracker_persist
        if not getattr(pred, "_tracker_persist", persist):
            pred.trackers.clear()

    def on_predict_postprocess_end(pred):
        path, _img, meta = pred.batch
        key = meta.get("source_i", str(path))
        trk = pred.trackers.get(key)
        if trk is None:
            trk = make_tracker(tracker, frame_rate=int(meta.get("fps") or 30))
            pred.trackers[key] = trk
        res = pred.results[0]
        if res.boxes is None:
            return
        import numpy as np
        dets = res.boxes.data[:, :6]
        extras = res.embeds if getattr(res, "embeds", None) is not None else None
        tracks = trk.update(dets, extras, img=getattr(res, "orig_img", None))
        res.boxes.data = tracks if len(tracks) else np.zeros((0, 7), dets.dtype)

    predictor.add_callback("on_predict_start", on_predict_start)
    predictor.add_callback("on_predict_postprocess_end", on_predict_postprocess_end)
    return predictor
