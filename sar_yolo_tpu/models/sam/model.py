"""SAM facade (reference models/sam/model.py SAM:26).

Usage:
    sam = SAM("sam_b")                    # random init (offline build)
    res = sam("img.jpg", points=[[500, 375]])
    res = sam("img.jpg", bboxes=[[100, 100, 400, 400]])
    res = sam("img.jpg")                  # segment everything (AMG)
"""

from __future__ import annotations

from pathlib import Path

import jax


class SAM:
    """Promptable segmentation model (SAM / SAM2 by name)."""

    def __init__(self, model="sam_b.pt", weights=None, imgsz: int | None = None,
                 verbose: bool = False):
        from .build import build_sam
        self.model_name = str(model)
        self.is_sam2 = "sam2" in Path(str(model)).stem.lower()
        self.module, self.variables, self.info_dict = build_sam(
            model, weights=weights, imgsz=imgsz)
        self.task = "segment"
        self._predictor = None
        self.verbose = verbose

    @property
    def predictor(self):
        if self._predictor is None:
            from .predict import SAMPredictor
            self._predictor = SAMPredictor(self.module, self.variables,
                                           imgsz=self.info_dict["img_size"])
        return self._predictor

    def predict(self, source, stream: bool = False, bboxes=None, points=None,
                labels=None, **kwargs):
        """Prompted (bboxes/points) or everything (no prompts) segmentation."""
        out = self.predictor(source, bboxes=bboxes, points=points, labels=labels,
                             **kwargs)
        return iter(out) if stream else out

    def __call__(self, source=None, stream: bool = False, bboxes=None, points=None,
                 labels=None, **kwargs):
        return self.predict(source, stream, bboxes, points, labels, **kwargs)

    def track(self, source, bboxes=None, points=None, labels=None, **kwargs):
        """Video object segmentation: prompt objects on the first frame, then
        propagate them with the SAM2 memory bank (reference
        SAM2VideoPredictor). Requires a SAM2 variant."""
        if not self.is_sam2:
            raise ValueError("video tracking requires a SAM2 model (sam2_*)")
        from .predict import SAM2VideoPredictor
        vp = SAM2VideoPredictor(self.module, self.variables,
                                imgsz=self.info_dict["img_size"])
        return vp(source, bboxes=bboxes, points=points, labels=labels, **kwargs)

    def info(self):
        """Log parameter count + config."""
        n = sum(x.size for x in jax.tree.leaves(self.variables))
        info = dict(self.info_dict, params=int(n))
        from sar_yolo_tpu.utils import LOGGER
        LOGGER.info(f"SAM {info}")
        return info
