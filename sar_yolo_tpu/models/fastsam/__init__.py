"""FastSAM: segment-anything-style everything-segmentation as a thin wrapper
over the segment task (reference models/fastsam/: FastSAM model.py:9,
FastSAMPredictor predict.py — ~280 LoC of prompt post-filtering over YOLO-seg).

Everything mode = single-class segmentation over the whole image; prompts
(boxes / points / texts) filter the everything-results AFTER inference,
exactly like the reference's FastSAMPredictor.prompt().
"""

from __future__ import annotations

import numpy as np

from sar_yolo_tpu.engine.model import YOLO


class FastSAM(YOLO):
    """Everything-segmentation facade. Default model: FastSAM-s.yaml (nc=1 seg)."""

    def __init__(self, model="FastSAM-s.yaml", task=None, verbose=False):
        super().__init__(model, task="segment", verbose=verbose)

    def predict(self, source, stream=False, bboxes=None, points=None, labels=None,
                texts=None, text_embeddings=None, **kwargs):
        """Segment everything, then apply prompt filters (ref fastsam/predict.py).

        Args:
            bboxes: (n, 4) xyxy prompt boxes — keep masks whose box-IoU is max.
            points: (n, 2) xy prompt points (+labels 1=fg, 0=bg) — keep masks
                containing fg points and not containing bg points.
            texts: text prompts — requires `text_embeddings` (a callable
                text->vector encoder); the offline build has no CLIP weights.
        """
        results = super().predict(source, stream=False, **kwargs)
        out = [self._prompt(r, bboxes, points, labels, texts, text_embeddings)
               for r in results]
        return iter(out) if stream else out

    @staticmethod
    def _prompt(result, bboxes, points, labels, texts, text_embeddings):
        if result.masks is None or len(result.masks) == 0 or \
                (bboxes is None and points is None and texts is None):
            return result
        keep = np.zeros(len(result.masks), bool)
        masks = result.masks.data.astype(bool)
        if bboxes is not None:
            bb = np.atleast_2d(np.asarray(bboxes, np.float32))
            rb = result.boxes.data[:, :4]
            area_r = (rb[:, 2] - rb[:, 0]) * (rb[:, 3] - rb[:, 1])
            for b in bb:
                ix1 = np.maximum(b[0], rb[:, 0])
                iy1 = np.maximum(b[1], rb[:, 1])
                ix2 = np.minimum(b[2], rb[:, 2])
                iy2 = np.minimum(b[3], rb[:, 3])
                inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
                union = area_r + (b[2] - b[0]) * (b[3] - b[1]) - inter
                keep[np.argmax(inter / np.maximum(union, 1e-9))] = True
        if points is not None:
            pts = np.atleast_2d(np.asarray(points, np.float32))
            lbl = np.asarray(labels if labels is not None else np.ones(len(pts)), int)
            h, w = result.orig_shape
            mh, mw = masks.shape[1:]
            for (x, y), l in zip(pts, lbl):
                mx = int(np.clip(x * mw / w, 0, mw - 1))
                my = int(np.clip(y * mh / h, 0, mh - 1))
                hit = masks[:, my, mx]
                if l == 1:
                    keep |= hit
                else:
                    keep &= ~hit
        if texts is not None:
            if text_embeddings is None:
                raise ValueError(
                    "text prompts need a text encoder; none is bundled offline — "
                    "pass text_embeddings=callable(prompt)->vector")
            # rank masks by similarity of their mean-crop embedding is not
            # available without an image encoder; reference uses CLIP on crops.
            raise NotImplementedError(
                "text-prompt filtering requires CLIP image+text towers "
                "(unavailable in the offline build)")
        idx = np.nonzero(keep)[0]
        result.boxes.data = result.boxes.data[idx]
        result.masks.data = result.masks.data[idx]
        return result
