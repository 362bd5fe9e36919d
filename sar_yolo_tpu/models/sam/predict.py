"""SAM promptable-segmentation predictor (reference models/sam/predict.py
Predictor:37, prompt_inference:207, generate:297).

TPU-native split: the heavy ViT tower runs ONCE per image (`set_image`,
jitted); every prompt then costs only the two-way-transformer decode. Prompt
batches are padded to power-of-two query counts so a handful of executables
serve any prompt mix. AMG ("segment everything") scores the whole point grid
on-device at low resolution — full-size masks are materialized only for the
NMS survivors.
"""

from __future__ import annotations

import math
import time

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from sar_yolo_tpu.engine.results import Results
from sar_yolo_tpu.utils import LOGGER

from .amg import batched_mask_to_box, build_point_grid, stability_score


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


class SAMPredictor:
    """Promptable segmentation over one cached image embedding."""

    def __init__(self, model, variables, imgsz: int = 1024, conf: float = 0.88,
                 stability_thresh: float = 0.95, iou_thres: float = 0.7,
                 names=None):
        self.model = model
        self.variables = variables
        self.imgsz = imgsz
        self.conf = conf
        self.stability_thresh = stability_thresh
        self.iou_thres = iou_thres
        self.names = names or {0: "object"}
        self._features = None
        self._im_meta = None      # (orig_h, orig_w, scaled_h, scaled_w)
        self.prompts = {}
        self._encode = jax.jit(
            lambda v, x: model.apply(v, x, method="encode"))
        self._decoders = {}

    # ------------------------------------------------------------------ image
    def set_image(self, image: np.ndarray):
        """image: (H, W, 3) BGR uint8. Resizes longest side to imgsz, pads
        bottom-right (SAM convention), computes + caches embeddings."""
        h, w = image.shape[:2]
        r = self.imgsz / max(h, w)
        nh, nw = round(h * r), round(w * r)
        scaled = cv2.resize(image[..., ::-1], (nw, nh), interpolation=cv2.INTER_LINEAR)
        canvas = np.zeros((self.imgsz, self.imgsz, 3), np.uint8)
        canvas[:nh, :nw] = scaled
        self._features = self._encode(self.variables, jnp.asarray(canvas[None]))
        self._im_meta = (h, w, nh, nw)
        return self._features

    def reset_image(self):
        self._features = None
        self._im_meta = None

    # ---------------------------------------------------------------- prompts
    def _decode_fn(self, key):
        """Jitted decode per (n_points, has_box) signature."""
        if key not in self._decoders:
            npts, has_box = key
            model = self.model

            @jax.jit
            def run(v, emb, points, labels, boxes):
                kw = {}
                if npts:
                    kw["points"] = points
                    kw["labels"] = labels
                if has_box:
                    kw["boxes"] = boxes
                out = model.apply(v, emb, method="decode", **kw)
                return out[0], out[1]                         # masks, iou (SAM1/SAM2)

            self._decoders[key] = run
        return self._decoders[key]

    def _scale_coords(self, xy):
        """Original-image pixels -> model input pixels."""
        h, w, nh, nw = self._im_meta
        return np.asarray(xy, np.float32) * np.asarray([nw / w, nh / h], np.float32)

    def prompt_inference(self, bboxes=None, points=None, labels=None,
                         multimask_output: bool = False):
        """Decode masks for prompts given in ORIGINAL image coordinates.

        bboxes (Q, 4) xyxy; points (Q, P, 2) or (Q, 2); labels matching points
        (default 1 = foreground). Returns (masks (N, H, W) bool in original
        resolution, scores (N,), boxes (N, 4) xyxy original coords).
        """
        if self._features is None:
            raise RuntimeError("call set_image() first")
        h, w, nh, nw = self._im_meta

        q_pts = q_box = 0
        pts = lbl = None
        if points is not None:
            pts = np.asarray(points, np.float32)
            if pts.ndim == 1:
                pts = pts[None]
            if pts.ndim == 2:
                pts = pts[:, None]                            # (Q, 1, 2)
            lbl = (np.ones(pts.shape[:2], np.float32) if labels is None
                   else np.asarray(labels, np.float32).reshape(pts.shape[:2]))
            pts = self._scale_coords(pts)
            q_pts = pts.shape[0]
        box_arr = None
        if bboxes is not None:
            box_arr = np.asarray(bboxes, np.float32).reshape(-1, 4)
            box_arr = box_arr * np.asarray([nw / w, nh / h, nw / w, nh / h], np.float32)
            q_box = box_arr.shape[0]

        Q = max(q_pts, q_box, 1)
        Qp = _next_pow2(Q)
        P = pts.shape[1] if pts is not None else 0
        # pad queries; padded point slots use label -1 (not-a-point)
        if pts is not None:
            pts = np.concatenate([pts, np.zeros((Qp - q_pts, P, 2), np.float32)], 0)
            lbl = np.concatenate([lbl, -np.ones((Qp - q_pts, P), np.float32)], 0)
        if box_arr is not None:
            box_arr = np.concatenate(
                [box_arr, np.zeros((Qp - q_box, 4), np.float32)], 0)

        run = self._decode_fn((P, box_arr is not None))
        masks, iou = run(self.variables, self._features,
                         jnp.asarray(pts) if pts is not None else None,
                         jnp.asarray(lbl) if lbl is not None else None,
                         jnp.asarray(box_arr) if box_arr is not None else None)
        masks, iou = np.asarray(masks, np.float32), np.asarray(iou, np.float32)
        masks, iou = masks[:Q], iou[:Q]
        if multimask_output:
            masks, iou = masks[:, 1:], iou[:, 1:]
            best = iou.argmax(1)
            masks = masks[np.arange(Q), best]
            iou = iou[np.arange(Q), best]
        else:
            masks, iou = masks[:, 0], iou[:, 0]
        return self._masks_to_original(masks), iou

    def _masks_to_original(self, low_res):
        """(N, h, w) low-res logits -> (N, H, W) bool at original size."""
        h, w, nh, nw = self._im_meta
        n = low_res.shape[0]
        if n == 0:
            return np.zeros((0, h, w), bool)
        up = jax.image.resize(jnp.asarray(low_res), (n, self.imgsz, self.imgsz),
                              "bilinear")
        up = up[:, :nh, :nw]
        up = jax.image.resize(up, (n, h, w), "bilinear")
        return np.asarray(up > 0.0)

    # ------------------------------------------------------------ generate
    def generate(self, points_per_side: int = 32, points_per_batch: int = 64,
                 max_det: int = 300, conf: float | None = None,
                 stability_thresh: float | None = None):
        """Segment everything: score a point grid on-device, NMS, then decode
        full masks only for the survivors (reference generate:297)."""
        if self._features is None:
            raise RuntimeError("call set_image() first")
        conf = self.conf if conf is None else conf
        stability_thresh = (self.stability_thresh if stability_thresh is None
                            else stability_thresh)
        h, w, nh, nw = self._im_meta
        grid = build_point_grid(points_per_side) * np.asarray([nw, nh], np.float32)
        n = grid.shape[0]
        nb = math.ceil(n / points_per_batch)
        pad_n = nb * points_per_batch
        grid_p = np.concatenate(
            [grid, np.zeros((pad_n - n, 2), np.float32)], 0).reshape(
            nb, points_per_batch, 1, 2)

        model = self.model

        @jax.jit
        def score_chunks(v, emb, chunks):
            def one(pts):
                out = model.apply(v, emb, method="decode", points=pts,
                                  labels=jnp.ones(pts.shape[:2]))
                masks, iou = out[0], out[1]
                m3, i3 = masks[:, 1:], iou[:, 1:]             # multimask slots
                stab = stability_score(m3)
                boxes = batched_mask_to_box(m3 > 0.0)
                return i3, stab, boxes
            return jax.lax.map(one, chunks)

        iou, stab, boxes = score_chunks(self.variables, self._features,
                                        jnp.asarray(grid_p))
        iou = np.asarray(iou).reshape(-1)                     # (pad_n*3,)
        stab = np.asarray(stab).reshape(-1)
        boxes = np.asarray(boxes).reshape(-1, 4)
        flat_pt = np.repeat(np.arange(pad_n), 3)
        flat_slot = np.tile(np.arange(1, 4), pad_n)

        keep = (iou > conf) & (stab > stability_thresh) & (flat_pt < n)
        keep &= (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
        idx = np.flatnonzero(keep)
        if idx.size == 0:
            return (np.zeros((0, h, w), bool), np.zeros(0, np.float32),
                    np.zeros((0, 4), np.float32))
        order = idx[np.argsort(-iou[idx])]
        # greedy box NMS on the candidates (host; <= a few thousand boxes)
        sel = []
        bb = boxes[order]
        for i in range(len(order)):
            ok = True
            for j in sel:
                ix1 = max(bb[i, 0], bb[j, 0]); iy1 = max(bb[i, 1], bb[j, 1])
                ix2 = min(bb[i, 2], bb[j, 2]); iy2 = min(bb[i, 3], bb[j, 3])
                inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
                a1 = (bb[i, 2] - bb[i, 0]) * (bb[i, 3] - bb[i, 1])
                a2 = (bb[j, 2] - bb[j, 0]) * (bb[j, 3] - bb[j, 1])
                if inter / max(a1 + a2 - inter, 1e-9) > self.iou_thres:
                    ok = False
                    break
            if ok:
                sel.append(i)
            if len(sel) >= max_det:
                break
        chosen = order[sel]

        # second decode pass: full masks only for survivors
        sel_pts = grid[flat_pt[chosen]][:, None]              # (K, 1, 2)
        K = sel_pts.shape[0]
        Kp = _next_pow2(K)
        sel_pts = np.concatenate([sel_pts, np.zeros((Kp - K, 1, 2), np.float32)], 0)
        lbl = np.ones((Kp, 1), np.float32)
        lbl[K:] = -1
        run = self._decode_fn((1, False))
        masks, _ = run(self.variables, self._features, jnp.asarray(sel_pts),
                       jnp.asarray(lbl), None)
        masks = np.asarray(masks, np.float32)[np.arange(Kp), np.r_[flat_slot[chosen],
                                                                   np.zeros(Kp - K, int)]]
        full = self._masks_to_original(masks[:K])
        scale = np.asarray([w / nw * 4, h / nh * 4] * 2, np.float32)  # low-res grid -> orig
        return full, iou[chosen], boxes[chosen] * scale

    # ---------------------------------------------------------------- facade
    def __call__(self, source, bboxes=None, points=None, labels=None,
                 multimask_output: bool = False, **kwargs):
        """Run on image source(s); prompts apply to every image. Returns
        [Results] with masks (+ boxes derived from masks)."""
        from sar_yolo_tpu.data.loaders import load_inference_source
        loader, _ = load_inference_source(source)
        out = []
        for path, img, _meta in loader:
            t0 = time.perf_counter()
            self.set_image(img)
            t1 = time.perf_counter()
            if bboxes is None and points is None and not self.prompts:
                masks, scores, boxes = self.generate(
                    **{k: v for k, v in kwargs.items()
                       if k in ("points_per_side", "points_per_batch", "max_det",
                                "conf", "stability_thresh")})
            else:
                bb = self.prompts.get("bboxes", bboxes)
                pp = self.prompts.get("points", points)
                ll = self.prompts.get("labels", labels)
                masks, scores = self.prompt_inference(bb, pp, ll, multimask_output)
                boxes = np.asarray(batched_mask_to_box(jnp.asarray(masks)))
            t2 = time.perf_counter()
            n = masks.shape[0]
            det = np.concatenate([np.asarray(boxes, np.float32).reshape(n, 4),
                                  np.asarray(scores, np.float32).reshape(n, 1),
                                  np.zeros((n, 1), np.float32)], 1)
            speed = {"preprocess": 0.0, "inference": (t1 - t0) * 1e3,
                     "postprocess": (t2 - t1) * 1e3}
            out.append(Results(img, path, self.names, boxes=det, masks=masks,
                               speed=speed))
        if not out:
            LOGGER.warning("SAM: no images found in source")
        return out

    def set_prompts(self, prompts: dict):
        self.prompts = dict(prompts or {})
