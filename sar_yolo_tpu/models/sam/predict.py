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
            if pts is not None and q_box != q_pts:
                # zero-padding boxes would embed a real degenerate box at (0,0)
                # for the point-only queries — there is no not-a-box token
                raise ValueError(f"points ({q_pts}) and boxes ({q_box}) must "
                                 "prompt the same queries; run separate calls "
                                 "for mixed prompt sets")
            box_arr = np.concatenate(
                [box_arr, np.tile(box_arr[-1:], (Qp - q_box, 1))], 0)

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
        # ONE jitted scoring program per chunk geometry, cached on the
        # predictor — a per-call closure would retrace/recompile every image
        if not hasattr(self, "_score_fns"):
            self._score_fns = {}
        shape_key = tuple(grid_p.shape)
        if shape_key not in self._score_fns:
            @jax.jit
            def score_chunks(v, emb, chunks):
                def one(pts):
                    out = model.apply(v, emb, method="decode", points=pts,
                                      labels=jnp.ones(pts.shape[:2]))
                    masks, iou = out[0], out[1]
                    m3, i3 = masks[:, 1:], iou[:, 1:]         # multimask slots
                    stab = stability_score(m3)
                    boxes = batched_mask_to_box(m3 > 0.0)
                    return i3, stab, boxes
                return jax.lax.map(one, chunks)
            self._score_fns[shape_key] = score_chunks

        iou, stab, boxes = self._score_fns[shape_key](self.variables, self._features,
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


class SAM2VideoPredictor(SAMPredictor):
    """Video object segmentation with a fixed-slot memory bank
    (reference models/sam/predict.py SAM2VideoPredictor:815).

    TPU-native: one jitted per-frame step — encode -> condition on the memory
    ring buffer -> decode -> encode new memory. The bank is a static
    (num_obj, num_maskmem, h, w, mem_dim) array + validity flags: slot 0 holds
    the prompted (conditioning) frame forever, slots 1.. rotate over recent
    frames. The reference's python-dict memory store becomes two arrays, so the
    whole tracking loop is XLA-compiled.
    """

    def __init__(self, model, variables, imgsz: int = 1024, **kw):
        super().__init__(model, variables, imgsz=imgsz, **kw)
        self._steps = {}  # object-count Q -> jitted step (Q is a trace constant)

    def _build_step(self, Q: int):
        model = self.model
        T = model.num_maskmem

        @jax.jit
        def step(v, canvas, bank, valid, tpos):
            feats = model.apply(v, canvas, method="encode")
            raw = feats["raw_embed"]                          # (1, h, w, C)

            def per_obj(bank_o, valid_o):
                return model.apply(v, raw, bank_o, valid_o, tpos,
                                   method="condition_on_memory")[0]

            cond = jax.vmap(per_obj)(bank, valid)             # (Q, h, w, C)
            # decode each object with a not-a-point token (no new prompts)
            pts = jnp.zeros((Q, 1, 2), jnp.float32)
            lbl = -jnp.ones((Q, 1), jnp.float32)
            f = {"image_embed": cond, "high_res_feats": feats["high_res_feats"]}
            masks, iou, _tok, obj = model.apply(v, f, points=pts, labels=lbl,
                                                method="decode")
            # single-mask slot 0 for tracking stability
            m0 = masks[:, 0]                                  # (Q, 4h, 4w)
            new_mem = jax.vmap(
                lambda m: model.apply(v, raw, m[None, :, :, None],
                                      method="encode_memory")[0])(m0)
            return m0, iou[:, 0], obj[:, 0], new_mem

        return step

    def init_video(self, first_frame, bboxes=None, points=None, labels=None):
        """Prompt objects on the first frame; build the memory bank."""
        self.set_image(first_frame)
        model = self.model
        h, w, nh, nw = self._im_meta

        # prompt decode on the first frame (batched objects)
        q_pts = None
        if points is not None:
            q_pts = np.asarray(points, np.float32)
            if q_pts.ndim == 1:
                q_pts = q_pts[None]
            if q_pts.ndim == 2:
                q_pts = q_pts[:, None]
            q_pts = self._scale_coords(q_pts)
        q_box = None
        if bboxes is not None:
            q_box = np.asarray(bboxes, np.float32).reshape(-1, 4) * np.asarray(
                [nw / w, nh / h, nw / w, nh / h], np.float32)
        Q = (q_pts.shape[0] if q_pts is not None else
             q_box.shape[0] if q_box is not None else 0)
        if Q == 0:
            raise ValueError("SAM2 video tracking needs first-frame prompts")
        lbl = (np.ones(q_pts.shape[:2], np.float32) if q_pts is not None else None)
        if labels is not None and q_pts is not None:
            lbl = np.asarray(labels, np.float32).reshape(q_pts.shape[:2])

        kw = {}
        if q_pts is not None:
            kw["points"] = jnp.asarray(q_pts)
            kw["labels"] = jnp.asarray(lbl)
        if q_box is not None:
            kw["boxes"] = jnp.asarray(q_box)
        feats = self._features
        masks, iou, _tok, _obj = self.model.apply(self.variables, feats,
                                                  method="decode", **kw)
        m0 = np.asarray(masks[:, 0])                          # (Q, 4h, 4w)

        raw = feats["raw_embed"]
        mem0 = jax.vmap(lambda m: model.apply(
            self.variables, raw, m[None, :, :, None], method="encode_memory")[0])(
            jnp.asarray(m0))
        T = model.num_maskmem
        hh, ww = raw.shape[1:3]
        bank = np.zeros((Q, T, hh, ww, model.mem_dim), np.float32)
        valid = np.zeros((Q, T), np.float32)
        bank[:, 0] = np.asarray(mem0)
        valid[:, 0] = 1.0
        self._bank = jnp.asarray(bank)
        self._valid = jnp.asarray(valid)
        self._frame_i = 0
        self._Q = Q
        self._slot_frame = np.full(T, -1, np.int64)  # track-step that wrote each slot
        if Q not in self._steps:
            self._steps[Q] = self._build_step(Q)
        self._step = self._steps[Q]
        return m0, np.asarray(iou[:, 0])

    def _canvas(self, frame):
        h, w = frame.shape[:2]
        r = self.imgsz / max(h, w)
        nh, nw = round(h * r), round(w * r)
        scaled = cv2.resize(frame[..., ::-1], (nw, nh), interpolation=cv2.INTER_LINEAR)
        canvas = np.zeros((self.imgsz, self.imgsz, 3), np.uint8)
        canvas[:nh, :nw] = scaled
        self._im_meta = (h, w, nh, nw)
        return canvas

    def track_step(self, frame):
        """Propagate all objects one frame; returns (masks_orig (Q, H, W) bool,
        scores (Q,), obj_logits (Q,))."""
        canvas = self._canvas(frame)
        # frames-back per slot (0 = the conditioning frame held in slot 0);
        # invalid slots are masked out of attention, their tpos is irrelevant
        T = self.model.num_maskmem
        tpos = np.where(self._slot_frame >= 0,
                        np.clip(self._frame_i - self._slot_frame + 1, 1, T - 1),
                        T - 1)
        tpos[0] = 0
        m0, score, obj, new_mem = self._step(self.variables,
                                             jnp.asarray(canvas[None]),
                                             self._bank, self._valid,
                                             jnp.asarray(tpos))
        # ring insert into slots 1..T-1 (slot 0 = conditioning frame)
        slot = 1 + (self._frame_i % max(T - 1, 1))
        self._bank = self._bank.at[:, slot].set(new_mem)
        self._valid = self._valid.at[:, slot].set(1.0)
        self._slot_frame[slot] = self._frame_i
        self._frame_i += 1
        return (self._masks_to_original(np.asarray(m0)), np.asarray(score),
                np.asarray(obj))

    def __call__(self, source, bboxes=None, points=None, labels=None, **kwargs):
        """Track prompted objects through a video; yields one Results per frame
        with stable per-object ids in boxes col 6."""
        from sar_yolo_tpu.data.loaders import load_inference_source
        loader, _ = load_inference_source(source)
        out = []
        for i, (path, img, _meta) in enumerate(loader):
            t0 = time.perf_counter()
            if i == 0:
                m0, score = self.init_video(img, bboxes=bboxes, points=points,
                                            labels=labels)
                masks = self._masks_to_original(m0)
            else:
                masks, score, _obj = self.track_step(img)
            t1 = time.perf_counter()
            boxes = np.asarray(batched_mask_to_box(jnp.asarray(masks)), np.float32)
            n = masks.shape[0]
            det = np.concatenate([boxes, score.reshape(n, 1).astype(np.float32),
                                  np.zeros((n, 1), np.float32),
                                  np.arange(n, dtype=np.float32).reshape(n, 1)], 1)
            res = Results(img, path, self.names, boxes=det, masks=masks,
                          speed={"inference": (t1 - t0) * 1e3})
            res.frame = i
            out.append(res)
        return out
