"""Predictor: streaming inference with fully on-device preprocess->forward->NMS.

Capability parity with reference BasePredictor (engine/predictor.py:64-408,
stream_inference:220) and JDEPredictor (models/yolo/jde/predict.py:10-78).

TPU-native: letterbox resize + normalize + forward + decode + NMS compile into
ONE jit program; per image only the (max_det, 6+E) result block crosses to
host (reference round-trips GPU->CPU between forward and NMS — SURVEY §3 hot
loop note, BASELINE.json north star).
"""

from __future__ import annotations

import time
from pathlib import Path

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from sar_yolo_tpu.engine.results import Results
from sar_yolo_tpu.ops.decode import decode_detect
from sar_yolo_tpu.ops.nms import non_max_suppression

from sar_yolo_tpu.data.loaders import IMG_FORMATS, VID_FORMATS, load_inference_source


def load_sources(source):
    """Yield (path, BGR image) pairs (back-compat shim over data/loaders.py)."""
    loader, _ = load_inference_source(source)
    for path, img, _meta in loader:
        yield path, img


class _MediaWriter:
    """Writes annotated outputs: images via imwrite, video/stream frames through
    one cv2.VideoWriter per source (reference BasePredictor save_preds /
    setup vid_writer, engine/predictor.py:330-380)."""

    def __init__(self, args):
        from sar_yolo_tpu.cfg import get_save_dir
        self.dir = Path(getattr(args, "save_dir", None) or get_save_dir(args))
        self.dir.mkdir(parents=True, exist_ok=True)
        self.writers = {}

    def write(self, res, meta):
        img = res.plot()
        path = Path(str(res.path))
        if meta.get("video") or meta.get("stream"):
            key = str(res.path)
            if key not in self.writers:
                fps = meta.get("fps") or 30
                h, w = img.shape[:2]
                out = self.dir / (path.stem + ".avi")  # MJPG: codec always available
                self.writers[key] = cv2.VideoWriter(
                    str(out), cv2.VideoWriter_fourcc(*"MJPG"), fps, (w, h))
            self.writers[key].write(img)
        else:
            cv2.imwrite(str(self.dir / path.name), img)

    def close(self):
        for w in self.writers.values():
            w.release()
        self.writers.clear()


class BasePredictor:
    """Builds the jitted end-to-end predict program and streams sources through it."""

    def __init__(self, model, variables, meta, args, names=None):
        self.model = model
        self.variables = variables
        self.meta = meta
        self.args = args
        self.names = names or {i: str(i) for i in range(meta["nc"])}
        self.imgsz = args.imgsz if isinstance(args.imgsz, int) else args.imgsz[0]
        # event hook bus (reference utils/callbacks/base.py predict events;
        # trackers/track.py:90 registers through these)
        self.callbacks = {"on_predict_start": [], "on_predict_batch_start": [],
                          "on_predict_postprocess_end": [], "on_predict_end": []}
        self.batch = None       # (path, orig_img, meta) of the current frame
        self.results = None     # [Results] of the current frame (callbacks may edit)
        self.source_types = None
        self.trackers = {}      # populated by register_tracker
        self._predict = self._build()

    def add_callback(self, event: str, fn):
        self.callbacks[event].append(fn)

    def run_callbacks(self, event: str):
        for fn in self.callbacks.get(event, []):
            fn(self)

    def _preprocess_jit(self, frame_u8):
        """Device-side BGR->RGB + letterbox + normalize, INSIDE the jit.

        frame_u8 is the raw (H, W, 3) uint8 frame; one executable is compiled
        per source geometry (shapes static per trace) and the scale constants
        (r, dw, dh) are baked in. Replaces the reference's host cv2 LetterBox
        (engine/predictor.py:116-162, data/augment.py:1493) — HBM receives a
        single uint8 copy of the frame, the whole pixel path runs on-device.
        """
        from sar_yolo_tpu.ops.preprocess import letterbox_device
        rgb = frame_u8[..., ::-1]
        lb, r, (dw, dh) = letterbox_device(rgb, self.imgsz, scaleup=False)
        x = lb[None] / 255.0
        pad = jnp.asarray([dw, dh], x.dtype)
        return x, r, pad

    def _dets_in_orig_coords(self, variables, x, r, pad, use_tta: bool = False):
        """Shared tail of every serving trace: normalized letterboxed batch ->
        decode -> (end2end | NMS) -> boxes rescaled to original image space."""
        model, meta, args = self.model, self.meta, self.args
        nc = meta["nc"]
        conf = args.conf if args.conf is not None else 0.25
        strides = tuple(meta["strides"])
        bank = None
        if use_tta:
            from sar_yolo_tpu.ops.tta import forward_tta
            preds = forward_tta(lambda xi: model.apply(variables, xi, train=False),
                                x, strides, nc, meta["reg_max"])
        else:
            feats = model.apply(variables, x, train=False)
            # JDE: keep the wide raw embedding channels out of the (B, N)-sized
            # decode/NMS traffic; they are gathered per kept detection after NMS
            emb_dim = meta.get("embed_dim") or 0
            preds = decode_detect(feats, strides, nc, meta["reg_max"],
                                  extra_sigmoid=meta.get("state_classes") or 0,
                                  split_extras=emb_dim)
            if emb_dim:
                preds, bank = preds
        if meta.get("head") == "v10Detect":  # NMS-free serve path
            from sar_yolo_tpu.ops.nms import postprocess_end2end
            dets = postprocess_end2end(preds, max_det=args.max_det,
                                       conf_thres=conf, nc=nc)
        else:
            dets = non_max_suppression(preds, conf_thres=conf, iou_thres=args.iou,
                                       max_det=args.max_det, nc=nc,
                                       agnostic=args.agnostic_nms, extras_bank=bank)
        pad = jnp.asarray(pad, dets.dtype)
        boxes = (dets[..., :4] - jnp.concatenate([pad, pad])[None, None, :]) / r
        return jnp.concatenate([boxes, dets[..., 4:]], -1)

    def _batch_tail(self, variables, x, r, pad):
        """Task-specific tail of every serving trace (single-frame AND batched):
        normalized letterboxed batch -> task outputs in original-image coords.
        Subclasses override this one method; both `_build` and `_build_batched`
        route through it, so every task serves through `predict_batch`."""
        return self._dets_in_orig_coords(variables, x, r, pad)

    def _build(self):
        meta = self.meta
        use_tta = bool(getattr(self.args, "augment", False))
        if use_tta and meta.get("head") != "Detect":
            from sar_yolo_tpu.utils import LOGGER
            LOGGER.warning("augment=True is Detect-only (reference nn/tasks.py:360); "
                           "reverting to single-scale prediction")
            use_tta = False

        @jax.jit
        def run(variables, frame_u8):
            """frame_u8: raw (H, W, 3) uint8 BGR frame."""
            x, r, pad = self._preprocess_jit(frame_u8)
            if use_tta:
                return self._dets_in_orig_coords(variables, x, r, pad, True)
            return self._batch_tail(variables, x, r, pad)

        return run

    def _build_batched(self, B: int, H: int, W: int):
        """One-dispatch executable for a uniform-geometry uint8 BGR batch —
        the high-throughput serving path (and the multi-chip one: under a
        mesh, XLA shards the batch over 'dp' and replicates the weights)."""
        from sar_yolo_tpu.ops.preprocess import letterbox_device
        imgsz = self.imgsz
        # static per-geometry scale constants (same math as letterbox_device)
        r = min(imgsz / H, imgsz / W, 1.0)
        new_h, new_w = round(H * r), round(W * r)
        left, top = (imgsz - new_w) // 2, (imgsz - new_h) // 2

        @jax.jit
        def run(variables, frames_u8):
            rgb = frames_u8[..., ::-1]
            x = jax.vmap(lambda im: letterbox_device(im, imgsz, scaleup=False)[0])(rgb)
            return self._batch_tail(variables, x / 255.0, r, [left, top])

        return run

    def predict_batch(self, frames_u8, mesh=None):
        """Run a (B, H, W, 3) uint8 BGR batch in ONE device dispatch.

        With `mesh` (a 1-axis jax.sharding.Mesh), the batch shards over the
        devices and the weights replicate — single-program multi-chip serving
        with zero per-chip code (the reference serves one GPU per process).

        Returns the task's batched outputs in original-image coordinates:
        (B, max_det, 6+E) detections for box heads (JDE extras carried),
        (dets, proto-res masks) for segment, (B, max_det, 6+K*D) for pose,
        (B, max_det, 7) xywhr for obb, (B, nc) probs for classify.
        """
        frames = np.asarray(frames_u8)
        B, H, W = frames.shape[:3]
        key = (B, H, W, None if mesh is None else tuple(map(str, mesh.devices.flat)))
        cached = getattr(self, "_batch_exec", None)
        if cached is None or cached[0] != key:
            self._batch_exec = [key, self._build_batched(B, H, W), None, None]
        fn = self._batch_exec[1]
        variables, batch = self.variables, jnp.asarray(frames)
        if mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P
            batch = jax.device_put(batch, NamedSharding(mesh, P(mesh.axis_names[0])))
            # replicate the weight tree to the mesh ONCE, not per request
            if self._batch_exec[2] is not self.variables:
                self._batch_exec[3] = jax.tree.map(
                    lambda x: jax.device_put(x, NamedSharding(mesh, P())),
                    self.variables)
                self._batch_exec[2] = self.variables
            variables = self._batch_exec[3]
        return jax.tree.map(np.asarray, fn(variables, batch))

    def postprocess(self, dets, path, orig_img, speed):
        d = np.asarray(dets[0])
        d = d[d[:, 4] > 0]
        h, w = orig_img.shape[:2]
        d[:, [0, 2]] = d[:, [0, 2]].clip(0, w)
        d[:, [1, 3]] = d[:, [1, 3]].clip(0, h)
        return Results(orig_img, path, self.names, boxes=d[:, :6], speed=speed)

    def __call__(self, source, stream: bool = False):
        gen = self.stream_inference(source)
        return gen if stream else list(gen)

    def stream_inference(self, source):
        loader, self.source_types = load_inference_source(source)
        self.run_callbacks("on_predict_start")
        writer = _MediaWriter(self.args) if getattr(self.args, "save", False) else None
        try:
            for path, img, meta in loader:
                self.batch = (path, img, meta)
                self.run_callbacks("on_predict_batch_start")
                t0 = time.perf_counter()
                inp = jnp.asarray(img)  # raw uint8 upload; letterbox runs on device
                t1 = time.perf_counter()
                dets = self._predict(self.variables, inp)
                dets = jax.block_until_ready(dets)
                t2 = time.perf_counter()
                speed = {"preprocess": (t1 - t0) * 1e3, "inference": (t2 - t1) * 1e3}
                res = self.postprocess(dets, path, img, speed)
                res.frame = meta.get("frame")
                self.results = [res]
                self.run_callbacks("on_predict_postprocess_end")
                res = self.results[0]
                t3 = time.perf_counter()
                speed["postprocess"] = (t3 - t2) * 1e3
                if writer is not None:
                    writer.write(res, meta)
                if getattr(self.args, "save_txt", False):
                    from sar_yolo_tpu.cfg import get_save_dir
                    d = Path(getattr(self.args, "save_dir", None) or get_save_dir(self.args))
                    stem = Path(str(path)).stem
                    n = f"_{meta['frame']}" if meta.get("frame") is not None else ""
                    res.save_txt(d / "labels" / f"{stem}{n}.txt")
                yield res
        finally:
            if writer is not None:
                writer.close()
            self.run_callbacks("on_predict_end")


class DetectionPredictor(BasePredictor):
    pass


class JDEPredictor(BasePredictor):
    """Splits [box, conf, cls, emb, state] and exposes embeddings + argmax state
    (reference jde/predict.py:29-78)."""

    def postprocess(self, dets, path, orig_img, speed):
        d = np.asarray(dets[0])
        d = d[d[:, 4] > 0]
        h, w = orig_img.shape[:2]
        d[:, [0, 2]] = d[:, [0, 2]].clip(0, w)
        d[:, [1, 3]] = d[:, [1, 3]].clip(0, h)
        ed = self.meta["embed_dim"]
        sc = self.meta.get("state_classes") or 0
        embeds = d[:, 6:6 + ed]
        states = d[:, 6 + ed:6 + ed + sc].argmax(-1) if sc else None
        return Results(orig_img, path, self.names, boxes=d[:, :6], embeds=embeds,
                       person_states=states, speed=speed)


class PosePredictor(BasePredictor):
    """Decodes keypoints into Results.keypoints (reference pose/predict.py)."""

    def _batch_tail(self, variables, x, r, pad):
        model, meta, args = self.model, self.meta, self.args
        nc = meta["nc"]
        conf = args.conf if args.conf is not None else 0.25
        strides = tuple(meta["strides"])
        kpt_shape = tuple(meta.get("kpt_shape", (17, 3)))
        pad = jnp.asarray(pad, x.dtype)
        feats = model.apply(variables, x, train=False)
        preds = decode_detect(feats, strides, nc, meta["reg_max"], kpt_shape=kpt_shape)
        dets = non_max_suppression(preds, conf_thres=conf, iou_thres=args.iou,
                                   max_det=args.max_det, nc=nc)
        boxes = (dets[..., :4] - jnp.concatenate([pad, pad])[None, None, :]) / r
        K, D = kpt_shape
        kpts = dets[..., 6:6 + K * D].reshape(*dets.shape[:2], K, D)
        kxy = (kpts[..., :2] - pad[None, None, None, :]) / r  # pad: (2,) consts
        kpts = jnp.concatenate([kxy, kpts[..., 2:]], -1).reshape(*dets.shape[:2], K * D)
        return jnp.concatenate([boxes, dets[..., 4:6], kpts], -1)

    def postprocess(self, dets, path, orig_img, speed):
        d = np.asarray(dets[0])
        d = d[d[:, 4] > 0]
        h, w = orig_img.shape[:2]
        d[:, [0, 2]] = d[:, [0, 2]].clip(0, w)
        d[:, [1, 3]] = d[:, [1, 3]].clip(0, h)
        K, D = self.meta.get("kpt_shape", (17, 3))
        kpts = d[:, 6:6 + K * D].reshape(-1, K, D)
        return Results(orig_img, path, self.names, boxes=d[:, :6], keypoints=kpts,
                       speed=speed)


class SegmentPredictor(BasePredictor):
    """Composes instance masks from prototypes (reference segment/predict.py)."""

    def _batch_tail(self, variables, x, r, pad):
        model, meta, args = self.model, self.meta, self.args
        nc = meta["nc"]
        conf = args.conf if args.conf is not None else 0.25
        strides = tuple(meta["strides"])
        pad = jnp.asarray(pad, x.dtype)
        feats, protos = model.apply(variables, x, train=False)
        preds = decode_detect(feats, strides, nc, meta["reg_max"])
        dets = non_max_suppression(preds, conf_thres=conf, iou_thres=args.iou,
                                   max_det=args.max_det, nc=nc)
        from sar_yolo_tpu.ops.masks import process_mask
        H = x.shape[1]
        masks = jax.vmap(lambda p, dd: process_mask(p, dd[:, 6:], dd[:, :4], (H, H)))(
            protos, dets)
        boxes = (dets[..., :4] - jnp.concatenate([pad, pad])[None, None, :]) / r
        return jnp.concatenate([boxes, dets[..., 4:6]], -1), masks

    def stream_inference(self, source):
        import time as _t
        for path, img in load_sources(source):
            t0 = _t.perf_counter()
            inp = jnp.asarray(img)
            t1 = _t.perf_counter()
            dets, masks = self._predict(self.variables, inp)
            dets = np.asarray(dets)
            masks = np.asarray(masks)
            t2 = _t.perf_counter()
            speed = {"preprocess": (t1 - t0) * 1e3, "inference": (t2 - t1) * 1e3}
            d = dets[0]
            keep = d[:, 4] > 0
            d = d[keep]
            h, w = img.shape[:2]
            d[:, [0, 2]] = d[:, [0, 2]].clip(0, w)
            d[:, [1, 3]] = d[:, [1, 3]].clip(0, h)
            res = Results(img, path, self.names, boxes=d[:, :6], masks=masks[0][keep],
                          speed=speed)
            yield res


class ClassificationPredictor(BasePredictor):
    """Image classification: returns Results.probs (reference classify/predict.py)."""

    def _batch_tail(self, variables, x, r, pad):
        return jax.nn.softmax(self.model.apply(variables, x, train=False), axis=-1)

    def postprocess(self, probs, path, orig_img, speed):
        p = np.asarray(probs[0])
        return Results(orig_img, path, self.names, probs=p, speed=speed)


class OBBPredictor(BasePredictor):
    """Rotated-box inference: Results carry xywhr rows (reference obb/predict.py)."""

    def _batch_tail(self, variables, x, r, pad):
        model, meta, args = self.model, self.meta, self.args
        nc = meta["nc"]
        conf = args.conf if args.conf is not None else 0.25
        strides = tuple(meta["strides"])
        from sar_yolo_tpu.ops.decode import decode_obb
        from sar_yolo_tpu.ops.nms import non_max_suppression_rotated
        pad = jnp.asarray(pad, x.dtype)
        feats = model.apply(variables, x, train=False)
        preds = decode_obb(feats, strides, nc, meta["reg_max"])
        dets = non_max_suppression_rotated(preds, conf_thres=conf, iou_thres=args.iou,
                                           max_det=args.max_det, nc=nc)
        xy = (dets[..., :2] - pad[None, None, :]) / r
        wh = dets[..., 2:4] / r
        return jnp.concatenate([xy, wh, dets[..., 4:]], -1)

    def postprocess(self, dets, path, orig_img, speed):
        d = np.asarray(dets[0])
        d = d[d[:, 5] > 0]
        res = Results(orig_img, path, self.names, speed=speed)
        res.obb = d  # rows [cx, cy, w, h, r, conf, cls]
        return res


class RTDETRPredictor(BasePredictor):
    """RT-DETR inference: top decoder layer, conf filter only (rtdetr/predict.py)."""

    def _batch_tail(self, variables, x, r, pad):
        conf = self.args.conf if self.args.conf is not None else 0.25
        imgsz = self.imgsz
        pad = jnp.asarray(pad, x.dtype)
        dec_b, dec_s, _, _ = self.model.apply(variables, x, train=False)
        boxes = dec_b[-1] * imgsz             # (B, nq, 4) pixels cxcywh
        scores = jax.nn.sigmoid(dec_s[-1])
        cls_conf = scores.max(-1)
        cls = scores.argmax(-1).astype(boxes.dtype)
        xy = (boxes[..., :2] - pad[None, None, :]) / r
        wh = boxes[..., 2:4] / r
        x1y1 = xy - wh / 2
        x2y2 = xy + wh / 2
        conf_m = jnp.where(cls_conf >= conf, cls_conf, 0.0)
        return jnp.concatenate([x1y1, x2y2, conf_m[..., None], cls[..., None]], -1)
