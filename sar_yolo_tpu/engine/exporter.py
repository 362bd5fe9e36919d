"""Exporter: StableHLO / TF SavedModel / TFLite deployment artifacts.

Capability parity with reference Exporter (engine/exporter.py:181, 13 formats).
TPU-native export story: the canonical portable artifact is **StableHLO**
(serialized jax.export), which any XLA-based runtime (and IREE) can consume;
TF SavedModel + TFLite come via jax2tf for the reference's TF-family targets.
Torch-specific formats (torchscript/engine/ncnn/...) are intentionally not
replicated — their deployment role is covered by the StableHLO/SavedModel path
and the C++ client under examples/.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from sar_yolo_tpu.ops.decode import decode_detect
from sar_yolo_tpu.ops.nms import non_max_suppression
from sar_yolo_tpu.utils import LOGGER

EXPORT_FORMATS = ("stablehlo", "saved_model", "tflite", "onnx", "pb")


def export_formats():
    """Table of supported export formats (mirrors reference export_formats:107)."""
    return [
        {"format": "stablehlo", "suffix": ".stablehlo", "args": []},
        {"format": "saved_model", "suffix": "_saved_model", "args": ["keras"]},
        {"format": "tflite", "suffix": ".tflite", "args": ["int8"]},
        {"format": "onnx", "suffix": ".onnx", "args": ["opset"]},
        {"format": "pb", "suffix": ".pb", "args": []},  # frozen TF GraphDef
    ]


class Exporter:
    def __init__(self, args):
        self.args = args

    def _representative_images(self, imgsz: int, n: int = 100):
        """Calibration frames for int8 quantization (reference exporter.py
        tflite int8 path: ~100 letterboxed images from `args.data`).

        Yields (1, imgsz, imgsz, 3) uint8 RGB arrays. When no dataset is
        given, deterministic synthetic frames keep the pipeline runnable but
        calibration quality is degraded — a warning says so.
        """
        paths = []
        if getattr(self.args, "data", None):
            from pathlib import Path as _P

            from sar_yolo_tpu.data.dataset import IMG_FORMATS, check_det_dataset
            d = check_det_dataset(self.args.data)
            for split in ("val", "train", "test"):
                src = d.get(split)
                if not src:
                    continue
                p = _P(src)
                if p.is_dir():
                    paths = sorted(str(f) for f in p.rglob("*")
                                   if f.suffix[1:].lower() in IMG_FORMATS)
                elif p.is_file() and p.suffix == ".txt":
                    base = p.parent
                    paths = [str((base / ln.strip()).resolve())
                             for ln in p.read_text().splitlines() if ln.strip()]
                if paths:
                    break
        if paths:
            import cv2

            from sar_yolo_tpu.data.augment import letterbox
            for f in paths[:n]:
                img = cv2.imread(f)
                if img is None:
                    continue
                lb, _, _ = letterbox(img, imgsz, scaleup=False)
                yield [np.ascontiguousarray(lb[..., ::-1])[None]]
        else:
            LOGGER.warning(
                "int8 calibration: no dataset images found (set `data=` to a "
                "dataset yaml for representative calibration); using synthetic "
                "frames — expect degraded quantized accuracy.")
            rng = np.random.default_rng(0)
            for _ in range(min(n, 32)):
                yield [rng.integers(0, 256, (1, imgsz, imgsz, 3), np.uint8)]

    def _build_infer_fn(self, model, variables, meta, with_nms: bool):
        """Task-aware serving graph (≙ reference Exporter covering every task
        via the model's own export-mode forward, engine/exporter.py:181).

        Output layouts (documented in the metadata sidecar):
          detect/jde  raw: (B, N, 4+nc+E) · nms: (B, max_det, 6+E)
          pose        raw/nms: + decoded keypoint pixels as trailing columns
          segment     raw: ((B, N, 4+nc+nm), (B, Hp, Wp, nm) protos)
                      nms: ((B, max_det, 6), (B, max_det, Hp, Wp) bool masks
                      at PROTO resolution, Hp=H/4 — same contract as the
                      native predictor; upsample to input res client-side)
          obb         raw: (B, N, 4+nc+1) · nms: (B, max_det, 7) xywhr+conf+cls
          classify    (B, nc) softmax probabilities
        """
        strides = tuple(meta.get("strides") or ())
        nc = meta["nc"]
        task = meta.get("task") or "detect"
        conf, iou, max_det = 0.25, self.args.iou, self.args.max_det

        if task == "classify":
            def infer(img):
                x = img.astype(jnp.float32) / 255.0
                return jax.nn.softmax(model.apply(variables, x, train=False), -1)
            return infer

        if task == "segment":
            def infer(img):
                x = img.astype(jnp.float32) / 255.0
                feats, protos = model.apply(variables, x, train=False)
                preds = decode_detect(feats, strides, nc, meta["reg_max"])
                if not with_nms:
                    return preds, protos
                from sar_yolo_tpu.ops.masks import process_mask
                dets = non_max_suppression(preds, conf_thres=conf, iou_thres=iou,
                                           max_det=max_det, nc=nc)
                H = img.shape[1]
                masks = jax.vmap(lambda p, dd: process_mask(
                    p, dd[:, 6:], dd[:, :4], (H, H)))(protos, dets)
                return dets[..., :6], masks
            return infer

        if task == "obb":
            from sar_yolo_tpu.ops.decode import decode_obb
            from sar_yolo_tpu.ops.nms import non_max_suppression_rotated

            def infer(img):
                x = img.astype(jnp.float32) / 255.0
                feats = model.apply(variables, x, train=False)
                preds = decode_obb(feats, strides, nc, meta["reg_max"])
                if not with_nms:
                    return preds
                return non_max_suppression_rotated(preds, conf_thres=conf,
                                                   iou_thres=iou, max_det=max_det,
                                                   nc=nc)
            return infer

        kpt_shape = (tuple(meta["kpt_shape"])
                     if task == "pose" and meta.get("kpt_shape") else None)
        extra_sig = meta.get("state_classes") or 0
        # embedded-NMS JDE artifacts use the bank path (embeddings gathered per
        # kept detection, ops/nms.py); raw-preds artifacts keep channels inline
        # so external consumers see the full documented (B, N, no) layout
        emb_dim = (meta.get("embed_dim") or 0) if with_nms else 0

        def infer(img):
            x = img.astype(jnp.float32) / 255.0
            feats = model.apply(variables, x, train=False)
            preds = decode_detect(feats, strides, nc, meta["reg_max"],
                                  extra_sigmoid=extra_sig, kpt_shape=kpt_shape,
                                  split_extras=emb_dim)
            bank = None
            if emb_dim:
                preds, bank = preds
            if with_nms:
                return non_max_suppression(preds, conf_thres=conf, iou_thres=iou,
                                           max_det=max_det, nc=nc,
                                           extras_bank=bank)
            return preds

        return infer

    def __call__(self, model, variables, meta):
        fmt = self.args.format
        imgsz = self.args.imgsz if isinstance(self.args.imgsz, int) else self.args.imgsz[0]
        batch = 1 if not self.args.dynamic else None
        out_dir = Path(getattr(self.args, "save_dir", None) or
                       getattr(self.args, "project", None) or "exports")
        out_dir.mkdir(parents=True, exist_ok=True)
        stem = Path(str(self.args.model or "model")).stem
        infer = self._build_infer_fn(model, variables, meta, with_nms=self.args.nms)
        dynamic = bool(getattr(self.args, "dynamic", False))
        spec_shape = (batch or 1, imgsz, imgsz, 3)
        dyn_shape = (None, imgsz, imgsz, 3)  # batch-polymorphic serving shape
        t0 = time.time()

        # metadata sidecar: the analog of the reference's embedded metadata.yaml
        # (exporter.py:~300); AutoBackend reads it back on load
        sidecar = {
            "input_shape": list(spec_shape), "input_dtype": "uint8",
            "imgsz": imgsz, "nc": meta["nc"], "task": meta.get("task"),
            "names": meta.get("names") or {i: f"c{i}" for i in range(meta["nc"])},
            "with_nms": bool(self.args.nms),
            "output": {
                "classify": "(B, nc) softmax probs",
                "segment": ("((B, max_det, 6) dets, (B, max_det, Hp, Wp) bool "
                            "masks at proto resolution Hp=H/4)"
                            if self.args.nms else
                            "((B, N, 4+nc+nm) preds, (B, Hp, Wp, nm) protos)"),
                "obb": ("(B, max_det, 7) xywhr+conf+cls" if self.args.nms
                        else "(B, N, 4+nc+1) raw preds, trailing angle"),
            }.get(meta.get("task"),
                  "(B, max_det, 6+E) dets" if self.args.nms
                  else "(B, N, 4+nc+E) raw preds"),
        }
        for k in ("kpt_shape", "embed_dim", "state_classes"):
            if meta.get(k):
                sidecar[k] = (list(meta[k]) if isinstance(meta[k], (tuple, list))
                              else meta[k])

        if fmt == "stablehlo":
            if dynamic:
                # batch-polymorphic artifact: one export serves any batch size
                # (reference dynamic=True ONNX/TF exports)
                b = jax.export.symbolic_shape("b")[0]
                in_spec = jax.ShapeDtypeStruct((b, imgsz, imgsz, 3), jnp.uint8)
                sidecar["input_shape"] = [None, imgsz, imgsz, 3]
            else:
                in_spec = jax.ShapeDtypeStruct(spec_shape, jnp.uint8)
            exported = jax.export.export(jax.jit(infer))(in_spec)
            path = out_dir / f"{stem}.stablehlo"
            path.write_bytes(exported.serialize())
            (out_dir / f"{stem}.stablehlo.json").write_text(json.dumps(sidecar))
        elif fmt in {"saved_model", "tflite"}:
            import tensorflow as tf
            from jax.experimental import jax2tf
            poly = [f"(b, {imgsz}, {imgsz}, 3)"] if dynamic else None
            if dynamic:
                sidecar["input_shape"] = [None, imgsz, imgsz, 3]
            tf_fn = tf.function(
                jax2tf.convert(infer, with_gradient=False,
                               polymorphic_shapes=poly),
                input_signature=[tf.TensorSpec(dyn_shape if dynamic else spec_shape,
                                               tf.uint8)],
                autograph=False)
            module = tf.Module()
            module.f = tf_fn
            sm_path = out_dir / f"{stem}_saved_model"
            tf.saved_model.save(module, str(sm_path))
            (sm_path / "metadata.json").write_text(json.dumps(sidecar))
            path = sm_path
            if fmt == "tflite":
                converter = tf.lite.TFLiteConverter.from_saved_model(str(sm_path))
                converter.target_spec.supported_ops = [
                    tf.lite.OpsSet.TFLITE_BUILTINS, tf.lite.OpsSet.SELECT_TF_OPS]
                int8_req = getattr(self.args, "int8", False)
                if int8_req:
                    # Post-training full-integer quantization with float
                    # fallback (reference export_tflite int8 path,
                    # exporter.py:1055): conv/matmul kernels calibrate to int8
                    # from representative frames; NMS/control ops stay float.
                    # int8='auto' quantizes here too (deliberately): the TPU
                    # scale policy (engine/model.py resolve_int8_policy) is an
                    # MXU heuristic — TFLite artifacts target edge CPUs where
                    # int8 helps at every scale.
                    if str(int8_req).lower() == "auto":
                        LOGGER.info("int8='auto': TFLite export quantizes at "
                                    "every scale (edge-CPU target; the m-scale "
                                    "policy applies only to TPU serving)")
                    converter.optimizations = [tf.lite.Optimize.DEFAULT]
                    rep = list(self._representative_images(imgsz))
                    converter.representative_dataset = lambda: iter(rep)
                    sidecar["int8"] = True
                tfl = converter.convert()
                path = out_dir / f"{stem}.tflite"
                path.write_bytes(tfl)
                (out_dir / f"{stem}.tflite.json").write_text(json.dumps(sidecar))
        elif fmt == "pb":
            # frozen TF GraphDef (reference export_pb, exporter.py:~1040):
            # constant-folded single-file graph for TF C/C++/Java deploys
            import tensorflow as tf
            from jax.experimental import jax2tf
            from tensorflow.python.framework.convert_to_constants import (
                convert_variables_to_constants_v2)
            tf_fn = tf.function(
                jax2tf.convert(infer, with_gradient=False),
                input_signature=[tf.TensorSpec(spec_shape, tf.uint8)],
                autograph=False)
            frozen = convert_variables_to_constants_v2(
                tf_fn.get_concrete_function())
            path = out_dir / f"{stem}.pb"
            tf.io.write_graph(frozen.graph.as_graph_def(), str(out_dir),
                              path.name, as_text=False)
            sidecar["inputs"] = [t.name for t in frozen.inputs]
            sidecar["outputs"] = [t.name for t in frozen.outputs]
            (out_dir / f"{stem}.pb.json").write_text(json.dumps(sidecar))
        elif fmt == "onnx":
            # native jaxpr->ONNX writer (reference export_onnx analog,
            # exporter.py:~470 — no torch.onnx/onnx wheel needed). Raw-preds
            # graphs only: the fixed-point NMS loop has no ONNX mapping.
            from sar_yolo_tpu.export.onnx_export import (UnsupportedPrimitive,
                                                         export_onnx)
            if self.args.nms:
                from sar_yolo_tpu.utils.errors import ExportError
                raise ExportError(
                    "format='onnx' exports the raw-predictions graph; embedded "
                    "NMS uses on-device control flow with no ONNX mapping. "
                    "Export with nms=False (NMS runs in the consumer), or use "
                    "'stablehlo'/'saved_model' for embedded-NMS artifacts.")
            path = out_dir / f"{stem}.onnx"
            try:
                export_onnx(infer, np.zeros(spec_shape, np.uint8), str(path),
                            opset=int(getattr(self.args, "opset", None) or 17))
            except UnsupportedPrimitive as e:
                from sar_yolo_tpu.utils.errors import ExportError
                raise ExportError(str(e)) from e
            (out_dir / f"{stem}.onnx.json").write_text(json.dumps(sidecar))
        else:
            raise ValueError(f"Unsupported export format '{fmt}'. "
                             f"Available: {EXPORT_FORMATS}")
        LOGGER.info(f"Export complete: {path} ({time.time() - t0:.1f}s)")
        return str(path)
