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
        {"format": "onnx", "suffix": ".onnx", "args": ["opset"]},  # needs tf2onnx
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
        strides = tuple(meta["strides"])
        nc = meta["nc"]
        extra_sig = meta.get("state_classes") or 0

        # embedded-NMS JDE artifacts use the bank path (embeddings gathered per
        # kept detection, ops/nms.py); raw-preds artifacts keep channels inline
        # so external consumers see the full documented (B, N, no) layout
        emb_dim = (meta.get("embed_dim") or 0) if with_nms else 0

        def infer(img):
            x = img.astype(jnp.float32) / 255.0
            feats = model.apply(variables, x, train=False)
            preds = decode_detect(feats, strides, nc, meta["reg_max"],
                                  extra_sigmoid=extra_sig, split_extras=emb_dim)
            bank = None
            if emb_dim:
                preds, bank = preds
            if with_nms:
                return non_max_suppression(preds, conf_thres=0.25, iou_thres=self.args.iou,
                                           max_det=self.args.max_det, nc=nc,
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
            "output": "(B, max_det, 6+E) dets" if self.args.nms else "(B, N, 4+nc+E) raw preds",
        }

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
                if getattr(self.args, "int8", False):
                    # Post-training full-integer quantization with float
                    # fallback (reference export_tflite int8 path,
                    # exporter.py:1055): conv/matmul kernels calibrate to int8
                    # from representative frames; NMS/control ops stay float.
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
            # jax2tf graph -> ONNX via tf2onnx (reference export_onnx analog,
            # exporter.py:~470). tf2onnx is not bundled in the zero-egress TPU
            # image, so this errors actionably when absent.
            try:
                import tf2onnx  # noqa: F401
            except ImportError as e:
                from sar_yolo_tpu.utils.errors import ExportError
                raise ExportError(
                    "ONNX export requires `tf2onnx` (pip install tf2onnx), which "
                    "is not bundled in this image. Portable alternatives already "
                    "supported: 'stablehlo' (hardware-neutral, versioned) or "
                    "'saved_model' (TF C API / serving).") from e
            import tensorflow as tf
            from jax.experimental import jax2tf
            tf_fn = tf.function(
                jax2tf.convert(infer, with_gradient=False),
                input_signature=[tf.TensorSpec(spec_shape, tf.uint8)],
                autograph=False)
            path = out_dir / f"{stem}.onnx"
            tf2onnx.convert.from_function(
                tf_fn, input_signature=[tf.TensorSpec(spec_shape, tf.uint8)],
                opset=int(getattr(self.args, "opset", None) or 17),
                output_path=str(path))
            (out_dir / f"{stem}.onnx.json").write_text(json.dumps(sidecar))
        else:
            raise ValueError(f"Unsupported export format '{fmt}'. "
                             f"Available: {EXPORT_FORMATS}")
        LOGGER.info(f"Export complete: {path} ({time.time() - t0:.1f}s)")
        return str(path)
