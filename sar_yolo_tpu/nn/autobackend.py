"""AutoBackend: uniform inference over exported artifacts.

Capability parity with reference nn/autobackend.py:159-660 (one forward() across
13 runtimes chosen by file suffix). TPU-native formats:

  * orbax checkpoint dir      -> native jit (build_model + variables)
  * .stablehlo                -> jax.export.deserialize; runs on any XLA backend
  * *_saved_model dir         -> tf.saved_model.load (TF runtime)
  * .tflite                   -> tf.lite.Interpreter (edge runtime)

Every exported artifact carries a JSON metadata sidecar (imgsz, nc, names,
task, with_nms) written by the Exporter — the analog of the reference's
embedded metadata.yaml. `AutoBackend(path)(img_u8)` returns numpy
(B, N, 4+nc+E) raw preds or (B, max_det, 6+E) dets when the artifact embeds NMS.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np


def _load_sidecar(path: Path) -> dict:
    for cand in (path.with_suffix(path.suffix + ".json"),
                 path.parent / (path.name + ".json"),
                 path / "metadata.json" if path.is_dir() else path):
        try:
            if Path(cand).is_file():
                return json.loads(Path(cand).read_text())
        except Exception:
            continue
    return {}


def _squeeze_outs(out):
    """Normalize backend returns: one array -> np.ndarray, many -> list."""
    if isinstance(out, (list, tuple)):
        arrs = [np.asarray(o) for o in out]
        return arrs[0] if len(arrs) == 1 else arrs
    return np.asarray(out)


class AutoBackend:
    """Load any supported artifact and expose one `__call__(img_u8)` returning
    np array(s)."""

    def __init__(self, weights: str | Path):
        p = Path(weights)
        self.path = p
        self.meta = _load_sidecar(p)
        self.kind = self._detect_kind(p)
        getattr(self, f"_init_{self.kind}")(p)

    @staticmethod
    def _detect_kind(p: Path) -> str:
        s = p.name.lower()
        if s.endswith(".stablehlo"):
            return "stablehlo"
        if s.endswith(".tflite"):
            return "tflite"
        if s.endswith(".pb"):
            return "pb"
        if s.endswith(".onnx"):
            return "onnx"
        if p.is_dir() and (p / "saved_model.pb").exists():
            return "saved_model"
        from sar_yolo_tpu.utils.checkpoint import is_checkpoint
        if is_checkpoint(p):
            return "native"
        raise ValueError(f"unrecognized model artifact: {p}")

    @staticmethod
    def is_exported_artifact(p) -> bool:
        try:
            k = AutoBackend._detect_kind(Path(p))
            return k in ("stablehlo", "tflite", "saved_model", "pb", "onnx")
        except Exception:
            return False

    # ---- per-backend init ---------------------------------------------------
    def _init_native(self, p):
        import jax
        from sar_yolo_tpu.nn.tasks import build_model
        from sar_yolo_tpu.ops.decode import decode_detect
        from sar_yolo_tpu.utils.checkpoint import load_checkpoint
        payload, metadata = load_checkpoint(p)
        self.meta = {**metadata, **self.meta}
        model, mmeta = build_model(metadata["model_yaml"], nc=metadata.get("nc"))
        mmeta["strides"] = metadata.get("strides") or mmeta.get("strides")
        variables = {"params": payload["ema_params"] or payload["params"],
                     "batch_stats": payload["batch_stats"]}

        @jax.jit
        def infer(img_u8):
            import jax.numpy as jnp
            x = img_u8.astype(jnp.float32) / 255.0
            feats = model.apply(variables, x, train=False)
            return decode_detect(feats, tuple(mmeta["strides"]), mmeta["nc"],
                                 mmeta["reg_max"],
                                 extra_sigmoid=mmeta.get("state_classes") or 0)

        self._fn = lambda img: np.asarray(infer(img))
        self.meta.setdefault("with_nms", False)
        self.meta.setdefault("nc", mmeta["nc"])

    def _init_onnx(self, p):
        # onnxruntime when available (reference autobackend onnx branch);
        # otherwise the in-repo numpy reference runtime executes the artifact
        try:
            import onnxruntime  # noqa: F401
            sess = onnxruntime.InferenceSession(str(p))
            iname = sess.get_inputs()[0].name
            # keep ALL session outputs (a segment artifact is preds+protos;
            # dropping to [0] broke _post_segment's 2-tuple unpack — r4 advisor)
            self._fn = lambda img: _squeeze_outs(
                sess.run(None, {iname: np.asarray(img, np.uint8)}))
        except ImportError:
            from sar_yolo_tpu.export.onnx_runtime import OnnxReferenceRuntime
            rt = OnnxReferenceRuntime(str(p))
            self._fn = lambda img: _squeeze_outs(rt(np.asarray(img, np.uint8)))

    def _init_stablehlo(self, p):
        import jax
        exported = jax.export.deserialize(p.read_bytes())
        self._fn = lambda img: _squeeze_outs(exported.call(np.asarray(img, np.uint8)))

    def _init_saved_model(self, p):
        import tensorflow as tf
        module = tf.saved_model.load(str(p))
        fn = module.f if hasattr(module, "f") else module.signatures["serving_default"]
        self._fn = lambda img: _squeeze_outs(fn(np.asarray(img, np.uint8)))

    def _init_pb(self, p):
        # frozen GraphDef (reference autobackend wrap_frozen_graph path)
        import tensorflow as tf
        gd = tf.compat.v1.GraphDef()
        gd.ParseFromString(p.read_bytes())

        def _imports():
            tf.compat.v1.import_graph_def(gd, name="")

        wrapped = tf.compat.v1.wrap_function(_imports, [])
        inputs = self.meta.get("inputs") or ["args_tf_0:0"]
        outputs = self.meta.get("outputs") or ["Identity:0"]
        fn = wrapped.prune(
            tf.nest.map_structure(wrapped.graph.as_graph_element, inputs[0]),
            tf.nest.map_structure(wrapped.graph.as_graph_element, outputs[0]))
        self._fn = lambda img: np.asarray(fn(tf.constant(np.asarray(img, np.uint8))))

    def _init_tflite(self, p):
        import tensorflow as tf
        interp = tf.lite.Interpreter(model_path=str(p))
        interp.allocate_tensors()
        inp = interp.get_input_details()[0]
        outs = interp.get_output_details()

        def run(img):
            interp.set_tensor(inp["index"], np.asarray(img, np.uint8))
            interp.invoke()
            return _squeeze_outs([interp.get_tensor(o["index"]).copy()
                                  for o in outs])

        self._fn = run

    # ---- uniform forward ----------------------------------------------------
    def __call__(self, img_u8):
        """img_u8: (B, imgsz, imgsz, 3) uint8 RGB letterboxed batch.

        Returns one np array, or a list of arrays for multi-output artifacts
        (segment: preds+protos / dets+masks).
        """
        return self._fn(img_u8)

    def warmup(self, imgsz: int | None = None):
        s = int(imgsz or self.meta.get("imgsz", 640))
        b = int((self.meta.get("input_shape") or [1])[0] or 1)
        self(np.zeros((b, s, s, 3), np.uint8))
        return self

    @property
    def with_nms(self) -> bool:
        return bool(self.meta.get("with_nms", False))


class BackendPredictor:
    """Predictor over an AutoBackend artifact: host letterbox (fixed input
    signature — exported graphs can't retrace per geometry) + backend forward +
    our device NMS when the artifact ships raw preds.

    Mirrors the reference flow where BasePredictor always talks to AutoBackend
    (engine/predictor.py:306 setup_model).
    """

    def __init__(self, backend: AutoBackend, args, names=None):
        self.backend = backend
        self.args = args
        meta = backend.meta
        self.imgsz = int(meta.get("imgsz") or
                         (args.imgsz if isinstance(args.imgsz, int) else args.imgsz[0]))
        self.nc = int(meta.get("nc", 80))
        nm = meta.get("names")
        self.names = ({int(k): v for k, v in nm.items()} if isinstance(nm, dict)
                      else {i: f"c{i}" for i in range(self.nc)})

    def __call__(self, source, stream: bool = False):
        gen = self._stream(source)
        return gen if stream else list(gen)

    def _stream(self, source):
        import time

        from sar_yolo_tpu.data.augment import letterbox
        from sar_yolo_tpu.data.loaders import load_inference_source
        from sar_yolo_tpu.engine.results import Results

        loader, _ = load_inference_source(source)
        conf = self.args.conf if self.args.conf is not None else 0.25
        task = self.backend.meta.get("task") or "detect"
        for path, img, meta in loader:
            t0 = time.perf_counter()
            lb, r, (dw, dh) = letterbox(img, self.imgsz, scaleup=False)
            rgb = np.ascontiguousarray(lb[..., ::-1])[None]
            t1 = time.perf_counter()
            out = self.backend(rgb)
            t2 = time.perf_counter()
            res = self._postprocess(task, out, img, path, conf, r, (dw, dh))
            res.speed = {"preprocess": (t1 - t0) * 1e3,
                         "inference": (t2 - t1) * 1e3,
                         "postprocess": (time.perf_counter() - t2) * 1e3}
            yield res

    # ---- per-task postprocess (mirrors the native predictors above each) ----
    def _postprocess(self, task, out, img, path, conf, r, pad):
        from sar_yolo_tpu.engine.results import Results
        if task == "classify":
            return Results(img, path, self.names, probs=np.asarray(out)[0])
        if task == "segment":
            return self._post_segment(out, img, path, conf, r, pad)
        dets, masks = self._nms_if_raw(task, out, conf), None
        d = dets[0]
        d = d[d[:, 5 if task == "obb" else 4] >
              (0 if self.backend.with_nms else conf)].copy()
        h, w = img.shape[:2]
        dw, dh = pad
        if task == "obb":  # rows [cx, cy, w, h, r, conf, cls]
            d[:, :2] = (d[:, :2] - np.array([dw, dh])) / r
            d[:, 2:4] = d[:, 2:4] / r
            res = Results(img, path, self.names)
            res.obb = d
            return res
        d[:, :4] = (d[:, :4] - np.array([dw, dh, dw, dh])) / r
        d[:, [0, 2]] = d[:, [0, 2]].clip(0, w)
        d[:, [1, 3]] = d[:, [1, 3]].clip(0, h)
        if task == "pose":
            K, D = self.backend.meta.get("kpt_shape") or (17, 3)
            kpts = d[:, 6:6 + K * D].reshape(-1, K, D)
            kpts[..., :2] = (kpts[..., :2] - np.array([dw, dh])) / r
            return Results(img, path, self.names, boxes=d[:, :6], keypoints=kpts)
        if task == "jde":
            ed = int(self.backend.meta.get("embed_dim") or 0)
            sc = int(self.backend.meta.get("state_classes") or 0)
            states = d[:, 6 + ed:6 + ed + sc].argmax(-1) if sc else None
            return Results(img, path, self.names, boxes=d[:, :6],
                           embeds=d[:, 6:6 + ed] if ed else None,
                           person_states=states)
        return Results(img, path, self.names, boxes=d[:, :6])

    def _nms_if_raw(self, task, out, conf):
        if self.backend.with_nms:
            return np.asarray(out)
        import jax.numpy as jnp

        from sar_yolo_tpu.ops.nms import (non_max_suppression,
                                          non_max_suppression_rotated)
        fn = non_max_suppression_rotated if task == "obb" else non_max_suppression
        return np.asarray(fn(jnp.asarray(out), conf_thres=conf,
                             iou_thres=self.args.iou,
                             max_det=self.args.max_det, nc=self.nc))

    def _post_segment(self, out, img, path, conf, r, pad):
        from sar_yolo_tpu.engine.results import Results
        a, b = out
        if a.ndim != 3:  # (dets|preds) is the rank-3 output
            a, b = b, a
        if self.backend.with_nms:
            dets, masks = np.asarray(a), np.asarray(b)
            keep_col, thr = 4, 0.0
        else:
            import jax
            import jax.numpy as jnp

            from sar_yolo_tpu.ops.masks import process_mask
            from sar_yolo_tpu.ops.nms import non_max_suppression
            dets_j = non_max_suppression(jnp.asarray(a), conf_thres=conf,
                                         iou_thres=self.args.iou,
                                         max_det=self.args.max_det, nc=self.nc)
            H = self.imgsz
            masks = np.asarray(jax.vmap(lambda p, dd: process_mask(
                p, dd[:, 6:], dd[:, :4], (H, H)))(jnp.asarray(b), dets_j))
            dets = np.asarray(dets_j)
            keep_col, thr = 4, conf
        d = dets[0]
        keep = d[:, keep_col] > thr
        d = d[keep].copy()
        dw, dh = pad
        h, w = img.shape[:2]
        d[:, :4] = (d[:, :4] - np.array([dw, dh, dw, dh])) / r
        d[:, [0, 2]] = d[:, [0, 2]].clip(0, w)
        d[:, [1, 3]] = d[:, [1, 3]].clip(0, h)
        return Results(img, path, self.names, boxes=d[:, :6], masks=masks[0][keep])
