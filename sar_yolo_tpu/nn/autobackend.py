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


class AutoBackend:
    """Load any supported artifact and expose one `__call__(img_u8) -> np.ndarray`."""

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
            return k in ("stablehlo", "tflite", "saved_model", "pb")
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

    def _init_stablehlo(self, p):
        import jax
        exported = jax.export.deserialize(p.read_bytes())
        self._fn = lambda img: np.asarray(exported.call(np.asarray(img, np.uint8)))

    def _init_saved_model(self, p):
        import tensorflow as tf
        module = tf.saved_model.load(str(p))
        fn = module.f if hasattr(module, "f") else module.signatures["serving_default"]
        self._fn = lambda img: np.asarray(fn(np.asarray(img, np.uint8)))

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
        out = interp.get_output_details()[0]

        def run(img):
            interp.set_tensor(inp["index"], np.asarray(img, np.uint8))
            interp.invoke()
            return interp.get_tensor(out["index"]).copy()

        self._fn = run

    # ---- uniform forward ----------------------------------------------------
    def __call__(self, img_u8) -> np.ndarray:
        """img_u8: (B, imgsz, imgsz, 3) uint8 RGB letterboxed batch."""
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
        from sar_yolo_tpu.ops.nms import non_max_suppression

        loader, _ = load_inference_source(source)
        conf = self.args.conf if self.args.conf is not None else 0.25
        for path, img, meta in loader:
            t0 = time.perf_counter()
            lb, r, (dw, dh) = letterbox(img, self.imgsz, scaleup=False)
            rgb = np.ascontiguousarray(lb[..., ::-1])[None]
            t1 = time.perf_counter()
            out = self.backend(rgb)
            t2 = time.perf_counter()
            if self.backend.with_nms:
                dets = np.asarray(out)
            else:
                import jax.numpy as jnp
                dets = np.asarray(non_max_suppression(
                    jnp.asarray(out), conf_thres=conf, iou_thres=self.args.iou,
                    max_det=self.args.max_det, nc=self.nc))
            d = dets[0]
            d = d[d[:, 4] > conf if not self.backend.with_nms else d[:, 4] > 0]
            d = d.copy()
            d[:, :4] = (d[:, :4] - np.array([dw, dh, dw, dh])) / r
            h, w = img.shape[:2]
            d[:, [0, 2]] = d[:, [0, 2]].clip(0, w)
            d[:, [1, 3]] = d[:, [1, 3]].clip(0, h)
            speed = {"preprocess": (t1 - t0) * 1e3, "inference": (t2 - t1) * 1e3,
                     "postprocess": (time.perf_counter() - t2) * 1e3}
            yield Results(img, path, self.names, boxes=d[:, :6], speed=speed)
