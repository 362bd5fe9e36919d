"""Trainer: SPMD training loop with warmup/cosine LR, EMA, checkpointing, early stop.

Capability parity with reference BaseTrainer (engine/trainer.py:58-821):
optimizer auto-selection (:760), warmup (:366-376), EMA (torch_utils.py:495),
early stopping (:713), ckpt save/resume (:513-546, :693-757), results.csv.

TPU-native redesign:
  * One jitted SPMD train_step over a jax.sharding.Mesh — the batch is sharded
    on the 'dp' axis, XLA inserts the gradient all-reduce (replaces the
    DDP subprocess + NCCL machinery of the reference, SURVEY §2.7).
  * bf16 compute / f32 params policy instead of AMP GradScaler.
  * EMA is a pytree lerp inside the step (no model copy).
  * Loss "criterion state" (JDE class-balanced EMA counts) is threaded
    functionally through TrainState.
"""

from __future__ import annotations

import math
import time
from pathlib import Path
from typing import Any, Callable

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from sar_yolo_tpu.cfg import get_cfg, get_save_dir
from sar_yolo_tpu.data import SyntheticDataset, YOLODataset, build_dataloader, check_det_dataset
from sar_yolo_tpu.nn.tasks import build_model, init_model
from sar_yolo_tpu.parallel import get_mesh, replicate, shard_batch
from sar_yolo_tpu.utils import DEFAULT_CFG, LOGGER, colorstr
from sar_yolo_tpu.utils.callbacks import HasCallbacks
from sar_yolo_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from sar_yolo_tpu.utils.loss import (detection_loss, jde_loss, obb_loss, pose_loss,
                                     segmentation_loss)


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    cb_counts: Any  # jde class-balanced state counts (zeros otherwise)
    # PRNG key threaded THROUGH the donated state and split ON DEVICE inside
    # the jitted step: a host-side jax.random.split per step is its own
    # tunneled dispatch in the sequential chain (measured ~36 ms/step on the
    # remote chip — 400 vs 515 img/s on yolov8n B=64)
    rng: Any


def build_lr_schedule(args, nb: int, lr0: float, warm_start: float = 0.0):
    """Warmup + per-epoch linear or cosine decay (reference trainer.py:309-316,
    366-376). `warm_start` is the lr at step 0 of warmup — the reference ramps
    biases from warmup_bias_lr (0.1) and everything else from 0."""
    nw = max(round(args.warmup_epochs * nb), 100) if args.warmup_epochs > 0 else 0
    lrf = args.lrf
    epochs = max(args.epochs, 1)

    def schedule(step):
        epoch_floor = jnp.floor(step / nb)
        if args.cos_lr:
            base = lrf + 0.5 * (1 - lrf) * (1 + jnp.cos(jnp.pi * jnp.minimum(epoch_floor, epochs) / epochs))
        else:
            base = jnp.maximum(1 - epoch_floor / epochs, 0) * (1.0 - lrf) + lrf
        base = lr0 * base
        if nw > 0:
            t = jnp.clip(step / nw, 0.0, 1.0)
            warm = warm_start + (base - warm_start) * t
            return jnp.where(step < nw, warm, base)
        return base

    return schedule


def _explicit_on(v) -> bool:
    """True only for an explicit opt-in spelling (auto/None are NOT on)."""
    return v in (True, "True", "true", "on", 1)


def _explicit_off(v) -> bool:
    return v in (False, "False", "false", "off", 0)


def _group_labels(params):
    """3-param-group split matching reference build_optimizer (trainer.py:784):
    pg0 = kernels (weight decay), pg1 = norm scales/other (no decay),
    pg2 = biases (no decay, warmup from warmup_bias_lr)."""
    def label(path, x):
        key = getattr(path[-1], "key", "")
        if key == "bias":
            return "bias"
        if key == "kernel" and x.ndim > 1:
            return "decay"
        return "nodecay"
    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(args, nb: int, nc: int, params):
    """Auto optimizer selection mirroring reference build_optimizer
    (trainer.py:760-821) with the 3-group warmup of reference trainer.py:366-376:
    biases ramp from warmup_bias_lr, lrs from 0, SGD momentum from
    warmup_momentum -> momentum over the warmup window."""
    iterations = args.epochs * nb
    name = args.optimizer
    lr0, momentum = args.lr0, args.momentum
    if name == "auto":
        lr_fit = round(0.002 * 5 / (4 + nc), 6)
        name, lr0, momentum = ("SGD", 0.01, 0.9) if iterations > 10000 else ("AdamW", lr_fit, 0.9)
    accumulate = max(round(args.nbs / args.batch), 1)
    wd = args.weight_decay * args.batch * accumulate / args.nbs
    # under MultiSteps the inner schedules tick once per OPTIMIZER UPDATE
    # (every `accumulate` micro-steps), so they must be built on the update
    # timeline or warmup/decay stretch by the accumulate factor
    nb_upd = max(nb // accumulate, 1)
    base_sched = build_lr_schedule(args, nb_upd, lr0)
    bias_sched = build_lr_schedule(args, nb_upd, lr0,
                                   warm_start=getattr(args, "warmup_bias_lr", 0.1))
    nw = max(round(args.warmup_epochs * nb_upd), max(round(100 / accumulate), 1)) \
        if args.warmup_epochs > 0 else 0
    wm = getattr(args, "warmup_momentum", 0.8)

    def mom_sched(step):
        if nw == 0:
            return momentum
        t = jnp.clip(step / nw, 0.0, 1.0)
        return wm + (momentum - wm) * t

    if name in {"Adam", "AdamW", "NAdam", "RAdam"}:
        def adam_group(lr_sched, group_wd):
            return optax.adamw(lr_sched, b1=momentum, b2=0.999, weight_decay=group_wd)
        groups = {"bias": adam_group(bias_sched, 0.0),
                  "decay": adam_group(base_sched, wd),
                  "nodecay": adam_group(base_sched, 0.0)}
    elif name == "RMSProp":
        def rms_group(lr_sched, group_wd):
            return optax.chain(optax.add_decayed_weights(group_wd),
                               optax.rmsprop(lr_sched, momentum=momentum))
        groups = {"bias": rms_group(bias_sched, 0.0),
                  "decay": rms_group(base_sched, wd),
                  "nodecay": rms_group(base_sched, 0.0)}
    else:  # SGD w/ nesterov + momentum warmup
        def sgd_group(lr_sched, group_wd):
            tr = optax.inject_hyperparams(
                lambda decay: optax.trace(decay=decay, nesterov=True))(decay=mom_sched)
            parts = []
            if group_wd:
                parts.append(optax.add_decayed_weights(group_wd))
            parts += [tr, optax.scale_by_schedule(lambda s: -lr_sched(s))]
            return optax.chain(*parts)
        groups = {"bias": sgd_group(bias_sched, 0.0),
                  "decay": sgd_group(base_sched, wd),
                  "nodecay": sgd_group(base_sched, 0.0)}

    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     optax.multi_transform(groups, _group_labels(params)))
    if accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate)
    LOGGER.info(f"{colorstr('optimizer:')} {name}(lr={lr0}, momentum={momentum}) wd={wd:.5f} "
                f"accumulate={accumulate} groups=(decay, nodecay, bias@{getattr(args, 'warmup_bias_lr', 0.1)})")
    schedules = {"pg0": base_sched, "pg1": base_sched, "pg2": bias_sched}
    return tx, schedules, accumulate


class BaseTrainer(HasCallbacks):
    """Generic trainer; task specialisation via loss_fn selection (task_map)."""

    def __init__(self, cfg=DEFAULT_CFG, overrides: dict | None = None, _callbacks=None):
        self.args = get_cfg(cfg, overrides)
        self.task = self.args.task
        self.init_callbacks()
        # logger integrations (tensorboard/wandb/mlflow/...): no-ops unless
        # enabled in settings.json AND importable (utils/callbacks package)
        from sar_yolo_tpu.utils.callbacks import add_integration_callbacks
        add_integration_callbacks(self)
        self.save_dir = get_save_dir(self.args)
        self.args.save_dir = str(self.save_dir)  # downstream consumers (validator json/csv)
        self.wdir = self.save_dir / "weights"
        self.csv = self.save_dir / "results.csv"
        self.best_fitness = -float("inf")  # no-val fitness is -sum(loss) < -1
        self.fitness = None
        self.epoch = 0
        self.metrics = {}
        self.validator = None

    # ------------------------------------------------------------------ setup
    def get_dataset(self):
        """Resolve args.data to (train_ds, val_ds, data_info)."""
        data = self.args.data
        use_tags = self.task == "jde"
        if data in (None, "synthetic") or str(data).startswith("synthetic"):
            nc = 3
            info = {"nc": nc, "names": {i: f"class{i}" for i in range(nc)}}
            kpt_shape = tuple(self.args.get("kpt_shape", (5, 3))) if hasattr(self.args, "get") else (5, 3)
            n_train = max(64, int(getattr(self.args, "batch", 16) or 16))
            train = SyntheticDataset(n=n_train, imgsz=self.args.imgsz, nc=nc,
                                     max_labels=self.args.max_labels, use_tags=use_tags,
                                     task=self.task, kpt_shape=kpt_shape)
            # synthetic data trains un-augmented by default (overfit proofs);
            # opt in to the device pipeline explicitly
            train.device_augment = _explicit_on(
                getattr(self.args, "device_augment", None)) \
                and self._device_augment_enabled()
            val = SyntheticDataset(n=16, imgsz=self.args.imgsz, nc=nc,
                                   max_labels=self.args.max_labels, use_tags=use_tags, seed=1,
                                   task=self.task, kpt_shape=kpt_shape)
            info["kpt_shape"] = kpt_shape
            return train, val, info
        info = check_det_dataset(data)
        kpt_shape = tuple(info.get("kpt_shape", (17, 3)))
        flip_idx = info.get("flip_idx")
        train = YOLODataset(info["train"], imgsz=self.args.imgsz, augment=True, hyp=self.args,
                            use_tags=use_tags, max_labels=self.args.max_labels,
                            single_cls=self.args.single_cls, fraction=self.args.fraction,
                            task=self.task, kpt_shape=kpt_shape, cache=self.args.cache,
                            flip_idx=flip_idx,
                            device_augment=self._device_augment_enabled())
        val = YOLODataset(info.get("val") or info["train"], imgsz=self.args.imgsz, augment=False,
                          hyp=self.args, use_tags=use_tags, max_labels=self.args.max_labels,
                          single_cls=self.args.single_cls, task=self.task, kpt_shape=kpt_shape,
                          flip_idx=flip_idx)
        return train, val, info

    def _device_augment_enabled(self) -> bool:
        """Gate for the fused on-device augmentation path (data/device_augment.py).

        The device pipeline expresses mosaic placement + affine as axis-separable
        matmuls, so it covers the DEFAULT hyp set exactly (degrees/shear/
        perspective = 0, mosaic prob 0 or 1, no copy_paste/mosaic9 — those need
        polygons or non-separable warps and stay on the host path)."""
        v = getattr(self.args, "device_augment", "auto")
        if _explicit_off(v):
            return False
        g = lambda k: float(getattr(self.args, k, 0) or 0)  # noqa: E731
        expressible = (self.task in ("detect", "jde", "pose")
                       and g("degrees") == 0 and g("shear") == 0
                       and g("perspective") == 0 and g("copy_paste") == 0
                       and g("mosaic9") == 0 and g("mosaic") in (0.0, 1.0))
        if _explicit_on(v) and not expressible:
            LOGGER.warning("device_augment=True but the hyp set needs host cv2 "
                           "(degrees/shear/perspective/copy_paste/mosaic9/fractional "
                           "mosaic or non-box task); using host augmentation")
        return expressible

    def make_loss_fn(self) -> Callable:
        """Returns loss(feats, batch, cb_counts) -> (total, items, new_cb)."""
        meta = self.meta
        strides = tuple(meta.get("strides") or ())
        if meta.get("head") == "RTDETRDecoder":
            from sar_yolo_tpu.utils.detr_loss import detr_loss
            def fn(outputs, batch, cb):
                out = detr_loss(outputs, batch, self.args, nc=meta["nc"])
                return out.total, out.items, cb
            self.loss_names = ("cls", "bbox", "giou")
            return fn
        if self.task == "jde":
            def fn(feats, batch, cb):
                out = jde_loss(feats, batch, self.args, nc=meta["nc"], reg_max=meta["reg_max"],
                               strides=strides, embed_dim=meta["embed_dim"],
                               state_classes=meta["state_classes"] or 1, cb_counts=cb)
                return out.total, out.items, out.cb_counts
            self.loss_names = ("box", "cls", "dfl", "emb", "state")
            return fn
        if self.task == "pose":
            kpt_shape = tuple(meta.get("kpt_shape", (17, 3)))
            def fn(feats, batch, cb):
                out = pose_loss(feats, batch, self.args, nc=meta["nc"], reg_max=meta["reg_max"],
                                strides=strides, kpt_shape=kpt_shape)
                return out.total, out.items, cb
            self.loss_names = ("box", "pose", "kobj", "cls", "dfl")
            return fn
        if self.task == "segment":
            def fn(feats_proto, batch, cb):
                out = segmentation_loss(feats_proto, batch, self.args, nc=meta["nc"],
                                        reg_max=meta["reg_max"], strides=strides,
                                        nm=meta.get("nm", 32))
                return out.total, out.items, cb
            self.loss_names = ("box", "seg", "cls", "dfl")
            return fn
        if self.task == "obb":
            def fn(feats, batch, cb):
                out = obb_loss(feats, batch, self.args, nc=meta["nc"],
                               reg_max=meta["reg_max"], strides=strides)
                return out.total, out.items, cb
            self.loss_names = ("box", "cls", "dfl")
            return fn
        if self.task == "classify":
            from sar_yolo_tpu.utils.loss import classification_loss
            def fn(logits, batch, cb):
                out = classification_loss(logits, batch)
                return out.total, out.items, cb
            self.loss_names = ("loss",)
            return fn
        if meta.get("head") == "v10Detect":
            # E2E dual-assignment loss (reference E2EDetectLoss loss.py:1266):
            # one2many branch topk=10 + one2one branch topk=1
            def fn(feats, batch, cb):
                m = detection_loss(feats["one2many"], batch, self.args, nc=meta["nc"],
                                   reg_max=meta["reg_max"], strides=strides, tal_topk=10)
                o = detection_loss(feats["one2one"], batch, self.args, nc=meta["nc"],
                                   reg_max=meta["reg_max"], strides=strides, tal_topk=1)
                return m.total + o.total, m.items + o.items, cb
            self.loss_names = ("box", "cls", "dfl")
            return fn
        def fn(feats, batch, cb):
            out = detection_loss(feats, batch, self.args, nc=meta["nc"], reg_max=meta["reg_max"],
                                 strides=strides)
            return out.total, out.items, cb
        self.loss_names = ("box", "cls", "dfl")
        return fn

    def _setup_train(self):
        args = self.args
        self.run_callbacks("on_pretrain_routine_start")
        self.train_set, self.val_set, self.data = self.get_dataset()
        nc = self.data["nc"] if not args.single_cls else 1

        dtype = jnp.bfloat16 if (args.half or args.amp) and jax.default_backend() == "tpu" else jnp.float32
        self.model, self.meta = build_model(args.model, nc=nc, dtype=dtype,
                                            dropout=float(args.dropout or 0.0))
        if getattr(args, "remat", False):
            # activation checkpointing: per-block rematerialization in the
            # backward (jax.checkpoint via nn.remat) — HBM for FLOPs, enabling
            # larger batch/imgsz/scale on a chip (nn/tasks.py GraphModel.remat)
            import dataclasses
            self.model = dataclasses.replace(self.model, remat=True)
            LOGGER.info("remat=True: per-block activation checkpointing "
                        "(larger batches at ~1/3 extra backward FLOPs)")
        rng = jax.random.PRNGKey(args.seed)
        variables = init_model(self.model, self.meta, rng, imgsz=args.imgsz)
        if dtype == jnp.bfloat16:
            # ≙ reference check_amp (utils/checks.py:638): verify the reduced-
            # precision forward tracks f32 before training in it; fall back if not
            from sar_yolo_tpu.utils.checks import check_bf16
            if not check_bf16(self.model, variables, imgsz=min(args.imgsz, 64)):
                LOGGER.warning("bf16 forward diverges from f32 on this model; "
                               "falling back to f32 compute (≙ AMP disabled)")
                self.model, self.meta = build_model(args.model, nc=nc, dtype=jnp.float32)
                variables = init_model(self.model, self.meta, rng, imgsz=args.imgsz)

        # 1-D [dp] or 2-D [dp, tp] mesh (tp = FSDP-style conv output-channel
        # sharding, same layout dryrun_multichip validates)
        ms = tuple(args.mesh_shape) if args.mesh_shape else None
        self.mesh = get_mesh(ms, axis_names=("dp", "tp")[:len(ms)] if ms else ("dp",))
        if args.batch == -1:  # autobatch (reference utils/autobatch.py)
            import numpy as _np
            from sar_yolo_tpu.utils.autobatch import check_train_batch_size
            n_params = int(sum(_np.prod(p.shape) for p in jax.tree.leaves(variables["params"])))
            args.batch = check_train_batch_size(n_params, args.imgsz)
        self.train_loader = build_dataloader(self.train_set, args.batch, shuffle=True,
                                             workers=args.workers, seed=args.seed)
        nb = max(len(self.train_loader), 1)
        self.nb = nb

        self.tx, self.lr_schedule, self.accumulate = build_optimizer(
            args, nb, nc, variables["params"])
        params = variables["params"]
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(params),
            ema_params=jax.tree.map(jnp.copy, params),  # distinct buffers (donation safety)
            cb_counts=jnp.zeros(self.meta.get("state_classes") or 1, jnp.float32),
            rng=jax.random.PRNGKey(args.seed + 1),
        )
        if args.resume:
            state = self._resume(state)
        tp = dict(zip(self.mesh.axis_names, self.mesh.devices.shape)).get("tp", 1)
        if tp > 1:
            # shard conv kernels' output-channel dim over tp; XLA inserts the
            # all-gathers/reduce-scatters (ZeRO-3/FSDP-style, ≙ dryrun_multichip)
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as P

            def _put(x):
                if getattr(x, "ndim", 0) == 4 and x.shape[-1] % tp == 0:
                    return jax.device_put(x, NamedSharding(self.mesh,
                                                           P(None, None, None, "tp")))
                return jax.device_put(x, NamedSharding(self.mesh, P()))

            self.state = jax.tree.map(_put, state)
        else:
            self.state = replicate(self.mesh, state)

        loss_impl = self.make_loss_fn()
        model = self.model
        is_detr = self.meta.get("head") == "RTDETRDecoder"

        # fused on-device augmentation (north star): host workers only decode +
        # letterbox; mosaic/affine/HSV/flip run inside this jit on the uint8 batch
        self._dev_aug = self._device_augment_enabled() and \
            getattr(self.train_set, "device_augment", False)
        self._mosaic_on = bool(self._dev_aug and float(args.mosaic or 0) > 0)
        aug_hyp = {k: float(getattr(args, k, 0) or 0)
                   for k in ("scale", "translate", "fliplr", "flipud",
                             "hsv_h", "hsv_s", "hsv_v", "mixup")}
        flip_idx = getattr(self.train_set, "flip_idx", None)
        if flip_idx is not None:
            aug_hyp["flip_idx"] = tuple(int(i) for i in flip_idx)
        dev_aug = self._dev_aug
        if dev_aug:
            LOGGER.info("device_augment: mosaic/affine/HSV/flip fused into the "
                        "jitted train step (host does decode+letterbox only)")

        def train_step(state: TrainState, batch, mosaic_on):
            new_rng, rng = jax.random.split(state.rng)
            if dev_aug:
                from sar_yolo_tpu.data.device_augment import device_train_augment
                rng, kaug = jax.random.split(rng)
                # dp-local mosaic partners/mixup: keeps the uint8 image gather
                # on-shard instead of all-gathering the global batch over ICI
                dp = int(self.mesh.devices.shape[0])
                span = max(batch["img"].shape[0] // max(dp, 1), 1)
                batch = device_train_augment(batch, kaug, aug_hyp, mosaic=mosaic_on,
                                             partner_span=span, dtype=dtype)

            def loss_fn(p):
                img = batch["img"]
                if img.dtype == jnp.uint8:  # device-side normalize (fused by XLA)
                    img = img.astype(jnp.float32) / 255.0
                kw = {}
                rngs = {"dropout": rng}
                if is_detr:  # contrastive denoising queries from the padded GT
                    kw["batch_gt"] = {k: batch[k] for k in ("cls", "bboxes", "mask")}
                    rngs["dn"] = jax.random.fold_in(rng, 17)
                feats, mut = model.apply(
                    {"params": p, "batch_stats": state.batch_stats}, img,
                    train=True, mutable=["batch_stats"], rngs=rngs, **kw)
                total, items, new_cb = loss_impl(feats, batch, state.cb_counts)
                return total, (items, mut["batch_stats"], new_cb)

            (total, (items, new_bs, new_cb)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            step = state.step + 1
            # EMA with decay ramp (reference ModelEMA: 0.9999 * (1 - exp(-t/2000)))
            d = 0.9999 * (1 - jnp.exp(-step.astype(jnp.float32) / 2000.0))
            new_ema = jax.tree.map(lambda e, p: e * d + (1.0 - d) * p,
                                   state.ema_params, new_params)
            new_state = state.replace(step=step, params=new_params, batch_stats=new_bs,
                                      opt_state=new_opt, ema_params=new_ema,
                                      cb_counts=new_cb, rng=new_rng)
            return new_state, total, items

        self._train_step = jax.jit(train_step, donate_argnums=(0,), static_argnums=(2,))
        self.run_callbacks("on_pretrain_routine_end")

    def _stop_trace(self, total=None):
        """Close an active jax.profiler trace (profile='trace'); safe to call
        on the exception path — an active trace must never leak past the step
        that started it (a later start_trace would raise)."""
        if not getattr(self, "_trace_dir", None):
            return
        try:
            if total is not None:
                jax.block_until_ready(total)  # flush async dispatches
            jax.profiler.stop_trace()
            LOGGER.info(f"jax.profiler trace written to {self._trace_dir} "
                        "(load with tensorboard --logdir)")
        except Exception as e:  # noqa: BLE001 — tracing is best-effort
            LOGGER.warning(f"stop_trace failed: {e}")
        self._trace_dir = None

    # ------------------------------------------------------------------ train
    def train(self):
        self._setup_train()
        args = self.args
        self.run_callbacks("on_train_start")
        LOGGER.info(f"Starting training for {args.epochs} epochs on "
                    f"{len(self.mesh.devices.flat)} device(s)...")
        t_start = time.time()
        patience = args.patience or float("inf")
        stop = False

        for epoch in range(self.epoch, args.epochs):
            self.epoch = epoch
            self.run_callbacks("on_train_epoch_start")
            # close_mosaic: disable mosaic for the final N epochs (reference trainer)
            if args.close_mosaic and epoch >= max(args.epochs - args.close_mosaic, 0) \
                    and (getattr(self.train_set, "mosaic_enabled", False) or self._mosaic_on):
                LOGGER.info("Closing dataloader mosaic")
                self.train_set.mosaic_enabled = False
                self._mosaic_on = False  # device path: one retrace, then cached
            self.train_loader.set_epoch(epoch)
            mloss = None
            n_seen = 0
            te = time.time()
            for i, batch in enumerate(self.train_loader):
                self.run_callbacks("on_train_batch_start")
                if epoch == 0 and i == 0 and args.plots:
                    try:
                        from sar_yolo_tpu.utils.plotting import plot_images
                        self.save_dir.mkdir(parents=True, exist_ok=True)
                        if "bboxes" in batch and batch["bboxes"].ndim == 3 and \
                                batch["bboxes"].shape[-1] == 4:
                            plot_images(batch, self.save_dir / "train_batch0.png")
                        lbs = getattr(self.train_set, "labels", None)
                        if lbs:  # dataset label statistics (reference plot_labels)
                            import numpy as _np

                            from sar_yolo_tpu.utils.plotting import plot_labels
                            bb = [_np.asarray(l["bboxes"], _np.float32).reshape(-1, 4)[:, :4]
                                  for l in lbs if len(l.get("bboxes", ()))]
                            cc = [_np.asarray(l["cls"]).reshape(-1)
                                  for l in lbs if len(l.get("bboxes", ()))]
                            if bb:
                                plot_labels(_np.concatenate(bb), _np.concatenate(cc),
                                            names=self.data.get("names"),
                                            save_dir=self.save_dir)
                    except Exception as e:  # noqa: BLE001 — plotting is best-effort
                        LOGGER.warning(f"plot_images failed: {e}")
                if args.multi_scale:
                    batch = self._multi_scale(batch, i)
                # profile=trace (SURVEY §5.1: the reference's torch-profiler
                # hooks map to jax.profiler): capture steps 1-3 of epoch 0
                # (post-compile; step 0 when the epoch has a single batch)
                # into a tensorboard/xprof-loadable trace dir.
                if str(getattr(args, "profile", False)).lower() == "trace" \
                        and epoch == 0 and not getattr(self, "_trace_done", False) \
                        and (i == 1 or len(self.train_loader) <= 1):
                    self._trace_dir = str(self.save_dir / "trace")
                    self._trace_done = True  # one capture per run
                    jax.profiler.start_trace(self._trace_dir)
                try:
                    batch = shard_batch(self.mesh, batch)
                    self.state, total, items = self._train_step(
                        self.state, batch, self._mosaic_on)
                except BaseException:
                    self._stop_trace(total=None)  # never leak an active trace
                    raise
                if getattr(self, "_trace_dir", None) and i >= 3:
                    self._stop_trace(total)
                # accumulate the loss items ON DEVICE (async dispatch) — a
                # per-step np.asarray would block the host on the device fetch
                # and stall dispatch of step i+1 by one tunnel round-trip
                # (bench.py documents the identical accumulator pattern)
                mloss = items if mloss is None else mloss + items
                n_seen += 1
                self.run_callbacks("on_train_batch_end")
            if getattr(self, "_trace_dir", None):  # <4-batch epoch: close out
                self._stop_trace(total)
            mloss = np.asarray(mloss) / max(n_seen, 1) if mloss is not None else None
            # schedules live on the optimizer-update timeline (see build_optimizer)
            step_now = int(self.state.step) // max(self.accumulate, 1)
            lr_now = float(self.lr_schedule["pg0"](step_now))
            self.lr = {"lr/pg0": lr_now,
                       "lr/pg1": float(self.lr_schedule["pg1"](step_now)),
                       "lr/pg2": float(self.lr_schedule["pg2"](step_now))}
            losses = {f"train/{k}": float(v) for k, v in zip(self.loss_names, mloss)}
            LOGGER.info(f"epoch {epoch + 1}/{args.epochs}  " +
                        "  ".join(f"{k.split('/')[1]}={v:.4f}" for k, v in losses.items()) +
                        f"  lr={lr_now:.5f}  {time.time() - te:.1f}s")
            self.run_callbacks("on_train_epoch_end")

            # validation + fitness
            self.metrics = dict(losses)
            if args.val and self.validator is not None:
                vmetrics = self.validate()
                self.metrics.update(vmetrics)
                self.fitness = vmetrics.get("fitness", -float(sum(mloss)))
            else:
                self.fitness = -float(sum(mloss))
            if self.fitness > self.best_fitness:
                self.best_fitness = self.fitness
                improved = True
            else:
                improved = False
            self._save_csv_row(epoch, losses, lr_now)
            if args.save:
                self.save_model(improved)
            self.run_callbacks("on_fit_epoch_end")

            if improved:
                self._last_improve = epoch
            elif epoch - getattr(self, "_last_improve", 0) >= patience:
                LOGGER.info(f"EarlyStopping: no improvement in {patience} epochs")
                stop = True
            if args.time and (time.time() - t_start) / 3600 > args.time:
                stop = True
            if stop:
                break

        if args.plots:
            try:
                from sar_yolo_tpu.utils.plotting import plot_results
                plot_results(self.csv)
            except Exception as e:  # noqa: BLE001
                LOGGER.warning(f"plot_results failed: {e}")
        self.run_callbacks("on_train_end")
        LOGGER.info(f"Training complete in {(time.time() - t_start) / 3600:.3f} hours; "
                    f"results saved to {self.save_dir}")
        return self.metrics

    def _multi_scale(self, batch, i):
        """Multi-scale training (reference trainer.py preprocess_batch): resize
        the whole batch to a random stride-multiple in [0.5, 1.5] * imgsz.

        XLA note: each distinct size compiles its own train-step executable;
        sizes are quantized to grid-stride multiples so the executable count is
        bounded (~20) and amortizes after the first epoch. Boxes are
        normalized, so labels need no rescale.
        """
        import cv2
        gs = max(int(max(self.meta.get("strides") or [32])), 32)
        if not hasattr(self, "_ms_rng"):
            self._ms_rng = np.random.default_rng(self.args.seed + 7)
            self._ms_warned = False
        imgsz = self.args.imgsz
        sz = int(self._ms_rng.integers(int(imgsz * 0.5), int(imgsz * 1.5) + gs)
                 // gs * gs)
        if sz == batch["img"].shape[1]:
            return batch
        if not self._ms_warned:
            LOGGER.info("multi_scale: one XLA executable per distinct size "
                        "(bounded by the stride grid)")
            self._ms_warned = True
        imgs = np.stack([cv2.resize(im, (sz, sz), interpolation=cv2.INTER_LINEAR)
                         for im in np.asarray(batch["img"])])
        out = dict(batch)
        out["img"] = imgs
        if "masks" in out and out["masks"].ndim == 3:  # seg overlap maps track /4
            ms = sz // 4
            out["masks"] = np.stack([cv2.resize(m, (ms, ms),
                                                interpolation=cv2.INTER_NEAREST)
                                     for m in np.asarray(out["masks"])])
        return out

    def validate(self) -> dict:
        """Run the attached validator with EMA params."""
        variables = {"params": self.state.ema_params, "batch_stats": self.state.batch_stats}
        return self.validator(model=self.model, variables=variables, meta=self.meta,
                              dataset=self.val_set, args=self.args, data=self.data)

    # -------------------------------------------------------------- persist
    def save_model(self, improved: bool):
        self.wdir.mkdir(parents=True, exist_ok=True)
        payload = {
            "params": jax.device_get(self.state.params),
            "ema_params": jax.device_get(self.state.ema_params),
            "batch_stats": jax.device_get(self.state.batch_stats),
            "cb_counts": jax.device_get(self.state.cb_counts),
            # optimizer moments + MultiSteps/schedule counters: without these a
            # resumed run restarts warmup and zeroes momentum (ref resume keeps
            # the torch optimizer state dict). Stored as an indexed flat-leaf
            # dict — optax states are nested namedtuples whose field order a
            # plain-pytree round-trip would not preserve.
            "opt_state": {f"l{i:05d}": jax.device_get(x) for i, x in
                          enumerate(jax.tree.leaves(self.state.opt_state))},
        }
        metadata = {
            "epoch": self.epoch,
            "best_fitness": float(self.best_fitness),
            "train_args": dict(self.args),
            "model_yaml": self.meta["yaml"],
            "task": self.task,
            "nc": self.meta["nc"],
            "strides": self.meta["strides"],
            "step": int(self.state.step),
        }
        save_checkpoint(self.wdir / "last", payload, metadata)
        if improved:
            save_checkpoint(self.wdir / "best", payload, metadata)
        if self.args.save_period > 0 and (self.epoch + 1) % self.args.save_period == 0:
            save_checkpoint(self.wdir / f"epoch{self.epoch + 1}", payload, metadata)
        self.run_callbacks("on_model_save")

    def _resume(self, state: TrainState) -> TrainState:
        path = self.args.resume if isinstance(self.args.resume, (str, Path)) else self.wdir / "last"
        payload, metadata = load_checkpoint(path)
        self.epoch = int(metadata.get("epoch", -1)) + 1
        self.best_fitness = float(metadata.get("best_fitness", -float("inf")))
        LOGGER.info(f"Resumed from {path} at epoch {self.epoch}")
        opt_state = state.opt_state
        saved_opt = payload.get("opt_state")
        if saved_opt is not None:
            # graft the indexed flat leaves back onto the fresh opt_state
            # skeleton (leaf order is pinned by the l{i} keys at save time)
            leaves = [saved_opt[k] for k in sorted(saved_opt)]
            skel_leaves, treedef = jax.tree.flatten(opt_state)
            if len(skel_leaves) == len(leaves) and all(
                    getattr(a, "shape", None) == getattr(b, "shape", None)
                    for a, b in zip(skel_leaves, leaves)):
                opt_state = jax.tree.unflatten(treedef, leaves)
            else:
                LOGGER.warning("resume: optimizer state structure changed; "
                               "momentum/schedule counters start fresh")
        else:
            LOGGER.warning("resume: checkpoint has no optimizer state (older "
                           "format); momentum/schedule counters start fresh")
        return state.replace(
            params=payload["params"], ema_params=payload["ema_params"],
            batch_stats=payload["batch_stats"], cb_counts=payload["cb_counts"],
            opt_state=opt_state,
            step=jnp.asarray(metadata.get("step", 0), jnp.int32))

    def _save_csv_row(self, epoch: int, losses: dict, lr: float):
        self.save_dir.mkdir(parents=True, exist_ok=True)
        row = {"epoch": epoch, **losses, **{k: v for k, v in self.metrics.items()
                                            if not k.startswith("train/")}, "lr": lr}
        header = not self.csv.exists()
        with self.csv.open("a") as f:
            if header:
                f.write(",".join(row.keys()) + "\n")
            f.write(",".join(f"{v:.6g}" if isinstance(v, float) else str(v)
                             for v in row.values()) + "\n")


class DetectionTrainer(BaseTrainer):
    """Detect-task trainer (validator attached lazily to avoid import cycle)."""

    def __init__(self, cfg=DEFAULT_CFG, overrides=None, _callbacks=None):
        overrides = dict(overrides or {})
        overrides.setdefault("task", "detect")
        super().__init__(cfg, overrides, _callbacks)
        from sar_yolo_tpu.engine.validator import DetectionValidator
        self.validator = DetectionValidator()


class JDETrainer(BaseTrainer):
    """JDE-task trainer: 5-part loss, tags pipeline."""

    def __init__(self, cfg=DEFAULT_CFG, overrides=None, _callbacks=None):
        overrides = dict(overrides or {})
        overrides["task"] = "jde"
        super().__init__(cfg, overrides, _callbacks)
        from sar_yolo_tpu.engine.validator import JDEValidator
        self.validator = JDEValidator()


class PoseTrainer(BaseTrainer):
    """Pose-task trainer: box + OKS keypoint + visibility loss."""

    def __init__(self, cfg=DEFAULT_CFG, overrides=None, _callbacks=None):
        overrides = dict(overrides or {})
        overrides["task"] = "pose"
        super().__init__(cfg, overrides, _callbacks)
        from sar_yolo_tpu.engine.validator import PoseValidator
        self.validator = PoseValidator()


class SegmentTrainer(BaseTrainer):
    """Segment-task trainer: box + prototype mask loss."""

    def __init__(self, cfg=DEFAULT_CFG, overrides=None, _callbacks=None):
        overrides = dict(overrides or {})
        overrides["task"] = "segment"
        super().__init__(cfg, overrides, _callbacks)
        from sar_yolo_tpu.engine.validator import SegmentValidator
        self.validator = SegmentValidator()


class ClassificationTrainer(BaseTrainer):
    """Classify-task trainer: cross-entropy over GAP logits."""

    def __init__(self, cfg=DEFAULT_CFG, overrides=None, _callbacks=None):
        overrides = dict(overrides or {})
        overrides["task"] = "classify"
        super().__init__(cfg, overrides, _callbacks)
        from sar_yolo_tpu.engine.validator import ClassificationValidator
        self.validator = ClassificationValidator()

    def get_dataset(self):
        """ImageNet-folder datasets: data=<root> with train/ and val|test/
        class-folder splits (reference ClassificationDataset data/dataset.py:412)."""
        from pathlib import Path as _P
        data = self.args.data
        if data and _P(str(data)).is_dir():
            from sar_yolo_tpu.data.dataset import ClassificationDataset
            root = _P(str(data))
            train_dir = root / "train" if (root / "train").is_dir() else root
            val_dir = next((root / s for s in ("val", "test")
                            if (root / s).is_dir()), train_dir)
            train = ClassificationDataset(train_dir, imgsz=self.args.imgsz,
                                          augment=True, hyp=self.args)
            val = ClassificationDataset(val_dir, imgsz=self.args.imgsz, augment=False)
            info = {"nc": len(train.names), "names": train.names}
            return train, val, info
        return super().get_dataset()


class OBBTrainer(BaseTrainer):
    """OBB-task trainer: rotated assigner + probiou loss."""

    def __init__(self, cfg=DEFAULT_CFG, overrides=None, _callbacks=None):
        overrides = dict(overrides or {})
        overrides["task"] = "obb"
        super().__init__(cfg, overrides, _callbacks)
        from sar_yolo_tpu.engine.validator import OBBValidator
        self.validator = OBBValidator()


class RTDETRTrainer(BaseTrainer):
    """RT-DETR trainer: Hungarian-matched DETR loss (models/rtdetr/train.py parity)."""

    def __init__(self, cfg=DEFAULT_CFG, overrides=None, _callbacks=None):
        overrides = dict(overrides or {})
        overrides.setdefault("task", "detect")
        super().__init__(cfg, overrides, _callbacks)
        from sar_yolo_tpu.engine.validator import RTDETRValidator
        self.validator = RTDETRValidator()
