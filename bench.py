"""Benchmark: end-to-end detection throughput (letterbox + forward + decode + NMS)
plus TRAIN-step throughput (device-augment + fwd + bwd + optimizer + EMA).

Output protocol (crash-proof by construction):
  stdout carries ONLY JSON result lines. The HEADLINE line is printed and
  flushed the moment the yolov8n e2e number exists — before any extra is even
  attempted. After each extra completes, the FULL line (headline + extras so
  far) is re-printed, so the last complete JSON line on stdout always holds
  the maximum information available at the moment the process dies, times
  out, or finishes. All package logging is rerouted to stderr.

Round-4 lesson (VERDICT.md Weak #1): the previous layout printed one line at
the very end, after five whole-program compiles; a driver timeout (rc=124)
captured ZERO numbers. Now a timeout after the first measurement still yields
the headline, and each extra is guarded by a wall-clock budget: an extra is
only STARTED if enough budget remains, so a slow compile can push past the
budget but never begins past it.

Headline = the BASELINE.json north-star metric — end-to-end images/sec/chip at
640px on yolov8n, where "end-to-end" really means it: raw RAGGED uint8 frames
(480x640, video-camera geometry) are letterboxed to 640x640 ON DEVICE inside
the same jit as the model + NMS (cv2-parity bilinear, ops/preprocess.py),
weights run in bfloat16 on TPU.

"extra" adds: sustained TRAIN img/s/chip at 640px for yolov8n and the flagship
yolov13n-JDE (the real jitted SPMD train step from engine/trainer.py with the
fused on-device mosaic/affine/HSV/flip augmentation of data/device_augment.py),
flagship JDE e2e inference throughput, and MFU (achieved TFLOP/s over the
chip's bf16 peak) for the headline configs.

`vs_baseline` compares against an A100 TensorRT-FP16 class figure for yolov8n
end-to-end batched inference (~1150 img/s — public TRT benchmark class, the
target named in BASELINE.md; the reference repo itself publishes no numbers,
only an unverified 6.85 img/s code comment we no longer use).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_TRT_E2E_IMGS_PER_SEC = 1150.0  # A100 TensorRT-FP16 batched e2e class figure

# Total wall-clock budget for the EXTRAS (seconds). The headline is never
# budgeted — it always runs. Extras are started oldest-first while
# elapsed < budget; anything not started is reported as "skipped: budget".
EXTRAS_BUDGET_S = 700.0

_T_START = time.perf_counter()
_RESULT: dict = {}


def _emit():
    """Print the current best-known full result line to stdout and flush.

    Called after the headline and again after every completed extra: the last
    JSON line on stdout is always the richest consistent snapshot.
    """
    print(json.dumps(_RESULT), flush=True)


def _elapsed() -> float:
    return time.perf_counter() - _T_START


def bench_train(model_yaml: str, task: str, B: int, imgsz: int = 640,
                n_iter: int = 12) -> float:
    """Sustained train-step img/s: the trainer's own jitted SPMD step (donated
    state threading makes the chain sequential; one scalar fetch at the end
    forces everything through the remote-device tunnel)."""
    from sar_yolo_tpu.engine.trainer import DetectionTrainer, JDETrainer
    from sar_yolo_tpu.parallel import shard_batch
    cls = JDETrainer if task == "jde" else DetectionTrainer
    # copy_paste=0 keeps the hyp set device-expressible (trainer falls back to
    # host cv2 augmentation otherwise — see _device_augment_enabled)
    # nbs=B -> accumulate=1: every timed step applies the optimizer, so the
    # number is comparable across models regardless of their bench batch size
    tr = cls(overrides=dict(model=model_yaml, data="synthetic", imgsz=imgsz,
                            batch=B, epochs=2, workers=1, val=False, save=False,
                            plots=False, device_augment=True, max_labels=64,
                            copy_paste=0.0, mesh_shape=[1], nbs=B))
    tr._setup_train()
    batch = next(iter(tr.train_loader))
    batch = shard_batch(tr.mesh, batch)  # device-resident raw uint8 tiles
    # the PRNG key lives in the donated TrainState and is split ON DEVICE each
    # step — the whole step is ONE dispatch (a host-side split per step costs
    # its own tunneled dispatch: measured 400 vs 515 img/s on yolov8n)
    state, total, _ = tr._train_step(tr.state, batch, tr._mosaic_on)
    float(total)  # compile + settle
    # second warm-up: the first call's OUTPUT shardings (GSPMD) can differ from
    # the trainer-made inputs (NamedSharding) -> one more compile on call 2;
    # without this the recompile lands INSIDE the timed loop (measured 62 vs
    # 515 img/s on yolov8n)
    state, total, _ = tr._train_step(state, batch, tr._mosaic_on)
    float(total)
    t0 = time.perf_counter()
    for i in range(n_iter):
        state, total, _ = tr._train_step(state, batch, tr._mosaic_on)
    float(total)  # forces the whole sequential chain
    dt = time.perf_counter() - t0
    return B * n_iter / dt


def bench_jde_e2e(B: int, imgsz: int = 640, n_iter: int = 20,
                  yaml_name: str = "yolov13n-JDE.yaml",
                  src_hw: tuple = (480, 640)) -> float:
    """Flagship yolov13n-JDE end-to-end inference: device letterbox + bf16
    fused forward + JDE decode (boxes/conf/emb/state) + NMS."""
    import dataclasses

    from sar_yolo_tpu.nn.fuse import fuse
    from sar_yolo_tpu.nn.tasks import build_model, init_model
    from sar_yolo_tpu.ops.decode import decode_detect
    from sar_yolo_tpu.ops.nms import non_max_suppression
    from sar_yolo_tpu.ops.preprocess import letterbox_device

    model, meta = build_model(yaml_name)
    variables = init_model(model, meta, jax.random.PRNGKey(0), imgsz=imgsz)
    model, variables = fuse(model, variables)
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        model = dataclasses.replace(model, dtype=jnp.bfloat16)
        variables = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            variables)
    strides = tuple(meta["strides"])
    nc = meta["nc"]

    @jax.jit
    def e2e(variables, frames_u8, acc):
        dt = jnp.bfloat16 if on_tpu else jnp.float32

        def prep(f):
            # identity-r letterbox: uint8 pad, cast+/255 fuse into the conv
            lb, _, _ = letterbox_device(f[..., ::-1], imgsz, dtype=dt)
            return lb / jnp.asarray(255.0, dt)
        x = jax.vmap(prep)(frames_u8)
        feats = model.apply(variables, x, train=False)
        feats = [f.astype(jnp.float32) for f in feats]
        # JDE level maps carry [box64, cls, emb256, state6]; the raw 256-d
        # embeddings stay OUT of the (B, N)-wide decode/NMS traffic (bank
        # path, ops/nms.py) and are gathered per kept detection after NMS
        preds, bank = decode_detect(feats, strides, nc, meta["reg_max"],
                                    extra_sigmoid=meta["state_classes"] or 0,
                                    split_extras=meta["embed_dim"])
        dets = non_max_suppression(preds, conf_thres=0.25, iou_thres=0.7,
                                   max_det=300, pre_topk=512, nc=nc,
                                   extras_bank=bank)
        return acc + jnp.sum(dets)

    rng = np.random.default_rng(0)
    img = jnp.asarray(
        rng.integers(0, 255, (B, src_hw[0], src_hw[1], 3), dtype=np.uint8))
    acc = jnp.zeros((), jnp.float32)
    float(e2e(variables, img, acc))  # compile + settle
    t0 = time.perf_counter()
    for _ in range(n_iter):
        acc = e2e(variables, img, acc)
    float(acc)
    dt = time.perf_counter() - t0
    ips = B * n_iter / dt
    try:  # MFU sidecar (B=1 fwd cost analysis; persistent-cache cheap)
        from sar_yolo_tpu.utils.mfu import chip_peak_bf16_tflops, model_fwd_gflops
        g = model_fwd_gflops(model, variables, meta, imgsz)
        peak = chip_peak_bf16_tflops()
        if g and peak:
            _RESULT["extra"][f"jde_mfu_{imgsz}px"] = {
                "gflops_per_img": round(g, 2),
                "mfu_pct": round(100.0 * ips * g / 1e3 / peak, 1)}
    except Exception:  # noqa: BLE001
        pass
    return ips


def main():
    # Persistent XLA compile cache: the bench is compile-dominated; a primed
    # cache (the builder runs bench.py in-round) makes the driver's run hit
    # warm cache and keeps it well inside its timeout.
    import os
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # stdout is the JSON result channel: reroute all package logging to stderr
    # so a driver tail/parse always lands on a result line (VERDICT r4 Weak #1).
    import logging
    from sar_yolo_tpu.utils import LOGGER
    for h in list(LOGGER.handlers):
        LOGGER.removeHandler(h)
    _h = logging.StreamHandler(sys.stderr)
    LOGGER.addHandler(_h)

    from sar_yolo_tpu.nn.tasks import build_model, init_model
    from sar_yolo_tpu.ops.decode import decode_detect
    from sar_yolo_tpu.ops.nms import non_max_suppression
    from sar_yolo_tpu.ops.preprocess import letterbox_device

    import dataclasses

    from sar_yolo_tpu.nn.fuse import fuse

    imgsz = 640
    src_h, src_w = 480, 640  # ragged camera geometry; letterbox runs on device
    model, meta = build_model("yolov8n.yaml")
    variables = init_model(model, meta, jax.random.PRNGKey(0), imgsz=imgsz)
    # deploy-time BN fold (exact algebraic refold at f32, nn/fuse.py): removes
    # every BatchNorm op from the traced program — measured 1.79x on the bf16
    # forward (BN breaks XLA's conv epilogue fusions; see PROFILE.md)
    model, variables = fuse(model, variables)
    strides = tuple(meta["strides"])
    nc = meta["nc"]
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # bf16 weights AND compute: halves HBM weight traffic, doubles MXU rate
        model = dataclasses.replace(model, dtype=jnp.bfloat16)
        variables = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            variables)

    @jax.jit
    def e2e(variables, frames_u8, acc):
        # device-side preprocess: BGR ragged uint8 -> letterboxed normalized float
        dt = jnp.bfloat16 if on_tpu else jnp.float32

        def prep(f):
            # identity-r letterbox: uint8 pad, cast+/255 fuse into the conv
            lb, _, _ = letterbox_device(f[..., ::-1], imgsz, dtype=dt)
            return lb / jnp.asarray(255.0, dt)
        x = jax.vmap(prep)(frames_u8)
        feats = model.apply(variables, x, train=False)
        feats = [f.astype(jnp.float32) for f in feats]
        preds = decode_detect(feats, strides, nc, meta["reg_max"])
        dets = non_max_suppression(preds, conf_thres=0.25, iou_thres=0.7,
                                   max_det=300, pre_topk=512, nc=nc)
        # fold the result into the running accumulator INSIDE the jit: one
        # dispatch per iteration (a separate host-side jnp.sum adds a second
        # tunneled dispatch per step — measured ~90us/img of pure RPC latency)
        return dets, acc + jnp.sum(dets)

    best = 0.0
    # B=128 only: 256 regressed (HBM pressure) and 64 under-fills — measured,
    # see PROFILE.md "measured non-wins"; one compile keeps total runtime bounded
    batches = [128] if on_tpu else [2]
    rng = np.random.default_rng(0)
    for B in batches:
        img = jnp.asarray(rng.integers(0, 255, (B, src_h, src_w, 3), dtype=np.uint8))
        acc = jnp.zeros((), jnp.float32)
        jax.device_get(e2e(variables, img, acc)[0])  # compile + settle
        n_iter = 30 if on_tpu else 2
        # Sustained throughput with a single completion barrier: every iteration
        # threads the device-side accumulator, so the one final scalar fetch
        # transitively forces ALL executions (block_until_ready does not
        # synchronize through the remote-device tunnel; a lone fetch per
        # iteration would serialize on tunnel round-trips instead).
        t0 = time.perf_counter()
        for i in range(n_iter):
            _, acc = e2e(variables, img, acc)
        float(acc)  # one round-trip: forces the whole chain
        dt = time.perf_counter() - t0
        ips = B * n_iter / dt
        best = max(best, ips)

    # ---- HEADLINE OUT IMMEDIATELY (crash/timeout after this keeps it) ----
    _RESULT.update({
        "metric": "e2e_images_per_sec_per_chip_640px_yolov8n_raggedinput",
        "value": round(best, 2),
        "unit": "img/s",
        "vs_baseline": round(best / A100_TRT_E2E_IMGS_PER_SEC, 2),
        "extra": {},
    })
    _emit()

    # MFU for the headline: model fwd FLOPs (fvcore-analog counter in
    # engine/model.py) at B=128 over the measured rate vs bf16 peak.
    extra = _RESULT["extra"]
    try:
        from sar_yolo_tpu.utils.mfu import chip_peak_bf16_tflops, model_fwd_gflops
        gflops = model_fwd_gflops(model, variables, meta, imgsz)
        peak = chip_peak_bf16_tflops()
        if gflops and peak:
            ach = best * gflops / 1e3  # img/s * GFLOP/img -> TFLOP/s
            extra["e2e_yolov8n_mfu"] = {
                "gflops_per_img": round(gflops, 2),
                "achieved_tflops": round(ach, 2),
                "peak_bf16_tflops": peak,
                "mfu_pct": round(100.0 * ach / peak, 1),
            }
            _emit()
    except Exception as e:  # noqa: BLE001
        extra["e2e_yolov8n_mfu"] = f"error: {type(e).__name__}: {e}"

    # ---- EXTRAS: started only while wall-clock budget remains ----
    # cheapest-first: the inference extras cost ~1 min each warm; the train
    # extras each pay a full _setup_train (host-side model+optimizer build)
    # on top of the cached compile, so they go LAST — any budget or driver
    # timeout cut then loses the least (each completed extra re-emits the
    # full line, so a kill mid-extra preserves everything before it)
    extras_plan = [
        ("e2e_yolov13njde_640_imgs_per_sec",
         lambda: bench_jde_e2e(B=128 if on_tpu else 2,
                               n_iter=20 if on_tpu else 2)),
        # SAR regime: P2-headed JDE at 1280px (ultra-small persons — the
        # fork's raison d'etre; VERDICT r4 item 4)
        # B=4: measured-optimal at 1280 (sweep: 64.4@4, 56.9@8, 58.7@16 —
        # B=4 clearly wins; the 8-vs-16 gap is inside the ±4% tunnel noise.
        # The P2-resolution 320x320 maps are HBM-hungry, so small batch wins
        # at high res; A/B in tools/p24_flash_ab.py)
        ("e2e_yolov13njde_p2_1280_imgs_per_sec",
         lambda: bench_jde_e2e(B=4 if on_tpu else 1, imgsz=1280,
                               n_iter=15 if on_tpu else 1,
                               yaml_name="yolov13n-JDE_P24.yaml",
                               src_hw=(960, 1280))),
        # train batch sizes are the measured-optimal occupancy points
        # (PROFILE.md: yolov8n 517@64 -> 758@128; JDE r5 sweep 237@64 ->
        # 284@96 -> 298@128 — the r4 "64 is optimal" stopped the sweep early)
        ("train_yolov8n_640_imgs_per_sec",
         lambda: bench_train("yolov8n.yaml", "detect", B=128 if on_tpu else 2,
                             n_iter=12 if on_tpu else 2)),
        ("train_yolov13njde_640_imgs_per_sec",
         lambda: bench_train("yolov13n-JDE.yaml", "jde", B=128 if on_tpu else 2,
                             n_iter=10 if on_tpu else 2)),
    ]
    for key, fn in extras_plan:
        if _elapsed() > EXTRAS_BUDGET_S:
            extra[key] = "skipped: budget"
            continue
        try:
            extra[key] = round(fn(), 2)
        except Exception as e:  # noqa: BLE001 — extras must never kill the headline
            extra[key] = f"error: {type(e).__name__}: {e}"
        _emit()  # richest-so-far line after EVERY completed extra

    extra["variance_note"] = "run-to-run ~±4% on this shared tunneled chip"
    extra["budget_s"] = EXTRAS_BUDGET_S
    extra["elapsed_s"] = round(_elapsed(), 1)
    _emit()


if __name__ == "__main__":
    main()
