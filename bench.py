"""Benchmark: end-to-end detection throughput (letterbox + forward + decode + NMS).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the BASELINE.json north-star metric — end-to-end images/sec/chip at
640px on yolov8n, where "end-to-end" now really means it: raw RAGGED uint8
frames (480x640, video-camera geometry) are letterboxed to 640x640 ON DEVICE
inside the same jit as the model + NMS (cv2-parity bilinear, see
sar_yolo_tpu/ops/preprocess.py), weights run in bfloat16 on TPU.

`vs_baseline` compares against an A100 TensorRT-FP16 class figure for yolov8n
end-to-end batched inference (~1150 img/s — public TRT benchmark class, the
target named in BASELINE.md; the reference repo itself publishes no numbers,
only an unverified 6.85 img/s code comment we no longer use).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

A100_TRT_E2E_IMGS_PER_SEC = 1150.0  # A100 TensorRT-FP16 batched e2e class figure


def main():
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
        def prep(f):
            lb, _, _ = letterbox_device(f[..., ::-1], imgsz)
            return lb / 255.0
        x = jax.vmap(prep)(frames_u8)
        if on_tpu:
            x = x.astype(jnp.bfloat16)
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
    batches = [128, 256] if on_tpu else [2]  # two compiles keep total runtime bounded
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

    print(json.dumps({
        "metric": "e2e_images_per_sec_per_chip_640px_yolov8n_raggedinput",
        "value": round(best, 2),
        "unit": "img/s",
        "vs_baseline": round(best / A100_TRT_E2E_IMGS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
