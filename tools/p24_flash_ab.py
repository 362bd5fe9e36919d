"""Flash-vs-einsum A/B at the SAR regime: yolov13n-JDE_P24 @ high resolution.

VERDICT r4 item 4: the Pallas flash kernel's claimed large-imgsz win had never
been measured above 640px; the auto-select threshold (chunk tokens > 1024,
nn/modules/block.py AAttn) was unvalidated. This tool measures the fused bf16
end-to-end forward (device letterbox + decode + NMS, same methodology as
bench.py) with the attention kernel FORCED to einsum, FORCED to flash, and on
auto, at a sweep of image sizes.

Usage: python tools/p24_flash_ab.py [imgsz ...]   (default: 960 1280)
Writes results to stdout; PROFILE.md records the conclusions.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def bench_e2e(yaml_name: str, imgsz: int, B: int, force, n_iter: int = 10):
    import dataclasses

    from sar_yolo_tpu.nn.fuse import fuse
    from sar_yolo_tpu.nn.modules import block as blk
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

    blk._AATTN_FORCE.append(force)
    try:
        @jax.jit
        def e2e(variables, frames_u8, acc):
            dt = jnp.bfloat16 if on_tpu else jnp.float32

            def prep(f):
                lb, _, _ = letterbox_device(f[..., ::-1], imgsz, dtype=dt)
                return lb / jnp.asarray(255.0, dt)
            x = jax.vmap(prep)(frames_u8)
            feats = model.apply(variables, x, train=False)
            feats = [f.astype(jnp.float32) for f in feats]
            preds, bank = decode_detect(feats, strides, nc, meta["reg_max"],
                                        extra_sigmoid=meta["state_classes"] or 0,
                                        split_extras=meta["embed_dim"])
            dets = non_max_suppression(preds, conf_thres=0.25, iou_thres=0.7,
                                       max_det=300, pre_topk=512, nc=nc,
                                       extras_bank=bank)
            return acc + jnp.sum(dets)

        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.integers(
            0, 255, (B, imgsz * 3 // 4, imgsz, 3), dtype=np.uint8))
        acc = jnp.zeros((), jnp.float32)
        float(e2e(variables, img, acc))  # compile
        t0 = time.perf_counter()
        for _ in range(n_iter):
            acc = e2e(variables, img, acc)
        float(acc)
        dt_s = time.perf_counter() - t0
        return B * n_iter / dt_s
    finally:
        blk._AATTN_FORCE.pop()


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [960, 1280]
    yaml_name = "yolov13n-JDE_P24.yaml"
    for imgsz in sizes:
        B = max(4, 2048 // imgsz * 4)  # keep HBM sane at high res
        for force, label in [(False, "einsum"), (True, "flash"), (None, "auto")]:
            try:
                ips = bench_e2e(yaml_name, imgsz, B, force)
                print(f"{yaml_name} @{imgsz} B={B} kernel={label}: "
                      f"{ips:.1f} img/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{yaml_name} @{imgsz} B={B} kernel={label}: "
                      f"ERROR {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
