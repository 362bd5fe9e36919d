"""Flagship yolov13n-JDE e2e attribution on the real chip (VERDICT r3 #2).

Cumulative donated-chain variants (bench.py methodology: python loop of jitted
calls threading a device accumulator, ONE scalar fetch at the end):

    letterbox    device letterbox + /255 only
    +fwd         + fused bf16 forward (yolov13n-JDE)
    +decode      + DFL/dist2bbox decode with emb/state extras
    +nms         + NMS carrying 262 extra columns  (= bench_jde_e2e)

plus isolation forwards:

    fwd_v13      plain yolov13n (Detect head) — isolates the JDE head cost
    fwd_v8       yolov8n — the e2e headline's forward, for scale

Usage: python tools/jde_profile.py [B] [imgsz]
"""

from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time_chain(fn, args, n_iter):
    acc = jnp.zeros((), jnp.float32)
    acc = fn(*args, acc)
    float(acc)  # compile + settle
    acc = fn(*args, acc)
    float(acc)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        acc = fn(*args, acc)
    float(acc)
    return (time.perf_counter() - t0) / n_iter


def _build(yaml_name, imgsz):
    from sar_yolo_tpu.nn.fuse import fuse
    from sar_yolo_tpu.nn.tasks import build_model, init_model

    model, meta = build_model(yaml_name)
    variables = init_model(model, meta, jax.random.PRNGKey(0), imgsz=imgsz)
    model, variables = fuse(model, variables)
    if jax.default_backend() == "tpu":
        model = dataclasses.replace(model, dtype=jnp.bfloat16)
        variables = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            variables)
    return model, meta, variables


def main(B=128, imgsz=640, n_iter=20):
    from sar_yolo_tpu.ops.decode import decode_detect
    from sar_yolo_tpu.ops.nms import non_max_suppression
    from sar_yolo_tpu.ops.preprocess import letterbox_device

    on_tpu = jax.default_backend() == "tpu"
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (B, 480, 640, 3), dtype=np.uint8))

    model, meta, variables = _build("yolov13n-JDE.yaml", imgsz)
    strides, nc = tuple(meta["strides"]), meta["nc"]

    def prep(frames):
        def one(f):
            lb, _, _ = letterbox_device(f[..., ::-1], imgsz, dtype=dt)
            return lb / jnp.asarray(255.0, dt)
        return jax.vmap(one)(frames)

    @jax.jit
    def s_letterbox(v, frames, acc):
        x = prep(frames)
        return acc + jnp.sum(x.astype(jnp.float32)[:, ::97, ::97])

    @jax.jit
    def s_fwd(v, frames, acc):
        feats = model.apply(v, prep(frames), train=False)
        return acc + sum(jnp.sum(f.astype(jnp.float32)[:, ::13, ::13]) for f in feats)

    @jax.jit
    def s_decode(v, frames, acc):
        feats = model.apply(v, prep(frames), train=False)
        feats = [f.astype(jnp.float32) for f in feats]
        preds, bank = decode_detect(feats, strides, nc, meta["reg_max"],
                                    extra_sigmoid=meta["state_classes"] or 0,
                                    split_extras=meta["embed_dim"])
        return acc + jnp.sum(preds[:, ::31]) + jnp.sum(bank[:, ::31])

    @jax.jit
    def s_nms(v, frames, acc):
        feats = model.apply(v, prep(frames), train=False)
        feats = [f.astype(jnp.float32) for f in feats]
        preds, bank = decode_detect(feats, strides, nc, meta["reg_max"],
                                    extra_sigmoid=meta["state_classes"] or 0,
                                    split_extras=meta["embed_dim"])
        dets = non_max_suppression(preds, conf_thres=0.25, iou_thres=0.7,
                                   max_det=300, pre_topk=512, nc=nc,
                                   extras_bank=bank)
        return acc + jnp.sum(dets)

    rows = []
    for name, fn in [("letterbox", s_letterbox), ("+fwd", s_fwd),
                     ("+decode", s_decode), ("+nms", s_nms)]:
        dtm = _time_chain(fn, (variables, img), n_iter)
        rows.append((name, dtm))

    # isolation forwards
    for label, yml in [("fwd_v13", "yolov13.yaml"), ("fwd_v8", "yolov8n.yaml")]:
        m2, meta2, v2 = _build(yml, imgsz)

        @jax.jit
        def s_f(v, frames, acc, _m=m2):
            feats = _m.apply(v, prep(frames), train=False)
            return acc + sum(jnp.sum(f.astype(jnp.float32)[:, ::13, ::13]) for f in feats)

        rows.append((label, _time_chain(s_f, (v2, img), n_iter)))

    print(f"\nyolov13n-JDE e2e attribution  B={B} imgsz={imgsz} ({n_iter} iters)")
    print(f"{'stage':<12} {'ms/batch':>9} {'us/img':>8} {'img/s':>9}")
    prev = 0.0
    for name, dtm in rows:
        d = "" if name.startswith("fwd_") else f"  (+{1e6 * (dtm - prev) / B:.0f})"
        print(f"{name:<12} {1e3 * dtm:9.2f} {1e6 * dtm / B:8.1f} {B / dtm:9.1f}{d}")
        if not name.startswith("fwd_"):
            prev = dtm


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 128, int(a[1]) if len(a) > 1 else 640)
