"""Prefix attribution of the yolov13n-JDE TRAIN fwd+bwd on the real chip.

Same early-return `embed=(k,)` trick as tools/v13_layer_profile.py, but in
train mode under jax.value_and_grad with a mean pseudo-loss — adjacent deltas
attribute FWD+BWD cost to each block family (the eval profiler showed the
forward; the JDE train ablation showed fwd+bwd is 77% of the step, this
localizes it). Unfused model (training keeps live BN), bf16 compute.

Usage: PYTHONPATH=. python tools/v13_train_profile.py [yaml] [B] [imgsz] [cuts]
"""

from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, args, n_iter=8):
    p, acc = args[0], jnp.zeros((), jnp.float32)
    p, acc = fn(p, *args[1:], acc)
    float(acc)
    p, acc = fn(p, *args[1:], acc)
    float(acc)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        p, acc = fn(p, *args[1:], acc)
    float(acc)
    return (time.perf_counter() - t0) / n_iter


def main(yaml_name="yolov13n-JDE.yaml", B=64, imgsz=640, n_iter=8):
    from sar_yolo_tpu.nn.tasks import build_model, init_model

    model, meta = build_model(yaml_name)
    variables = init_model(model, meta, jax.random.PRNGKey(0), imgsz=imgsz)
    if jax.default_backend() == "tpu":
        model = dataclasses.replace(model, dtype=jnp.bfloat16)

    bs = variables.get("batch_stats", {})
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (B, imgsz, imgsz, 3)).astype(np.float32))

    names = {s.i: s.name for s in model.specs}
    cuts = [int(c) for c in
            (sys.argv[4].split(",") if len(sys.argv) > 4 else [2, 4, 6, 8, 9, 21, 31])]
    cuts = [c for c in cuts if c in names]

    rows = []
    for c in cuts:
        def loss_fn(p, bs, x, _c=c):
            e, mut = model.apply({"params": p, "batch_stats": bs}, x, train=True,
                                 mutable=["batch_stats"], embed=(_c,),
                                 rngs={"dropout": jax.random.PRNGKey(0)})
            return jnp.mean(e.astype(jnp.float32)), mut

        @jax.jit
        def run(p, bs, x, acc, _loss=loss_fn):
            (l, _), g = jax.value_and_grad(_loss, has_aux=True)(p, bs, x)
            # touch the grads so nothing dead-code-eliminates; donate-free probe
            gsum = sum(jnp.sum(t.astype(jnp.float32)) for t in jax.tree.leaves(g))
            return p, acc + l + 0.0 * gsum

        dt = _time(run, (variables["params"], bs, x), n_iter)
        print(f"->{c} {names[c]}: fwd+bwd {1e6 * dt / B:.1f} us/img", flush=True)
        rows.append((f"->{c} {names[c]}", dt))

    def loss_full(p, bs, x):
        feats, mut = model.apply({"params": p, "batch_stats": bs}, x, train=True,
                                 mutable=["batch_stats"],
                                 rngs={"dropout": jax.random.PRNGKey(0)})
        return sum(jnp.mean(f.astype(jnp.float32)) for f in jax.tree.leaves(feats)), mut

    @jax.jit
    def run_full(p, bs, x, acc):
        (l, _), g = jax.value_and_grad(loss_full, has_aux=True)(p, bs, x)
        gsum = sum(jnp.sum(t.astype(jnp.float32)) for t in jax.tree.leaves(g))
        return p, acc + l + 0.0 * gsum

    rows.append(("full (head)", _time(run_full, (variables["params"], bs, x), n_iter)))

    print(f"\n{yaml_name} TRAIN fwd+bwd prefix attribution  B={B} imgsz={imgsz}")
    print(f"{'prefix':<22} {'ms/batch':>9} {'us/img':>8} {'delta us/img':>13}")
    prev = 0.0
    for name, dt in rows:
        print(f"{name:<22} {1e3 * dt:9.2f} {1e6 * dt / B:8.1f} {1e6 * (dt - prev) / B:13.1f}")
        prev = dt


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "yolov13n-JDE.yaml",
         int(a[1]) if len(a) > 1 else 64,
         int(a[2]) if len(a) > 2 else 640)
