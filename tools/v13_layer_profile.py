"""Per-stage attribution INSIDE the yolov13n-JDE forward on the real chip.

Times cumulative graph prefixes via the early-return `embed=(k,)` path of
BaseModel._walk (pooled-feature exit after layer k) on the FUSED bf16 model —
adjacent deltas attribute cost to each block family (stem, DSC3k2 stages,
A2C2f attention, HyperACE, FPN, JDE head).

Also A/Bs the AAttn attention kernel: Pallas flash vs einsum fallback
(monkeypatched), full-model.

Usage: python tools/v13_layer_profile.py [yaml] [B] [imgsz]
"""

from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, args, n_iter=20):
    acc = jnp.zeros((), jnp.float32)
    acc = fn(*args, acc)
    float(acc)
    acc = fn(*args, acc)
    float(acc)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        acc = fn(*args, acc)
    float(acc)
    return (time.perf_counter() - t0) / n_iter


def main(yaml_name="yolov13n-JDE.yaml", B=128, imgsz=640, n_iter=10):
    from sar_yolo_tpu.nn.fuse import fuse
    from sar_yolo_tpu.nn.tasks import build_model, init_model

    model, meta = build_model(yaml_name)
    variables = init_model(model, meta, jax.random.PRNGKey(0), imgsz=imgsz)
    model, variables = fuse(model, variables)
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        model = dataclasses.replace(model, dtype=jnp.bfloat16)
        variables = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            variables)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (B, imgsz, imgsz, 3)).astype(np.float32))
    if on_tpu:
        x = x.astype(jnp.bfloat16)

    names = {s.i: s.name for s in model.specs}
    cuts = [int(c) for c in
            (sys.argv[4].split(",") if len(sys.argv) > 4 else [2, 6, 8, 9, 21, 31])]
    cuts = [c for c in cuts if c in names]

    rows = []
    for c in cuts:
        @jax.jit
        def run(v, x, acc, _c=c):
            e = model.apply(v, x, train=False, embed=(_c,))
            return acc + jnp.sum(e.astype(jnp.float32))

        dt = _time(run, (variables, x), n_iter)
        print(f"->{c} {names[c]}: {1e6 * dt / B:.1f} us/img", flush=True)
        rows.append((f"->{c} {names[c]}", dt))

    @jax.jit
    def run_full(v, x, acc):
        feats = model.apply(v, x, train=False)
        return acc + sum(jnp.sum(f.astype(jnp.float32)[:, ::13, ::13]) for f in feats)

    rows.append(("full (head)", _time(run_full, (variables, x), n_iter)))

    print(f"\n{yaml_name} prefix attribution  B={B} imgsz={imgsz}")
    print(f"{'prefix':<22} {'ms/batch':>9} {'us/img':>8} {'delta us/img':>13}")
    prev = 0.0
    for name, dt in rows:
        print(f"{name:<22} {1e3 * dt:9.2f} {1e6 * dt / B:8.1f} {1e6 * (dt - prev) / B:13.1f}")
        prev = dt

    # ---- AAttn kernel A/B: pallas flash vs einsum fallback -------------------
    # Force each leg through block._AATTN_FORCE: since the measured auto-select
    # landed (einsum when N/area <= 1024), re-tracing the model unmodified at
    # small imgsz would time the einsum path TWICE and label one leg "pallas".
    import sar_yolo_tpu.nn.modules.block as blk

    def _leg(force):
        blk._AATTN_FORCE.append(force)
        try:
            @jax.jit
            def run(v, x, acc):
                feats = model.apply(v, x, train=False)
                return acc + sum(jnp.sum(f.astype(jnp.float32)[:, ::13, ::13])
                                 for f in feats)
            return _time(run, (variables, x), n_iter)
        finally:
            blk._AATTN_FORCE.pop()

    t_flash = _leg(True)
    t_einsum = _leg(False)
    print(f"\nAAttn kernel A/B (full model): pallas {1e6 * t_flash / B:.1f} us/img"
          f"  vs einsum {1e6 * t_einsum / B:.1f} us/img")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "yolov13n-JDE.yaml",
         int(a[1]) if len(a) > 1 else 128,
         int(a[2]) if len(a) > 2 else 640)
