"""Shared deterministic SPMD train step for the multi-host simulation test.

Used by BOTH the 2-process workers (multihost_worker.py) and the in-process
single-process reference (test_parallel.py) so the computation compared is
byte-identical code: tinydet forward + detection loss + grad + SGD update,
batch sharded over the mesh 'dp' axis, params replicated.
"""

from __future__ import annotations

from types import SimpleNamespace

import numpy as np

HYP = SimpleNamespace(box=7.5, cls=0.5, dfl=1.5)
LR = 0.01


def GLOBAL_BATCH():
    rng = np.random.default_rng(0)
    B, M = 4, 8
    img = rng.uniform(0, 1, (B, 32, 32, 3)).astype(np.float32)
    pos = rng.uniform(0.3, 0.7, (B, M, 2)).astype(np.float32)
    wh = rng.uniform(0.1, 0.25, (B, M, 2)).astype(np.float32)
    return {
        "img": img,
        "bboxes": np.concatenate([pos, wh], -1),
        "cls": np.zeros((B, M), np.float32),
        "mask": (rng.uniform(size=(B, M)) < 0.7).astype(np.float32),
    }


def _host_read(x):
    return np.asarray(x.addressable_data(0)) if hasattr(x, "addressable_data") \
        else np.asarray(x)


def param_checksum(tree) -> float:
    import jax
    return float(sum(np.abs(_host_read(l)).sum() for l in jax.tree.leaves(tree)))


def make_step_fn(mesh):
    """Return step(global_batch) -> (loss, updated_variables)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sar_yolo_tpu.nn.tasks import build_model, init_model
    from sar_yolo_tpu.utils.loss import detection_loss

    model, meta = build_model("tinydet.yaml")
    variables = init_model(model, meta, jax.random.PRNGKey(0), imgsz=32)
    strides, nc, reg_max = tuple(meta["strides"]), meta["nc"], meta["reg_max"]

    rep = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        # identical init on every process (same PRNG) -> replicated global tree
        variables = jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)),
            variables)
    else:
        variables = jax.tree.map(lambda x: jax.device_put(x, rep), variables)

    @jax.jit
    def _step(v, batch):
        def loss_fn(vv):
            feats = model.apply(vv, batch["img"], train=False)
            out = detection_loss(
                feats, {k: batch[k] for k in ("bboxes", "cls", "mask")},
                HYP, nc=nc, reg_max=reg_max, strides=strides)
            return out.total
        loss, grads = jax.value_and_grad(loss_fn)(v)
        new_v = jax.tree.map(lambda p, g: p - LR * g, v, grads)
        return loss, new_v

    def step(global_batch):
        loss, new_v = _step(variables, global_batch)
        return loss, new_v

    return step
