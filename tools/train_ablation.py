"""Train-step cost attribution on the real chip (PROFILE.md round-3 TODO).

Each variant is a complete donated-buffer dispatch chain timed exactly like
bench.py's bench_train (python loop of jitted calls threading donated state,
ONE scalar fetch at the end — the only methodology that measures device time
through the remote tunnel). Variants peel one subsystem at a time:

    full        augment + fwd(train) + loss + bwd + optax + EMA   (= bench_train)
    no_aug      same but device augmentation off (host feeds float batch)
    no_loss     fwd(train) + bwd + optax + EMA, loss = mean(feats)
    no_opt      fwd(train) + bwd only (p <- p - 0*g keeps the chain sequential)
    fwd_train   forward in train mode (BN batch stats updated)
    fwd_eval    forward in eval mode (running stats; BN foldable in serving)

Deltas between adjacent rows attribute the step cost to augmentation, the
TAL/loss math, optimizer+EMA sweeps, backward, and training-mode BN.

Usage: python tools/train_ablation.py [model_yaml] [batch] [imgsz]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def _mean_feats(feats):
    leaves = [f for f in jax.tree.leaves(feats) if hasattr(f, "dtype")]
    return sum(jnp.mean(x.astype(jnp.float32)) for x in leaves) / len(leaves)


def _time_chain(step, state, n_iter, *args):
    """Run step n_iter times threading donated state; returns img/s factor 1/dt."""
    state, probe = step(state, *args)
    jax.block_until_ready(probe)  # compile + settle
    # second warm-up: the first call's OUTPUT shardings (GSPMD) can differ from
    # the trainer-made inputs (NamedSharding) -> one more compile on call 2
    state, probe = step(state, *args)
    jax.block_until_ready(probe)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        state, probe = step(state, *args)
    float(probe)  # force the whole chain
    dt = time.perf_counter() - t0
    return n_iter / dt, state


def main(model_yaml="yolov8n.yaml", B=64, imgsz=640, n_iter=10):
    from sar_yolo_tpu.engine.trainer import DetectionTrainer
    from sar_yolo_tpu.parallel import shard_batch

    rows = []

    def trainer(dev_aug: bool):
        tr = DetectionTrainer(overrides=dict(
            model=model_yaml, data="synthetic", imgsz=imgsz, batch=B, epochs=2,
            workers=1, val=False, save=False, plots=False,
            device_augment=dev_aug, max_labels=64, copy_paste=0.0,
            mesh_shape=[1], nbs=B))
        tr._setup_train()
        batch = next(iter(tr.train_loader))
        return tr, shard_batch(tr.mesh, batch)

    # -- full + no_aug: the trainer's own step --------------------------------
    for name, dev_aug in (("full", True), ("no_aug", False)):
        tr, batch = trainer(dev_aug)

        def step(state, batch, _tr=tr):
            new_state, total, _ = _tr._train_step(state, batch, True)
            return new_state, total

        rate, end_state = _time_chain(step, tr.state, n_iter, batch)
        rows.append((name, rate * B))
        if not dev_aug:
            tr_noaug_src = (tr, batch, end_state)  # reuse for peeled variants

    tr, batch, state = tr_noaug_src
    model = tr.model
    img = batch["img"].astype(jnp.float32) / 255.0

    # -- no_loss: fwd(train)+bwd+optax+EMA, mean-of-feats loss ----------------
    import optax

    def no_loss_step(state, img):
        def loss_fn(p):
            feats, mut = model.apply(
                {"params": p, "batch_stats": state.batch_stats}, img,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)})
            return _mean_feats(feats), mut["batch_stats"]

        (total, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tr.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        d = 0.9999
        new_ema = jax.tree.map(lambda e, p: e * d + (1 - d) * p,
                               state.ema_params, new_params)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_bs, opt_state=new_opt,
                             ema_params=new_ema), total

    rate, state = _time_chain(jax.jit(no_loss_step, donate_argnums=(0,)),
                              state, n_iter, img)
    rows.append(("no_loss", rate * B))

    # -- no_opt: fwd(train)+bwd only ------------------------------------------
    def no_opt_step(state, img):
        def loss_fn(p):
            feats, mut = model.apply(
                {"params": p, "batch_stats": state.batch_stats}, img,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)})
            return _mean_feats(feats), mut["batch_stats"]

        (total, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_params = jax.tree.map(lambda p, g: p - 0.0 * g, state.params, grads)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=new_bs), total

    rate, state = _time_chain(jax.jit(no_opt_step, donate_argnums=(0,)),
                              state, n_iter, img)
    rows.append(("no_opt", rate * B))

    # -- fwd_train / fwd_eval --------------------------------------------------
    def fwd_step(carry, img, train):
        acc, params, bs = carry
        out = model.apply({"params": params, "batch_stats": bs}, img,
                          train=train, mutable=["batch_stats"] if train else False,
                          rngs={"dropout": jax.random.PRNGKey(0)} if train else None)
        feats, mut = out if train else (out, None)
        acc = acc + _mean_feats(feats)
        return (acc, params, mut["batch_stats"] if train else bs), acc

    carry = (jnp.zeros(()), state.params, state.batch_stats)
    for name, train in (("fwd_train", True), ("fwd_eval", False)):
        rate, carry = _time_chain(
            jax.jit(lambda c, im, _t=train: fwd_step(c, im, _t),
                    donate_argnums=(0,)), carry, n_iter, img)
        carry = (jnp.zeros(()), carry[1], carry[2])  # reset acc, reuse buffers
        rows.append((name, rate * B))

    print(f"\n{model_yaml} B={B} imgsz={imgsz} ({n_iter} iters/variant)")
    print(f"{'variant':<10} {'img/s':>9} {'ms/step':>9}")
    for name, rate in rows:
        print(f"{name:<10} {rate:9.1f} {1000 * B / rate:9.1f}")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(a[0] if a else "yolov8n.yaml",
         int(a[1]) if len(a) > 1 else 64,
         int(a[2]) if len(a) > 2 else 640)
