"""Localize the loss/TAL train-step cost on the real chip.

train_ablation.py attributed 131 ms/step (63% of the yolov8n no_aug step,
B=64 @640) to the loss; this harness peels the detection loss into stages,
timed with the same donated-chain methodology (sequential data dependency via
a threaded probe scalar, ONE fetch at the end — the only tunnel-safe timing).

Stages:
    loss_grad    value_and_grad(detection_loss)   (= what the train step pays)
    loss_fwd     detection_loss forward only
    tal          task_aligned_assigner alone (stop-grad inputs)
    tal_metric   align-metric part only: in-gt mask + CIoU overlaps + gather
    topk         lax.top_k over the (B, M, N) align metric
    onehot       the top-k -> per-anchor count reduction (one_hot form)

Usage: python tools/loss_ablation.py [B] [imgsz] [M]
"""

from __future__ import annotations

import sys
import time
from types import SimpleNamespace

import jax
import jax.numpy as jnp


def _time(fn, n_iter, *args):
    probe = jnp.zeros((), jnp.float32)
    fn_j = jax.jit(fn)
    probe = fn_j(probe, *args)
    jax.block_until_ready(probe)
    probe = fn_j(probe, *args)
    jax.block_until_ready(probe)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        probe = fn_j(probe, *args)
    float(probe)
    return (time.perf_counter() - t0) / n_iter


def main(B=64, imgsz=640, M=64, n_iter=10):
    from sar_yolo_tpu.utils.loss import detection_loss
    from sar_yolo_tpu.utils.tal import task_aligned_assigner
    from sar_yolo_tpu.ops.boxes import bbox_iou, make_anchors

    nc, reg_max = 80, 16
    strides = (8, 16, 32)
    hw = [(imgsz // s, imgsz // s) for s in strides]
    N = sum(h * w for h, w in hw)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)

    feats = [jax.random.normal(ks[0], (B, h, w, 4 * reg_max + nc), jnp.float32) * 0.1
             for (h, w) in hw]
    cls = jax.random.randint(ks[1], (B, M), 0, nc).astype(jnp.float32)
    cxy = jax.random.uniform(ks[2], (B, M, 2), minval=0.2, maxval=0.8)
    wh = jax.random.uniform(ks[3], (B, M, 2), minval=0.02, maxval=0.3)
    bboxes = jnp.concatenate([cxy, wh], -1)
    mask = (jax.random.uniform(ks[4], (B, M)) < 0.6).astype(jnp.float32)
    batch = {"cls": cls, "bboxes": bboxes, "mask": mask}
    hyp = SimpleNamespace(box=7.5, cls=0.5, dfl=1.5)

    anchor_points, stride_t = make_anchors(hw, strides)
    pd_scores = jax.nn.sigmoid(jax.random.normal(ks[5], (B, N, nc)) * 2 - 4)
    pd_bboxes = jnp.concatenate([
        anchor_points - jnp.abs(jax.random.normal(key, (B, N, 2))) * 3,
        anchor_points + jnp.abs(jax.random.normal(ks[1], (B, N, 2))) * 3], -1)
    anc_img = anchor_points * stride_t
    pd_img = pd_bboxes * stride_t[None]
    scale = jnp.array([imgsz, imgsz, imgsz, imgsz], jnp.float32)
    gt_img = jnp.concatenate([cxy - wh / 2, cxy + wh / 2], -1) * scale[None, None]

    rows = []

    def loss_grad(probe, feats, batch):
        f = [x + probe * 1e-20 for x in feats]
        def lf(f0):
            out = detection_loss(f0, batch, hyp, nc=nc, reg_max=reg_max, strides=strides)
            return out[0]
        val, grads = jax.value_and_grad(lf)(f)
        return probe + val * 1e-20 + sum(jnp.sum(g) for g in grads) * 1e-20

    def loss_fwd(probe, feats, batch):
        f = [x + probe * 1e-20 for x in feats]
        out = detection_loss(f, batch, hyp, nc=nc, reg_max=reg_max, strides=strides)
        return probe + out[0] * 1e-20

    def tal(probe, pd_scores, pd_img, gt_img, cls, mask):
        s = pd_scores + probe * 1e-20
        a = task_aligned_assigner(s, pd_img, anc_img, cls.astype(jnp.int32),
                                  gt_img, mask, topk=10, num_classes=nc)
        return probe + (a.target_scores.sum() + a.fg_mask.sum()) * 1e-20

    def tal_metric(probe, pd_scores, pd_img, gt_img, cls, mask):
        s = pd_scores + probe * 1e-20
        lt = anc_img[None, None, :, :] - gt_img[:, :, None, :2]
        rb = gt_img[:, :, None, 2:] - anc_img[None, None, :, :]
        mask_in = (jnp.minimum(lt.min(-1), rb.min(-1)) > 1e-9).astype(jnp.float32)
        gl = jnp.clip(cls.astype(jnp.int32), 0, nc - 1)
        bs = jnp.take_along_axis(s.transpose(0, 2, 1), gl[:, :, None], axis=1)
        ov = bbox_iou(gt_img[:, :, None, :], pd_img[:, None, :, :],
                      xywh=False, CIoU=True).squeeze(-1)
        am = (bs * mask_in) ** 0.5 * jnp.clip(ov, 0) ** 6.0
        return probe + am.sum() * 1e-20

    am0 = jax.random.uniform(key, (B, M, N)) * mask[:, :, None]

    def topk(probe, am):
        a = am + probe * 1e-20
        v, i = jax.lax.top_k(a, 10)
        return probe + (v.sum() + i.sum()) * 1e-20

    _, idx0 = jax.lax.top_k(am0, 10)
    val0 = jnp.ones((B, M, 10), jnp.float32)

    def onehot(probe, idx, val):
        v = val + probe * 1e-20
        count = jnp.sum(jax.nn.one_hot(idx, N, dtype=jnp.float32) * v[..., None], axis=2)
        return probe + count.sum() * 1e-20

    for name, fn, args in [
        ("loss_grad", loss_grad, (feats, batch)),
        ("loss_fwd", loss_fwd, (feats, batch)),
        ("tal", tal, (pd_scores, pd_img, gt_img, cls, mask)),
        ("tal_metric", tal_metric, (pd_scores, pd_img, gt_img, cls, mask)),
        ("topk", topk, (am0,)),
        ("onehot", onehot, (idx0, val0)),
    ]:
        dt = _time(fn, n_iter, *args)
        rows.append((name, dt * 1000))
        print(f"{name:<11} {dt * 1000:9.2f} ms", flush=True)

    print(f"\nB={B} imgsz={imgsz} M={M} N={N} ({n_iter} iters)")
    for name, ms in rows:
        print(f"{name:<11} {ms:9.2f} ms/step {1000.0 * B / ms:9.1f} img/s-equiv")


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 64, int(a[1]) if len(a) > 1 else 640,
         int(a[2]) if len(a) > 2 else 64)
