"""Benchmark exact top-k alternatives for the TAL assigner + loss sub-stages.

tools/loss_ablation.py measured lax.top_k over the (B, M, N) align metric at
39.65 ms — 30% of the whole loss, which itself is 63% of the train step. This
compares:

    sort_topk    lax.top_k (current)
    iter_topk    topk rounds of (argmax -> one-hot pick -> mask out): exact,
                 no duplicate picks possible, ~2 fused (B,M,N) passes per round
    approx_topk  lax.approx_max_k recall_target=1.0 (TPU PartialReduce)

and then peels the ~85 ms of loss-forward that is NOT the assigner:

    flatten      flatten_feats (per-level NHWC -> (B, N, no) concat relayout)
    decode       dfl_decode + dist2bbox on (B, N, 64)
    bce          BCE over (B, N, nc)
    dfl          _df_loss target-bucket gathers on (B, N, 4, reg_max)

Usage: python tools/topk_bench.py [B] [M]
"""

from __future__ import annotations

import sys
import time

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


def iter_topk_mask(metric, topk: int):
    """Exact per-row top-k as a selected-anchor mask, via argmax rounds."""
    N = metric.shape[-1]
    count = jnp.zeros_like(metric)
    work = metric
    for _ in range(topk):
        idx = jnp.argmax(work, axis=-1)
        val = jnp.take_along_axis(work, idx[..., None], -1)
        pick = jax.nn.one_hot(idx, N, dtype=metric.dtype) * (val > 0)
        count = count + pick
        work = jnp.where(pick > 0, -1.0, work)
    return count


def main(B=64, M=64, n_iter=10):
    nc, reg_max, topk = 80, 16, 10
    strides = (8, 16, 32)
    imgsz = 640
    hw = [(imgsz // s, imgsz // s) for s in strides]
    N = sum(h * w for h, w in hw)
    key = jax.random.PRNGKey(0)
    am = jax.random.uniform(key, (B, M, N)) * (jax.random.uniform(
        jax.random.fold_in(key, 1), (B, M, N)) > 0.3)

    def sort_topk(probe, a):
        a = a + probe * 1e-20
        v, i = jax.lax.top_k(a, topk)
        return probe + (v.sum() + i.sum()) * 1e-20

    def iter_topk(probe, a):
        a = a + probe * 1e-20
        return probe + iter_topk_mask(a, topk).sum() * 1e-20

    def approx_topk(probe, a):
        a = a + probe * 1e-20
        v, i = jax.lax.approx_max_k(a, topk, recall_target=1.0)
        return probe + (v.sum() + i.sum()) * 1e-20

    # correctness cross-check on CPU-sized slice: same selected set
    sub = am[:2, :4]
    v_ref, i_ref = jax.lax.top_k(sub, topk)
    m_ref = jnp.zeros((2, 4, N)).at[
        jnp.arange(2)[:, None, None], jnp.arange(4)[None, :, None],
        i_ref].add((v_ref > 0).astype(jnp.float32))
    m_new = iter_topk_mask(sub, topk)
    assert jnp.allclose(m_ref, m_new), float(jnp.abs(m_ref - m_new).sum())
    print("iter_topk_mask == lax.top_k selected set: OK", flush=True)

    feats_flat = jax.random.normal(key, (B, N, 4 * reg_max + nc)) * 0.1
    feats = [jax.random.normal(jax.random.fold_in(key, j),
                               (B, h, w, 4 * reg_max + nc), jnp.float32) * 0.1
             for j, (h, w) in enumerate(hw)]

    from sar_yolo_tpu.ops.boxes import dfl_decode, dist2bbox, make_anchors
    from sar_yolo_tpu.ops.decode import flatten_feats
    from sar_yolo_tpu.utils.loss import _bce_logits, _df_loss

    anchor_points, _ = make_anchors(hw, strides)
    tscores = jax.nn.sigmoid(jax.random.normal(jax.random.fold_in(key, 9), (B, N, nc)))
    tltrb = jnp.abs(jax.random.normal(jax.random.fold_in(key, 10), (B, N, 4))) * 5

    def flatten(probe, fs):
        fs = [x + probe * 1e-20 for x in fs]
        x, _ = flatten_feats(fs)
        return probe + x.sum() * 1e-20

    def decode(probe, x):
        x = x + probe * 1e-20
        pd = x[..., : 4 * reg_max]
        bb = dist2bbox(dfl_decode(pd, reg_max), anchor_points[None], xywh=False)
        return probe + bb.sum() * 1e-20

    def bce(probe, x, t):
        x = x + probe * 1e-20
        return probe + _bce_logits(x[..., 4 * reg_max:], t).sum() * 1e-20

    def dfl(probe, x, t):
        x = x + probe * 1e-20
        pd4 = x[..., : 4 * reg_max].reshape(B, N, 4, reg_max)
        return probe + _df_loss(pd4, t, reg_max).sum() * 1e-20

    for name, fn, args in [
        ("sort_topk", sort_topk, (am,)),
        ("iter_topk", iter_topk, (am,)),
        ("approx_topk", approx_topk, (am,)),
        ("flatten", flatten, (feats,)),
        ("decode", decode, (feats_flat,)),
        ("bce", bce, (feats_flat, tscores)),
        ("dfl", dfl, (feats_flat, tltrb)),
    ]:
        try:
            dt = _time(fn, n_iter, *args)
            print(f"{name:<12} {dt * 1000:9.2f} ms", flush=True)
        except Exception as e:  # approx_max_k may be unsupported on this backend
            print(f"{name:<12} error: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    a = sys.argv[1:]
    main(int(a[0]) if a else 64, int(a[1]) if len(a) > 1 else 64)
