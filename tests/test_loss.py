"""Assigner + loss tests: shapes, finiteness, and overfit-decreases sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sar_yolo_tpu.nn.tasks import build_model, init_model
from sar_yolo_tpu.utils import IterableSimpleNamespace
from sar_yolo_tpu.utils.loss import detection_loss, jde_loss, triplet_embedding_loss
from sar_yolo_tpu.utils.tal import task_aligned_assigner

HYP = IterableSimpleNamespace(box=7.5, cls=0.5, dfl=1.5, clr=0.5, state=1.0,
                              state_focal_gamma=2.0, use_state_cb=True, state_cb_beta=0.999)


def _batch(B=2, M=8, imgsz=64, tags=False):
    rng = np.random.default_rng(0)
    cls = np.zeros((B, M), np.float32)
    boxes = np.zeros((B, M, 4), np.float32)
    mask = np.zeros((B, M), np.float32)
    for b in range(B):
        for j in range(2):  # two real boxes per image
            cx, cy = rng.uniform(0.3, 0.7, 2)
            w, h = rng.uniform(0.2, 0.4, 2)
            boxes[b, j] = [cx, cy, w, h]
            mask[b, j] = 1
    out = {"img": rng.uniform(0, 1, (B, imgsz, imgsz, 3)).astype(np.float32),
           "cls": jnp.asarray(cls), "bboxes": jnp.asarray(boxes), "mask": jnp.asarray(mask)}
    if tags:
        out["tags"] = jnp.asarray(np.tile(np.arange(M), (B, 1)).astype(np.float32) % 3)
    out["img"] = jnp.asarray(out["img"])
    return out


def test_assigner_basic():
    B, N, M, nc = 1, 64, 4, 3
    anc = jnp.stack(jnp.meshgrid(jnp.arange(8) * 8 + 4.0, jnp.arange(8) * 8 + 4.0,
                                 indexing="xy"), -1).reshape(-1, 2)
    pd_scores = jnp.full((B, N, nc), 0.5)
    # predicted boxes = tiles around anchors
    pd_boxes = jnp.concatenate([anc - 6, anc + 6], -1)[None]
    gt_boxes = jnp.array([[[10.0, 10.0, 30.0, 30.0], [0, 0, 0, 0], [0, 0, 0, 0], [0, 0, 0, 0]]])
    gt_labels = jnp.array([[1, 0, 0, 0]])
    mask_gt = jnp.array([[1.0, 0, 0, 0]])
    res = task_aligned_assigner(pd_scores, pd_boxes, anc, gt_labels, gt_boxes, mask_gt,
                                topk=5, num_classes=nc)
    assert res.fg_mask.shape == (B, N)
    assert int(res.fg_mask.sum()) > 0
    # all fg anchors assigned to gt 0 with label 1
    fg = np.asarray(res.fg_mask[0])
    assert np.all(np.asarray(res.target_labels[0])[fg] == 1)
    # fg anchors lie inside the gt box
    centers = np.asarray(anc)[fg]
    assert np.all((centers > 9) & (centers < 31))


def test_triplet_loss_separates():
    K, D = 16, 8
    rng = np.random.default_rng(1)
    # well-separated clusters -> near-zero loss
    emb = np.concatenate([rng.normal(0, 0.01, (8, D)) + 5, rng.normal(0, 0.01, (8, D)) - 5])
    tags = np.array([0] * 8 + [1] * 8)
    conf = np.ones(K, np.float32)
    valid = np.ones(K, bool)
    loss_sep = float(triplet_embedding_loss(jnp.asarray(emb, jnp.float32), jnp.asarray(tags),
                                            jnp.asarray(conf), jnp.asarray(valid)))
    # collapsed embeddings: all pairwise distances equal -> NO negative is
    # strictly farther than the hardest positive -> the semihard miner drops
    # every anchor -> loss 0 (library semantics, pinned vs the reference's
    # MetricLearningLoss in test_loss_crosscheck.py; the old behavior of
    # returning the margin came from a hardest-negative fallback the
    # pytorch_metric_learning miner does not have)
    emb2 = np.zeros((K, D), np.float32)
    loss_col = float(triplet_embedding_loss(jnp.asarray(emb2), jnp.asarray(tags),
                                            jnp.asarray(conf), jnp.asarray(valid)))
    assert loss_sep < 1e-3
    assert loss_col == 0.0
    # mildly-overlapping clusters still produce a positive training signal
    emb3 = np.concatenate([rng.normal(0, 1.0, (8, D)), rng.normal(0.5, 1.0, (8, D))])
    loss_mix = float(triplet_embedding_loss(jnp.asarray(emb3, jnp.float32),
                                            jnp.asarray(tags), jnp.asarray(conf),
                                            jnp.asarray(valid)))
    assert loss_mix > 0.01


@pytest.mark.slow
def test_detection_loss_decreases():
    model, meta = build_model("tinydet.yaml", nc=3)
    variables = init_model(model, meta, jax.random.PRNGKey(0), imgsz=64)
    params, bstats = variables["params"], variables["batch_stats"]
    batch = _batch()
    tx = optax.sgd(5e-3, momentum=0.9)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, bstats, opt_state, batch):
        def loss_fn(p):
            feats, updates = model.apply({"params": p, "batch_stats": bstats},
                                         batch["img"], train=True,
                                         mutable=["batch_stats"],
                                         rngs={"dropout": jax.random.PRNGKey(0)})
            out = detection_loss(feats, batch, HYP, nc=3, reg_max=16,
                                 strides=tuple(meta["strides"]))
            return out.total, (out.items, updates["batch_stats"])
        (total, (items, new_bstats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bstats, opt_state, total, items

    losses = []
    boxes = []
    for i in range(120):
        params, bstats, opt_state, total, items = step(params, bstats, opt_state, batch)
        losses.append(float(total))
        boxes.append(float(items[0]))
    assert np.isfinite(losses).all()
    assert max(boxes) > 0, "box loss never became positive (assigner found no fg)"
    # loss first grows as fg count ramps, then overfits downward from the peak.
    # The trajectory oscillates (SGD at this lr has blowup-recover cycles), so
    # assert on the best of the tail rather than the single final step — the
    # endpoint is chaos-sensitive to last-bit compilation differences.
    assert min(losses[-15:]) < max(losses) * 0.5, \
        f"loss did not decrease from peak: {losses}"


@pytest.mark.slow
def test_jde_loss_runs_and_decreases():
    model, meta = build_model("tinyjde.yaml")
    variables = init_model(model, meta, jax.random.PRNGKey(0), imgsz=64)
    params, bstats = variables["params"], variables["batch_stats"]
    batch = _batch(tags=True)
    batch["cls"] = jnp.zeros_like(batch["cls"])  # single person class
    tx = optax.sgd(5e-3, momentum=0.9)
    opt_state = tx.init(params)
    cb = jnp.zeros(6)

    @jax.jit
    def step(params, bstats, opt_state, cb, batch):
        def loss_fn(p):
            feats, updates = model.apply({"params": p, "batch_stats": bstats},
                                         batch["img"], train=True,
                                         mutable=["batch_stats"],
                                         rngs={"dropout": jax.random.PRNGKey(0)})
            out = jde_loss(feats, batch, HYP, nc=1, reg_max=16,
                           strides=tuple(meta["strides"]), embed_dim=32,
                           state_classes=6, cb_counts=cb)
            return out.total, (out.items, out.cb_counts, updates["batch_stats"])
        (tot, (items, cb2, nb)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, nb, opt_state, cb2, tot, items

    losses = []
    for i in range(60):
        params, bstats, opt_state, cb, tot, items = step(params, bstats, opt_state, cb, batch)
        losses.append(float(tot))
    assert np.isfinite(losses).all(), f"non-finite jde loss: {losses}"
    assert losses[-1] < max(losses) * 0.9, f"jde loss did not decrease from peak: {losses}"
    assert np.asarray(items).shape == (5,)
    assert float(jnp.sum(cb)) > 0  # cb counts accumulated once fg appeared


def test_rtdetr_cdn_denoising():
    """CDN branch: decoder returns dn_meta with G groups of [M pos | M neg]
    noised-GT queries; detr_loss consumes it and stays finite with grads."""
    from sar_yolo_tpu.nn.modules.transformer import RTDETRDecoder
    from sar_yolo_tpu.utils.detr_loss import detr_loss

    B, M, hd, nq, nc = 2, 8, 32, 16, 3
    batch = _batch(B=B, M=M)
    batch["cls"] = batch["cls"].astype(jnp.int32)
    # ndl=1 keeps the compile small (multi-layer covered by slow rtdetr parity)
    dec = RTDETRDecoder(nc=nc, ch=(hd, hd, hd), hd=hd, nq=nq, ndl=1, nh=4, d_ffn=64)
    xs = [jnp.ones((B, s, s, hd), jnp.float32) * 0.1 for s in (8, 4, 2)]
    rng = jax.random.PRNGKey(0)
    # jit init/grad/inference: one (persistently cached) compile each instead
    # of eager per-op dispatch, which dominated this test's wall time
    variables = jax.jit(lambda r: dec.init({"params": r, "dn": r}, xs,
                                           train=True, batch_gt=batch))(rng)

    def loss_fn(params):
        out, _ = dec.apply({"params": params["params"],
                            "batch_stats": variables["batch_stats"]},
                           xs, train=True, batch_gt=batch,
                           mutable=["batch_stats"], rngs={"dn": rng})
        assert len(out) == 5
        dn = out[4]
        G = dn["G"]
        DN = dn["dn_bboxes"].shape[2]
        assert DN == G * 2 * M and dn["dn_scores"].shape == (1, B, DN, nc)
        return detr_loss(out, batch, None, nc=nc).total, dn["pos_flag"]

    (total, pos_flag), grads = jax.jit(
        lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p))(
        {"params": variables["params"]})
    # pos/neg layout: first M of each group positive
    pf = np.asarray(pos_flag).reshape(-1, 2 * M)
    assert (pf[:, :M] == 1).all() and (pf[:, M:] == 0).all()
    assert np.isfinite(float(total))
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # the dn class embedding must receive gradient (CDN actually trains)
    emb_g = grads["params"]["denoising_class_embed"]["embedding"]
    assert float(jnp.abs(emb_g).sum()) > 0

    # inference path unchanged: 4-tuple, no dn slots in outputs
    out_inf = jax.jit(lambda v: dec.apply(v, xs, train=False))(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]})
    assert len(out_inf) == 4 and out_inf[0].shape[2] == min(nq, sum(s * s for s in (8, 4, 2)))
