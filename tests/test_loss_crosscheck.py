"""Loss-parity audit: run the REFERENCE's own loss code (torch-CPU, imported
from /root/reference) and ours on identical head maps + identical ground truth,
and require the per-item losses to agree.

This permanently pins the two TPU-rewritten hot paths — `tal.py` topk as
argmax-and-mask rounds and `_df_loss` as a one-hot reduce — against the exact
functions the reference trains through (`v8DetectionLoss`
/root/reference/ultralytics/utils/loss.py:255, `v13JDELoss` :360): a silent
assigner or DFL regression now fails this test instead of silently invalidating
every future training number.

Scope notes:
- the reference loss reads only head attributes (stride/nc/reg_max/...) off the
  model, so a minimal fake module stands in — no full torch model build.
- the JDE embed (triplet) term's pytorch_metric_learning dependency is not in
  this image; ref_stubs installs a FAITHFUL test-local oracle of the two
  classes the reference instantiates (BatchEasyHardMiner + TripletMarginLoss,
  written from the library contract), so the reference's own MetricLearningLoss
  code path (confidence gating, normalize flag, miner→loss wiring) runs for
  real and the embed item is compared exactly alongside box/cls/dfl/state.
"""

import types

import numpy as np
import pytest


def _import_ref_loss():
    from ref_stubs import install_reference_stubs
    install_reference_stubs()
    try:
        from ultralytics.utils import loss as ref_loss
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"reference not importable: {e}")
    return ref_loss


def _fake_torch_model(torch, *, nc, reg_max, strides, hyp, embed_dim=None,
                      state_classes=None):
    head = torch.nn.Module()
    head.nc = nc
    head.reg_max = reg_max
    head.stride = torch.tensor(strides, dtype=torch.float32)
    if embed_dim is not None:
        head.embed_dim = embed_dim
        head.state_classes = state_classes
    model = torch.nn.Module()
    model.model = torch.nn.ModuleList([head])
    model.args = hyp
    model._anchor = torch.nn.Parameter(torch.zeros(1))  # device probe
    return model


def _make_inputs(rng, *, B, nc, reg_max, strides, imgsz, extra_ch=0,
                 boxes_per_img=6, tag_range=None):
    """Random per-level head maps + well-formed GT, in BOTH batch formats."""
    no = 4 * reg_max + nc + extra_ch
    hw = [(imgsz // s, imgsz // s) for s in strides]
    feats_nhwc = [rng.normal(0, 1.0, (B, h, w, no)).astype(np.float32)
                  for h, w in hw]

    # GT: normalized xywh fully inside the image
    M = boxes_per_img
    cxy = rng.uniform(0.2, 0.8, (B, M, 2))
    wh = rng.uniform(0.05, 0.3, (B, M, 2))
    bboxes = np.concatenate([cxy, wh], -1).astype(np.float32)
    cls = rng.integers(0, nc, (B, M)).astype(np.float32)
    nvalid = rng.integers(2, M + 1, B)  # >=2 boxes per image
    mask = (np.arange(M)[None] < nvalid[:, None])
    tags = None
    if tag_range is not None:
        tags = rng.integers(0, tag_range, (B, M)).astype(np.float32)

    # flat (reference) format: only valid rows, image index in col 0
    bidx, rows = np.nonzero(mask)
    flat = {
        "batch_idx": bidx.astype(np.float32),
        "cls": cls[bidx, rows],
        "bboxes": bboxes[bidx, rows],
    }
    if tags is not None:
        flat["tags"] = tags[bidx, rows]

    padded = {"cls": cls, "bboxes": bboxes, "mask": mask.astype(np.float32)}
    if tags is not None:
        padded["tags"] = tags
    return feats_nhwc, flat, padded


@pytest.mark.parametrize("tal_topk", [10, 1])
def test_v8_detection_loss_matches_reference(tal_topk):
    """topk=10 is the standard det loss; topk=1 is the one2one branch the
    reference's E2EDetectLoss (v10, loss.py:1266) builds from the same class —
    covering both pins the whole E2E dual-assignment loss path."""
    import torch

    import jax.numpy as jnp

    ref_loss_mod = _import_ref_loss()
    from sar_yolo_tpu.utils.loss import detection_loss

    nc, reg_max, strides, imgsz, B = 7, 16, (8, 16, 32), 128, 3
    hyp = types.SimpleNamespace(box=7.5, cls=0.5, dfl=1.5)
    model = _fake_torch_model(torch, nc=nc, reg_max=reg_max, strides=strides, hyp=hyp)
    ref_fn = ref_loss_mod.v8DetectionLoss(model, tal_topk=tal_topk)

    for trial in range(3):
        rng = np.random.default_rng(100 + trial)
        feats, flat, padded = _make_inputs(
            rng, B=B, nc=nc, reg_max=reg_max, strides=strides, imgsz=imgsz)

        feats_t = [torch.from_numpy(f.transpose(0, 3, 1, 2)).contiguous()
                   for f in feats]
        batch_t = {k: torch.from_numpy(v) for k, v in flat.items()}
        ref_total, ref_items = ref_fn(feats_t, batch_t)

        out = detection_loss([jnp.asarray(f) for f in feats],
                             {k: jnp.asarray(v) for k, v in padded.items()},
                             hyp, nc=nc, reg_max=reg_max, strides=strides,
                             tal_topk=tal_topk)
        np.testing.assert_allclose(np.asarray(out.items),
                                   ref_items.numpy(), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(float(out.total), float(ref_total),
                                   rtol=2e-4)


def test_v13_jde_loss_matches_reference():
    """Full 5-part JDE loss parity INCLUDING the triplet embed term: the
    reference's v13JDELoss runs with a faithful test-local oracle of
    pytorch_metric_learning's BatchEasyHardMiner + TripletMarginLoss
    (ref_stubs._make_metric_learning_oracle — unit-norm LpDistance,
    hard-pos/semihard-neg mining with dropped anchors, AvgNonZeroReducer).
    Pins the use_tags assigner path and the CB-focal state loss."""
    import torch

    import jax.numpy as jnp

    ref_loss_mod = _import_ref_loss()
    from sar_yolo_tpu.utils.loss import jde_loss

    nc, reg_max, strides, imgsz, B = 1, 16, (8, 16, 32), 128, 3
    embed_dim, state_classes = 32, 3

    for use_cb, seed in [(False, 7), (True, 11)]:
        hyp = types.SimpleNamespace(box=7.5, cls=0.5, dfl=1.5, clr=0.5, state=1.0,
                                    state_focal_gamma=2.0, use_state_cb=use_cb,
                                    state_cb_beta=0.9999)
        model = _fake_torch_model(torch, nc=nc, reg_max=reg_max, strides=strides,
                                  hyp=hyp, embed_dim=embed_dim,
                                  state_classes=state_classes)
        ref_fn = ref_loss_mod.v13JDELoss(model)
        # Warm-start the CB EMA counts on both sides: at cold start
        # (n_c = 1e-4·batch_count ≈ 4e-7 exponents) the reference's f32
        # `1 - β**n_c` (loss.py:544) sits below f32 spacing near 1.0, so its
        # own CB weights are ±7-20% quantization noise; our expm1 form is
        # exact there. Parity is asserted in the well-conditioned regime.
        warm = [30.0, 20.0, 10.0]
        if use_cb:
            ref_fn.class_sample_counts = torch.tensor(warm)

        rng = np.random.default_rng(seed)
        feats, flat, padded = _make_inputs(
            rng, B=B, nc=nc, reg_max=reg_max, strides=strides, imgsz=imgsz,
            extra_ch=embed_dim + state_classes, boxes_per_img=8,
            tag_range=state_classes)

        feats_t = [torch.from_numpy(f.transpose(0, 3, 1, 2)).contiguous()
                   for f in feats]
        batch_t = {k: torch.from_numpy(v) for k, v in flat.items()}
        ref_total, ref_items = ref_fn(feats_t, batch_t)

        if use_cb:
            # our CB normalizes over OBSERVED classes only (documented fix of a
            # reference latent bug); parity requires every state class in fg
            counts = ref_fn.class_sample_counts.numpy()
            assert (counts > 0).all(), (
                f"seed must put every state class in fg for CB parity: {counts}")

        out = jde_loss([jnp.asarray(f) for f in feats],
                       {k: jnp.asarray(v) for k, v in padded.items()},
                       hyp, nc=nc, reg_max=reg_max, strides=strides,
                       embed_dim=embed_dim, state_classes=state_classes,
                       cb_counts=jnp.asarray(warm) if use_cb
                       else jnp.zeros(state_classes))
        ours = np.asarray(out.items)
        ref = ref_items.numpy()
        for i, name in [(0, "box"), (1, "cls"), (2, "dfl"), (3, "emb"),
                        (4, "state")]:
            np.testing.assert_allclose(ours[i], ref[i], rtol=3e-4, atol=3e-5,
                                       err_msg=f"{name} (use_cb={use_cb})")
        np.testing.assert_allclose(ours.sum() * B, float(ref_total), rtol=3e-4)


def test_triplet_embed_loss_matches_reference_semantics():
    """Unit crosscheck of triplet_embedding_loss against the reference's OWN
    MetricLearningLoss.forward (running on the faithful oracle classes) over
    randomized fg/tag configurations, incl. degenerate cases: single identity
    (no negatives), all-unique identities (no positives), tiny candidate sets,
    and collapsed embeddings (VERDICT r4 item 3)."""
    import torch

    import jax.numpy as jnp

    ref_loss_mod = _import_ref_loss()
    from sar_yolo_tpu.utils.loss import triplet_embedding_loss

    ml = ref_loss_mod.MetricLearningLoss()
    K = 64  # static candidate bound on our side

    cases = []
    rng = np.random.default_rng(42)
    for trial in range(6):
        n = int(rng.integers(4, 40))
        emb = rng.normal(size=(n, 16)).astype(np.float32)
        tags = rng.integers(0, max(2, n // 4), size=n).astype(np.int64)
        conf = rng.uniform(0.05, 0.99, size=n).astype(np.float32)
        cases.append((emb, tags, conf))
    # degenerate: one identity only (no negatives anywhere)
    cases.append((rng.normal(size=(6, 16)).astype(np.float32),
                  np.zeros(6, np.int64),
                  rng.uniform(0.1, 0.9, 6).astype(np.float32)))
    # degenerate: all identities unique (no positives)
    cases.append((rng.normal(size=(8, 16)).astype(np.float32),
                  np.arange(8, dtype=np.int64),
                  rng.uniform(0.1, 0.9, 8).astype(np.float32)))
    # degenerate: 2 candidates (gating keeps int(0.5*2)=1 -> no pairs)
    cases.append((rng.normal(size=(2, 16)).astype(np.float32),
                  np.zeros(2, np.int64),
                  np.array([0.9, 0.8], np.float32)))
    # collapsed embeddings (all identical): zero distances everywhere
    cases.append((np.ones((10, 16), np.float32),
                  rng.integers(0, 3, 10).astype(np.int64),
                  rng.uniform(0.1, 0.9, 10).astype(np.float32)))

    # K < n_fg <= 2K: the top-K gather truncates candidates but the gating
    # fraction must still be taken of the FULL fg count (r5 review finding:
    # clamping n_total before the fraction halved the kept set here)
    cases.append((rng.normal(size=(100, 16)).astype(np.float32),
                  rng.integers(0, 12, 100).astype(np.int64),
                  rng.uniform(0.05, 0.99, 100).astype(np.float32)))

    for ci, (emb, tags, conf) in enumerate(cases):
        ref = float(ml.forward(torch.from_numpy(emb), torch.from_numpy(tags),
                               torch.from_numpy(conf)))
        n = len(emb)
        # our fixed-shape call: top-K by conf desc (as the top-K gather in
        # jde_loss_components produces), padded to K, n_total = FULL count
        order = np.argsort(-conf)[:K]
        kcnt = len(order)
        pad = K - kcnt
        e_p = np.concatenate([emb[order], np.zeros((pad, 16), np.float32)])
        t_p = np.concatenate([tags[order], np.full(pad, -1, np.int64)])
        c_p = np.concatenate([conf[order], np.zeros(pad, np.float32)])
        v_p = np.concatenate([np.ones(kcnt, bool), np.zeros(pad, bool)])
        ours = float(triplet_embedding_loss(
            jnp.asarray(e_p), jnp.asarray(t_p), jnp.asarray(c_p),
            jnp.asarray(v_p), n_total=jnp.asarray(n)))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5,
                                   err_msg=f"case {ci} (n={n})")


def test_v8_segmentation_loss_matches_reference():
    """box/cls/dfl + prototype mask BCE parity with the reference's
    v8SegmentationLoss (/root/reference/ultralytics/utils/loss.py:801).

    Our mask term computes BCE on the top-`mask_topk` anchors by assigned
    weight instead of the reference's per-image dynamic fg loop — identical
    when every fg anchor fits in the top-K (guaranteed here: <= 10 topk * 4
    boxes = 40 fg per image < 64) and every fg anchor has weight > 0
    (asserted below)."""
    import torch

    import jax.numpy as jnp

    ref_loss_mod = _import_ref_loss()
    from sar_yolo_tpu.utils.loss import segmentation_loss

    nc, reg_max, strides, imgsz, B, nm = 5, 16, (8, 16, 32), 128, 2, 8
    mh = mw = imgsz // 4
    hyp = types.SimpleNamespace(box=7.5, cls=0.5, dfl=1.5, overlap_mask=True)
    model = _fake_torch_model(torch, nc=nc, reg_max=reg_max, strides=strides, hyp=hyp)
    ref_fn = ref_loss_mod.v8SegmentationLoss(model)

    no = 4 * reg_max + nc
    for trial in range(2):
        rng = np.random.default_rng(300 + trial)
        feats, flat, padded = _make_inputs(
            rng, B=B, nc=nc, reg_max=reg_max, strides=strides, imgsz=imgsz,
            extra_ch=nm, boxes_per_img=4)
        protos = rng.normal(0, 1.0, (B, mh, mw, nm)).astype(np.float32)

        # overlap-encoded gt masks at proto resolution: rectangle per valid gt
        masks = np.zeros((B, mh, mw), np.float32)
        M = padded["bboxes"].shape[1]
        for b in range(B):
            for m in range(M):
                if padded["mask"][b, m] <= 0:
                    continue
                cx, cy, w, h = padded["bboxes"][b, m]
                x1 = int(np.clip((cx - w / 2) * mw, 0, mw - 1))
                x2 = int(np.clip((cx + w / 2) * mw, x1 + 1, mw))
                y1 = int(np.clip((cy - h / 2) * mh, 0, mh - 1))
                y2 = int(np.clip((cy + h / 2) * mh, y1 + 1, mh))
                masks[b, y1:y2, x1:x2] = m + 1

        # reference: feats carry only the det channels; coeffs + protos separate
        feats_t = [torch.from_numpy(f[..., :no].transpose(0, 3, 1, 2)).contiguous()
                   for f in feats]
        pmasks_t = torch.cat(
            [torch.from_numpy(f[..., no:].transpose(0, 3, 1, 2).reshape(B, nm, -1))
             for f in feats], dim=2).contiguous()
        proto_t = torch.from_numpy(protos.transpose(0, 3, 1, 2)).contiguous()
        batch_t = {k: torch.from_numpy(v) for k, v in flat.items()}
        batch_t["masks"] = torch.from_numpy(masks)
        ref_total, ref_items = ref_fn((feats_t, pmasks_t, proto_t), batch_t)

        padded_j = {k: jnp.asarray(v) for k, v in padded.items()}
        padded_j["masks"] = jnp.asarray(masks)
        out = segmentation_loss(
            ([jnp.asarray(f) for f in feats], jnp.asarray(protos)),
            padded_j, hyp, nc=nc, reg_max=reg_max, strides=strides, nm=nm)
        np.testing.assert_allclose(np.asarray(out.items),
                                   ref_items.numpy(), rtol=3e-4, atol=3e-5)
        np.testing.assert_allclose(float(out.total), float(ref_total), rtol=3e-4)


def test_v8_pose_loss_matches_reference():
    """box/cls/dfl + OKS keypoint + visibility-BCE parity with the reference's
    v8PoseLoss (/root/reference/ultralytics/utils/loss.py:984), including the
    COCO OKS sigmas and the per-anchor K/visible-count loss factor."""
    import torch

    import jax.numpy as jnp

    ref_loss_mod = _import_ref_loss()
    from sar_yolo_tpu.utils.loss import pose_loss

    nc, reg_max, strides, imgsz, B = 1, 16, (8, 16, 32), 128, 2
    K, kdim = 17, 3
    hyp = types.SimpleNamespace(box=7.5, cls=0.5, dfl=1.5, pose=12.0, kobj=1.0)
    model = _fake_torch_model(torch, nc=nc, reg_max=reg_max, strides=strides, hyp=hyp)
    model.model[-1].kpt_shape = [K, kdim]
    ref_fn = ref_loss_mod.v8PoseLoss(model)

    no = 4 * reg_max + nc
    for trial in range(2):
        rng = np.random.default_rng(500 + trial)
        feats, flat, padded = _make_inputs(
            rng, B=B, nc=nc, reg_max=reg_max, strides=strides, imgsz=imgsz,
            extra_ch=K * kdim, boxes_per_img=4)
        M = padded["bboxes"].shape[1]
        kpts = np.concatenate(
            [rng.uniform(0.1, 0.9, (B, M, K, 2)),
             rng.choice([0.0, 2.0], (B, M, K, 1), p=[0.3, 0.7])],
            axis=-1).astype(np.float32)
        padded["keypoints"] = kpts
        bidx = flat["batch_idx"].astype(np.int64)
        rows = np.concatenate([np.nonzero(bidx == b)[0] for b in range(B)])
        # flat keypoints in the same (image-major, valid-first) order as flat boxes
        valid_rows = (padded["mask"] > 0)
        flat_kpts = np.concatenate([kpts[b][valid_rows[b]] for b in range(B)], axis=0)

        feats_t = [torch.from_numpy(f[..., :no].transpose(0, 3, 1, 2)).contiguous()
                   for f in feats]
        pkpts_t = torch.cat(
            [torch.from_numpy(f[..., no:].transpose(0, 3, 1, 2).reshape(B, K * kdim, -1))
             for f in feats], dim=2).contiguous()
        batch_t = {k: torch.from_numpy(v) for k, v in flat.items()}
        batch_t["keypoints"] = torch.from_numpy(flat_kpts)
        ref_total, ref_items = ref_fn((feats_t, pkpts_t), batch_t)

        out = pose_loss([jnp.asarray(f) for f in feats],
                        {k: jnp.asarray(v) for k, v in padded.items()},
                        hyp, nc=nc, reg_max=reg_max, strides=strides,
                        kpt_shape=(K, kdim))
        np.testing.assert_allclose(np.asarray(out.items),
                                   ref_items.numpy(), rtol=3e-4, atol=3e-5)
        np.testing.assert_allclose(float(out.total), float(ref_total), rtol=3e-4)


def test_v8_obb_loss_matches_reference():
    """Rotated box parity with the reference's v8OBBLoss
    (/root/reference/ultralytics/utils/loss.py:1150): rotated assigner,
    probiou box loss, DFL on the axis-aligned hull. Square image on purpose:
    the reference's tiny-rbox filter multiplies w by imgsz[0] (H) and h by
    imgsz[1] (W) (loss.py:1197), so only square shapes are comparable."""
    import torch

    import jax.numpy as jnp

    ref_loss_mod = _import_ref_loss()
    from sar_yolo_tpu.utils.loss import obb_loss

    nc, reg_max, strides, imgsz, B = 3, 16, (8, 16, 32), 128, 2
    hyp = types.SimpleNamespace(box=7.5, cls=0.5, dfl=1.5)
    model = _fake_torch_model(torch, nc=nc, reg_max=reg_max, strides=strides, hyp=hyp)
    ref_fn = ref_loss_mod.v8OBBLoss(model)

    no = 4 * reg_max + nc
    for trial in range(2):
        rng = np.random.default_rng(700 + trial)
        feats, flat, padded = _make_inputs(
            rng, B=B, nc=nc, reg_max=reg_max, strides=strides, imgsz=imgsz,
            extra_ch=1, boxes_per_img=5)
        # append a radian angle column to both formats
        M = padded["bboxes"].shape[1]
        ang = rng.uniform(-np.pi / 4, np.pi / 4, (B, M, 1)).astype(np.float32)
        padded["bboxes"] = np.concatenate([padded["bboxes"], ang], axis=-1)
        bidx = flat["batch_idx"].astype(np.int64)
        valid_rows = (padded["mask"] > 0)
        flat["bboxes"] = np.concatenate(
            [padded["bboxes"][b][valid_rows[b]] for b in range(B)], axis=0)

        feats_t = [torch.from_numpy(f[..., :no].transpose(0, 3, 1, 2)).contiguous()
                   for f in feats]
        pangle_t = torch.cat(
            [torch.from_numpy(f[..., no:].transpose(0, 3, 1, 2).reshape(B, 1, -1))
             for f in feats], dim=2).contiguous()
        # the reference's OBB head transforms angle logits BEFORE the loss
        # (head.py:293: (sigmoid - 0.25) * pi); our obb_loss takes raw logits
        pangle_t = (pangle_t.sigmoid() - 0.25) * np.pi
        batch_t = {k: torch.from_numpy(v) for k, v in flat.items()}
        ref_total, ref_items = ref_fn((feats_t, pangle_t), batch_t)

        out = obb_loss([jnp.asarray(f) for f in feats],
                       {k: jnp.asarray(v) for k, v in padded.items()},
                       hyp, nc=nc, reg_max=reg_max, strides=strides, ne=1)
        np.testing.assert_allclose(np.asarray(out.items),
                                   ref_items.numpy(), rtol=3e-4, atol=3e-5)
        np.testing.assert_allclose(float(out.total), float(ref_total), rtol=3e-4)


def _import_ref_detr_loss():
    from ref_stubs import install_reference_stubs
    install_reference_stubs()
    try:
        from ultralytics.models.utils import loss as ref_detr
    except Exception as e:  # noqa: BLE001
        pytest.skip(f"reference detr loss not importable: {e}")
    return ref_detr


@pytest.mark.parametrize("with_dn", [False, True])
def test_rtdetr_loss_matches_reference(with_dn):
    """Hungarian matching + VFL + L1/GIoU (+ CDN denoising branch) parity with
    the reference's RTDETRDetectionLoss(use_vfl=True)
    (/root/reference/ultralytics/models/utils/loss.py:291, wired in
    nn/tasks.py:535-585). Images carry DIFFERENT gt counts (incl. one empty) so
    the batch-total num_gts normalization is exercised, not just the equal-count
    special case."""
    import torch

    import jax.numpy as jnp

    ref_detr = _import_ref_detr_loss()
    from sar_yolo_tpu.utils.detr_loss import detr_loss

    L, B, Q, nc, M = 3, 3, 24, 5, 4
    counts = [2, 4, 0]  # per-image gt counts (one empty image)
    rng = np.random.default_rng(900 + int(with_dn))

    dec_boxes = rng.uniform(0.15, 0.55, (L, B, Q, 4)).astype(np.float32)
    dec_scores = rng.normal(0, 1.5, (L, B, Q, nc)).astype(np.float32)
    enc_boxes = rng.uniform(0.15, 0.55, (B, Q, 4)).astype(np.float32)
    enc_scores = rng.normal(0, 1.5, (B, Q, nc)).astype(np.float32)

    gt_padded = np.zeros((B, M, 4), np.float32)
    cls_padded = np.zeros((B, M), np.int32)
    mask = np.zeros((B, M), np.float32)
    for b, n in enumerate(counts):
        gt_padded[b, :n] = rng.uniform(0.2, 0.5, (n, 4))
        cls_padded[b, :n] = rng.integers(0, nc, n)
        mask[b, :n] = 1.0

    batch_j = {"bboxes": jnp.asarray(gt_padded), "cls": jnp.asarray(cls_padded),
               "mask": jnp.asarray(mask)}
    outputs = [jnp.asarray(dec_boxes), jnp.asarray(dec_scores),
               jnp.asarray(enc_boxes), jnp.asarray(enc_scores)]

    # reference batch: flat (image-major) gts + per-image counts
    flat_boxes = np.concatenate([gt_padded[b, :n] for b, n in enumerate(counts)])
    flat_cls = np.concatenate([cls_padded[b, :n] for b, n in enumerate(counts)])
    targets = {"cls": torch.from_numpy(flat_cls).long(),
               "bboxes": torch.from_numpy(flat_boxes),
               "gt_groups": counts}

    dn_bboxes_t = dn_scores_t = dn_meta_t = None
    if with_dn:
        G = 2
        M2 = 2 * M                      # [M positives | M negatives] per group
        DN = G * M2
        dn_boxes = rng.uniform(0.15, 0.55, (L, B, DN, 4)).astype(np.float32)
        dn_scores = rng.normal(0, 1.5, (L, B, DN, nc)).astype(np.float32)
        outputs.append({"dn_bboxes": jnp.asarray(dn_boxes),
                        "dn_scores": jnp.asarray(dn_scores), "G": G})
        # reference CDN match indices: positive query g*M2+m <-> gt row m
        dn_pos_idx = [torch.cat([torch.arange(n) + g * M2 for g in range(G)])
                      for n in counts]
        dn_meta_t = {"dn_pos_idx": dn_pos_idx, "dn_num_group": G}
        dn_bboxes_t = torch.from_numpy(dn_boxes)
        dn_scores_t = torch.from_numpy(dn_scores)

    ref_fn = ref_detr.RTDETRDetectionLoss(nc=nc, use_vfl=True)
    # the reference receives [enc | dec] stacked (nn/tasks.py:575): last = main
    ref_boxes = torch.from_numpy(
        np.concatenate([enc_boxes[None], dec_boxes], axis=0))
    ref_scores = torch.from_numpy(
        np.concatenate([enc_scores[None], dec_scores], axis=0))
    ref = ref_fn((ref_boxes, ref_scores), targets, dn_bboxes=dn_bboxes_t,
                 dn_scores=dn_scores_t, dn_meta=dn_meta_t)

    def ref_sum(stem):
        return sum(float(v) for k, v in ref.items() if k.startswith(stem))

    out = detr_loss(tuple(outputs), batch_j, None, nc=nc)
    ours = np.asarray(out.items)
    np.testing.assert_allclose(ours[0], ref_sum("loss_class"), rtol=2e-4)
    np.testing.assert_allclose(ours[1], ref_sum("loss_bbox"), rtol=2e-4)
    np.testing.assert_allclose(ours[2], ref_sum("loss_giou"), rtol=2e-4)
    np.testing.assert_allclose(float(out.total),
                               float(sum(v for v in ref.values())), rtol=2e-4)


def test_v8_classification_loss_matches_reference():
    """Mean softmax CE parity with the reference's v8ClassificationLoss
    (/root/reference/ultralytics/utils/loss.py:1139) — completes the loss
    family: every task's training loss is now pinned to the reference."""
    import torch

    import jax.numpy as jnp

    ref_loss_mod = _import_ref_loss()
    from sar_yolo_tpu.utils.loss import classification_loss

    ref_fn = ref_loss_mod.v8ClassificationLoss()
    rng = np.random.default_rng(1100)
    B, nc = 16, 10
    logits = rng.normal(0, 2.0, (B, nc)).astype(np.float32)
    labels = rng.integers(0, nc, B)

    ref_total, ref_items = ref_fn(torch.from_numpy(logits),
                                  {"cls": torch.from_numpy(labels).long()})
    out = classification_loss(jnp.asarray(logits),
                              {"cls": jnp.asarray(labels)})
    np.testing.assert_allclose(float(out.total), float(ref_total), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.items), [float(ref_items)],
                               rtol=1e-5)
