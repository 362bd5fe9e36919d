"""Tests for box ops and on-device NMS (vs. a trusted numpy greedy reference)."""

import jax
import jax.numpy as jnp
import numpy as np

from sar_yolo_tpu.ops import (bbox2dist, bbox_iou, box_iou_pairwise, dfl_decode,
                              dist2bbox, make_anchors, non_max_suppression,
                              xywh2xyxy, xyxy2xywh)


def test_xywh_roundtrip():
    x = jnp.array([[10.0, 20.0, 4.0, 8.0]])
    assert np.allclose(xyxy2xywh(xywh2xyxy(x)), x)
    assert np.allclose(xywh2xyxy(x), [[8, 16, 12, 24]])


def test_make_anchors():
    pts, strd = make_anchors([(2, 2), (1, 1)], [8, 16])
    assert pts.shape == (5, 2) and strd.shape == (5, 1)
    assert np.allclose(pts[0], [0.5, 0.5]) and np.allclose(pts[3], [1.5, 1.5])
    assert np.allclose(strd[:4], 8) and np.allclose(strd[4], 16)


def test_dist2bbox_bbox2dist_roundtrip():
    anchors = jnp.array([[4.0, 4.0], [10.0, 10.0]])
    boxes = jnp.array([[2.0, 1.0, 6.0, 7.0], [8.0, 9.0, 14.0, 13.0]])
    dist = bbox2dist(anchors, boxes, 16.0)
    rec = dist2bbox(dist, anchors, xywh=False)
    assert np.allclose(rec, boxes, atol=1e-5)


def test_dfl_decode_onehot():
    # one-hot distribution at bin k decodes to ~k
    logits = np.full((1, 1, 64), -20.0, np.float32)
    for side, k in enumerate([3, 7, 0, 15]):
        logits[0, 0, side * 16 + k] = 20.0
    out = dfl_decode(jnp.asarray(logits), 16)
    assert np.allclose(out[0, 0], [3, 7, 0, 15], atol=1e-3)


def test_bbox_iou_identity():
    b = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    assert np.isclose(float(bbox_iou(b, b)[0, 0]), 1.0, atol=1e-5)
    ciou = float(bbox_iou(b, b, CIoU=True)[0, 0])
    assert np.isclose(ciou, 1.0, atol=1e-5)


def _numpy_nms(boxes, scores, iou_thres):
    """Trusted O(n^2) greedy NMS."""
    idxs = np.argsort(-scores)
    keep = []
    while len(idxs):
        i = idxs[0]
        keep.append(i)
        if len(idxs) == 1:
            break
        xx1 = np.maximum(boxes[i, 0], boxes[idxs[1:], 0])
        yy1 = np.maximum(boxes[i, 1], boxes[idxs[1:], 1])
        xx2 = np.minimum(boxes[i, 2], boxes[idxs[1:], 2])
        yy2 = np.minimum(boxes[i, 3], boxes[idxs[1:], 3])
        inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area_o = (boxes[idxs[1:], 2] - boxes[idxs[1:], 0]) * (boxes[idxs[1:], 3] - boxes[idxs[1:], 1])
        iou = inter / (area_i + area_o - inter + 1e-7)
        idxs = idxs[1:][iou <= iou_thres]
    return keep


def test_nms_matches_numpy_reference():
    rng = np.random.default_rng(0)
    N, nc = 100, 3
    cx = rng.uniform(50, 590, (N, 1))
    cy = rng.uniform(50, 590, (N, 1))
    wh = rng.uniform(10, 80, (N, 2))
    scores = rng.uniform(0, 1, (N, nc)).astype(np.float32)
    preds = np.concatenate([cx, cy, wh, scores], -1).astype(np.float32)[None]

    out = np.asarray(non_max_suppression(jnp.asarray(preds), conf_thres=0.25,
                                         iou_thres=0.5, max_det=50, nc=nc))
    got = out[0]
    got = got[got[:, 4] > 0]

    # build the expected set with the same conf/class rules
    boxes = np.asarray(xywh2xyxy(jnp.asarray(preds[0, :, :4])))
    conf = scores.max(-1)
    cls = scores.argmax(-1)
    mask = conf >= 0.25
    exp_keep = []
    for c in range(nc):
        m = mask & (cls == c)
        if m.sum() == 0:
            continue
        kept = _numpy_nms(boxes[m], conf[m], 0.5)
        idx = np.where(m)[0][kept]
        exp_keep.extend(idx.tolist())
    exp_keep = sorted(exp_keep, key=lambda i: -conf[i])[:50]

    assert len(got) == len(exp_keep)
    assert np.allclose(sorted(got[:, 4].tolist()), sorted(conf[exp_keep].tolist()), atol=1e-5)


def test_nms_carries_extras():
    # one confident box with an extra embedding channel
    pred = np.zeros((1, 10, 4 + 1 + 2), np.float32)
    pred[0, 3, :4] = [100, 100, 20, 20]
    pred[0, 3, 4] = 0.9
    pred[0, 3, 5:] = [0.5, -0.25]
    out = np.asarray(non_max_suppression(jnp.asarray(pred), nc=1, max_det=5))
    assert out.shape == (1, 5, 8)
    assert np.isclose(out[0, 0, 4], 0.9)
    assert np.allclose(out[0, 0, 6:], [0.5, -0.25])
    assert np.all(out[0, 1:, 4] == 0)


def test_nms_multi_label():
    """multi_label=True (reference val-time NMS): every (anchor, class) pair
    above conf_thres is its own candidate — one anchor confident in two
    classes yields two detections (different classes never suppress each
    other); within a class, greedy suppression still applies."""
    pred = np.zeros((1, 20, 4 + 3), np.float32)
    pred[0, 5, :4] = [100, 100, 20, 20]
    pred[0, 5, 4:] = [0.9, 0.8, 0.01]          # two confident classes
    pred[0, 9, :4] = [101, 101, 20, 20]        # overlaps anchor 5
    pred[0, 9, 4:] = [0.7, 0.01, 0.01]         # same class 0 -> suppressed
    out = np.asarray(non_max_suppression(jnp.asarray(pred), nc=3, max_det=10,
                                         pre_topk=16, multi_label=True))
    kept = out[0][out[0, :, 4] > 0]
    assert len(kept) == 2
    np.testing.assert_allclose(sorted(kept[:, 4]), [0.8, 0.9])
    assert set(kept[:, 5].astype(int)) == {0, 1}
    # single-label on the same input: one detection (argmax class only)
    out1 = np.asarray(non_max_suppression(jnp.asarray(pred), nc=3, max_det=10,
                                          pre_topk=16))
    assert (out1[0, :, 4] > 0).sum() == 1


def test_nms_extras_bank_matches_inline():
    """The post-NMS embedding-bank gather (decode split_extras + extras_bank)
    must reproduce the all-inline column layout exactly — same detections,
    same [box, conf, cls, emb, state] ordering, zeros on padding rows."""
    rng = np.random.default_rng(7)
    B, N, nc, E, S = 3, 200, 1, 8, 2
    pred = np.zeros((B, N, 4 + nc + E + S), np.float32)
    pred[..., 0:2] = rng.uniform(50, 600, (B, N, 2))
    pred[..., 2:4] = rng.uniform(5, 60, (B, N, 2))
    pred[..., 4:5] = rng.uniform(0, 1, (B, N, 1))
    pred[..., 5:] = rng.normal(size=(B, N, E + S)).astype(np.float32)
    inline = np.asarray(non_max_suppression(jnp.asarray(pred), nc=nc, max_det=20,
                                            pre_topk=64))
    small = np.concatenate([pred[..., :4 + nc], pred[..., 4 + nc + E:]], -1)
    bank = pred[..., 4 + nc:4 + nc + E]
    banked = np.asarray(non_max_suppression(jnp.asarray(small), nc=nc, max_det=20,
                                            pre_topk=64,
                                            extras_bank=jnp.asarray(bank)))
    assert banked.shape == inline.shape
    np.testing.assert_allclose(banked, inline, atol=1e-6)


def test_nms_extras_bank_bf16_index_exact():
    """half=True serving: the anchor index threaded through suppression must
    stay exact in bf16 (8-bit significand rounds ints > 256), or the post-NMS
    bank gather fetches a NEIGHBORING anchor's embedding. The bank row is its
    own anchor id, so kept embedding == kept index proves the gather is exact
    for anchors far above 256."""
    rng = np.random.default_rng(3)
    B, N, nc = 2, 8400, 1
    pred = np.zeros((B, N, 4 + nc), np.float32)
    # well-separated boxes so NMS keeps everything it sees
    cx = (np.arange(N, dtype=np.float32) % 100) * 70 + 35
    cy = (np.arange(N, dtype=np.float32) // 100) * 70 + 35
    pred[..., 0], pred[..., 1] = cx, cy
    pred[..., 2:4] = 20.0
    pred[..., 4] = rng.uniform(0.3, 1.0, (B, N))
    bank = np.repeat(np.arange(N, dtype=np.float32)[None, :, None], B, 0)  # (B,N,1)
    out = np.asarray(non_max_suppression(
        jnp.asarray(pred, jnp.bfloat16), nc=nc, max_det=50, pre_topk=512,
        extras_bank=jnp.asarray(bank)).astype(jnp.float32))
    keep = out[..., 4] > 0
    assert keep.any()
    got_ids = out[..., 6][keep]
    assert got_ids.max() > 256, "test must exercise indices beyond bf16 exactness"
    # recover each detection's true anchor id from its own (bf16-rounded) box:
    # grid spacing 70 >> 2*bf16 rounding error (<=16 below 8192), so nearest
    # grid point is unambiguous; a rounded index column would gather a
    # NEIGHBORING anchor's id, disagreeing with the box it rides on
    rcx = (out[..., 0] + out[..., 2]) / 2
    rcy = (out[..., 1] + out[..., 3]) / 2
    expect = (np.round((rcy - 35) / 70) * 100 + np.round((rcx - 35) / 70))[keep]
    np.testing.assert_array_equal(got_ids, expect)


def test_flash_area_attention_matches_einsum():
    """Pallas flash kernel (interpret mode) vs einsum reference."""
    import jax
    from sar_yolo_tpu.nn.modules.block import area_attention
    from sar_yolo_tpu.ops.pallas import flash_area_attention

    key = jax.random.PRNGKey(0)
    for B, N, C, H, area in [(2, 64, 64, 2, 1), (2, 256, 64, 2, 4), (1, 100, 32, 1, 1)]:
        ks = jax.random.split(key, 3)
        q = jax.random.normal(ks[0], (B, N, C))
        k = jax.random.normal(ks[1], (B, N, C))
        v = jax.random.normal(ks[2], (B, N, C))
        ref = area_attention(q, k, v, H, area)
        got = flash_area_attention(q, k, v, H, area, interpret=True)
        assert float(jnp.abs(ref - got).max()) < 1e-4


def test_probiou_identity_and_rotation():
    from sar_yolo_tpu.ops.boxes import probiou
    b = jnp.array([[50.0, 50.0, 20.0, 10.0, 0.3]])
    assert float(probiou(b, b)[0, 0]) > 0.99
    # same box rotated 90deg with swapped w/h is identical geometry
    b2 = jnp.array([[50.0, 50.0, 10.0, 20.0, 0.3 + jnp.pi / 2]])
    assert float(probiou(b, b2)[0, 0]) > 0.97
    # disjoint boxes
    b3 = jnp.array([[500.0, 500.0, 20.0, 10.0, 0.0]])
    assert float(probiou(b, b3)[0, 0]) < 0.05


def test_dist2rbox_zero_angle_matches_dist2bbox():
    from sar_yolo_tpu.ops.boxes import dist2rbox
    anchors = jnp.array([[10.0, 10.0]])
    dist = jnp.array([[3.0, 2.0, 5.0, 6.0]])
    out = dist2rbox(dist, jnp.zeros((1, 1)), anchors)
    ref = dist2bbox(dist, anchors, xywh=True)
    assert np.allclose(out, ref, atol=1e-5)


def test_flash_attention_gradients_match_einsum():
    """custom_vjp backward (einsum recompute) matches direct einsum grads."""
    import jax
    from sar_yolo_tpu.nn.modules.block import area_attention
    from sar_yolo_tpu.ops.pallas import flash_area_attention

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    q = jax.random.normal(ks[0], (2, 64, 64))
    k = jax.random.normal(ks[1], (2, 64, 64))
    v = jax.random.normal(ks[2], (2, 64, 64))
    gf = jax.grad(lambda *a: jnp.sum(flash_area_attention(*a, 2, 4, interpret=True) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda *a: jnp.sum(area_attention(*a, 2, 4) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        assert float(jnp.abs(a - b).max()) < 1e-4


def test_letterbox_device_matches_host():
    """Device-side letterbox (inside the predict jit) must agree with the host
    cv2 letterbox on geometry (r, pads) and pixels within bilinear tolerance."""
    import numpy as np
    import jax.numpy as jnp
    from sar_yolo_tpu.data.augment import letterbox
    from sar_yolo_tpu.ops.preprocess import letterbox_device

    rng = np.random.default_rng(0)
    for H, W in [(97, 211), (640, 480), (64, 64), (31, 333)]:
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        host, r_h, (dw_h, dh_h) = letterbox(img, 64, scaleup=False)
        dev, r_d, (dw_d, dh_d) = letterbox_device(jnp.asarray(img), 64, scaleup=False)
        assert abs(r_h - r_d) < 1e-9
        assert (dw_h, dh_h) == (dw_d, dh_d)
        dev_np = np.asarray(dev)
        assert dev_np.shape == host.shape
        # cv2 INTER_LINEAR uses 5-bit fixed-point weights; our float path
        # agrees to within ~1 LSB everywhere
        diff = np.abs(dev_np.astype(np.float32) - host.astype(np.float32))
        assert diff.mean() < 0.5 and diff.max() < 1.5, \
            f"diff mean {diff.mean()} max {diff.max()} at {(H, W)}"


def test_letterbox_device_identity_geometry():
    """r == 1 (e.g. 480x640 -> 640): cv2 skips resize entirely; the device path
    must be BIT-exact (uint8 pad + cast, no matmuls) — and bf16 output is exact
    too since integer pixel values <= 255 fit bf16's mantissa."""
    import jax.numpy as jnp
    import numpy as np

    from sar_yolo_tpu.data.augment import letterbox
    from sar_yolo_tpu.ops.preprocess import letterbox_device

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
    host, r_h, (dw_h, dh_h) = letterbox(img, 640, scaleup=False)
    for dt in (jnp.float32, jnp.bfloat16):
        dev, r_d, (dw_d, dh_d) = letterbox_device(jnp.asarray(img), 640,
                                                  scaleup=False, dtype=dt)
        assert r_d == r_h == 1.0 and (dw_d, dh_d) == (dw_h, dh_h)
        np.testing.assert_array_equal(np.asarray(dev, np.float32),
                                      host.astype(np.float32))
