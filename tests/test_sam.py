"""SAM / SAM2 / MobileSAM: prompt inference, AMG helpers, memory modules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _img():
    img = np.full((96, 160, 3), 40, np.uint8)
    img[20:70, 40:120] = (200, 60, 60)
    return img


@pytest.fixture(scope="module")
def sam_tiny():
    from sar_yolo_tpu.models.sam import SAM
    return SAM("sam_test")


def test_sam_point_and_box_prompts(sam_tiny):
    img = _img()
    res = sam_tiny(img, points=[[80, 45]])
    r = res[0]
    assert r.masks.data.shape == (1, 96, 160)
    assert r.boxes.data.shape == (1, 6)
    # multi-point multi-query + multimask selection
    res = sam_tiny(img, points=[[80, 45], [10, 10]], multimask_output=True)
    assert res[0].masks.data.shape == (2, 96, 160)
    # box prompts
    res = sam_tiny(img, bboxes=[[35, 15, 125, 75], [0, 0, 30, 30]])
    assert res[0].masks.data.shape == (2, 96, 160)


def test_sam_prompt_padding_invariance(sam_tiny):
    """Padded queries (power-of-two batching) must not change the real ones."""
    img = _img()
    p = sam_tiny.predictor
    p.set_image(img)
    m1, s1 = p.prompt_inference(points=[[80, 45]])
    m3, s3 = p.prompt_inference(points=[[80, 45], [10, 10], [150, 90]])
    assert np.array_equal(m1[0], m3[0])
    assert abs(float(s1[0]) - float(s3[0])) < 1e-5


def test_sam_generate_runs(sam_tiny):
    """AMG everything-mode: runs end-to-end; with random weights the filters
    may keep 0..N masks — shapes must stay consistent either way."""
    p = sam_tiny.predictor
    p.set_image(_img())
    masks, scores, boxes = p.generate(points_per_side=4, points_per_batch=8,
                                      conf=-1e9, stability_thresh=-1.0)  # accept all
    assert masks.shape[1:] == (96, 160)
    assert len(scores) == len(masks) == len(boxes)
    assert len(masks) >= 1


@pytest.mark.slow
def test_sam2_prompts():
    from sar_yolo_tpu.models.sam import SAM
    m = SAM("sam2_test")
    assert m.is_sam2
    res = m(_img(), points=[[80, 45]])
    assert res[0].masks.data.shape == (1, 96, 160)


@pytest.mark.slow
def test_mobile_sam_builds():
    from sar_yolo_tpu.models.sam import SAM
    m = SAM("mobile_sam", imgsz=128)
    res = m(_img(), bboxes=[[35, 15, 125, 75]])
    assert res[0].masks.data.shape == (1, 96, 160)


def test_amg_helpers():
    from sar_yolo_tpu.models.sam.amg import (batched_mask_to_box,
                                             build_point_grid, stability_score)
    grid = build_point_grid(4)
    assert grid.shape == (16, 2) and grid.min() > 0 and grid.max() < 1

    m = np.zeros((2, 8, 8), np.float32) - 5
    m[0, 2:5, 3:7] = 5.0
    box = np.asarray(batched_mask_to_box(jnp.asarray(m) > 0))
    assert box[0].tolist() == [3, 2, 7, 5]
    assert box[1].tolist() == [0, 0, 0, 0]          # empty mask -> zeros

    s = np.asarray(stability_score(jnp.asarray(m)))
    assert s[0] == 1.0                               # sharp logits: fully stable


def test_sam_mask_decoder_shapes():
    from sar_yolo_tpu.models.sam.modules import MaskDecoder
    dec = MaskDecoder(transformer_dim=32)
    emb = jnp.ones((1, 8, 8, 32)) * 0.1
    pe = jnp.ones((1, 8, 8, 32)) * 0.05
    sparse = jnp.ones((3, 2, 32)) * 0.1
    dense = jnp.ones((3, 8, 8, 32)) * 0.1
    v = dec.init(jax.random.PRNGKey(0), emb, pe, sparse, dense)
    masks, iou = dec.apply(v, emb, pe, sparse, dense)
    assert masks.shape == (3, 4, 32, 32) and iou.shape == (3, 4)


@pytest.mark.slow
def test_sam2_memory_modules():
    """Memory encoder + attention: a frame conditioned on a memory bank keeps
    shape and responds to the bank contents."""
    from sar_yolo_tpu.models.sam.modules2 import SAM2Model
    m = SAM2Model(img_size=64, embed_dim=16, stages=(1, 1, 1, 1), num_heads=1,
                  global_att_blocks=(3,), window_spec=(4, 4, 4, 4),
                  backbone_channel_list=(128, 64, 32, 16), num_maskmem=3)
    x = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.3
    pts = jnp.asarray([[[32.0, 32.0]]])
    lbl = jnp.ones((1, 1))
    v = m.init(jax.random.PRNGKey(0), x, points=pts, labels=lbl, method="init_all")

    feats = m.apply(v, x, method="encode")
    h, w = feats["raw_embed"].shape[1:3]
    masks, iou, tok, obj = m.apply(v, feats, points=pts, labels=lbl, method="decode")
    assert masks.shape[1] == 4 and obj.shape == (1, 1)

    mem = m.apply(v, feats["raw_embed"], masks[:, :1].transpose(0, 2, 3, 1),
                  method="encode_memory")
    assert mem.shape == (1, h, w, 64)

    bank = jnp.concatenate([mem, jnp.zeros_like(mem), jnp.zeros_like(mem)], 0)
    valid = jnp.asarray([1.0, 0.0, 0.0])
    cond = m.apply(v, feats["raw_embed"], bank, valid, method="condition_on_memory")
    assert cond.shape == feats["raw_embed"].shape
    # memory must actually influence the conditioned features
    cond2 = m.apply(v, feats["raw_embed"], bank * 3.0, valid,
                    method="condition_on_memory")
    assert float(jnp.abs(cond - cond2).max()) > 1e-6


@pytest.mark.slow
def test_auto_annotate(tmp_path):
    import cv2
    from sar_yolo_tpu.data.annotator import auto_annotate

    d = tmp_path / "imgs"
    d.mkdir()
    img = np.full((64, 64, 3), 30, np.uint8)
    img[12:52, 16:48] = (220, 50, 50)
    cv2.imwrite(str(d / "a.jpg"), img)
    out = auto_annotate(d, det_model="tinydet.yaml", sam_model="sam_test",
                        conf=0.0, imgsz=64, output_dir=tmp_path / "labels")
    files = list(out.glob("*.txt"))
    # random-weight det may or may not fire; if it did, labels are polygons
    for f in files:
        rows = f.read_text().strip().splitlines()
        for row in rows:
            vals = row.split()
            assert len(vals) >= 7 and (len(vals) - 1) % 2 == 0
            assert all(0 <= float(x) <= 1 for x in vals[1:])


@pytest.mark.slow
def test_sam2_video_tracking():
    """SAM2 video: prompt one object on frame 0, memory-bank propagation keeps
    a mask with a stable id across frames."""
    from sar_yolo_tpu.models.sam import SAM
    m = SAM("sam2_test")
    frames = []
    for t in range(3):
        f = np.full((96, 160, 3), 40, np.uint8)
        x0 = 40 + 6 * t
        f[20:70, x0:x0 + 80] = (200, 60, 60)
        frames.append(f)
    res = m.track(frames, points=[[80, 45]])
    assert len(res) == 3
    for i, r in enumerate(res):
        assert r.masks.data.shape == (1, 96, 160)
        assert r.boxes.data.shape[1] == 7            # id column
        assert r.boxes.data[0, 6] == 0               # stable object id
        assert r.frame == i
