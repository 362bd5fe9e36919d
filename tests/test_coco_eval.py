"""CocoEval: pycocotools-protocol bbox evaluation (no pycocotools in env).

Hand-constructed cases with analytically known AP values, mirroring how the
reference's eval_json consumes predictions.json (ref models/yolo/detect/val.py).
"""

import numpy as np

from sar_yolo_tpu.utils.coco_eval import CocoEval, eval_json


def _gt(image_id, cat, x, y, w, h, **kw):
    return {"image_id": image_id, "category_id": cat, "bbox": [x, y, w, h], **kw}


def _dt(image_id, cat, x, y, w, h, score):
    return {"image_id": image_id, "category_id": cat, "bbox": [x, y, w, h], "score": score}


def test_perfect_match_is_ap1():
    gt = {"annotations": [_gt(0, 0, 10, 10, 50, 50)]}
    dt = [_dt(0, 0, 10, 10, 50, 50, 0.9)]
    s = CocoEval(gt, dt).accumulate().summarize()
    assert s["AP"] == 1.0 and s["AP50"] == 1.0 and s["AP75"] == 1.0
    assert s["AR100"] == 1.0


def test_extra_fp_after_tp_keeps_ap1():
    # COCO's 101-pt interp: precision at each achieved recall uses the envelope
    gt = {"annotations": [_gt(0, 0, 10, 10, 50, 50)]}
    dt = [_dt(0, 0, 10, 10, 50, 50, 0.9), _dt(0, 0, 300, 300, 20, 20, 0.5)]
    s = CocoEval(gt, dt).accumulate().summarize()
    assert s["AP"] == 1.0


def test_missing_gt_halves_recall():
    gt = {"annotations": [_gt(0, 0, 10, 10, 50, 50), _gt(0, 0, 200, 200, 50, 50)]}
    dt = [_dt(0, 0, 10, 10, 50, 50, 0.9)]
    s = CocoEval(gt, dt).accumulate().summarize()
    # precision 1.0 up to recall 0.5 → 51 of 101 recall points
    assert abs(s["AP"] - 51 / 101) < 1e-9
    assert s["AR100"] == 0.5


def test_low_iou_counts_at_50_not_75():
    # IoU = 32*50 / (50*50 + 50*50 - 32*50) ≈ 0.471 < 0.5 → no match anywhere
    # shift by 9 → IoU = 41*50/(2500+2500-41*50) ≈ 0.695: match at 0.5, not 0.75
    gt = {"annotations": [_gt(0, 0, 10, 10, 50, 50)]}
    dt = [_dt(0, 0, 19, 10, 50, 50, 0.9)]
    s = CocoEval(gt, dt).accumulate().summarize()
    assert s["AP50"] == 1.0
    assert s["AP75"] == 0.0
    # 4 of 10 thresholds matched (0.50, 0.55, 0.60, 0.65)
    assert abs(s["AP"] - 0.4) < 1e-9


def test_crowd_gt_absorbs_duplicates():
    # crowd region: duplicate detections matching it are ignored, not FPs
    gt = {"annotations": [_gt(0, 0, 10, 10, 50, 50),
                          _gt(0, 0, 100, 100, 80, 80, iscrowd=1)]}
    dt = [_dt(0, 0, 10, 10, 50, 50, 0.9),
          _dt(0, 0, 100, 100, 80, 80, 0.8),
          _dt(0, 0, 105, 105, 75, 75, 0.7)]
    s = CocoEval(gt, dt).accumulate().summarize()
    assert s["AP"] == 1.0  # the crowd matches don't dilute precision


def test_class_confusion_is_fp():
    gt = {"annotations": [_gt(0, 0, 10, 10, 50, 50), _gt(0, 1, 200, 200, 50, 50)]}
    dt = [_dt(0, 0, 10, 10, 50, 50, 0.9), _dt(0, 0, 200, 200, 50, 50, 0.8)]
    s = CocoEval(gt, dt).accumulate().summarize()
    # cat0: tp then fp → AP 1.0; cat1: no dets → AP 0.0 → mean 0.5
    assert abs(s["AP"] - 0.5) < 1e-9


def test_area_ranges():
    gt = {"annotations": [_gt(0, 0, 10, 10, 20, 20),      # small (400 px²)
                          _gt(0, 0, 200, 200, 100, 100)]} # large (10000 px²)
    dt = [_dt(0, 0, 10, 10, 20, 20, 0.9), _dt(0, 0, 200, 200, 100, 100, 0.8)]
    s = CocoEval(gt, dt).accumulate().summarize()
    assert s["APsmall"] == 1.0 and s["APlarge"] == 1.0 and s["APmedium"] == -1.0


def test_eval_json_helper(tmp_path):
    import json
    preds = [_dt(0, 0, 10, 10, 50, 50, 0.9)]
    p = tmp_path / "predictions.json"
    p.write_text(json.dumps(preds))
    out = eval_json(p, {"annotations": [_gt(0, 0, 10, 10, 50, 50)]})
    assert out["metrics/coco_mAP50-95"] == 1.0
    assert out["metrics/coco_mAP50"] == 1.0


def test_score_ordering_matters():
    # higher-scored FP before the TP pushes precision down at that recall
    gt = {"annotations": [_gt(0, 0, 10, 10, 50, 50)]}
    dt = [_dt(0, 0, 300, 300, 20, 20, 0.95), _dt(0, 0, 10, 10, 50, 50, 0.9)]
    s = CocoEval(gt, dt).accumulate().summarize()
    assert abs(s["AP"] - 0.5) < 1e-9  # precision 0.5 at every recall point


def test_predictions_json_native_space(tmp_path):
    """save_json writes COCO-comparable rows: numeric image ids from file
    stems and boxes mapped back to NATIVE image pixels (reference
    detect/val.py pred_to_json + scale_boxes semantics)."""
    import json

    import cv2
    import numpy as np

    from sar_yolo_tpu import YOLO

    root = tmp_path / "ds"
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir(parents=True)
    oh, ow = 80, 120  # non-square natives so letterbox pad + ratio both matter
    for i in range(4):
        img = np.full((oh, ow, 3), 30, np.uint8)
        img[20:60, 30:90] = (40, 220, 40)
        cv2.imwrite(str(root / "images" / f"{i:03d}.jpg"), img)
        # one box: cx=0.5, cy=0.5, w=0.5, h=0.5 -> native (30, 20, 60, 40) xywh
        (root / "labels" / f"{i:03d}.txt").write_text("0 0.5 0.5 0.5 0.5")
    (root / "data.yaml").write_text(
        f"path: {root}\ntrain: images\nval: images\nnc: 1\nnames: {{0: person}}\n")

    m = YOLO("tinydet.yaml", task="detect")
    m.val(data=str(root / "data.yaml"), imgsz=64, batch=4, save_json=True,
          conf=1e-6, project=str(tmp_path / "out"), name="v", plots=False)
    jfiles = list((tmp_path / "out").rglob("predictions.json"))
    assert jfiles, "predictions.json not written under project dir"
    rows = json.loads(jfiles[0].read_text())
    assert rows
    for r in rows:
        assert isinstance(r["image_id"], int) and 0 <= r["image_id"] < 4
        x, y, w, h = r["bbox"]
        assert 0 <= x <= ow and 0 <= y <= oh and x + w <= ow + 1e-6 and y + h <= oh + 1e-6
