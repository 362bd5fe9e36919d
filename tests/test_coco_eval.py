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
