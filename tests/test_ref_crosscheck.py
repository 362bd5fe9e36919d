"""External-standard metric audit: run the REFERENCE's own metric code (from
/root/reference, torch-CPU) on the same inputs as ours and require agreement.

This substitutes for a pycocotools/coco128 parity run in the zero-egress env:
the reference's ap_per_class + BaseValidator.match_predictions are the exact
functions its published mAP numbers flow through, so agreement here means a val
run on identical predictions would print identical mAP.
"""

import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _import_ref_metrics():
    """Import ultralytics.utils.metrics from the read-only reference checkout.

    The reference hard-requires torchvision/thop/pytorch_metric_learning at
    import; none are installed and none are touched by the metric functions, so
    they are stubbed out (see ref_stubs.py, shared with test_torch_parity).
    """
    from ref_stubs import install_reference_stubs
    install_reference_stubs()
    from ultralytics.engine import validator as ref_validator
    from ultralytics.utils import metrics as ref_metrics
    return ref_metrics, ref_validator


def test_ap_per_class_matches_reference():
    """Same (tp, conf, pred_cls, target_cls) -> same AP matrix and mAPs."""
    ref_metrics, _ = _import_ref_metrics()
    from sar_yolo_tpu.utils.metrics import ap_per_class

    rng = np.random.default_rng(42)
    n_pred, n_gt, nc = 500, 200, 5
    tp = rng.random((n_pred, 10)) > rng.uniform(0.3, 0.8, (n_pred, 1))
    tp = np.sort(tp, axis=1)[:, ::-1]  # monotone over IoU thresholds, like real TPs
    conf = rng.random(n_pred)
    pred_cls = rng.integers(0, nc, n_pred).astype(float)
    target_cls = rng.integers(0, nc, n_gt).astype(float)

    ours = ap_per_class(tp, conf, pred_cls, target_cls)
    ref_out = ref_metrics.ap_per_class(tp, conf, pred_cls, target_cls)
    # reference returns (tp, fp, p, r, f1, ap, unique_classes, p_curve, ...)
    ref_ap = ref_out[5]
    assert ref_ap.shape == ours["ap"].shape
    np.testing.assert_allclose(ours["ap"], ref_ap, atol=1e-10)
    np.testing.assert_allclose(ours["ap"][:, 0].mean(), ref_ap[:, 0].mean(), atol=1e-12)
    np.testing.assert_allclose(ours["ap"].mean(), ref_ap.mean(), atol=1e-12)


def test_match_predictions_matches_reference():
    """Same boxes -> same TP matrix as reference BaseValidator.match_predictions."""
    import torch
    ref_metrics, ref_validator = _import_ref_metrics()
    from sar_yolo_tpu.utils.metrics import (IOU_THRESHOLDS, box_iou_np,
                                            match_predictions)

    rng = np.random.default_rng(7)
    for trial in range(5):
        n_gt, n_pred = rng.integers(1, 30), rng.integers(1, 60)
        gt_xy = rng.uniform(0, 200, (n_gt, 2))
        gt = np.concatenate([gt_xy, gt_xy + rng.uniform(10, 60, (n_gt, 2))], 1)
        # predictions: jittered copies of GT + noise boxes
        idx = rng.integers(0, n_gt, n_pred)
        pred = gt[idx] + rng.normal(0, 6, (n_pred, 4))
        pred[:, 2:] = np.maximum(pred[:, 2:], pred[:, :2] + 1)
        gt_cls = rng.integers(0, 3, n_gt).astype(float)
        pred_cls = rng.integers(0, 3, n_pred).astype(float)

        ours = match_predictions(pred, pred_cls, gt, gt_cls)

        shim = types.SimpleNamespace(iouv=torch.from_numpy(IOU_THRESHOLDS))
        iou_t = torch.from_numpy(box_iou_np(gt, pred))
        ref_tp = ref_validator.BaseValidator.match_predictions(
            shim, torch.from_numpy(pred_cls), torch.from_numpy(gt_cls), iou_t)
        ref_tp = ref_tp.cpu().numpy()
        assert (ours == ref_tp).all(), f"trial {trial}: assignments diverge"


def test_detmetrics_pipeline_matches_reference_end_to_end():
    """Full pipeline on a synthetic 'dataset': our DetMetrics mAP equals the
    mAP the reference computes from its own matching on the same detections."""
    import torch
    ref_metrics, ref_validator = _import_ref_metrics()
    from sar_yolo_tpu.utils.metrics import (DetMetrics, IOU_THRESHOLDS, box_iou_np,
                                            match_predictions)

    rng = np.random.default_rng(3)
    ours_m = DetMetrics()
    ref_stats = {"tp": [], "conf": [], "pred_cls": [], "target_cls": []}
    shim = types.SimpleNamespace(iouv=torch.from_numpy(IOU_THRESHOLDS))
    for _ in range(12):  # 12 images
        n_gt, n_pred = rng.integers(1, 12), rng.integers(0, 25)
        gt_xy = rng.uniform(0, 300, (n_gt, 2))
        gt = np.concatenate([gt_xy, gt_xy + rng.uniform(15, 80, (n_gt, 2))], 1)
        idx = rng.integers(0, n_gt, n_pred)
        pred = gt[idx] + rng.normal(0, 8, (n_pred, 4))
        if n_pred:
            pred[:, 2:] = np.maximum(pred[:, 2:], pred[:, :2] + 1)
        gt_cls = rng.integers(0, 4, n_gt).astype(float)
        pred_cls = rng.integers(0, 4, n_pred).astype(float)
        conf = rng.random(n_pred)

        ours_m.update(match_predictions(pred, pred_cls, gt, gt_cls), conf, pred_cls, gt_cls)
        ref_tp = ref_validator.BaseValidator.match_predictions(
            shim, torch.from_numpy(pred_cls), torch.from_numpy(gt_cls),
            torch.from_numpy(box_iou_np(gt, pred))).cpu().numpy()
        ref_stats["tp"].append(ref_tp)
        ref_stats["conf"].append(conf)
        ref_stats["pred_cls"].append(pred_cls)
        ref_stats["target_cls"].append(gt_cls)

    ours = ours_m.process()
    ref_out = ref_metrics.ap_per_class(
        np.concatenate(ref_stats["tp"]), np.concatenate(ref_stats["conf"]),
        np.concatenate(ref_stats["pred_cls"]), np.concatenate(ref_stats["target_cls"]))
    ref_ap = ref_out[5]
    np.testing.assert_allclose(ours["metrics/mAP50(B)"], ref_ap[:, 0].mean(), atol=1e-9)
    np.testing.assert_allclose(ours["metrics/mAP50-95(B)"], ref_ap.mean(), atol=1e-9)


def test_bytetrack_matches_reference():
    """Identical detection sequences -> identical track ids, boxes, scores from
    the reference's own BYTETracker (trackers/byte_tracker.py:235, numpy CPU).

    The sequence exercises every code path: high/low-conf split, lost->refind,
    unconfirmed removal, new-track gating, expiry, and duplicate pruning."""
    from ref_stubs import install_reference_stubs
    install_reference_stubs()
    from ultralytics.trackers.byte_tracker import BYTETracker as RefTracker
    from ultralytics.trackers.basetrack import BaseTrack as RefBase

    from sar_yolo_tpu.trackers.byte_tracker import BYTETracker, STrack

    args = types.SimpleNamespace(track_high_thresh=0.5, track_low_thresh=0.1,
                                 new_track_thresh=0.6, track_buffer=30,
                                 match_thresh=0.8, fuse_score=True)
    RefBase.reset_id()
    ref = RefTracker(args, frame_rate=30)
    STrack._count = 0
    ours = BYTETracker(track_high_thresh=0.5, track_low_thresh=0.1,
                       new_track_thresh=0.6, track_buffer=30,
                       match_thresh=0.8, fuse_score_flag=True, frame_rate=30)

    rng = np.random.default_rng(7)
    # 5 objects on linear trajectories; per-frame conf noise, dropouts, clutter
    pos0 = rng.uniform(50, 500, (5, 2))
    vel = rng.uniform(-4, 4, (5, 2))
    wh = rng.uniform(30, 90, (5, 2))
    for frame in range(1, 61):
        boxes, confs, clss = [], [], []
        for k in range(5):
            if k == 2 and 20 <= frame < 28:
                continue  # dropout -> lost -> refind
            if k == 4 and frame >= 40:
                continue  # permanent loss -> expiry
            c = pos0[k] + vel[k] * frame + rng.normal(0, 1.5, 2)
            boxes.append(np.r_[c - wh[k] / 2, c + wh[k] / 2])
            confs.append(0.25 if (k == 3 and frame % 4 == 0) else
                         float(np.clip(rng.uniform(0.55, 0.95), 0, 1)))
            clss.append(float(k % 3))
        if frame % 5 == 0:  # clutter: low-conf false positive
            fp = rng.uniform(100, 400, 2)
            boxes.append(np.r_[fp, fp + 40])
            confs.append(float(rng.uniform(0.15, 0.45)))
            clss.append(0.0)
        boxes = np.asarray(boxes, np.float32)
        confs = np.asarray(confs, np.float32)
        clss = np.asarray(clss, np.float32)

        xywh = np.concatenate([(boxes[:, :2] + boxes[:, 2:]) / 2,
                               boxes[:, 2:] - boxes[:, :2]], 1)
        ref_out = ref.update(types.SimpleNamespace(conf=confs, xywh=xywh, cls=clss))
        our_out = ours.update(np.concatenate([boxes, confs[:, None], clss[:, None]], 1))

        # ref rows: x1,y1,x2,y2,id,score,cls,idx — ours: x1,y1,x2,y2,score,cls,id
        ref_rows = {int(r[4]): r for r in np.asarray(ref_out).reshape(-1, 8)}
        our_rows = {int(r[6]): r for r in our_out}
        assert set(ref_rows) == set(our_rows), f"frame {frame}: ids diverge"
        for tid, rr in ref_rows.items():
            np.testing.assert_allclose(our_rows[tid][:4], rr[:4], atol=1e-3,
                                       err_msg=f"frame {frame} id {tid} box")
            np.testing.assert_allclose(our_rows[tid][4], rr[5], atol=1e-6)
            assert our_rows[tid][5] == rr[6]
    assert STrack._count == RefBase._count  # same total tracks ever created


def _make_val_dataset(root, n=16, imgsz=128, nc=1):
    """Square-imgsz images (identity letterbox on both sides) with colored
    rectangles; YOLO txt labels; returns the data.yaml path."""
    import cv2
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir(parents=True)
    rng = np.random.default_rng(3)
    colors = [(220, 40, 40), (40, 220, 40), (40, 40, 220)]
    for i in range(n):
        img = rng.integers(0, 60, (imgsz, imgsz, 3)).astype(np.uint8)
        rows = []
        for _ in range(int(rng.integers(1, 4))):
            c = int(rng.integers(0, nc))
            w, h = rng.uniform(0.15, 0.35, 2)
            cx = float(rng.uniform(w / 2, 1 - w / 2))
            cy = float(rng.uniform(h / 2, 1 - h / 2))
            x1, y1 = int((cx - w / 2) * imgsz), int((cy - h / 2) * imgsz)
            x2, y2 = int((cx + w / 2) * imgsz), int((cy + h / 2) * imgsz)
            img[y1:y2, x1:x2] = colors[c % 3]
            rows.append(f"{c} {cx:.6f} {cy:.6f} {w:.6f} {h:.6f}")
        cv2.imwrite(str(root / "images" / f"{i:03d}.jpg"), img)
        (root / "labels" / f"{i:03d}.txt").write_text("\n".join(rows))
    names = {i: f"c{i}" for i in range(nc)}
    (root / "data.yaml").write_text(
        f"path: {root}\ntrain: images\nval: images\nnc: {nc}\nnames: {names}\n")
    return root / "data.yaml"


@pytest.mark.parametrize("nc", [1, 3])
def test_detection_val_end_to_end_matches_reference(tmp_path, nc):
    """THE joint-pipeline golden: run the reference's full DetectionValidator
    (torch CPU, its own dataloader/letterbox/NMS/matching/AP chain) and our
    DetectionValidator on the SAME images and the SAME (converted) weights;
    the printed mAPs must agree. Metric functions are pinned individually
    elsewhere; this closes the remaining joint gap (letterbox, normalize,
    NMS defaults, pre-topk interplay). nc=1 = the fork's own person-detection
    regime; nc=3 exercises the reference's MULTI-LABEL val NMS against our
    multi_label path end-to-end.
    Reference: models/yolo/detect/val.py, engine/validator.py.
    """
    import contextlib
    import io

    import torch

    from ref_stubs import install_reference_stubs
    install_reference_stubs()

    data_yaml = _make_val_dataset(tmp_path / "golden", n=16, imgsz=128, nc=nc)

    # --- reference model with deterministic torch-init weights -------------
    torch.manual_seed(0)
    with contextlib.redirect_stdout(io.StringIO()), \
            contextlib.redirect_stderr(io.StringIO()):
        from ultralytics.cfg import get_cfg as ref_get_cfg
        from ultralytics.models.yolo.detect import DetectionValidator as RefVal
        from ultralytics.nn.tasks import DetectionModel as RefDetectionModel
        ref_model = RefDetectionModel("yolov8n.yaml", nc=nc, verbose=False)

        # brief overfit on the golden images with the REFERENCE'S OWN loss so
        # val sees real detections (random init scores mAP 0 — no signal)
        from ultralytics.utils.loss import v8DetectionLoss
        ref_model.args = types.SimpleNamespace(box=7.5, cls=0.5, dfl=1.5)
        ref_model.train()
        loss_fn = v8DetectionLoss(ref_model)
        import cv2
        imgs, bidx, bcls, bbox = [], [], [], []
        for i, f in enumerate(sorted((tmp_path / "golden" / "images").glob("*.jpg"))):
            imgs.append(cv2.imread(str(f))[..., ::-1].copy())
            for row in (tmp_path / "golden" / "labels" / f"{f.stem}.txt").read_text().splitlines():
                v = [float(t) for t in row.split()]
                bidx.append(i)
                bcls.append([v[0]])
                bbox.append(v[1:5])
        x = torch.from_numpy(np.stack(imgs).transpose(0, 3, 1, 2)).float() / 255.0
        tbatch = {"batch_idx": torch.tensor(bidx).float(),
                  "cls": torch.tensor(bcls).float(),
                  "bboxes": torch.tensor(bbox).float()}
        opt = torch.optim.Adam(ref_model.parameters(), lr=2e-3)
        for _ in range(250):  # conf saturates ~0.95 by step 200 (measured)
            opt.zero_grad()
            loss, _ = loss_fn(ref_model(x), tbatch)
            loss.sum().backward()
            opt.step()
        ref_model.eval()

        # convert BEFORE the reference val: its AutoBackend fuses the torch
        # model IN PLACE (BN folded away), emptying the bn state_dict keys
        from sar_yolo_tpu.utils.torch_convert import translate_torch_state_dict
        conv, skipped = translate_torch_state_dict(ref_model.state_dict())
        assert not skipped, f"unmapped torch keys: {skipped[:5]}"

        ref_args = ref_get_cfg(overrides=dict(
            model="yolov8n.yaml", data=str(data_yaml), imgsz=128, batch=4,
            device="cpu", workers=0, plots=False, save_json=False, save_txt=False,
            save_hybrid=False, verbose=False, half=False, mode="val", rect=False))
        ref_val = RefVal(args=ref_args, save_dir=tmp_path / "ref_out")
        ref_stats = ref_val(model=ref_model)

    # --- ours: same graph, converted weights, our whole val stack ----------
    from sar_yolo_tpu import YOLO

    import yaml as _yaml
    from sar_yolo_tpu.nn.tasks import yaml_model_load
    cfg = yaml_model_load("yolov8n.yaml")
    cfg = dict(cfg)
    cfg["nc"] = nc
    our_yaml = tmp_path / "yolov8n.yaml"  # keep the n-scale filename hint
    our_yaml.write_text(_yaml.safe_dump(cfg))

    m = YOLO(str(our_yaml), task="detect")
    m._ensure_variables(128)  # populates meta strides; weights replaced below
    m.variables = {"params": conv["params"], "batch_stats": conv["batch_stats"]}
    res = m.val(data=str(data_yaml), imgsz=128, batch=4, workers=0,
                project=str(tmp_path), name="ours_out", exist_ok=True,
                plots=False, verbose=False)
    ours = res if isinstance(res, dict) else getattr(res, "results_dict", res)

    ref_map50 = float(ref_stats["metrics/mAP50(B)"])
    ref_map = float(ref_stats["metrics/mAP50-95(B)"])
    our_map50 = float(ours["metrics/mAP50(B)"])
    our_map = float(ours["metrics/mAP50-95(B)"])
    # torch-init weights on structured images produce a small but NONZERO mAP;
    # require signal so the equality below means something
    assert ref_map50 > 0, "golden has no signal (reference mAP50 == 0)"
    assert abs(our_map50 - ref_map50) < 5e-3, (our_map50, ref_map50)
    assert abs(our_map - ref_map) < 5e-3, (our_map, ref_map)
