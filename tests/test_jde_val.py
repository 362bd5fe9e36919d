"""JDEValidator fork-parity metrics, unit-level (no model forward needed).

Covers: clamp state-gt semantics (NOT tag % sc — ref loss.py:512), the
state-detection mAP second pass (ref jde/val.py:577-579), euclidean/silhouette/
Davies-Bouldin ReID stats (ref jde/val.py:524-526), per-state table, and the
cumulative consolidated CSV (ref jde/val.py:935).
"""

import numpy as np
import pytest

from sar_yolo_tpu.engine.validator import JDEValidator
from sar_yolo_tpu.utils import IterableSimpleNamespace


def _make_validator(tmp_path, sc=3, embed_dim=8):
    v = JDEValidator()
    v.meta = {"nc": 1, "state_classes": sc, "embed_dim": embed_dim}
    v.data = {"names": {0: "person"}}
    v.args = IterableSimpleNamespace(save_dir=str(tmp_path), model="tinyjde")
    v.init_metrics()
    return v


def _det_row(box, conf, cls, emb, state):
    return np.concatenate([np.asarray(box, np.float32), [conf, cls],
                           np.asarray(emb, np.float32), np.asarray(state, np.float32)])


def test_state_gt_uses_clamp_not_modulo():
    # tag 7 with 3 states: clamp → 2; modulo would give 1
    assert JDEValidator._state_gt(np.array([7]), 3)[0] == 2
    assert JDEValidator._state_gt(np.array([1]), 3)[0] == 1
    assert JDEValidator._state_gt(np.array([-2]), 3)[0] == 0


def test_full_metric_set(tmp_path):
    sc, E = 3, 8
    v = _make_validator(tmp_path, sc, E)
    rng = np.random.default_rng(0)

    # two identities with distinct embedding clusters, states 0 and 1
    centers = {0: rng.normal(size=E), 1: rng.normal(size=E) + 5}
    for step in range(6):
        tag = step % 2
        emb = centers[tag] + rng.normal(scale=0.05, size=E)
        state_logits = np.eye(sc)[tag]  # predict state == tag (clamped gt matches)
        d = _det_row([10, 10, 50, 50], 0.9, 0, emb, state_logits)[None]
        batch = {
            "mask": np.array([[1.0, 0.0]]),
            "cls": np.array([[0.0, 0.0]]),
            "tags": np.array([[float(tag), 0.0]]),
        }
        gt_boxes = np.array([[10, 10, 50, 50]], np.float32)
        gt_cls = np.array([0.0])
        tp = np.ones((1, 10), bool)
        v.det_metrics.update(tp, d[:, 4], d[:, 5], gt_cls)
        v._extra_update(d, gt_boxes, gt_cls, batch, 0)

    results = v.finalize_metrics()
    assert results["metrics/state_acc"] == 1.0
    assert results["metrics/state_macro_f1"] == 1.0
    # state-detection mAP second pass present and (near-)perfect — 101-pt
    # interpolation on tiny sample counts tops out just below 1.0
    assert results["metrics/mAP50(S)"] > 0.98
    assert results["metrics/mAP50-95(S)"] > 0.98
    # ReID: tight clusters → cosine separation positive, pos_euc << neg_euc
    assert results["metrics/reid_separation"] > 0.3
    assert results["metrics/reid_pos_euc"] < results["metrics/reid_neg_euc"]
    assert results["metrics/reid_silhouette"] > 0.5
    assert results["metrics/reid_davies_bouldin"] < 1.0

    # consolidated CSV: one row per run, appended
    v._export_consolidated(results)
    csv_path = tmp_path / "jde_results.csv"
    lines = csv_path.read_text().strip().splitlines()
    assert len(lines) == 3  # header + finalize_metrics row + explicit row
    assert "state_acc" in lines[0]


def test_state_mismatch_detected(tmp_path):
    """Predicting the wrong state must show up in acc AND state-detection mAP."""
    sc, E = 3, 4
    v = _make_validator(tmp_path, sc, E)
    d = _det_row([10, 10, 50, 50], 0.9, 0, np.zeros(E), [0, 0, 1])[None]  # pred state 2
    batch = {"mask": np.array([[1.0]]), "cls": np.array([[0.0]]),
             "tags": np.array([[0.0]])}  # gt state 0
    gt_boxes = np.array([[10, 10, 50, 50]], np.float32)
    v.det_metrics.update(np.ones((1, 10), bool), d[:, 4], d[:, 5], np.array([0.0]))
    v._extra_update(d, gt_boxes, np.array([0.0]), batch, 0)
    results = v.finalize_metrics()
    assert results["metrics/state_acc"] == 0.0
    assert results.get("metrics/mAP50(S)", 0.0) == 0.0


def test_per_state_table_printed(tmp_path, monkeypatch):
    from sar_yolo_tpu.engine import validator as vmod
    lines = []
    monkeypatch.setattr(vmod.LOGGER, "info", lambda msg, *a: lines.append(str(msg)))
    v = _make_validator(tmp_path)
    v.state_table = {"precision": np.array([1.0, 0.5, 0.0]),
                     "recall": np.array([1.0, 0.5, 0.0]),
                     "f1": np.array([1.0, 0.5, 0.0]),
                     "support": np.array([3, 2, 0])}
    v.data["person_states"] = {0: "stands", 1: "laying_down", 2: "walking"}
    v.print_results({"metrics/state_acc": 0.8}, 5)
    text = "\n".join(lines)
    assert "stands" in text and "laying_down" in text and "walking" in text


@pytest.mark.slow
def test_jde_val_on_6col_fixture_e2e(tmp_path):
    """Full fork metric set from YOLO.val on a real 6-column disk dataset
    (VERDICT r1 item 3 'done' criterion)."""
    from test_data import make_dataset
    from sar_yolo_tpu import YOLO

    yaml_path = make_dataset(tmp_path / "jde6", n=6, jde=True)
    m = YOLO("tinyjde.yaml", task="jde")
    res = m.val(data=str(yaml_path), imgsz=64, batch=2, workers=1, max_labels=8,
                project=str(tmp_path), name="out", exist_ok=True, verbose=True)
    assert "metrics/mAP50(S)" in res          # state-detection mAP second pass
    assert "metrics/mAP50-95(S)" in res
    assert list(tmp_path.rglob("jde_results.csv"))  # cumulative export
    # match-conditional metrics (state_acc, ReID stats) require IoU>=0.5 matches,
    # which an untrained model can't produce; their computation is pinned by the
    # unit tests above. Here we assert the pipeline ran the full fork metric
    # path without error and exported the cumulative row.
    row = list(tmp_path.rglob("jde_results.csv"))[0].read_text().splitlines()
    assert len(row) >= 2 and "mAP50(S)" in row[0]
