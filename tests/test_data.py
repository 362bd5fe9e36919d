"""Real on-disk YOLO dataset pipeline tests (txt labels incl. 6-col jde tags)."""

import numpy as np
import pytest
import cv2

from sar_yolo_tpu.data import YOLODataset, check_det_dataset
from sar_yolo_tpu import YOLO


def make_dataset(root, n=8, jde=False, imgsz=96):
    """Write a tiny YOLO-format dataset: images/ + labels/ + data.yaml."""
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.integers(0, 60, (imgsz, imgsz, 3), dtype=np.uint8)
        rows = []
        for j in range(2):
            w, h = 0.25, 0.3
            cx = float(rng.uniform(w / 2, 1 - w / 2))
            cy = float(rng.uniform(h / 2, 1 - h / 2))
            x1, y1 = int((cx - w / 2) * imgsz), int((cy - h / 2) * imgsz)
            x2, y2 = int((cx + w / 2) * imgsz), int((cy + h / 2) * imgsz)
            img[y1:y2, x1:x2] = (40, 220, 40)
            row = f"0 {cx:.4f} {cy:.4f} {w} {h}"
            if jde:
                row += f" {j + 1}"  # person id
            rows.append(row)
        cv2.imwrite(str(root / "images" / f"{i:03d}.jpg"), img)
        (root / "labels" / f"{i:03d}.txt").write_text("\n".join(rows))
    yaml_text = f"path: {root}\ntrain: images\nval: images\nnc: 1\nnames: {{0: person}}\n"
    (root / "data.yaml").write_text(yaml_text)
    return root / "data.yaml"


def test_yolo_dataset_loads(tmp_path):
    yaml_path = make_dataset(tmp_path / "ds", jde=True)
    info = check_det_dataset(yaml_path)
    assert info["nc"] == 1
    ds = YOLODataset(info["train"], imgsz=64, augment=False, use_tags=True, max_labels=8)
    item = ds[0]
    assert item["img"].shape == (64, 64, 3)
    assert item["mask"].sum() == 2
    assert set(item["tags"][:2]) == {1.0, 2.0}
    # normalized xywh in range
    b = item["bboxes"][item["mask"] > 0]
    assert (b > 0).all() and (b < 1).all()


def test_yolo_dataset_mosaic(tmp_path):
    from sar_yolo_tpu.utils import IterableSimpleNamespace
    yaml_path = make_dataset(tmp_path / "ds2")
    info = check_det_dataset(yaml_path)
    hyp = IterableSimpleNamespace(mosaic=1.0, degrees=0.0, translate=0.1, scale=0.5,
                                  shear=0.0, perspective=0.0, hsv_h=0.015, hsv_s=0.7,
                                  hsv_v=0.4, fliplr=0.5, flipud=0.0)
    ds = YOLODataset(info["train"], imgsz=64, augment=True, hyp=hyp, max_labels=32)
    item = ds[0]
    # mosaic composes at 2x then the affine with mosaic border crops back to imgsz
    assert item["img"].shape == (64, 64, 3)
    assert item["mask"].sum() >= 1


@pytest.mark.slow
def test_train_on_disk_dataset(tmp_path):
    yaml_path = make_dataset(tmp_path / "ds3")
    m = YOLO("tinydet.yaml")
    metrics = m.train(data=str(yaml_path), epochs=1, imgsz=64, batch=4, workers=1,
                      project=str(tmp_path), name="t", exist_ok=True, max_labels=16,
                      mesh_shape=[1], plots=True, mosaic=0.0)
    assert np.isfinite(metrics["train/box"])
    # plots=True writes the batch mosaic + dataset label statistics
    d = tmp_path / "detect" / "t"
    assert (d / "train_batch0.png").exists()
    assert (d / "labels.jpg").exists()


def test_dataset_yamls_parse():
    """Every shipped dataset yaml parses with consistent nc/names (and pose
    yamls carry kpt_shape + a valid flip_idx permutation)."""
    from pathlib import Path

    from sar_yolo_tpu.utils import yaml_load
    files = sorted((Path(__file__).parent.parent / "sar_yolo_tpu" / "cfg" /
                    "datasets").glob("*.yaml"))
    assert len(files) >= 29
    for f in files:
        d = yaml_load(f)
        names = d.get("names")
        n = len(names) if names is not None else 0
        assert d.get("nc", n) == n, f"{f.name}: nc={d.get('nc')} != {n}"
        if "kpt_shape" in d and d.get("flip_idx"):
            k = d["kpt_shape"][0]
            assert sorted(d["flip_idx"]) == list(range(k)), f.name


def test_label_cache_and_verify(tmp_path):
    """Second init loads the .cache.npz; corrupt images are dropped (reference
    verify_image_label + cache_labels, data/utils.py:102-173)."""
    yaml_path = make_dataset(tmp_path / "ds4", n=6)
    info = check_det_dataset(yaml_path)
    # corrupt one image file
    (tmp_path / "ds4" / "images" / "000.jpg").write_bytes(b"not a jpeg")
    ds = YOLODataset(info["train"], imgsz=64, augment=False, max_labels=8)
    assert len(ds) == 5  # corrupt one dropped
    assert ds.shapes.shape == (5, 2) and (ds.shapes == 96).all()
    cache = ds._cache_path()
    assert cache.is_file()
    # reload: served from cache (mutate in-memory marker to prove no re-verify)
    ds2 = YOLODataset(info["train"], imgsz=64, augment=False, max_labels=8)
    assert len(ds2) == 5
    assert [l["cls"].tolist() for l in ds2.labels] == [l["cls"].tolist() for l in ds.labels]
    # label edit invalidates the hash -> rebuild
    lbl = tmp_path / "ds4" / "labels" / "001.txt"
    lbl.write_text("0 0.5 0.5 0.2 0.2")
    ds3 = YOLODataset(info["train"], imgsz=64, augment=False, max_labels=8)
    i = ds3.im_files.index(str(tmp_path / "ds4" / "images" / "001.jpg"))
    assert len(ds3.labels[i]["cls"]) == 1


def test_rect_val_batching(tmp_path):
    """Rect mode: aspect-sorted batches, stride-multiple bucketed shapes, every
    image letterboxed to its batch shape (reference BaseDataset.set_rectangle)."""
    root = tmp_path / "ds5"
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir(parents=True)
    rng = np.random.default_rng(1)
    sizes = [(64, 128), (64, 128), (128, 64), (128, 64), (96, 96), (96, 96)]
    for i, (h, w) in enumerate(sizes):
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "images" / f"{i:03d}.jpg"), img)
        (root / "labels" / f"{i:03d}.txt").write_text("0 0.5 0.5 0.4 0.4")
    ds = YOLODataset(str(root / "images"), imgsz=128, augment=False, max_labels=8)
    ds.init_rect(batch_size=2, stride=32, quant=64)
    assert ds.rect and len(ds.batch_shapes) == 3
    for s in ds.batch_shapes:
        assert s[0] % 32 == 0 and s[1] % 32 == 0
        assert min(s) % 64 == 0 or min(s) == max(s)
    # wide images sort first (h/w < 1): their batch is shorter than wide
    assert ds.batch_shapes[0][0] < ds.batch_shapes[0][1]
    for i in range(len(ds)):
        item = ds[i]
        assert item["img"].shape[:2] == ds.batch_shapes[ds.batch_index[i]]
        b = item["bboxes"][item["mask"] > 0]
        assert (b > 0).all() and (b < 1).all()


def test_rect_val_e2e(tmp_path):
    """YOLO.val(rect=True) runs the bucketed-shape loop end to end."""
    yaml_path = make_dataset(tmp_path / "ds6", n=4)
    m = YOLO("tinydet.yaml")
    res = m.val(data=str(yaml_path), imgsz=64, batch=2, rect=True, workers=1,
                max_labels=16, verbose=False)
    assert "metrics/mAP50-95(B)" in res


def test_disk_cache(tmp_path):
    yaml_path = make_dataset(tmp_path / "ds7", n=2)
    info = check_det_dataset(yaml_path)
    ds = YOLODataset(info["train"], imgsz=64, augment=False, max_labels=8, cache="disk")
    _ = ds[0]
    import pathlib
    npys = list(pathlib.Path(info["train"]).glob("*.npy"))
    assert npys, "disk cache sidecar not written"
    _ = ds[0]  # served from sidecar


def test_grounding_dataset(tmp_path):
    """GroundingDataset parses caption+tokens_positive grounding json into
    per-image class vocabularies (reference data/dataset.py:306)."""
    import json
    from pathlib import Path
    root = tmp_path / "g"
    (root / "images").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(2):
        img = rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "images" / f"img{i}.jpg"), img)
    cap = "a red car next to a person"
    ann = {
        "images": [
            {"id": 1, "file_name": "img0.jpg", "height": 60, "width": 80, "caption": cap},
            {"id": 2, "file_name": "img1.jpg", "height": 60, "width": 80, "caption": cap},
        ],
        "annotations": [
            {"image_id": 1, "bbox": [8, 6, 24, 18], "iscrowd": 0,
             "tokens_positive": [[2, 9]]},          # "red car"
            {"image_id": 1, "bbox": [40, 20, 16, 30], "iscrowd": 0,
             "tokens_positive": [[20, 26]]},        # "person"
            {"image_id": 1, "bbox": [8, 6, 24, 18], "iscrowd": 0,
             "tokens_positive": [[2, 9]]},          # exact duplicate -> dropped
            {"image_id": 2, "bbox": [0, 0, 10, 10], "iscrowd": 1,
             "tokens_positive": [[20, 26]]},        # crowd -> dropped
            {"image_id": 2, "bbox": [10, 10, 20, 20], "iscrowd": 0,
             "tokens_positive": [[20, 26]]},
        ],
    }
    jf = root / "ann.json"
    jf.write_text(json.dumps(ann))

    from sar_yolo_tpu.data import GroundingDataset
    ds = GroundingDataset(str(root / "images"), json_file=str(jf), imgsz=64, max_labels=8)
    assert len(ds) == 2
    lb0 = ds.labels[[Path(f).stem for f in ds.im_files].index("img0")]
    assert len(lb0["cls"]) == 2  # duplicate dropped
    assert lb0["texts"] == [["red car"], ["person"]]
    # normalized xywh of the first box: center (20, 15)/(80, 60), wh (24, 18)
    np.testing.assert_allclose(lb0["bboxes"][0], [20 / 80, 15 / 60, 24 / 80, 18 / 60],
                               atol=1e-6)
    item = ds[0]  # full pipeline works
    assert item["img"].shape == (64, 64, 3)


def test_split_dota(tmp_path):
    """split_trainval tiles images into overlapping windows with renormalized
    OBB labels (reference data/split_dota.py:230), IoF via rect clipping."""
    from pathlib import Path as _P

    from sar_yolo_tpu.data.split_dota import bbox_iof, get_windows, split_trainval

    # IoF sanity: quad fully inside -> 1; half-in -> 0.5
    win = np.array([[0, 0, 100, 100]], np.float64)
    inside = np.array([[10, 10, 30, 10, 30, 30, 10, 30]], np.float64)
    straddle = np.array([[80, 10, 120, 10, 120, 30, 80, 30]], np.float64)
    iof = bbox_iof(np.concatenate([inside, straddle]), win)
    np.testing.assert_allclose(iof[:, 0], [1.0, 0.5], atol=1e-9)

    # windows cover the image and the edge window is shifted flush
    w = get_windows((200, 300), crop_sizes=(128,), gaps=(32,))
    assert (w[:, 2] <= 300).all() and (w[:, 3] <= 200).all()
    assert (w[:, 0] >= 0).all() and (w[:, 1] >= 0).all()

    root = tmp_path / "dota"
    for split in ("train", "val"):
        (root / "images" / split).mkdir(parents=True)
        (root / "labels" / split).mkdir(parents=True)
        img = np.full((200, 300, 3), 128, np.uint8)
        cv2.imwrite(str(root / "images" / split / "P0001.jpg"), img)
        # one OBB: axis-aligned square at (30..60, 30..60) px, normalized
        quad = np.array([30, 30, 60, 30, 60, 60, 30, 60], np.float32)
        quad[0::2] /= 300
        quad[1::2] /= 200
        (root / "labels" / split / "P0001.txt").write_text(
            "1 " + " ".join(f"{v:.6g}" for v in quad) + "\n")
    out = tmp_path / "out"
    split_trainval(str(root), str(out), crop_size=128, gap=32)
    crops = sorted((out / "images" / "train").glob("*.jpg"))
    labels = sorted((out / "labels" / "train").glob("*.txt"))
    assert crops and labels
    # the window at origin contains the full box: label renormalized to 128px
    lb = dict((p.stem, p) for p in labels)["P0001__128__0___0"].read_text().split()
    got = np.array([float(v) for v in lb[1:]]).reshape(4, 2) * 128
    np.testing.assert_allclose(got, [[30, 30], [60, 30], [60, 60], [30, 60]], atol=0.5)


def test_albumentations_noop_without_lib():
    """The Albumentations adapter is a silent no-op when the lib is absent
    (reference data/augment.py:1749 is import-gated the same way)."""
    import numpy as np

    from sar_yolo_tpu.data.augment import Albumentations

    t = Albumentations(p=1.0)
    img = np.full((32, 32, 3), 7, np.uint8)
    item = {"img": img}
    out = t(item, rng=np.random.default_rng(0))
    try:
        import albumentations  # noqa: F401
        assert out["img"].shape == img.shape  # lib present: still shape-stable
    except ImportError:
        assert out["img"] is img  # absent: exact no-op


def test_train_on_disk_dataset_device_augment(tmp_path):
    """device_augment=True on a REAL disk dataset: train batches must stay
    numeric end to end (regression: im_file/ratio_pad strings leaked into
    train batches and crashed shard_batch's device_put)."""
    yaml_path = make_dataset(tmp_path / "dsda")
    m = YOLO("tinydet.yaml")
    metrics = m.train(data=str(yaml_path), epochs=1, imgsz=64, batch=4, workers=1,
                      project=str(tmp_path), name="da", exist_ok=True, max_labels=16,
                      mesh_shape=[1], plots=False, val=False,
                      device_augment=True, copy_paste=0.0)
    assert np.isfinite(metrics["train/box"])


def test_dataloader_survives_dropped_sentinel(monkeypatch):
    """If the producer's bounded sentinel retries expire while the consumer is
    stalled (minutes inside an XLA compile), the end-of-epoch None never lands
    in the queue. The consumer must still terminate — drained queue + dead
    producer thread == end of epoch — instead of blocking in q.get forever."""
    import queue as _queue
    import threading
    import types

    import sar_yolo_tpu.data.build as build_mod

    class SentinelDroppingQueue(_queue.Queue):
        def put(self, item, *a, **kw):
            if item is None:
                return  # simulate the expired bounded-retry sentinel
            super().put(item, *a, **kw)

    fake_queue_mod = types.SimpleNamespace(
        Queue=SentinelDroppingQueue, Empty=_queue.Empty, Full=_queue.Full)
    monkeypatch.setattr(build_mod, "queue", fake_queue_mod)

    class TinyDataset:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            return {"img": np.full((4, 4, 3), i, np.uint8)}

    dl = build_mod.DataLoader(TinyDataset(), batch_size=2, shuffle=False,
                              workers=1, drop_last=False)
    got = []
    done = threading.Event()

    def consume():
        for batch in dl:
            got.append(int(batch["img"][0, 0, 0, 0]))
        done.set()

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    assert done.wait(timeout=30.0), "iteration hung after the sentinel was lost"
    assert got == [0, 2, 4]  # every batch still delivered, in order
