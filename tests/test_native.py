"""Native C++ host runtime vs numpy/cv2 reference."""

import numpy as np
import pytest

from sar_yolo_tpu.utils.native import letterbox_native, load_native, nms_native, decode_jpeg_native


pytestmark = pytest.mark.skipif(load_native() is None, reason="native lib unavailable")


def test_native_letterbox_matches_cv2():
    from sar_yolo_tpu.data.augment import letterbox
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (97, 143, 3), dtype=np.uint8)
    out_c, r_c, pad_c = letterbox_native(img, 64)
    out_py, r_py, pad_py = letterbox(img, 64, scaleup=False)
    assert abs(r_c - r_py) < 1e-6
    assert pad_c == pad_py
    # bilinear rounding differences only
    diff = np.abs(out_c.astype(int) - out_py.astype(int))
    assert np.mean(diff) < 3.0
    assert (diff > 30).mean() < 0.02


def test_native_nms_matches_python():
    # top-level import (pytest puts tests/ on sys.path): `tests.test_ops`
    # would resolve to the REFERENCE's tests package once ref_stubs adds
    # /root/reference to sys.path (its tests/ has __init__.py and wins over
    # our namespace dir)
    from test_ops import _numpy_nms
    rng = np.random.default_rng(1)
    n = 80
    xy = rng.uniform(0, 500, (n, 2)).astype(np.float32)
    wh = rng.uniform(20, 90, (n, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], 1)
    scores = rng.uniform(0.01, 1, n).astype(np.float32)
    keep_c = nms_native(boxes, scores, 0.5, 50)
    keep_py = _numpy_nms(boxes, scores, 0.5)[:50]
    assert list(keep_c) == list(keep_py)


def test_native_jpeg_decode():
    import cv2
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    ok, enc = cv2.imencode(".jpg", img)
    assert ok
    dec = decode_jpeg_native(enc.tobytes())
    if dec is None:
        pytest.skip("libjpeg not compiled in")
    assert dec.shape == (48, 64, 3)
    ref = cv2.cvtColor(cv2.imdecode(enc, cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
    assert np.mean(np.abs(dec.astype(int) - ref.astype(int))) < 4
