"""ctypes bindings for the native host runtime (csrc/saryolo_native.cpp).

Builds on demand (`make -C csrc`) if the .so is missing and a compiler exists;
all callers fall back to the numpy/cv2 path when unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path  # noqa: F401 — used in _LIB_PATH

import numpy as np

from sar_yolo_tpu.utils import LOGGER, ROOT

_LIB_PATH = ROOT / "lib" / "libsaryolo_native.so"
_lib = None
_tried = False


def load_native():
    """Load (building if needed) the native library; returns None on failure."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _LIB_PATH.exists():
            csrc = ROOT.parent / "csrc"
            if (csrc / "Makefile").exists():
                subprocess.run(["make", "-C", str(csrc)], check=True,
                               capture_output=True, timeout=120)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.sy_letterbox_u8.restype = ctypes.c_float
        lib.sy_nms.restype = ctypes.c_int
        _lib = lib
    except Exception as e:  # noqa: BLE001 — native path is strictly optional
        LOGGER.warning(f"native library unavailable ({e}); using numpy fallback")
        _lib = None
    return _lib


def letterbox_native(img: np.ndarray, imgsz: int, scaleup: bool = False,
                     pad_value: int = 114):
    """C++ letterbox; returns (out_u8 (imgsz,imgsz,3), r, (pad_x, pad_y)) or None."""
    lib = load_native()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    out = np.empty((imgsz, imgsz, 3), np.uint8)
    px = ctypes.c_int()
    py = ctypes.c_int()
    r = lib.sy_letterbox_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), imgsz,
        int(scaleup), pad_value, ctypes.byref(px), ctypes.byref(py))
    return out, float(r), (px.value, py.value)


def nms_native(boxes: np.ndarray, scores: np.ndarray, iou_thres: float = 0.7,
               max_det: int = 300):
    """C++ greedy NMS; returns kept indices (for exported-model deploy paths)."""
    lib = load_native()
    if lib is None:
        return None
    boxes = np.ascontiguousarray(boxes, np.float32)
    scores = np.ascontiguousarray(scores, np.float32)
    keep = np.empty(max_det, np.int32)
    n = lib.sy_nms(boxes.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                   scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                   len(boxes), ctypes.c_float(iou_thres), max_det,
                   keep.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return keep[:n]


def decode_jpeg_native(buf: bytes, max_h: int = 8192, max_w: int = 8192):
    """C++ libjpeg decode to RGB uint8; returns array or None."""
    lib = load_native()
    if lib is None or not hasattr(lib, "sy_decode_jpeg"):
        return None
    out = np.empty((max_h, max_w, 3), np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.sy_decode_jpeg(ctypes.cast(buf, ctypes.POINTER(ctypes.c_uint8)),
                            len(buf),
                            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                            max_h, max_w, ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        return None
    # C writes rows compactly (stride = w*3), not at the max_w buffer stride
    hw = h.value * w.value * 3
    return out.ravel()[:hw].reshape(h.value, w.value, 3).copy()
