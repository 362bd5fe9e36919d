"""Task packages (reference models/ layout parity: models/yolo/{detect,...,jde})."""

from sar_yolo_tpu.models.yolo import YOLO


def __getattr__(name):  # lazy: SAM pulls in flax module trees
    if name == "SAM":
        from sar_yolo_tpu.models.sam import SAM
        return SAM
    if name == "FastSAM":
        from sar_yolo_tpu.models.fastsam import FastSAM
        return FastSAM
    if name == "NAS":
        from sar_yolo_tpu.models.nas import NAS
        return NAS
    if name == "RTDETR":
        from sar_yolo_tpu.models.rtdetr import RTDETR
        return RTDETR
    raise AttributeError(name)


__all__ = ["YOLO", "SAM", "FastSAM", "NAS", "RTDETR"]
