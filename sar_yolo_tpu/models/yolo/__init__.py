from sar_yolo_tpu.engine.model import YOLO
from . import detect, jde, pose, segment

__all__ = ["YOLO", "detect", "jde", "pose", "segment"]
