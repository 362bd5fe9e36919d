"""Task packages (reference models/ layout parity: models/yolo/{detect,...,jde})."""

from sar_yolo_tpu.models.yolo import YOLO

__all__ = ["YOLO"]
