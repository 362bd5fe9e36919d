from sar_yolo_tpu.engine.predictor import SegmentPredictor
from sar_yolo_tpu.engine.trainer import SegmentTrainer
from sar_yolo_tpu.engine.validator import SegmentValidator

__all__ = ["SegmentTrainer", "SegmentValidator", "SegmentPredictor"]
