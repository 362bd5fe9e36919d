from sar_yolo_tpu.engine.predictor import DetectionPredictor
from sar_yolo_tpu.engine.trainer import DetectionTrainer
from sar_yolo_tpu.engine.validator import DetectionValidator

__all__ = ["DetectionTrainer", "DetectionValidator", "DetectionPredictor"]
