from sar_yolo_tpu.engine.predictor import JDEPredictor
from sar_yolo_tpu.engine.trainer import JDETrainer
from sar_yolo_tpu.engine.validator import JDEValidator

__all__ = ["JDETrainer", "JDEValidator", "JDEPredictor"]
