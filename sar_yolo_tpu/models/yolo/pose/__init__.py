from sar_yolo_tpu.engine.predictor import PosePredictor
from sar_yolo_tpu.engine.trainer import PoseTrainer
from sar_yolo_tpu.engine.validator import PoseValidator

__all__ = ["PoseTrainer", "PoseValidator", "PosePredictor"]
