"""RT-DETR model family (reference models/rtdetr/ parity)."""

from sar_yolo_tpu.engine.model import YOLO
from sar_yolo_tpu.engine.predictor import RTDETRPredictor
from sar_yolo_tpu.engine.trainer import RTDETRTrainer
from sar_yolo_tpu.engine.validator import RTDETRValidator


class RTDETR(YOLO):
    """RT-DETR facade: YOLO API over the transformer detector."""

    def __init__(self, model="rtdetr-l.yaml", task=None, verbose=False):
        super().__init__(model, task="detect", verbose=verbose)

    @property
    def task_map(self):
        return {"detect": {"trainer": RTDETRTrainer, "validator": RTDETRValidator,
                           "predictor": RTDETRPredictor}}


__all__ = ["RTDETR", "RTDETRTrainer", "RTDETRValidator", "RTDETRPredictor"]
