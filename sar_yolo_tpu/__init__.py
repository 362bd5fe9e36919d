"""SAR-YOLO-TPU: a TPU-native (JAX/XLA/Pallas) detection + ReID framework.

Brand-new implementation with capability parity to the reference SAR-YOLO stack
(Ultralytics YOLO fork for UAV search-and-rescue: YOLOv8..v13 detection, JDE
joint detection/embedding/posture, pose, segment, OBB, tracking, export).
"""

__version__ = "0.2.0"

__all__ = ["YOLO", "YOLOWorld", "RTDETR", "SAM", "FastSAM", "NAS", "settings",
           "checks", "__version__"]


def __getattr__(name):  # lazy import keeps `import sar_yolo_tpu` light
    if name == "YOLO":
        from sar_yolo_tpu.engine.model import YOLO
        return YOLO
    if name == "SAM":
        from sar_yolo_tpu.models.sam import SAM
        return SAM
    if name == "settings":
        from sar_yolo_tpu.utils.settings import SETTINGS
        return SETTINGS
    if name == "checks":
        from sar_yolo_tpu.utils import checks
        return checks
    if name == "YOLOWorld":
        from sar_yolo_tpu.models.yolo.world import YOLOWorld
        return YOLOWorld
    if name == "RTDETR":
        from sar_yolo_tpu.models.rtdetr import RTDETR
        return RTDETR
    if name == "FastSAM":
        from sar_yolo_tpu.models.fastsam import FastSAM
        return FastSAM
    if name == "NAS":
        from sar_yolo_tpu.models.nas import NAS
        return NAS
    raise AttributeError(name)
