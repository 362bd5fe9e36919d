"""SAR-YOLO-TPU: a TPU-native (JAX/XLA/Pallas) detection + ReID framework.

Brand-new implementation with capability parity to the reference SAR-YOLO stack
(Ultralytics YOLO fork for UAV search-and-rescue: YOLOv8..v13 detection, JDE
joint detection/embedding/posture, pose, segment, OBB, tracking, export).
"""

__version__ = "0.1.0"

__all__ = ["YOLO", "__version__"]


def __getattr__(name):  # lazy import keeps `import sar_yolo_tpu` light
    if name == "YOLO":
        from sar_yolo_tpu.engine.model import YOLO
        return YOLO
    raise AttributeError(name)
