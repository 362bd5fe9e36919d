"""YOLO-NAS facade (reference models/nas/: model.py NAS:9, val.py, predict.py —
a predict/val-only wrapper; training is not supported upstream either).

The reference loads super-gradients torch checkpoints; those are torch-native
artifacts with no TPU path, so here NAS wraps any detect-task yaml/checkpoint
under the same restricted API surface (predict/val only, train raises), which
is the behavioral contract of the reference class.
"""

from __future__ import annotations

from sar_yolo_tpu.engine.model import YOLO


class NAS(YOLO):
    def __init__(self, model="yolo_nas.yaml", task=None, verbose=False):
        super().__init__(model, task="detect", verbose=verbose)

    def train(self, **kwargs):
        raise NotImplementedError(
            "YOLO-NAS models only support predict/val (reference models/nas/model.py)")
