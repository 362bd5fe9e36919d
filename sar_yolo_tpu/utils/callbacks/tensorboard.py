"""TensorBoard logging (≙ reference utils/callbacks/tensorboard.py).

Active only when SETTINGS["tensorboard"] is true AND a SummaryWriter is
importable (torch ships one; the standalone `tensorboard` package also works).
Event files land in trainer.save_dir — point `tensorboard --logdir` there.
"""

from __future__ import annotations

from sar_yolo_tpu.utils import LOGGER
from sar_yolo_tpu.utils.settings import SETTINGS

SummaryWriter = None
if SETTINGS.get("tensorboard"):
    try:
        from torch.utils.tensorboard import SummaryWriter  # noqa: F811
    except ImportError:
        try:
            from tensorboardX import SummaryWriter  # noqa: F811
        except ImportError:
            LOGGER.warning("tensorboard enabled in settings but no SummaryWriter found")

_WRITER = None


def _scalars(writer, scalars: dict, step: int):
    for k, v in scalars.items():
        try:
            writer.add_scalar(k, float(v), step)
        except (TypeError, ValueError):
            pass  # non-scalar metric (e.g. per-class array)


def on_pretrain_routine_start(trainer):
    global _WRITER
    _WRITER = SummaryWriter(str(trainer.save_dir))
    LOGGER.info(f"TensorBoard: logging to {trainer.save_dir}")


def on_fit_epoch_end(trainer):
    if _WRITER:
        _scalars(_WRITER, trainer.metrics, trainer.epoch)
        _scalars(_WRITER, getattr(trainer, "lr", {}) or {}, trainer.epoch)


def on_train_end(trainer):
    if _WRITER:
        _WRITER.flush()
        _WRITER.close()


callbacks = {
    "on_pretrain_routine_start": on_pretrain_routine_start,
    "on_fit_epoch_end": on_fit_epoch_end,
    "on_train_end": on_train_end,
} if SummaryWriter else {}
