"""ClearML logging (≙ reference utils/callbacks/clearml.py). Active when
SETTINGS["clearml"] and `clearml` import."""

from __future__ import annotations

from sar_yolo_tpu.utils.settings import SETTINGS

clearml = None
if SETTINGS.get("clearml"):
    try:
        import clearml  # noqa: F811
        from clearml import Task
        assert hasattr(clearml, "__version__")
    except (ImportError, AssertionError):
        clearml = None

_TASK = None


def on_pretrain_routine_end(trainer):
    global _TASK
    _TASK = Task.current_task() or Task.init(
        project_name=str(getattr(trainer.args, "project", None) or "sar-yolo-tpu"),
        task_name=str(getattr(trainer.args, "name", None) or trainer.save_dir.name),
        output_uri=False)
    params = dict(trainer.args) if hasattr(trainer.args, "__iter__") else vars(trainer.args)
    _TASK.connect({k: str(v) for k, v in params.items()}, name="hyperparameters")


def on_fit_epoch_end(trainer):
    if _TASK:
        logger = _TASK.get_logger()
        for k, v in {**trainer.metrics, **(getattr(trainer, "lr", {}) or {})}.items():
            try:
                title, series = (k.split("/", 1) + [k])[:2]
                logger.report_scalar(title, series, float(v), trainer.epoch)
            except (TypeError, ValueError):
                pass
        # debug samples per epoch (≙ reference clearml.py _log_debug_samples)
        for p in trainer.save_dir.glob("val_batch*_pred.jpg"):
            logger.report_image("validation", p.stem, local_path=str(p),
                                iteration=trainer.epoch)


def on_train_end(trainer):
    if _TASK:
        for p in trainer.save_dir.glob("*.png"):
            _TASK.get_logger().report_image("plots", p.stem, local_path=str(p))
        _TASK.close()


callbacks = {
    "on_pretrain_routine_end": on_pretrain_routine_end,
    "on_fit_epoch_end": on_fit_epoch_end,
    "on_train_end": on_train_end,
} if clearml else {}
