"""NeptuneAI logging (≙ reference utils/callbacks/neptune.py). Active when
SETTINGS["neptune"] and `neptune` import."""

from __future__ import annotations

from sar_yolo_tpu.utils.settings import SETTINGS

neptune = None
if SETTINGS.get("neptune"):
    try:
        import neptune  # noqa: F811
        assert hasattr(neptune, "__version__")
    except (ImportError, AssertionError):
        neptune = None

_RUN = None


def on_pretrain_routine_end(trainer):
    global _RUN
    _RUN = neptune.init_run(
        project=str(getattr(trainer.args, "project", None) or "sar-yolo-tpu"),
        name=str(getattr(trainer.args, "name", None) or trainer.save_dir.name))
    params = dict(trainer.args) if hasattr(trainer.args, "__iter__") else vars(trainer.args)
    _RUN["configuration/hyperparameters"] = {k: str(v) for k, v in params.items()}


def on_fit_epoch_end(trainer):
    if _RUN:
        for k, v in {**trainer.metrics, **(getattr(trainer, "lr", {}) or {})}.items():
            try:
                _RUN[k].append(float(v), step=trainer.epoch)
            except (TypeError, ValueError):
                pass


def on_train_end(trainer):
    if _RUN:
        for p in trainer.save_dir.glob("*.png"):
            _RUN[f"plots/{p.stem}"].upload(str(p))
        _RUN.stop()


callbacks = {
    "on_pretrain_routine_end": on_pretrain_routine_end,
    "on_fit_epoch_end": on_fit_epoch_end,
    "on_train_end": on_train_end,
} if neptune else {}
