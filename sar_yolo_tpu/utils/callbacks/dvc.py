"""DVCLive logging (≙ reference utils/callbacks/dvc.py). Active when
SETTINGS["dvc"] and `dvclive` import."""

from __future__ import annotations

from sar_yolo_tpu.utils.settings import SETTINGS

dvclive = None
if SETTINGS.get("dvc"):
    try:
        import dvclive  # noqa: F811
        assert hasattr(dvclive, "__version__")
    except (ImportError, AssertionError):
        dvclive = None

_LIVE = None


def on_pretrain_routine_end(trainer):
    global _LIVE
    _LIVE = dvclive.Live(str(trainer.save_dir / "dvclive"), save_dvc_exp=True)
    params = dict(trainer.args) if hasattr(trainer.args, "__iter__") else vars(trainer.args)
    _LIVE.log_params({k: str(v) for k, v in params.items()})


def on_fit_epoch_end(trainer):
    if _LIVE:
        for k, v in {**trainer.metrics, **(getattr(trainer, "lr", {}) or {})}.items():
            try:
                _LIVE.log_metric(k, float(v))
            except (TypeError, ValueError):
                pass
        _LIVE.next_step()


def on_train_end(trainer):
    if _LIVE:
        for p in trainer.save_dir.glob("*.png"):
            _LIVE.log_image(p.stem, str(p))
        _LIVE.end()


callbacks = {
    "on_pretrain_routine_end": on_pretrain_routine_end,
    "on_fit_epoch_end": on_fit_epoch_end,
    "on_train_end": on_train_end,
} if dvclive else {}
