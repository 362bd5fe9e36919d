"""Ray Tune session reporting (≙ reference utils/callbacks/raytune.py). Active
when SETTINGS["raytune"] and `ray.tune` import; reports per-epoch metrics to an
in-progress Ray Tune session so schedulers (ASHA etc.) can early-stop trials."""

from __future__ import annotations

from sar_yolo_tpu.utils.settings import SETTINGS

tune = None
if SETTINGS.get("raytune"):
    try:
        from ray import train, tune  # noqa: F811
    except ImportError:
        tune = None


def on_fit_epoch_end(trainer):
    try:
        in_session = train.get_context().get_trial_name() is not None
    except Exception:
        in_session = False
    if in_session:
        train.report({**trainer.metrics, "epoch": trainer.epoch + 1})


callbacks = {"on_fit_epoch_end": on_fit_epoch_end} if tune else {}
