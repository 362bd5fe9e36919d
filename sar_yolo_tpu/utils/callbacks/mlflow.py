"""MLflow logging (≙ reference utils/callbacks/mlflow.py).

Active when SETTINGS["mlflow"] is true and `mlflow` is installed. Tracking URI
comes from MLFLOW_TRACKING_URI (defaults to ./runs/mlflow), experiment name
from MLFLOW_EXPERIMENT_NAME or the trainer's project.
"""

from __future__ import annotations

import os

from sar_yolo_tpu.utils import LOGGER
from sar_yolo_tpu.utils.settings import SETTINGS

mlflow = None
if SETTINGS.get("mlflow"):
    try:
        import mlflow  # noqa: F811
        assert hasattr(mlflow, "__version__")
    except (ImportError, AssertionError):
        mlflow = None


def _sanitize(metrics: dict) -> dict:
    out = {}
    for k, v in metrics.items():
        try:
            out[k.replace("(", "").replace(")", "")] = float(v)
        except (TypeError, ValueError):
            pass
    return out


def on_pretrain_routine_end(trainer):
    uri = os.environ.get("MLFLOW_TRACKING_URI") or str(trainer.save_dir / "mlflow")
    mlflow.set_tracking_uri(uri)
    exp = os.environ.get("MLFLOW_EXPERIMENT_NAME") or \
        str(getattr(trainer.args, "project", None) or "sar-yolo-tpu")
    mlflow.set_experiment(exp)
    try:
        mlflow.start_run(run_name=str(getattr(trainer.args, "name", None)
                                      or trainer.save_dir.name))
        params = dict(trainer.args) if hasattr(trainer.args, "__iter__") else vars(trainer.args)
        mlflow.log_params({k: str(v) for k, v in params.items()})
    except Exception as e:
        LOGGER.warning(f"mlflow init failed: {e}")


def on_fit_epoch_end(trainer):
    if mlflow.active_run():
        mlflow.log_metrics(_sanitize({**trainer.metrics,
                                      **(getattr(trainer, "lr", {}) or {})}),
                           step=trainer.epoch)


def on_train_end(trainer):
    if mlflow.active_run():
        for f in ("results.csv", "results.png"):
            p = trainer.save_dir / f
            if p.exists():
                mlflow.log_artifact(str(p))
        mlflow.end_run()


callbacks = {
    "on_pretrain_routine_end": on_pretrain_routine_end,
    "on_fit_epoch_end": on_fit_epoch_end,
    "on_train_end": on_train_end,
} if mlflow else {}
