"""Hub trainer callbacks (≙ reference utils/callbacks/hub.py).

Active when SETTINGS["hub"] is true AND a hub endpoint is configured
(`SARYOLO_HUB_API`); otherwise `callbacks` is empty and training never touches
the network. Metrics are queued per epoch and flushed under the session's
rate limit; checkpoints (orbax dirs, zipped by the session) upload under a
much slower limit; the final best checkpoint uploads synchronously.
"""

from __future__ import annotations

import json
import os

from sar_yolo_tpu.utils import LOGGER
from sar_yolo_tpu.utils.settings import SETTINGS


def on_pretrain_routine_start(trainer):
    if getattr(trainer, "hub_session", None) is None:
        from sar_yolo_tpu.hub import HUBTrainingSession

        args = {k: getattr(trainer.args, k, None)
                for k in ("batch", "epochs", "imgsz", "patience", "cache", "data")}
        trainer.hub_session = HUBTrainingSession.create_session(
            getattr(trainer.args, "model", None) or "model.yaml", args)


def on_fit_epoch_end(trainer):
    session = getattr(trainer, "hub_session", None)
    if session is None:
        return
    payload = {k: float(v) for k, v in (trainer.metrics or {}).items()
               if isinstance(v, (int, float))}
    session.metrics_queue[trainer.epoch] = json.dumps(payload)
    if not session.rate_limited("metrics"):
        session.upload_metrics()


def on_model_save(trainer):
    session = getattr(trainer, "hub_session", None)
    if session is None:
        return
    if not session.rate_limited("ckpt"):
        is_best = trainer.fitness is not None and trainer.fitness == trainer.best_fitness
        session.upload_model(trainer.epoch, trainer.wdir / "last", is_best=is_best)


def on_train_end(trainer):
    session = getattr(trainer, "hub_session", None)
    if session is None:
        return
    best = trainer.wdir / "best"
    target = best if best.exists() else trainer.wdir / "last"
    session.upload_model(trainer.epoch, target,
                         map=float((trainer.metrics or {}).get("metrics/mAP50-95(B)", 0.0)),
                         final=True, thread=False)
    session.upload_metrics(thread=False)  # drain any rate-limited leftovers
    session.stop()
    if session.model_url:
        LOGGER.info(f"hub: final model synced — {session.model_url}")


callbacks = {
    "on_pretrain_routine_start": on_pretrain_routine_start,
    "on_fit_epoch_end": on_fit_epoch_end,
    "on_model_save": on_model_save,
    "on_train_end": on_train_end,
} if SETTINGS.get("hub") and os.environ.get("SARYOLO_HUB_API") else {}
