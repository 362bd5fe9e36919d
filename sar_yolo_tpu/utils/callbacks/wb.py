"""Weights & Biases logging (≙ reference utils/callbacks/wb.py).

Active when SETTINGS["wandb"] is true and the `wandb` package is installed.
Logs hyperparameters at pretrain end, train/val metrics + lr per epoch, and
uploads the best checkpoint + result plots as artifacts at train end.
"""

from __future__ import annotations

from sar_yolo_tpu.utils.settings import SETTINGS

wandb = None
if SETTINGS.get("wandb"):
    try:
        import wandb  # noqa: F811
        assert hasattr(wandb, "__version__")
    except (ImportError, AssertionError):
        wandb = None

_RUN = None


def on_pretrain_routine_end(trainer):
    global _RUN
    _RUN = wandb.run or wandb.init(
        project=str(getattr(trainer.args, "project", None) or "sar-yolo-tpu"),
        name=str(getattr(trainer.args, "name", None) or trainer.save_dir.name),
        config=dict(trainer.args) if hasattr(trainer.args, "__iter__") else vars(trainer.args),
    )


def on_fit_epoch_end(trainer):
    if not _RUN:
        return
    _RUN.log({**trainer.metrics, **(getattr(trainer, "lr", {}) or {})},
             step=trainer.epoch + 1)
    # annotated val previews per epoch (≙ reference wb.py _log_plots)
    for p in trainer.save_dir.glob("val_batch*_pred.jpg"):
        _RUN.log({p.stem: wandb.Image(str(p))}, step=trainer.epoch + 1)


def on_train_end(trainer):
    if _RUN:
        best = trainer.wdir / "best"
        if best.exists():
            art = wandb.Artifact(f"run_{_RUN.id}_model", type="model")
            art.add_dir(str(best)) if best.is_dir() else art.add_file(str(best))
            _RUN.log_artifact(art, aliases=["best"])
        for png in trainer.save_dir.glob("*.png"):
            _RUN.log({png.stem: wandb.Image(str(png))})
        _RUN.finish()


callbacks = {
    "on_pretrain_routine_end": on_pretrain_routine_end,
    "on_fit_epoch_end": on_fit_epoch_end,
    "on_train_end": on_train_end,
} if wandb else {}
