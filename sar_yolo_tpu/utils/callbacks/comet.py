"""Comet ML logging (≙ reference utils/callbacks/comet.py, trimmed to the
experiment/metric/asset core). Active when SETTINGS["comet"] and `comet_ml`
import."""

from __future__ import annotations

from sar_yolo_tpu.utils.settings import SETTINGS

comet_ml = None
if SETTINGS.get("comet"):
    try:
        import comet_ml  # noqa: F811
        assert hasattr(comet_ml, "__version__")
    except (ImportError, AssertionError):
        comet_ml = None

_EXP = None


def on_pretrain_routine_end(trainer):
    global _EXP
    _EXP = comet_ml.Experiment(
        project_name=str(getattr(trainer.args, "project", None) or "sar-yolo-tpu"))
    _EXP.set_name(str(getattr(trainer.args, "name", None) or trainer.save_dir.name))
    params = dict(trainer.args) if hasattr(trainer.args, "__iter__") else vars(trainer.args)
    _EXP.log_parameters({k: str(v) for k, v in params.items()})


def on_fit_epoch_end(trainer):
    if not _EXP:
        return
    _EXP.log_metrics({**trainer.metrics, **(getattr(trainer, "lr", {}) or {})},
                     epoch=trainer.epoch)
    # per-epoch confusion matrix + annotated eval previews (≙ reference
    # comet.py _log_confusion_matrix:275 / _log_images with annotations:300)
    cm = getattr(getattr(trainer, "validator", None), "confusion_matrix", None)
    if cm is not None and getattr(cm, "matrix", None) is not None:
        names = list((trainer.data.get("names") or {}).values())
        _EXP.log_confusion_matrix(
            matrix=cm.matrix.astype(int).tolist(),
            labels=names + ["background"] if names else None,
            epoch=trainer.epoch, file_name=f"confusion-matrix-{trainer.epoch}.json")
    for p in trainer.save_dir.glob("val_batch*_pred.jpg"):
        _EXP.log_image(str(p), name=p.stem, step=trainer.epoch)


def on_train_end(trainer):
    if _EXP:
        for p in trainer.save_dir.glob("*.png"):
            _EXP.log_image(str(p), name=p.stem)
        best = trainer.wdir / "best"
        if best.exists():
            _EXP.log_asset_folder(str(best)) if best.is_dir() else _EXP.log_asset(str(best))
        _EXP.end()


callbacks = {
    "on_pretrain_routine_end": on_pretrain_routine_end,
    "on_fit_epoch_end": on_fit_epoch_end,
    "on_train_end": on_train_end,
} if comet_ml else {}
