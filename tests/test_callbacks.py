"""Logger integrations (utils/callbacks package) + settings registry.

Reference capability: utils/callbacks/{tensorboard,wb,mlflow,...}.py registered
via add_integration_callbacks (base.py:212), gated by SETTINGS flags.
"""

import importlib
import json
import sys

import numpy as np


def test_settings_env_override(tmp_path, monkeypatch):
    monkeypatch.setenv("SARYOLO_SETTINGS", str(tmp_path / "settings.json"))
    monkeypatch.setenv("SARYOLO_TENSORBOARD", "1")
    import sar_yolo_tpu.utils.settings as S
    importlib.reload(S)
    assert S.SETTINGS["tensorboard"] is True
    assert S.SETTINGS["wandb"] is False
    S.update_settings(mlflow=True)
    assert json.loads((tmp_path / "settings.json").read_text())["mlflow"] is True
    try:
        S.update_settings(nope=1)
        raise AssertionError("expected KeyError")
    except KeyError:
        pass
    monkeypatch.delenv("SARYOLO_TENSORBOARD")
    monkeypatch.setenv("SARYOLO_SETTINGS", str(tmp_path / "nonexistent.json"))
    importlib.reload(S)


def test_integrations_default_noop(tmp_path, monkeypatch):
    """With all flags off, every integration exposes an empty callbacks dict."""
    monkeypatch.setenv("SARYOLO_SETTINGS", str(tmp_path / "none.json"))
    import sar_yolo_tpu.utils.settings as S
    importlib.reload(S)
    from sar_yolo_tpu.utils.callbacks import (clearml, comet, dvc, mlflow, neptune,
                                              raytune, tensorboard, wb)
    for mod in (tensorboard, wb, mlflow, comet, clearml, dvc, neptune, raytune):
        importlib.reload(mod)
        assert mod.callbacks == {}, mod.__name__


def test_tensorboard_integration_end_to_end(tmp_path, monkeypatch):
    """SARYOLO_TENSORBOARD=1 -> trainer writes tfevents files to save_dir."""
    monkeypatch.setenv("SARYOLO_TENSORBOARD", "1")
    import sar_yolo_tpu.utils.settings as S
    importlib.reload(S)
    import sar_yolo_tpu.utils.callbacks.tensorboard as tb
    importlib.reload(tb)
    if not tb.callbacks:
        import pytest
        pytest.skip("no SummaryWriter available")

    class FakeTrainer:
        pass

    t = FakeTrainer()
    t.save_dir = tmp_path / "run"
    t.save_dir.mkdir()
    t.metrics = {"metrics/mAP50-95(B)": 0.5, "train/box": 1.25}
    t.lr = {"lr/pg0": 0.01}
    t.epoch = 0
    tb.on_pretrain_routine_start(t)
    tb.on_fit_epoch_end(t)
    tb.on_train_end(t)
    assert list(t.save_dir.glob("events.out.tfevents.*")), "no event file written"
    monkeypatch.delenv("SARYOLO_TENSORBOARD")
    importlib.reload(S)
    importlib.reload(tb)


def test_add_integration_callbacks_registers(monkeypatch):
    from sar_yolo_tpu.utils.callbacks import HasCallbacks, add_integration_callbacks

    class T(HasCallbacks):
        pass

    t = T()
    t.init_callbacks()
    add_integration_callbacks(t)  # all flags off: registry unchanged but valid
    assert all(isinstance(v, list) for v in t.callbacks.values())
