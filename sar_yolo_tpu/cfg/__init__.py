"""Config layer: merge/validate user overrides onto default.yaml, CLI entrypoint.

Capability parity with reference cfg layer (ultralytics/cfg/__init__.py:271 get_cfg,
:319 check_cfg, :820 entrypoint, TASKS/MODES :50-76) — new implementation.
"""

from __future__ import annotations

import difflib
import sys
from pathlib import Path
from typing import Any

from sar_yolo_tpu.utils import DEFAULT_CFG_DICT, IterableSimpleNamespace, LOGGER, ROOT, yaml_load

TASKS = {"detect", "segment", "classify", "pose", "obb", "jde"}
MODES = {"train", "val", "predict", "export", "track", "benchmark", "tune"}

TASK2DATA = {
    "detect": "coco8.yaml",
    "segment": "coco8-seg.yaml",
    "classify": "imagenet10",
    "pose": "coco8-pose.yaml",
    "obb": "dota8.yaml",
    "jde": "person-search.yaml",
}
TASK2MODEL = {
    "detect": "yolov8n.yaml",
    "segment": "yolov8n-seg.yaml",
    "classify": "yolov8n-cls.yaml",
    "pose": "yolov8n-pose.yaml",
    "obb": "yolov8n-obb.yaml",
    "jde": "yolov13n-JDE.yaml",
}

# Type constraint tables (key -> expected kinds), mirroring reference check_cfg.
CFG_FLOAT_KEYS = {"warmup_epochs", "box", "cls", "dfl", "degrees", "shear", "time", "workspace",
                  "batch", "clr", "state", "state_focal_gamma", "state_cb_beta"}
CFG_FRACTION_KEYS = {"dropout", "lr0", "lrf", "momentum", "weight_decay", "warmup_momentum",
                     "warmup_bias_lr", "hsv_h", "hsv_s", "hsv_v", "translate", "scale",
                     "perspective", "flipud", "fliplr", "bgr", "mosaic", "mixup", "copy_paste",
                     "conf", "iou", "fraction", "erasing", "crop_fraction"}
CFG_INT_KEYS = {"epochs", "patience", "workers", "seed", "close_mosaic", "mask_ratio",
                "max_det", "vid_stride", "line_width", "nbs", "save_period", "max_labels"}
CFG_BOOL_KEYS = {"save", "exist_ok", "verbose", "deterministic", "single_cls", "rect", "cos_lr",
                 "overlap_mask", "val", "save_json", "save_hybrid", "half", "dnn", "plots",
                 "show", "save_txt", "save_conf", "save_crop", "save_frames", "show_labels",
                 "show_conf", "visualize", "augment", "agnostic_nms", "retina_masks",
                 "show_boxes", "keras", "optimize", "int8", "dynamic", "simplify", "nms",
                 "profile", "multi_scale", "stream_buffer", "use_state_cb", "remat"}


def cfg2dict(cfg) -> dict:
    """Convert a config object (path / dict / namespace) to a plain dict."""
    if isinstance(cfg, (str, Path)):
        return yaml_load(cfg)
    if isinstance(cfg, IterableSimpleNamespace):
        return vars(cfg)
    return dict(cfg)


def check_dict_alignment(base: dict, custom: dict) -> None:
    """Raise with near-miss suggestions if custom contains keys not in base."""
    mismatched = [k for k in custom if k not in base]
    if mismatched:
        msgs = []
        for k in mismatched:
            matches = difflib.get_close_matches(k, base.keys())
            hint = f" (did you mean {matches}?)" if matches else ""
            msgs.append(f"'{k}' is not a valid config key{hint}")
        raise SyntaxError("\n".join(msgs))


def check_cfg(cfg: dict, hard: bool = True) -> None:
    """Type/range-check config values in place (numbers coerced, fractions bounded)."""
    for k, v in cfg.items():
        if v is None:
            continue
        if k in CFG_FLOAT_KEYS and not isinstance(v, (int, float)):
            if hard:
                raise TypeError(f"'{k}={v}' must be a number")
            cfg[k] = float(v)
        elif k in CFG_FRACTION_KEYS:
            if not isinstance(v, (int, float)):
                if hard:
                    raise TypeError(f"'{k}={v}' must be a number")
                v = cfg[k] = float(v)
            if not 0.0 <= v <= 1.0:
                raise ValueError(f"'{k}={v}' must be in [0, 1]")
        elif k in CFG_INT_KEYS and not isinstance(v, int):
            if hard:
                raise TypeError(f"'{k}={v}' must be an int")
            cfg[k] = int(v)
        elif k in CFG_BOOL_KEYS and not isinstance(v, bool):
            if k == "int8" and str(v).lower() == "auto":
                cfg[k] = "auto"  # scale-aware int8 policy (engine/model.py)
                continue
            if k == "profile" and str(v).lower() == "trace":
                cfg[k] = "trace"  # jax.profiler trace dir (engine/trainer.py)
                continue
            if hard:
                raise TypeError(f"'{k}={v}' must be a bool")
            cfg[k] = bool(v)


def _handle_deprecation(custom: dict) -> dict:
    """Map legacy keys to their current names with a warning (reference
    cfg/__init__.py:413 _handle_deprecation — lets configs written for old
    ultralytics versions keep working)."""
    from sar_yolo_tpu.utils import LOGGER
    renames = {"boxes": "show_boxes", "line_thickness": "line_width"}
    inverted = {"hide_labels": "show_labels", "hide_conf": "show_conf"}
    for old, new in renames.items():
        if old in custom:
            LOGGER.warning(f"'{old}' is deprecated, use '{new}'")
            custom[new] = custom.pop(old)
    for old, new in inverted.items():
        if old in custom:
            LOGGER.warning(f"'{old}' is deprecated, use '{new}' (inverted)")
            v = custom.pop(old)
            custom[new] = (str(v) == "False") if isinstance(v, str) else not v
    if "label_smoothing" in custom:
        LOGGER.warning("'label_smoothing' is deprecated and has no effect")
        custom.pop("label_smoothing")
    return custom


def get_cfg(cfg=None, overrides: dict | None = None) -> IterableSimpleNamespace:
    """Merge overrides onto cfg (default config if None) and validate.

    Layering matches the reference: default < cfg < overrides.
    """
    cfg = cfg2dict(cfg) if cfg is not None else dict(DEFAULT_CFG_DICT)
    merged = {**DEFAULT_CFG_DICT, **_handle_deprecation(cfg)}
    if overrides:
        overrides = _handle_deprecation(cfg2dict(overrides))
        overrides.pop("save_dir", None)
        check_dict_alignment(merged, overrides)
        merged = {**merged, **overrides}
    for k in ("project", "name"):
        if merged.get(k) is not None:
            merged[k] = str(merged[k])
    if merged.get("name") == "model" or merged.get("name") is None:
        merged["name"] = merged.get("task", "run")
    check_cfg(merged, hard=False)
    return IterableSimpleNamespace(**merged)


def get_save_dir(args, name: str | None = None) -> Path:
    """Resolve the run save directory: project/name with auto-increment."""
    project = Path(args.project or Path("runs")) / args.task
    base = name or args.name or "exp"
    save_dir = project / base
    if save_dir.exists() and not getattr(args, "exist_ok", False):
        for i in range(2, 10000):
            cand = project / f"{base}{i}"
            if not cand.exists():
                save_dir = cand
                break
    return save_dir


def find_model_yaml(name: str) -> Path | None:
    """Locate a bundled model yaml by name, searching cfg/models/** (scale-aware).

    'yolov8n.yaml' resolves to models/v8/yolov8.yaml with scale 'n' applied by the
    model loader (same convention as the reference yaml_model_load).
    """
    name = Path(name).name
    candidates = [name]
    stem = Path(name).stem
    # strip scale char: yolov8n -> yolov8, yolov13s-JDE -> yolov13-JDE
    import re
    m = re.match(r"(yolov\d+)([nslmx])(.*)", stem)
    if m:
        candidates.append(f"{m.group(1)}{m.group(3)}.yaml")
    for cand in candidates:
        for p in (ROOT / "cfg" / "models").rglob(cand):
            return p
    return None


def _version() -> str:
    import sar_yolo_tpu
    return f"sar_yolo_tpu {getattr(sar_yolo_tpu, '__version__', 'dev')}"


def _handle_settings(rest: list[str]):
    """`saryolo settings [reset | key=value ...]` (reference handle_yolo_settings)."""
    from sar_yolo_tpu.utils import settings as S
    if rest and rest[0] == "reset":
        S.SETTINGS.clear()
        S.SETTINGS.update(S._DEFAULTS)
        S.SETTINGS_FILE.parent.mkdir(parents=True, exist_ok=True)
        S.SETTINGS_FILE.write_text("{}")
        LOGGER.info("settings reset to defaults")
        rest = rest[1:]
    updates = {}
    for a in rest:
        if "=" in a:
            k, v = a.split("=", 1)
            import ast
            try:
                v = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                pass
            updates[k] = v
    if updates:
        S.update_settings(**updates)
    LOGGER.info("\n".join(f"{k}={v}" for k, v in S.SETTINGS.items()))
    return dict(S.SETTINGS)


def _run_checks():
    import jax

    from sar_yolo_tpu.utils.checks import check_version
    import numpy, flax, optax  # noqa: E401
    info = {"jax": jax.__version__, "numpy": numpy.__version__,
            "flax": flax.__version__, "optax": optax.__version__,
            "backend": jax.default_backend(),
            "devices": [str(d) for d in jax.devices()]}
    LOGGER.info("\n".join(f"{k}: {v}" for k, v in info.items()))
    return info


def _copy_default_cfg():
    """Copy default.yaml to cwd as default_copy.yaml (reference copy_default_cfg)."""
    import shutil
    dst = Path.cwd() / "default_copy.yaml"
    shutil.copy2(Path(__file__).parent / "default.yaml", dst)
    LOGGER.info(f"{dst} created — use with: saryolo cfg=default_copy.yaml ...")
    return dst


def entrypoint(argv: list[str] | None = None) -> Any:
    """CLI: `saryolo TASK MODE key=value ...` (mirrors the reference `yolo` CLI)."""
    args = argv if argv is not None else sys.argv[1:]
    if not args:
        LOGGER.info(f"Usage: saryolo TASK MODE key=value ...\n  TASK in {sorted(TASKS)}\n  MODE in {sorted(MODES)}")
        return None

    # special shell modes (reference entrypoint cfg/__init__.py:862-930)
    special = {
        "help": lambda _: LOGGER.info(
            f"Usage: saryolo TASK MODE key=value ...\n  TASK in {sorted(TASKS)}\n"
            f"  MODE in {sorted(MODES)}\nSpecial: help version settings cfg "
            f"checks copy-cfg\nDocs: docs/ in the repo"),
        "version": lambda _: LOGGER.info(_version()),
        "settings": _handle_settings,
        "cfg": lambda _: LOGGER.info(
            (Path(__file__).parent / "default.yaml").read_text()),
        "checks": lambda _: _run_checks(),
        "copy-cfg": lambda _: _copy_default_cfg(),
        "login": lambda rest: __import__(
            "sar_yolo_tpu.hub", fromlist=["login"]).login(rest[0] if rest else None),
        "logout": lambda _: __import__(
            "sar_yolo_tpu.hub", fromlist=["logout"]).logout(),
    }
    for k in list(special):
        special[f"-{k}"] = special[f"--{k}"] = special[k]
    if args[0].lower() in special:
        return special[args[0].lower()](args[1:])

    overrides: dict[str, Any] = {}
    task, mode = None, None
    for a in args:
        if "=" in a:
            k, v = a.split("=", 1)
            try:
                import ast
                v = ast.literal_eval(v)
            except (ValueError, SyntaxError):
                pass
            if isinstance(v, str) and v.lower() in {"true", "false", "none"}:
                v = {"true": True, "false": False, "none": None}[v.lower()]
            overrides[k] = v
        elif a in TASKS:
            task = a
        elif a in MODES:
            mode = a
        else:
            raise SyntaxError(f"'{a}' is not a valid task, mode, or key=value pair")

    task = task or overrides.pop("task", None) or "detect"
    mode = mode or overrides.pop("mode", None) or "predict"
    model = overrides.pop("model", None) or TASK2MODEL[task]

    from sar_yolo_tpu import YOLO

    model_obj = YOLO(model, task=task)
    return getattr(model_obj, mode)(**overrides)
