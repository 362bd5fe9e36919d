"""Core utilities: logging, YAML IO, config namespaces.

TPU-native rebuild of the reference infra layer (see /root/reference
ultralytics/utils/__init__.py — LOGGER :329, yaml io :438, IterableSimpleNamespace :224).
Re-designed, not translated: no torch, no env-probing side effects at import.
"""

from __future__ import annotations

import logging
import os
import sys
from pathlib import Path
from types import SimpleNamespace

import yaml

ROOT = Path(__file__).resolve().parents[1]  # sar_yolo_tpu/ package root
DEFAULT_CFG_PATH = ROOT / "cfg" / "default.yaml"

VERBOSE = os.environ.get("SARYOLO_VERBOSE", "1") == "1"


def _make_logger(name: str = "sar_yolo_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(logging.Formatter("%(message)s"))
        logger.addHandler(handler)
    logger.setLevel(logging.INFO if VERBOSE else logging.WARNING)
    logger.propagate = False
    return logger


LOGGER = _make_logger()


def yaml_load(path, append_filename: bool = False) -> dict:
    """Load a YAML file into a dict (optionally recording its source path)."""
    path = Path(path)
    with path.open("r", encoding="utf-8", errors="ignore") as f:
        data = yaml.safe_load(f.read()) or {}
    if append_filename:
        data["yaml_file"] = str(path)
    return data


def yaml_save(path, data: dict) -> None:
    """Save a dict to a YAML file, creating parent dirs as needed."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    clean = {k: (str(v) if isinstance(v, Path) else v) for k, v in data.items()}
    with path.open("w", encoding="utf-8") as f:
        yaml.safe_dump(clean, f, sort_keys=False, allow_unicode=True)


class IterableSimpleNamespace(SimpleNamespace):
    """SimpleNamespace that supports iteration over (key, value) pairs and dict-like get."""

    def __iter__(self):
        return iter(vars(self).items())

    def __str__(self):
        return "\n".join(f"{k}={v}" for k, v in vars(self).items())

    def get(self, key, default=None):
        return getattr(self, key, default)


def colorstr(*args):
    """ANSI-color a string: colorstr('blue', 'bold', 'hello')."""
    *prefix, string = args if len(args) > 1 else ("blue", "bold", args[0])
    colors = {
        "black": "\033[30m", "red": "\033[31m", "green": "\033[32m", "yellow": "\033[33m",
        "blue": "\033[34m", "magenta": "\033[35m", "cyan": "\033[36m", "white": "\033[37m",
        "bright_red": "\033[91m", "bright_green": "\033[92m", "bright_yellow": "\033[93m",
        "bright_blue": "\033[94m", "end": "\033[0m", "bold": "\033[1m", "underline": "\033[4m",
    }
    return "".join(colors[p] for p in prefix) + str(string) + colors["end"]


DEFAULT_CFG_DICT = yaml_load(DEFAULT_CFG_PATH)
for _k, _v in DEFAULT_CFG_DICT.items():
    if isinstance(_v, str) and _v.lower() == "none":
        DEFAULT_CFG_DICT[_k] = None
DEFAULT_CFG = IterableSimpleNamespace(**DEFAULT_CFG_DICT)
