"""Typed exceptions (capability parity with reference utils/errors.py, widened:
the reference only types HUBModelError; downstream code catches these to give
actionable messages instead of raw tracebacks)."""

from __future__ import annotations


class SARYOLOError(Exception):
    """Base class for all framework-raised errors."""


class ModelNotFoundError(SARYOLOError, FileNotFoundError):
    """A model yaml/checkpoint could not be located (≙ reference HUBModelError
    for models that would have been fetched remotely)."""

    def __init__(self, name, hint: str = ""):
        super().__init__(
            f"Model '{name}' not found. Bundled yamls live under "
            f"sar_yolo_tpu/cfg/models/**; checkpoints are orbax dirs. {hint}".strip())


class DatasetError(SARYOLOError):
    """Dataset yaml/images/labels missing or failed verification."""


class ExportError(SARYOLOError):
    """Export/AutoBackend failure (unsupported format, missing runtime)."""
