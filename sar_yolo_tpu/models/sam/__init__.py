"""SAM / SAM2 promptable segmentation (reference models/sam/)."""

from .build import build_sam
from .model import SAM
from .predict import SAMPredictor

__all__ = ["SAM", "SAMPredictor", "build_sam"]
