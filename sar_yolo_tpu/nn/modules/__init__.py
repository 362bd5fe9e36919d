"""Flax module zoo: convs, CSP/attention blocks, detection heads."""

from .conv import CBAM, Concat, Conv, DSConv, DWConv, Upsample
from .block import (
    A2C2f, AAttn, ABlock, AdaHGComputation, AdaHGConv, AdaHyperedgeGen, Bottleneck,
    C2f, C3, C3AH, C3k, C3k2, C3k2_CBAM, DSBottleneck, DSC3k, DSC3k2, DSC3k2_CBAM,
    DownsampleConv, FullPAD_Tunnel, FuseModule, HyperACE, SPPF,
)
from .head import JDE, OBB, Classify, Detect, Pose, Proto, Segment

__all__ = [
    "Conv", "DWConv", "DSConv", "CBAM", "Concat", "Upsample",
    "Bottleneck", "C2f", "C3", "C3k", "C3k2", "C3k2_CBAM", "SPPF",
    "AAttn", "ABlock", "A2C2f", "DSBottleneck", "DSC3k", "DSC3k2", "DSC3k2_CBAM",
    "AdaHyperedgeGen", "AdaHGConv", "AdaHGComputation", "C3AH", "FuseModule",
    "HyperACE", "DownsampleConv", "FullPAD_Tunnel",
    "Detect", "JDE", "Segment", "Pose", "OBB", "Classify", "Proto",
]
