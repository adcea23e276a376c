"""Differentiable audio processor library."""

from grafx_tpu.processors.stereo import (
    MidSideToStereo,
    MonoToStereo,
    SideGainImager,
    StereoGain,
    StereoToMidSide,
)

__all__ = [
    "MidSideToStereo",
    "MonoToStereo",
    "SideGainImager",
    "StereoGain",
    "StereoToMidSide",
]
