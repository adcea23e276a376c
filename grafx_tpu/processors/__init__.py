"""Differentiable audio processor library.

Mirrors the reference's exports
(reference: src/grafx/processors/__init__.py:1-36).
"""

from grafx_tpu.processors.container import (
    DryWet,
    GainStagingRegularization,
    ParallelMix,
    SerialChain,
)
from grafx_tpu.processors.delay import MultitapDelay
from grafx_tpu.processors.dynamics import (
    ApproxCompressor,
    ApproxNoiseGate,
    BallisticsEnvelopeFollower,
    BaseEnvelopeFollower,
    Compressor,
    FactorizedCompressor,
    IIREnvelopeFollower,
    NoiseGate,
)
from grafx_tpu.processors.eq import (
    GraphicEqualizer,
    NewZeroPhaseFIREqualizer,
    ParametricEqualizer,
    ZeroPhaseFIREqualizer,
)
from grafx_tpu.processors.filter import (
    AllPassFilter,
    BandPassFilter,
    BandRejectFilter,
    BaseParametricEqualizerFilter,
    BaseParametricFilter,
    BiquadFilter,
    FIRFilter,
    HighPassFilter,
    HighShelf,
    LowPassFilter,
    LowShelf,
    PeakingFilter,
    PoleZeroFilter,
    StateVariableFilter,
)
from grafx_tpu.processors.nonlinear import (
    ChebyshevDistortion,
    PiecewiseTanhDistortion,
    PowerDistortion,
    TanhDistortion,
)
from grafx_tpu.processors.reverb import (
    FeedbackDelayNetwork,
    FilteredNoiseShapingReverb,
    STFTMaskedNoiseReverb,
)
from grafx_tpu.processors.stereo import (
    MidSideToStereo,
    MonoToStereo,
    SideGainImager,
    StereoGain,
    StereoToMidSide,
)

__all__ = [
    "AllPassFilter",
    "ApproxCompressor",
    "ApproxNoiseGate",
    "BallisticsEnvelopeFollower",
    "BandPassFilter",
    "BandRejectFilter",
    "BaseEnvelopeFollower",
    "BaseParametricEqualizerFilter",
    "BaseParametricFilter",
    "BiquadFilter",
    "ChebyshevDistortion",
    "Compressor",
    "DryWet",
    "FactorizedCompressor",
    "FeedbackDelayNetwork",
    "FilteredNoiseShapingReverb",
    "FIRFilter",
    "GainStagingRegularization",
    "GraphicEqualizer",
    "HighPassFilter",
    "HighShelf",
    "IIREnvelopeFollower",
    "LowPassFilter",
    "LowShelf",
    "MidSideToStereo",
    "MonoToStereo",
    "MultitapDelay",
    "NewZeroPhaseFIREqualizer",
    "NoiseGate",
    "ParallelMix",
    "ParametricEqualizer",
    "PeakingFilter",
    "PiecewiseTanhDistortion",
    "PoleZeroFilter",
    "PowerDistortion",
    "SerialChain",
    "SideGainImager",
    "StateVariableFilter",
    "StereoGain",
    "StereoToMidSide",
    "TanhDistortion",
    "ZeroPhaseFIREqualizer",
]
