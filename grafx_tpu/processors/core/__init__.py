"""DSP cores shared across the processor library."""

from grafx_tpu.processors.core.convolution import FIRConvolution, convolve
from grafx_tpu.processors.core.delay import SurrogateDelay, normalized_gradient
from grafx_tpu.processors.core.envelope import Ballistics, TruncatedOnePoleIIRFilter
from grafx_tpu.processors.core.fft_filterbank import TriangularFilterBank
from grafx_tpu.processors.core.fir import (
    ZeroPhaseFIR,
    ZeroPhaseFilterBankFIR,
    log_magnitude_to_zerophase_fir,
)
from grafx_tpu.processors.core.geq import GraphicEqualizerBiquad
from grafx_tpu.processors.core.iir import IIRFilter
from grafx_tpu.processors.core.midside import lr_to_ms, ms_to_lr
from grafx_tpu.processors.core.utils import normalize_impulse, rms_difference

__all__ = [
    "Ballistics",
    "FIRConvolution",
    "GraphicEqualizerBiquad",
    "IIRFilter",
    "SurrogateDelay",
    "TriangularFilterBank",
    "TruncatedOnePoleIIRFilter",
    "ZeroPhaseFIR",
    "ZeroPhaseFilterBankFIR",
    "convolve",
    "log_magnitude_to_zerophase_fir",
    "lr_to_ms",
    "ms_to_lr",
    "normalize_impulse",
    "normalized_gradient",
    "rms_difference",
]
