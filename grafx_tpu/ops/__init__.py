"""TPU compute primitives: FFT convolution, exact blocked IIR, ballistics,
STFT.  These are the tpu-native equivalents of the reference's external
native kernels (FlashFFTConv, torchlpc, torchcomp; see SURVEY.md §2.9)."""

from grafx_tpu.ops.ballistics import ballistics_core
from grafx_tpu.ops.fftconv import FIRConvolution, fft_convolve, next_pow2
from grafx_tpu.ops.iir import (
    biquad_exact,
    biquad_scan,
    iir_fsm_fir,
    iir_fsm_response,
    onepole_exact,
)
from grafx_tpu.ops.stft import get_window, hann_window, istft, stft

__all__ = [
    "ballistics_core",
    "FIRConvolution",
    "fft_convolve",
    "next_pow2",
    "biquad_exact",
    "biquad_scan",
    "iir_fsm_fir",
    "iir_fsm_response",
    "onepole_exact",
    "get_window",
    "hann_window",
    "istft",
    "stft",
]
