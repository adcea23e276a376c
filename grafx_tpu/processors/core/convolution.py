"""FIR convolution core — re-export of the TPU op.

The reference's ``FIRConvolution`` / ``convolve``
(reference: src/grafx/processors/core/convolution.py:17-134) had an
optional FlashFFTConv CUDA fast path; on TPU the XLA FFT *is* the fast
path, so a single implementation lives in :mod:`grafx_tpu.ops.fftconv`.
"""

from grafx_tpu.ops.fftconv import FIRConvolution, compute_pad_len, fft_convolve

convolve = fft_convolve

__all__ = ["FIRConvolution", "compute_pad_len", "convolve", "fft_convolve"]
