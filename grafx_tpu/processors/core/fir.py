"""Zero-phase FIR synthesis from log-magnitude responses.

Behavioral parity with the reference
(reference: src/grafx/processors/core/fir.py:25-123): exp(log-magnitude)
-> irfft -> roll to center -> window.  All ops fuse under XLA.
"""

import jax.numpy as jnp
import numpy as np

from grafx_tpu.ops.stft import get_window
from grafx_tpu.processors.core.fft_filterbank import TriangularFilterBank


def log_magnitude_to_zerophase_fir(log_magnitude, fir_len, window=None):
    """``(..., F)`` log-magnitudes -> ``(..., fir_len)`` zero-phase FIRs."""
    magnitude = jnp.exp(log_magnitude)
    ir = jnp.fft.irfft(magnitude, n=fir_len)
    ir = jnp.roll(ir, shift=fir_len // 2, axis=-1)
    if window is not None:
        ir = ir * window
    return ir


def _resolve_window(window, length, **kwargs):
    if window is None or isinstance(window, str):
        w = get_window(window, length, **kwargs)
        return None if w is None else jnp.asarray(w, dtype=jnp.float32)
    return jnp.asarray(window, dtype=jnp.float32)


class ZeroPhaseFIR:
    """Zero-phase FIR from a log-magnitude response
    (reference: core/fir.py:43-83)."""

    def __init__(self, num_magnitude_bins=1024, window="hann", **window_kwargs):
        self.num_magnitude_bins = num_magnitude_bins
        self.fir_len = 2 * num_magnitude_bins - 1
        self.window = _resolve_window(window, self.fir_len, **window_kwargs)

    def __call__(self, log_magnitude):
        return log_magnitude_to_zerophase_fir(
            log_magnitude, fir_len=self.fir_len, window=self.window
        )


class ZeroPhaseFilterBankFIR:
    """Zero-phase FIR with an optional triangular-filterbank magnitude
    parameterization in the energy domain
    (reference: core/fir.py:86-123)."""

    def __init__(
        self,
        num_frequency_bins=1024,
        use_filterbank=False,
        filterbank_kwargs=None,
        window="hann",
        window_kwargs=None,
        eps=1e-7,
    ):
        self.num_frequency_bins = num_frequency_bins
        self.fir_len = 2 * num_frequency_bins - 1
        self.eps = eps
        self.use_filterbank = use_filterbank
        if use_filterbank:
            self.filterbank = TriangularFilterBank(
                num_frequency_bins=num_frequency_bins, **(filterbank_kwargs or {})
            )
        self.window = _resolve_window(window, self.fir_len, **(window_kwargs or {}))

    def __call__(self, log_magnitude):
        magnitude = jnp.exp(log_magnitude)
        if self.use_filterbank:
            energy = jnp.square(magnitude)
            energy = self.filterbank(energy)
            magnitude = jnp.sqrt(energy + self.eps)
        ir = jnp.fft.irfft(magnitude, n=self.fir_len)
        ir = jnp.roll(ir, shift=self.fir_len // 2, axis=-1)
        if self.window is not None:
            ir = ir * self.window
        return ir
