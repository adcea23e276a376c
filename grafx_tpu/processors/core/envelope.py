"""Envelope smoothers: truncated one-pole IIR and attack/release ballistics.

Behavioral parity with the reference
(reference: src/grafx/processors/core/envelope.py:10-101).  The ballistics
recursion replaces ``torchcomp.compressor_core`` with the TPU kernel in
:mod:`grafx_tpu.ops.ballistics` (Pallas forward, associative-scan
backward).
"""

import jax
import jax.numpy as jnp

from grafx_tpu.ops.ballistics import ballistics_core
from grafx_tpu.ops.fftconv import fft_convolve
from grafx_tpu.ops.iir import onepole_exact


class TruncatedOnePoleIIRFilter:
    """One-pole smoother via its truncated analytic impulse response
    ``(1 - a) a^n`` and a causal FFT convolution
    (reference: core/envelope.py:10-60).

    Args:
        iir_len: truncated IR length.
        exact: if ``True``, use the exact blocked one-pole filter
            (:func:`grafx_tpu.ops.iir.onepole_exact`) instead of the
            truncated-FIR approximation — a TPU-only upgrade over the
            reference default.
    """

    def __init__(self, iir_len=16384, exact=False, **_ignored_backend_kwargs):
        self.iir_len = iir_len
        self.exact = exact

    def __call__(self, input_signals, z_alpha):
        """Smooth ``(B, L)`` signals with per-item coefficients
        ``z_alpha`` ``(B, 1)`` (pre-sigmoid)."""
        alpha = jax.nn.sigmoid(z_alpha)
        alpha = jnp.minimum(alpha, 1.0 - 1e-5)
        if self.exact:
            smoothed = onepole_exact(input_signals, alpha[..., 0])
        else:
            h = self.compute_impulse(alpha)
            smoothed = fft_convolve(
                input_signals, h, mode="causal", pad_mode="pow2"
            )
        return jax.nn.relu(smoothed)

    def compute_impulse(self, alpha):
        log_alpha = jnp.log(alpha)  # (B, 1)
        n = jnp.arange(self.iir_len, dtype=log_alpha.dtype)[None, :]
        decay = jnp.exp(n * log_alpha)
        return (1.0 - alpha) * decay

    # -- streaming -----------------------------------------------------

    def stream_zero_state(self, batch_size):
        """Carried state (previous raw output sample) for block-wise
        streaming; requires the exact backend (the truncated-FIR
        approximation has no compact state)."""
        if not self.exact:
            raise NotImplementedError(
                "streaming requires the exact one-pole backend"
                " (TruncatedOnePoleIIRFilter(exact=True))."
            )
        return jnp.zeros(batch_size)

    def stream(self, input_signals, state, z_alpha):
        alpha = jax.nn.sigmoid(z_alpha)
        alpha = jnp.minimum(alpha, 1.0 - 1e-5)
        y, state = onepole_exact(
            input_signals, alpha[..., 0], state_in=state, return_state=True
        )
        return jax.nn.relu(y), state


class Ballistics:
    """Attack/release one-pole smoother
    (reference: core/envelope.py:63-101): ``y[n]`` follows ``u[n]`` with
    coefficient ``alpha_A`` when attacking (``u >= y[n-1]``) and
    ``alpha_R`` when releasing."""

    def __call__(self, input_signals, z_alpha):
        """Smooth ``(B, L)`` signals; ``z_alpha`` is ``(B, 2)``
        (pre-sigmoid attack and release coefficients)."""
        ts = jax.nn.sigmoid(z_alpha)
        zi = jnp.ones(input_signals.shape[0], dtype=input_signals.dtype)
        at, rt = ts[..., 0], ts[..., 1]
        return ballistics_core(input_signals, zi, at, rt)

    # -- streaming -----------------------------------------------------

    def stream_zero_state(self, batch_size):
        """Initial envelope (1, matching ``__call__``'s ``zi``)."""
        return jnp.ones(batch_size)

    def stream(self, input_signals, state, z_alpha):
        ts = jax.nn.sigmoid(z_alpha)
        y = ballistics_core(input_signals, state, ts[..., 0], ts[..., 1])
        return y, y[:, -1]
