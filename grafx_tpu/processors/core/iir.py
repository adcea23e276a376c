"""Biquad-cascade IIR filter core with TPU-first backends.

Behavioral parity with the reference ``IIRFilter``
(reference: src/grafx/processors/core/iir.py:25-276), whose backends are
``"fsm"`` (FFT approximation), ``"lfilter"`` (exact, torchaudio CUDA) and
``"ssm"`` (exact, torchlpc CUDA scan).  Here:

* ``"fsm"`` — frequency-sampling FIR approximation + causal FFT conv
  (maps directly onto the XLA FFT units).
* ``"exact"`` (alias ``"ssm"``, ``"lfilter"``) — the exact blocked
  state-space filter of :func:`grafx_tpu.ops.iir.biquad_exact`: zero-state
  responses are FFT convolutions, cross-block state propagation is a tiny
  associative scan — no per-sample recursion anywhere.
* ``"scan"`` — sequential ``lax.scan`` oracle (tests only).
"""

import jax.numpy as jnp

from grafx_tpu.ops.fftconv import fft_convolve
from grafx_tpu.ops.iir import biquad_exact, biquad_scan, iir_fsm_fir


class IIRFilter:
    """A serial stack of biquads applied via the selected backend.

    Args:
        order: filter order per section (2 = biquad; only 2 supported).
        backend: ``"fsm"``, ``"exact"`` (aliases ``"ssm"``, ``"lfilter"``),
            or ``"scan"``.
        fsm_fir_len: FIR length for the FSM approximation.
        exact_block_size: block length for the exact blocked filter.

    The reference's ``flashfftconv`` / ``fsm_max_input_len`` arguments are
    accepted and ignored (XLA FFT is the fast path on TPU).
    """

    def __init__(
        self,
        order=2,
        backend="fsm",
        fsm_fir_len=4000,
        exact_block_size=128,
        flashfftconv=False,
        fsm_max_input_len=2**17,
        fsm_regularization=False,
        **_ignored,
    ):
        if order != 2:
            raise ValueError("Only second-order sections are supported.")
        if backend not in ("fsm", "exact", "ssm", "lfilter", "scan"):
            raise ValueError(f"Unsupported backend: {backend}")
        self.backend = backend
        self.fsm_fir_len = fsm_fir_len
        self.exact_block_size = exact_block_size

    def __call__(self, input_signal, Bs, As):
        """Apply the biquad cascade.

        Args:
            input_signal: ``(B, C_in, L)``.
            Bs, As: ``(B, C_filter, K, 3)`` coefficients; the channel dim
                broadcasts against the input's.

        Returns:
            ``(B, C, L)`` filtered signals.
        """
        B, C_in, L = input_signal.shape
        C_f = Bs.shape[1]
        C = max(C_in, C_f)

        if self.backend == "fsm":
            firs = iir_fsm_fir(Bs, As, self.fsm_fir_len)  # (B, C_f, fir_len)
            return fft_convolve(input_signal, firs, mode="causal", pad_mode="pow2")

        # exact paths: broadcast channels, flatten to (N, L)
        x = jnp.broadcast_to(input_signal, (B, C, L)).reshape(-1, L)
        K = Bs.shape[-2]
        Bs_b = jnp.broadcast_to(Bs, (B, C, K, 3)).reshape(-1, K, 3)
        As_b = jnp.broadcast_to(As, (B, C, K, 3)).reshape(-1, K, 3)
        if self.backend == "scan":
            y = biquad_scan(x, Bs_b, As_b)
        else:
            y = biquad_exact(x, Bs_b, As_b, block_size=self.exact_block_size)
        return y.reshape(B, C, L)
