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

from grafx_tpu.ops.fftconv import (
    conv_stream_zero_tail,
    fft_convolve,
    fft_convolve_stream,
)
from grafx_tpu.ops.iir import (
    biquad_exact,
    biquad_exact_apply,
    biquad_exact_build,
    biquad_exact_zero_state,
    biquad_scan,
    iir_fsm_fir,
)


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
        # GRAFX_TPU_EXACT_BLOCK_SIZE overrides the *default* block
        # length (on-chip sweep knob: T trades kernel-build and
        # Toeplitz-ZSR cost ~K*T^2 against propagation rounds ~log(L/T));
        # an explicit constructor argument always wins.
        if exact_block_size == 128:
            import os

            exact_block_size = int(
                os.environ.get("GRAFX_TPU_EXACT_BLOCK_SIZE", exact_block_size)
            )
        self.exact_block_size = exact_block_size

    def precompute(self, Bs, As):
        """Build the parameter-dependent work once (``precompute`` hook).

        For the ``"fsm"`` backend this is the FIR bank; for the exact
        backend the blocked-cascade kernels
        (:func:`grafx_tpu.ops.iir.biquad_exact_build`).  The returned
        dict's arrays all have leading dim ``B`` (the node batch), so a
        render executor can slice them per stage exactly like parameter
        rows and pass the slice back via ``cache=``.

        Returns ``None`` for backends with nothing to prebuild.
        """
        if self.backend == "fsm":
            return {"firs": iir_fsm_fir(Bs, As, self.fsm_fir_len)}
        if self.backend == "scan":
            return {"Bs": Bs, "As": As}  # nothing to prebuild
        B, C_f, K, _ = Bs.shape
        cache = biquad_exact_build(
            Bs.reshape(-1, K, 3),
            As.reshape(-1, K, 3),
            block_size=self.exact_block_size,
        )
        return {k: v.reshape((B, C_f) + v.shape[1:]) for k, v in cache.items()}

    def __call__(self, input_signal, Bs=None, As=None, cache=None):
        """Apply the biquad cascade.

        Args:
            input_signal: ``(B, C_in, L)``.
            Bs, As: ``(B, C_filter, K, 3)`` coefficients; the channel dim
                broadcasts against the input's.  May be ``None`` when a
                ``cache`` from :meth:`precompute` is given.
            cache: optional prebuilt kernels from :meth:`precompute`.

        Returns:
            ``(B, C, L)`` filtered signals.
        """
        B, C_in, L = input_signal.shape

        if cache is not None and "Bs" in cache:  # scan backend pass-through
            Bs, As, cache = cache["Bs"], cache["As"], None
        if cache is not None:
            if self.backend == "fsm":
                return fft_convolve(
                    input_signal, cache["firs"], mode="causal", pad_mode="pow2"
                )
            C_f = next(iter(cache.values())).shape[1]
            C = max(C_in, C_f)
            x = jnp.broadcast_to(input_signal, (B, C, L)).reshape(-1, L)
            cache_b = {
                k: jnp.broadcast_to(
                    v, (B, C) + v.shape[2:]
                ).reshape((-1,) + v.shape[2:])
                for k, v in cache.items()
            }
            y = biquad_exact_apply(x, cache_b, block_size=self.exact_block_size)
            return y.reshape(B, C, L)

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

    # -- streaming (block-wise processing with carried filter state) ----

    def stream_zero_state(self, cache, num_channels, block_len):
        """Initial streaming state for :meth:`stream` given a
        :meth:`precompute` cache and the input channel count.

        ``"exact"``: the blocked filter's eigenbasis state (zeros);
        ``"fsm"``: the FIR convolution's overlap-add tail (zeros).
        ``block_len`` must be a multiple of ``exact_block_size`` for the
        exact backend (checked here, once per stream).
        """
        if self.backend == "fsm":
            B, C_f, fir_len = cache["firs"].shape
            C = max(num_channels, C_f)
            return conv_stream_zero_tail((B, C), fir_len)
        if self.backend not in ("exact", "ssm", "lfilter"):
            raise NotImplementedError(
                f"streaming is not supported for backend {self.backend!r}"
            )
        if block_len % self.exact_block_size:
            raise ValueError(
                f"streaming block_len ({block_len}) must be a multiple of"
                f" exact_block_size ({self.exact_block_size})."
            )
        B, C_f = next(iter(cache.values())).shape[:2]
        C = max(num_channels, C_f)
        return biquad_exact_zero_state(
            {k: v.reshape((-1,) + v.shape[2:]) for k, v in cache.items()},
            B * C,
        )

    def stream(self, input_signal, state, cache):
        """One streaming block: ``(B, C_in, block) -> (B, C, block)``
        plus the carried state.  Streams of blocks reproduce the
        one-shot :meth:`__call__` output to float round-off."""
        B, C_in, L = input_signal.shape
        if self.backend == "fsm":
            y, tail = fft_convolve_stream(input_signal, cache["firs"], state)
            return y, tail
        C_f = next(iter(cache.values())).shape[1]
        C = max(C_in, C_f)
        x = jnp.broadcast_to(input_signal, (B, C, L)).reshape(-1, L)
        cache_b = {
            k: jnp.broadcast_to(v, (B, C) + v.shape[2:]).reshape(
                (-1,) + v.shape[2:]
            )
            for k, v in cache.items()
        }
        y, state = biquad_exact_apply(
            x,
            cache_b,
            block_size=self.exact_block_size,
            state_in=state,
            return_state=True,
        )
        return y.reshape(B, C, L), state
