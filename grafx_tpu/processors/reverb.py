"""Reverbs: STFT-masked noise and filtered-noise shaping.

Behavioral parity with the reference
(reference: src/grafx/processors/reverb.py:15-447).  The STFT/iSTFT use
:mod:`grafx_tpu.ops.stft` (torch conventions); noise buffers are built
host-side at init.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from grafx_tpu.ops.stft import hann_window, istft, stft
from grafx_tpu.processors.core.convolution import FIRConvolution
from grafx_tpu.processors.core.midside import lr_to_ms, ms_to_lr
from grafx_tpu.processors.core.noise import get_filtered_noise
from grafx_tpu.processors.core.utils import normalize_impulse


def _numpy_stft(x, n_fft, hop_length, window):
    """Host-side STFT with the same conventions as
    :func:`grafx_tpu.ops.stft.stft` (center=True, reflect pad)."""
    L = x.shape[-1]
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)], "reflect")
    num_frames = 1 + L // hop_length
    starts = np.arange(num_frames) * hop_length
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    frames = xp[..., idx] * window
    spec = np.fft.rfft(frames, n=n_fft, axis=-1)
    return np.swapaxes(spec, -1, -2).astype(np.complex64)


class STFTMaskedNoiseReverb:
    """Masked-noise reverb: uniform noise STFT x learnable decaying mask
    -> iSTFT -> causal convolution (reference: reverb.py:15-228).

    Args:
        ir_len: impulse-response length.
        processor_channel: ``"mono"``, ``"stereo"``, ``"midside"``, or
            ``"pseudo_midside"`` (mask in M/S, convolve in L/R).
        n_fft / hop_length: STFT parameters.
        fixed_noise: fixed (seed-0) noise or per-call resampled noise
            (resampling requires passing ``noise_key``; under jit the key
            must be threaded explicitly).
        gain_envelope: add a frequency-independent per-frame gain.
    """

    def __init__(
        self,
        ir_len=60000,
        processor_channel="pseudo_midside",
        n_fft=384,
        hop_length=192,
        fixed_noise=True,
        gain_envelope=False,
        **_ignored,
    ):
        self.ir_len = ir_len
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.num_frames = 1 + ir_len // hop_length
        self.num_bins = 1 + n_fft // 2
        self.window = jnp.asarray(hann_window(n_fft), dtype=jnp.float32)
        self.arange = jnp.arange(self.num_frames, dtype=jnp.float32)[
            None, None, None, :
        ]
        self.fixed_noise = fixed_noise
        if fixed_noise:
            # host-side numpy STFT: keeps the constant embeddable in jit
            # programs (complex device->host transfers are not supported
            # over the tunneled TPU backend)
            rng = np.random.RandomState(0)
            noise = 2.0 * rng.uniform(size=(2, ir_len)).astype(np.float32) - 1.0
            self.noise_stft = _numpy_stft(
                noise, n_fft, hop_length, hann_window(n_fft)
            )[None]  # (1, 2, F, T)
        self.gain_envelope = gain_envelope
        self.conv = FIRConvolution(mode="causal")
        if processor_channel not in ("mono", "stereo", "midside", "pseudo_midside"):
            raise ValueError(f"Invalid processor_channel: {processor_channel}")
        self.processor_channel = processor_channel

    def __call__(
        self,
        input_signals,
        init_log_magnitude,
        delta_log_magnitude,
        gain_env_log_magnitude=None,
        noise_key=None,
    ):
        ir = self.compute_ir(
            init_log_magnitude,
            delta_log_magnitude,
            gain_env_log_magnitude,
            noise_key=noise_key,
        )
        match self.processor_channel:
            case "mono" | "stereo":
                return self.conv(input_signals, normalize_impulse(ir))
            case "midside":
                x = lr_to_ms(input_signals)
                return ms_to_lr(self.conv(x, normalize_impulse(ir)))
            case "pseudo_midside":
                ir = normalize_impulse(ms_to_lr(ir))
                return self.conv(input_signals, ir)

    def compute_ir(
        self,
        init_log_magnitude,
        delta_log_magnitude,
        gain_env_log_magnitude=None,
        noise_key=None,
    ):
        if self.fixed_noise:
            noise_stft = self.noise_stft
        else:
            if noise_key is None:
                noise_key = jax.random.PRNGKey(0)
            b = init_log_magnitude.shape[0]
            noise = (
                2.0 * jax.random.uniform(noise_key, (b, 2, self.ir_len)) - 1.0
            )
            noise_stft = stft(noise, self.n_fft, self.hop_length, self.window)

        mask = self.compute_stft_mask(
            init_log_magnitude, delta_log_magnitude, gain_env_log_magnitude
        )
        ir_stft = noise_stft * mask
        ir = istft(
            ir_stft, self.n_fft, self.hop_length, self.window, length=self.ir_len
        )
        return ir  # (B, 2, ir_len)

    def fir_kernel(self, init_log_magnitude, delta_log_magnitude,
                   gain_env_log_magnitude=None, noise_key=None):
        """FIR-LTI capability (render/fuse.py): the effective causal IR
        (channel-diagonal modes; ``midside`` convolves in the M/S basis
        and is not fusable with L/R members)."""
        if self.processor_channel == "midside":
            raise NotImplementedError("midside reverb is not channel-diagonal")
        ir = self.compute_ir(
            init_log_magnitude, delta_log_magnitude, gain_env_log_magnitude,
            noise_key=noise_key,
        )
        if self.processor_channel == "pseudo_midside":
            return normalize_impulse(ms_to_lr(ir)), 0, None
        return normalize_impulse(ir), 0, None

    # -- streaming -----------------------------------------------------

    def stream_init(self, num_channels, block_len, noise_key=None, **params):
        """Streaming contract: freeze the IR once (noise drawn at init
        when ``fixed_noise=False``), stream the causal convolution —
        long IRs carry a frequency-domain partitioned delay line, short
        ones an overlap-add tail (ops/fftconv.py conv_stream_init)."""
        from grafx_tpu.ops.fftconv import conv_stream_init

        ir = self.compute_ir(
            params["init_log_magnitude"],
            params["delta_log_magnitude"],
            params.get("gain_env_log_magnitude"),
            noise_key=noise_key,
        )
        if self.processor_channel == "pseudo_midside":
            h = normalize_impulse(ms_to_lr(ir))
        else:
            h = normalize_impulse(ir)
        state, conv = conv_stream_init(h, num_channels, block_len)
        return state, {"conv": conv, "ms": self.processor_channel == "midside"}

    def stream_step(self, x, state, cache):
        from grafx_tpu.ops.fftconv import conv_stream_apply

        if cache["ms"]:
            y, state = conv_stream_apply(lr_to_ms(x), state, cache["conv"])
            return ms_to_lr(y), state
        return conv_stream_apply(x, state, cache["conv"])

    def compute_stft_mask(
        self, init_log_magnitude, delta_log_magnitude, gain_env_log_magnitude=None
    ):
        init = init_log_magnitude[:, :, :, None]
        delta = -jax.nn.softplus(delta_log_magnitude)[:, :, :, None]
        mask_log = init + delta * self.arange
        if self.gain_envelope:
            mask_log = mask_log + gain_env_log_magnitude[:, :, None, :]
        return jnp.exp(mask_log / 8.0)

    def parameter_size(self):
        size = {
            "init_log_magnitude": (2, self.num_bins),
            "delta_log_magnitude": (2, self.num_bins),
        }
        if self.gain_envelope:
            size["gain_env_log_magnitude"] = (2, self.num_frames)
        return size


class FilteredNoiseShapingReverb:
    """K-band filtered noise with per-band exponential decay envelopes
    (reference: reverb.py:231-447).

    ``noise_randomness="pseudo-random"`` draws a random crop of a
    5x-length noise buffer per call with a host RNG; under ``jit`` the
    crop freezes at trace time (use ``"fixed"`` for determinism).
    """

    def __init__(
        self,
        ir_len=60000,
        num_bands=12,
        processor_channel="midside",
        f_min=31.5,
        f_max=15000,
        scale="log",
        sr=30000,
        zerophase=True,
        order=2,
        noise_randomness="pseudo-random",
        use_fade_in=False,
        min_decay_ms=50,
        max_decay_ms=2000,
        **_ignored,
    ):
        self.num_bands = num_bands
        self.processor_channel = processor_channel
        if processor_channel in ("midside", "stereo"):
            self.num_channels = 2
        elif processor_channel == "mono":
            self.num_channels = 1
        else:
            raise ValueError(f"Unknown channel type: {processor_channel}")

        self.ir_len = ir_len
        self.noise_randomness = noise_randomness
        if noise_randomness not in ("pseudo-random", "fixed"):
            raise ValueError(f"Invalid noise_randomness: {noise_randomness}")
        noise_len = ir_len if noise_randomness == "fixed" else ir_len * 5
        filtered_noise = get_filtered_noise(
            noise_len,
            num_channels=self.num_channels,
            num_bands=num_bands,
            f_min=f_min,
            f_max=f_max,
            scale=scale,
            sr=sr,
            zerophase=zerophase,
            order=order,
        )
        self.filtered_noise = jnp.asarray(filtered_noise)[None]  # (1,C,K,Ln)
        self._crop_rng = np.random.default_rng(0)

        self.conv = FIRConvolution(mode="causal")

        min_decay_db = -60.0 / (min_decay_ms * sr / 1000)
        self.min_decay = min_decay_db / 20 * math.log(10)
        max_decay_db = -60.0 / (max_decay_ms * sr / 1000)
        self.max_decay = max_decay_db / 20 * math.log(10)

        self.use_fade_in = use_fade_in
        self.arange = jnp.arange(ir_len, dtype=jnp.float32)[None, None, None, :]

    def __call__(
        self,
        input_signals,
        log_decay,
        log_gain,
        log_fade_in=None,
        z_fade_in_gain=None,
        noise_key=None,
    ):
        ir = self.compute_ir(
            log_decay, log_gain, log_fade_in, z_fade_in_gain, noise_key
        )
        if self.processor_channel == "midside":
            x = lr_to_ms(input_signals)
            return ms_to_lr(self.conv(x, normalize_impulse(ir)))
        return self.conv(input_signals, normalize_impulse(ir))

    def compute_ir(
        self,
        log_decay,
        log_gain,
        log_fade_in=None,
        z_fade_in_gain=None,
        noise_key=None,
    ):
        log_decay = (
            jax.nn.sigmoid(log_decay) * (self.max_decay - self.min_decay)
            + self.min_decay
        )
        envelope = jnp.exp(self.arange * log_decay[..., None])

        if self.use_fade_in:
            log_fade_in = (
                jax.nn.sigmoid(log_fade_in) * (log_decay - self.min_decay)
                + self.min_decay
            )
            fade_in = jnp.exp(self.arange * log_fade_in[..., None])
            fade_in_gain = jax.nn.sigmoid(z_fade_in_gain)[..., None]
            envelope = envelope - fade_in * fade_in_gain

        envelope = envelope * log_gain[..., None]
        return (self.get_noise(noise_key) * envelope).sum(axis=2)  # (B, C, L)

    def fir_kernel(self, log_decay, log_gain, log_fade_in=None,
                   z_fade_in_gain=None, noise_key=None):
        """FIR-LTI capability (channel-diagonal modes only)."""
        if self.processor_channel == "midside":
            raise NotImplementedError("midside reverb is not channel-diagonal")
        ir = self.compute_ir(
            log_decay, log_gain, log_fade_in, z_fade_in_gain, noise_key
        )
        return normalize_impulse(ir), 0, None

    # -- streaming -----------------------------------------------------

    def stream_init(self, num_channels, block_len, noise_key=None, **params):
        from grafx_tpu.ops.fftconv import conv_stream_init

        ir = self.compute_ir(
            params["log_decay"],
            params["log_gain"],
            params.get("log_fade_in"),
            params.get("z_fade_in_gain"),
            noise_key,
        )
        state, conv = conv_stream_init(
            normalize_impulse(ir), num_channels, block_len
        )
        return state, {"conv": conv, "ms": self.processor_channel == "midside"}

    def stream_step(self, x, state, cache):
        from grafx_tpu.ops.fftconv import conv_stream_apply

        if cache["ms"]:
            y, state = conv_stream_apply(lr_to_ms(x), state, cache["conv"])
            return ms_to_lr(y), state
        return conv_stream_apply(x, state, cache["conv"])

    def get_noise(self, noise_key=None):
        """Noise buffer for this call.  ``"pseudo-random"`` takes a random
        crop of the 5x-length buffer; pass ``noise_key`` (a jax PRNG key)
        to keep the crop random *under jit* — without it the crop is drawn
        with a host RNG and freezes at trace time."""
        if self.noise_randomness == "fixed":
            return self.filtered_noise
        limit = self.filtered_noise.shape[-1] - self.ir_len
        if noise_key is not None:
            start = jax.random.randint(noise_key, (), 0, limit)
        else:
            start = int(self._crop_rng.integers(0, limit))
        return jax.lax.dynamic_slice_in_dim(
            self.filtered_noise, start, self.ir_len, axis=-1
        )

    def parameter_size(self):
        shape = (self.num_channels, self.num_bands)
        size = {"log_decay": shape, "log_gain": shape}
        if self.use_fade_in:
            size["log_fade_in"] = shape
            size["z_fade_in_gain"] = shape
        return size


class FeedbackDelayNetwork:
    """A frequency-sampled feedback delay network (FDN) reverb.

    The reference lists this as an unimplemented stub
    (reference: reverb.py:450-460; docs TODO at
    references/history.rst:14-22) — implemented here.

    An FDN with ``N`` delay lines of (static, mutually-prime) lengths
    ``m_i``, a Householder feedback matrix ``Q``, per-line absorption
    gains ``g_i`` in (0, 1), input gains ``b`` and per-channel output
    gains ``C`` has transfer function

        H(z) = C (I - D(z) G Q)^{-1} D(z) b,    D(z) = diag(z^{-m_i}).

    We sample ``H`` on the ``ir_len``-point DFT grid — a batch of tiny
    complex ``N x N`` solves, ideal for the TPU — then irfft to a causal
    FIR and convolve.  All gains are learnable; the absorption maps to a
    per-line frequency-independent decay.

    Args:
        ir_len: FIR length (also the DFT size for frequency sampling).
        num_delays: number of delay lines ``N``.
        delay_lengths: optional explicit lengths (defaults to spread
            primes around 1000-4000 samples).
        processor_channel: ``"mono"``, ``"stereo"``, or ``"midside"``.
    """

    PRIMES = [1031, 1327, 1523, 1871, 2053, 2311, 2617, 2903,
              3167, 3469, 3727, 4001]

    def __init__(
        self,
        ir_len=30000,
        num_delays=6,
        delay_lengths=None,
        processor_channel="stereo",
        **_ignored,
    ):
        self.ir_len = ir_len
        self.num_delays = num_delays
        if delay_lengths is None:
            delay_lengths = self.PRIMES[:num_delays]
        assert len(delay_lengths) == num_delays
        self.processor_channel = processor_channel
        if processor_channel == "mono":
            self.num_channels = 1
        elif processor_channel in ("stereo", "midside"):
            self.num_channels = 2
        else:
            raise ValueError(f"Unknown channel type: {processor_channel}")

        # Householder feedback matrix Q = I - 2 v v^T / (v^T v)
        v = np.ones((num_delays, 1))
        Q = np.eye(num_delays) - 2.0 * (v @ v.T) / num_delays
        self.Q = jnp.asarray(Q, dtype=jnp.complex64)

        # delay phasors z^{-m_i} on the rfft grid: (F, N)
        m = np.asarray(delay_lengths)[None, :]
        k = np.arange(ir_len // 2 + 1)[:, None]
        self.delay_phasors = jnp.asarray(
            np.exp(-2j * np.pi * k * m / ir_len), dtype=jnp.complex64
        )
        self.conv = FIRConvolution(mode="causal")

    def __call__(self, input_signals, z_absorption, input_gains, output_gains):
        """Apply the FDN reverb.

        Args:
            input_signals: ``(B, C, L)``.
            z_absorption: ``(B, N)`` pre-sigmoid per-line absorption.
            input_gains: ``(B, N)``.
            output_gains: ``(B, C_rev, N)``.
        """
        ir = self.compute_ir(z_absorption, input_gains, output_gains)
        if self.processor_channel == "midside":
            x = lr_to_ms(input_signals)
            return ms_to_lr(self.conv(x, normalize_impulse(ir)))
        return self.conv(input_signals, normalize_impulse(ir))

    def compute_ir(self, z_absorption, input_gains, output_gains):
        B, N = z_absorption.shape
        g = 0.99 * jax.nn.sigmoid(z_absorption)  # stable: spectral radius < 1
        D = self.delay_phasors[None]  # (1, F, N)
        GQ = (g[:, None, :, None] * self.Q[None, None]).astype(jnp.complex64)
        # (B, F, N, N): A(z) = D(z) G Q ; solve (I - A) x = D b
        A = D[..., :, None] * GQ
        eye = jnp.eye(N, dtype=jnp.complex64)
        rhs = D * input_gains[:, None, :].astype(jnp.complex64)  # (B, F, N)
        x = jnp.linalg.solve(eye - A, rhs[..., None])[..., 0]  # (B, F, N)
        H = jnp.einsum(
            "bcn,bfn->bcf", output_gains.astype(jnp.complex64), x
        )
        return jnp.fft.irfft(H, n=self.ir_len)  # (B, C_rev, ir_len)

    def fir_kernel(self, z_absorption, input_gains, output_gains):
        """FIR-LTI capability (channel-diagonal modes only)."""
        if self.processor_channel == "midside":
            raise NotImplementedError("midside FDN is not channel-diagonal")
        ir = self.compute_ir(z_absorption, input_gains, output_gains)
        return normalize_impulse(ir), 0, None

    # -- streaming -----------------------------------------------------

    def stream_init(self, num_channels, block_len, **params):
        from grafx_tpu.ops.fftconv import conv_stream_init

        ir = self.compute_ir(
            params["z_absorption"], params["input_gains"], params["output_gains"]
        )
        state, conv = conv_stream_init(
            normalize_impulse(ir), num_channels, block_len
        )
        return state, {"conv": conv, "ms": self.processor_channel == "midside"}

    def stream_step(self, x, state, cache):
        from grafx_tpu.ops.fftconv import conv_stream_apply

        if cache["ms"]:
            y, state = conv_stream_apply(lr_to_ms(x), state, cache["conv"])
            return ms_to_lr(y), state
        return conv_stream_apply(x, state, cache["conv"])

    def parameter_size(self):
        return {
            "z_absorption": self.num_delays,
            "input_gains": self.num_delays,
            "output_gains": (self.num_channels, self.num_delays),
        }
