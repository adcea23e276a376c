"""Dynamic range processors: compressors, noise gates, envelope followers.

Behavioral parity with the reference
(reference: src/grafx/processors/dynamics.py:8-784).  Branchless knee
computation (``jnp.where`` / mask multiplication fuses under XLA); the
ballistics smoothing recursion uses the TPU kernel in
:mod:`grafx_tpu.ops.ballistics`.
"""

import jax
import jax.numpy as jnp

from grafx_tpu.ops.ballistics import ballistics_gain_core, fused_gain_available
from grafx_tpu.processors.core.envelope import Ballistics, TruncatedOnePoleIIRFilter


def _make_smoother(kind, iir_len, **backend_kwargs):
    match kind:
        case "iir":
            return TruncatedOnePoleIIRFilter(iir_len=iir_len, **backend_kwargs)
        case "iir_exact":
            # TPU upgrade over the reference's truncated-FIR approximation:
            # the exact blocked one-pole (ops/iir.py onepole_exact)
            return TruncatedOnePoleIIRFilter(exact=True, **backend_kwargs)
        case "ballistics":
            return Ballistics()
        case None:
            return None
        case _:
            raise ValueError(f"Unknown smoother: {kind}")


class Compressor:
    """Feed-forward compressor with selectable energy/gain smoothing and
    knee shape (reference: dynamics.py:213-489).

    On TPU, the common configuration (ballistics energy smoothing, no
    gain smoothing, quadratic knee) runs as ONE fused Pallas op
    (:func:`grafx_tpu.ops.ballistics.ballistics_gain_core`): recursion,
    knee, and the full adjoint live in the kernels.  Other
    configurations use the composed path; outputs are identical.
    """

    _fused_kind = "compressor"
    #: joins the "dynamics" graph-fusion family (render/fuse.py): the
    #: node's effect is ``y = gain(mean(x^2, ch)) * x``, so serial runs
    #: can compute one shared energy and thread gain products through
    #: members (``mean((g x)^2, ch) == g^2 mean(x^2, ch)``).
    dynamics_fusable = True

    def __init__(
        self,
        energy_smoother="iir",
        gain_smoother=None,
        gain_smooth_in_log=False,
        knee="quadratic",
        iir_len=16384,
        **backend_kwargs,
    ):
        self.energy_smoother = energy_smoother
        self.energy_smoother_module = _make_smoother(
            energy_smoother, iir_len, **backend_kwargs
        )
        self.gain_smoother = gain_smoother
        self.gain_smoother_module = _make_smoother(
            gain_smoother, iir_len, **backend_kwargs
        )
        if knee not in ("hard", "quadratic", "exponential"):
            raise ValueError(f"Unknown knee: {knee}")
        self.knee = knee
        self.gain_smooth_in_log = gain_smooth_in_log

    def __call__(
        self,
        input_signals,
        log_threshold,
        log_ratio,
        log_knee=None,
        z_alpha_pre=None,
        z_alpha_post=None,
    ):
        """Compress ``(N, C, L)`` signals; see ``parameter_size`` for the
        per-node parameters."""
        energy = jnp.mean(jnp.square(input_signals), axis=-2)
        gain = self.gain_from_energy(
            energy,
            log_threshold,
            log_ratio,
            log_knee=log_knee,
            z_alpha_pre=z_alpha_pre,
            z_alpha_post=z_alpha_post,
        )
        return gain[:, None, :] * input_signals

    def gain_from_energy(
        self,
        energy,
        log_threshold,
        log_ratio,
        log_knee=None,
        z_alpha_pre=None,
        z_alpha_post=None,
    ):
        """Linear gain time series from the ``(N, L)`` input energy.

        The node's whole effect is ``y = gain(energy) * x``; exposing
        the gain path lets the "dynamics" graph-fusion family
        (render/fuse.py) compute one shared energy for a serial run and
        thread gain products through members."""
        if (
            self.knee == "quadratic"
            and isinstance(self.energy_smoother_module, Ballistics)
            and self.gain_smoother is None
            and fused_gain_available()
        ):
            ts = jax.nn.sigmoid(z_alpha_pre)
            ratio = 1.0 + jnp.exp(log_ratio[..., 0])
            if self._fused_kind == "compressor":
                cf = 1.0 / ratio - 1.0
            else:
                cf = ratio - 1.0
            return ballistics_gain_core(
                energy,
                jnp.ones(energy.shape[0], dtype=energy.dtype),
                ts[..., 0],
                ts[..., 1],
                log_threshold[..., 0] - 6.0,
                cf,
                jnp.exp(log_knee[..., 0]) / 2.0,
                self._fused_kind,
            )
        if self.energy_smoother_module is not None:
            energy = self.energy_smoother_module(energy, z_alpha=z_alpha_pre)
        log_energy = jnp.log(energy + 1e-5)
        log_gain = self.compute_gain(
            log_energy, log_threshold - 6.0, log_ratio, log_knee
        )
        if self.gain_smoother_module is not None:
            if self.gain_smooth_in_log:
                return jnp.exp(
                    self.gain_smoother_module(log_gain, z_alpha=z_alpha_post)
                )
            return self.gain_smoother_module(
                jnp.exp(log_gain), z_alpha=z_alpha_post
            )
        return jnp.exp(log_gain)

    # -- streaming -----------------------------------------------------

    def stream_init(self, num_channels, block_len, **params):
        """Streaming contract (render/streaming.py): carry the energy
        (and optional gain) smoother states across blocks.  Uses the
        composed path — identical outputs to ``__call__`` — because the
        fused kernel does not expose the final envelope."""
        del num_channels, block_len
        N = params["log_threshold"].shape[0]
        e_state = (
            None
            if self.energy_smoother_module is None
            else self.energy_smoother_module.stream_zero_state(N)
        )
        g_state = (
            None
            if self.gain_smoother_module is None
            else self.gain_smoother_module.stream_zero_state(N)
        )
        return {"energy": e_state, "gain": g_state}, dict(params)

    def stream_step(self, x, state, cache):
        energy = jnp.mean(jnp.square(x), axis=-2)
        gain, state = self.gain_stream_from_energy(energy, state, cache)
        return gain[:, None, :] * x, state

    def gain_stream_from_energy(self, energy, state, cache):
        """Streaming counterpart of :meth:`gain_from_energy`: one block
        of ``(N, block)`` input energy -> (gain, new state)."""
        e_state, g_state = state["energy"], state["gain"]
        if self.energy_smoother_module is not None:
            energy, e_state = self.energy_smoother_module.stream(
                energy, e_state, z_alpha=cache.get("z_alpha_pre")
            )
        log_energy = jnp.log(energy + 1e-5)
        log_gain = self.compute_gain(
            log_energy,
            cache["log_threshold"] - 6.0,
            cache["log_ratio"],
            cache.get("log_knee"),
        )
        if self.gain_smoother_module is not None:
            if self.gain_smooth_in_log:
                smoothed, g_state = self.gain_smoother_module.stream(
                    log_gain, g_state, z_alpha=cache.get("z_alpha_post")
                )
                gain = jnp.exp(smoothed)
            else:
                gain, g_state = self.gain_smoother_module.stream(
                    jnp.exp(log_gain), g_state, z_alpha=cache.get("z_alpha_post")
                )
        else:
            gain = jnp.exp(log_gain)
        return gain, {"energy": e_state, "gain": g_state}

    def compute_gain(self, log_energy, log_threshold, log_ratio, log_knee):
        match self.knee:
            case "hard":
                return self.gain_hard_knee(log_energy, log_threshold, log_ratio, None)
            case "quadratic":
                return self.gain_quad_knee(
                    log_energy, log_threshold, log_ratio, log_knee
                )
            case "exponential":
                return self.gain_exp_knee(
                    log_energy, log_threshold, log_ratio, log_knee
                )

    def parameter_size(self):
        size = {"log_threshold": 1, "log_ratio": 1}
        if self.knee != "hard":
            size["log_knee"] = 1
        if self.energy_smoother in ("iir", "iir_exact"):
            size["z_alpha_pre"] = 1
        elif self.energy_smoother == "ballistics":
            size["z_alpha_pre"] = 2
        if self.gain_smoother in ("iir", "iir_exact"):
            size["z_alpha_post"] = 1
        elif self.gain_smoother == "ballistics":
            size["z_alpha_post"] = 2
        return size

    @staticmethod
    def gain_hard_knee(log_energy, log_threshold, log_ratio, _):
        ratio = 1.0 + jnp.exp(log_ratio)
        out = jnp.minimum(
            log_energy, log_threshold + (log_energy - log_threshold) / ratio
        )
        return out - log_energy

    @staticmethod
    def gain_quad_knee(log_energy, log_threshold, log_ratio, log_knee):
        ratio = 1.0 + jnp.exp(log_ratio)
        half_knee = jnp.exp(log_knee) / 2.0

        below = log_energy
        above = log_threshold + (log_energy - log_threshold) / ratio
        middle = log_energy + (1.0 / ratio - 1.0) * jnp.square(
            log_energy - log_threshold + half_knee
        ) / (4.0 * half_knee)

        out = jnp.where(
            log_energy < log_threshold - half_knee,
            below,
            jnp.where(log_energy > log_threshold + half_knee, above, middle),
        )
        return out - log_energy

    @staticmethod
    def gain_exp_knee(log_energy, log_threshold, log_ratio, log_knee):
        ratio = 1.0 + jnp.exp(log_ratio)
        knee = jnp.exp(log_knee)
        return (
            (1.0 / ratio - 1.0)
            * jax.nn.softplus(knee * (log_energy - log_threshold))
            / knee
        )


class NoiseGate(Compressor):
    """Feed-forward noise gate: the below-threshold mirror of
    :class:`Compressor` (reference: dynamics.py:492-721)."""

    _fused_kind = "noisegate"

    @staticmethod
    def gain_hard_knee(log_energy, log_threshold, log_ratio, _):
        ratio = 1.0 + jnp.exp(log_ratio)
        out = jnp.minimum(
            log_energy, ratio * (log_energy - log_threshold) + log_threshold
        )
        return out - log_energy

    @staticmethod
    def gain_quad_knee(log_energy, log_threshold, log_ratio, log_knee):
        ratio = 1.0 + jnp.exp(log_ratio)
        half_knee = jnp.exp(log_knee) / 2.0

        below = ratio * (log_energy - log_threshold) + log_threshold
        above = log_energy
        middle = log_energy + (1.0 - ratio) * jnp.square(
            log_energy - log_threshold - half_knee
        ) / (4.0 * half_knee)

        out = jnp.where(
            log_energy < log_threshold - half_knee,
            below,
            jnp.where(log_energy > log_threshold + half_knee, above, middle),
        )
        return out - log_energy

    @staticmethod
    def gain_exp_knee(log_energy, log_threshold, log_ratio, log_knee):
        one_minus_ratio = -jnp.exp(log_ratio)
        knee = jnp.exp(log_knee)
        return (
            one_minus_ratio
            * jax.nn.softplus(knee * (log_threshold - log_energy))
            / knee
        )


class FactorizedCompressor(Compressor):
    """Compressor with *frame-factorized* ballistics smoothing.

    The reference ships this as a constructor-only stub
    (reference: dynamics.py:724-739, and the commented
    ``FramewiseBallistics`` sketch at core/envelope.py:104-121); the
    intended design — run the data-dependent attack/release recursion at
    the *frame* level instead of per sample — is implemented here.

    The per-channel energy is mean-pooled into frames of ``frame_len``,
    the ballistics recursion runs over the ~L/frame_len frame sequence
    (hundreds of steps instead of 10^5+), and the smoothed envelope is
    linearly interpolated back to sample rate.  This trades a small
    envelope lag for a ~frame_len-times shorter sequential recursion.
    """

    def __init__(self, frame_len=1024, gain_smoother=None,
                 gain_smooth_in_log=False, knee="quadratic", **backend_kwargs):
        super().__init__(
            energy_smoother="ballistics",
            gain_smoother=gain_smoother,
            gain_smooth_in_log=gain_smooth_in_log,
            knee=knee,
            **backend_kwargs,
        )
        self.frame_len = frame_len
        ballistics = self.energy_smoother_module

        class _FrameSmoother:
            def __call__(_self, energy, z_alpha):
                B, L = energy.shape
                F = self.frame_len
                pad = (-L) % F
                e = jnp.pad(energy, ((0, 0), (0, pad)))
                frames = e.reshape(B, -1, F).mean(-1)
                smoothed = ballistics(frames, z_alpha=z_alpha)
                # Linear interpolation back to sample rate, GATHER-FREE
                # (TPU gathers over 10^5 indices serialize): sample j of
                # block k sits between frame centers, so the upsample is
                # a broadcast lerp between the previous/current/next
                # frame values with a fixed per-offset weight pattern,
                # flat-extended at the edges (identical to the
                # clipped-gather formulation).
                s = smoothed  # (B, n_frames)
                s_prev = jnp.concatenate([s[:, :1], s[:, :-1]], axis=1)
                s_next = jnp.concatenate([s[:, 1:], s[:, -1:]], axis=1)
                w = (jnp.arange(F, dtype=s.dtype) + 0.5) / F  # (F,)
                first = w < 0.5
                frac = jnp.where(first, w + 0.5, w - 0.5)  # (F,)
                a = jnp.where(first, s_prev[..., None], s[..., None])
                b = jnp.where(first, s[..., None], s_next[..., None])
                up = a * (1.0 - frac) + b * frac  # (B, n_frames, F)
                return up.reshape(B, -1)[:, :L]

        self.energy_smoother_module = _FrameSmoother()

    def stream_init(self, num_channels, block_len, **params):
        raise NotImplementedError(
            "FactorizedCompressor has no compact per-sample state"
            " (frame-factorized smoothing); stream with"
            " Compressor(energy_smoother='ballistics') instead."
        )


class ApproxCompressor:
    """Deprecated v0.5 compressor: IIR envelope + quadratic knee
    (reference: dynamics.py:8-120)."""

    def __init__(self, iir_len=16384, **backend_kwargs):
        self.env_follower = IIREnvelopeFollower(iir_len=iir_len, **backend_kwargs)

    def __call__(self, input_signals, z_alpha, log_threshold, log_ratio, log_knee=None):
        log_energy = self.env_follower(input_signals, z_alpha)
        log_gain = Compressor.gain_quad_knee(
            log_energy, log_threshold - 6.0, log_ratio, log_knee
        )
        return jnp.exp(log_gain)[:, None, :] * input_signals

    def parameter_size(self):
        return {"z_alpha": 1, "log_threshold": 1, "log_ratio": 1, "log_knee": 1}


class ApproxNoiseGate:
    """Deprecated v0.5 noise gate (reference: dynamics.py:123-210)."""

    def __init__(self, freq_sample_n=16384, **backend_kwargs):
        self.env_follower = IIREnvelopeFollower(
            iir_len=freq_sample_n, **backend_kwargs
        )

    def __call__(self, input_signals, z_alpha, log_threshold, log_ratio, log_knee):
        log_energy = self.env_follower(input_signals, z_alpha)
        gain = self.compute_gain(
            log_energy, log_threshold - 6.0, log_ratio, log_knee
        )
        return gain * input_signals

    @staticmethod
    def compute_gain(log_energy, log_threshold, log_ratio, log_knee):
        ratio = jnp.exp(log_ratio)
        knee = jnp.exp(log_knee)

        below = ratio * (log_energy - log_threshold) + log_threshold
        above = log_energy
        middle = log_energy + (1.0 - ratio) * jnp.square(
            log_energy - log_threshold - knee / 2.0
        ) / 2.0 / (knee + 1e-3)

        out = jnp.where(
            log_energy < log_threshold - knee / 2.0,
            below,
            jnp.where(log_energy > log_threshold + knee / 2.0, above, middle),
        )
        return jnp.exp(out - log_energy)[:, None, :]

    def parameter_size(self):
        return {"z_alpha": 1, "log_threshold": 1, "log_ratio": 1, "log_knee": 1}


class BaseEnvelopeFollower:
    """Loudness detect (energy / amplitude / rms) -> smooth -> log
    (reference: dynamics.py:742-770)."""

    def __init__(self, smoother, detect_with="energy"):
        self.detect_with = detect_with
        self.smoother = smoother
        self.eps = 1e-7

    def __call__(self, signal, *args, **kwargs):
        match self.detect_with:
            case "energy":
                loudness = jnp.mean(jnp.square(signal), axis=-2)
            case "amplitude":
                loudness = jnp.mean(jnp.abs(signal), axis=-2)
            case "rms_channel":
                loudness = jnp.sqrt(self.eps + jnp.mean(jnp.square(signal), axis=-2))
            case _:
                raise ValueError(f"Unknown detect_with: {self.detect_with}")
        envelope = self.smoother(loudness, *args, **kwargs)
        return jnp.log(envelope + 1e-5)

    def parameter_size(self):
        # one coefficient for the one-pole smoother, two for ballistics
        # (the reference delegates to the smoother, which lacks the method
        # — a latent bug; resolved here)
        n = 2 if isinstance(self.smoother, Ballistics) else 1
        return {"z_alpha": n}


class IIREnvelopeFollower(BaseEnvelopeFollower):
    """Envelope follower with truncated one-pole smoothing
    (reference: dynamics.py:773-779)."""

    def __init__(self, detect_with="energy", iir_len=16384, **backend_kwargs):
        super().__init__(
            smoother=TruncatedOnePoleIIRFilter(iir_len=iir_len, **backend_kwargs),
            detect_with=detect_with,
        )

    def __call__(self, signal, z_alpha):
        return super().__call__(signal, z_alpha=z_alpha)


class BallisticsEnvelopeFollower(BaseEnvelopeFollower):
    """Envelope follower with ballistics smoothing
    (reference: dynamics.py:782-784)."""

    def __init__(self, detect_with="energy"):
        super().__init__(smoother=Ballistics(), detect_with=detect_with)

    def __call__(self, signal, z_alpha):
        return super().__call__(signal, z_alpha=z_alpha)
