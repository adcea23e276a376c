"""Stereo utility processors.

Behavioral parity with the reference
(reference: src/grafx/processors/stereo.py:9-205).  ``StereoToMidSide``
returns a *list* of two signals (the MIMO contract of the render
executor: one entry per outlet) rather than the reference's tuple, which
its own executor would misread as (output, intermediates).
"""

import math

import jax.numpy as jnp

INV_SQRT_2 = 1.0 / math.sqrt(2.0)


class StereoGain:
    """Channel-wise log-gain (reference: stereo.py:9-48)."""

    def __call__(self, input_signals, log_gain):
        """``(B, C, L)`` signals x ``(B, 2)`` log-gains -> ``(B, 2, L)``."""
        gain = jnp.exp(log_gain)
        return input_signals * gain[..., None]

    def fir_kernel(self, log_gain):
        """FIR-LTI capability: a gain is a 1-tap causal FIR, so gains in
        a serial LTI run fold into the neighbor's IR for free."""
        return jnp.exp(log_gain)[..., None], 0, None

    def parameter_size(self):
        return {"log_gain": 2}


class SideGainImager:
    """Side-channel loudness control (reference: stereo.py:51-99)."""

    def __call__(self, input_signals, log_gain):
        """``(B, 2, L)`` signals x ``(B, 1)`` side log-gain."""
        assert input_signals.shape[-2] == 2
        left, right = input_signals[:, 0, :], input_signals[:, 1, :]
        mid, side = left + right, left - right
        side = jnp.exp(log_gain) * side
        left, right = (mid + side) / 2, (mid - side) / 2
        return jnp.stack([left, right], axis=1)

    def parameter_size(self):
        return {"log_gain": 1}


class MonoToStereo:
    """Duplicate a mono signal to stereo (reference: stereo.py:102-131)."""

    def __call__(self, input_signals):
        assert input_signals.shape[-2] == 1
        return jnp.tile(input_signals, (1, 2, 1))

    def parameter_size(self):
        return {}


class StereoToMidSide:
    """Stereo -> (mid, side) — a two-outlet MIMO processor
    (reference: stereo.py:134-168)."""

    def __init__(self, normalize=True):
        self.normalize = normalize

    def __call__(self, input_signals):
        assert input_signals.shape[-2] == 2
        if self.normalize:
            input_signals = input_signals * INV_SQRT_2
        left, right = input_signals[:, :1, :], input_signals[:, 1:, :]
        return [left + right, left - right]

    def parameter_size(self):
        return {}


class MidSideToStereo:
    """(mid, side) -> stereo — a two-inlet MIMO processor
    (reference: stereo.py:171-205)."""

    def __init__(self, normalize=True):
        self.normalization_const = INV_SQRT_2 if normalize else 0.5

    def __call__(self, mid, side):
        assert mid.shape[-2] == 1
        out = jnp.concatenate([mid + side, mid - side], axis=1)
        return out * self.normalization_const

    def parameter_size(self):
        return {}
