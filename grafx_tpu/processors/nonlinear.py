"""Memoryless nonlinear distortion processors.

Behavioral parity with the reference
(reference: src/grafx/processors/nonlinear.py:6-413).  All are
elementwise (VPU) and fuse under XLA; the Chebyshev recurrence unrolls at
trace time.
"""

import jax
import jax.numpy as jnp


class TanhDistortion:
    """Tanh clipper with optional pre/post gain, bias, and DC removal
    (reference: nonlinear.py:6-112)."""

    def __init__(
        self,
        pre_post_gain=True,
        inverse_post_gain=True,
        remove_dc=False,
        use_bias=False,
    ):
        self.pre_post_gain = pre_post_gain
        self.inverse_post_gain = inverse_post_gain
        self.remove_dc = remove_dc
        self.use_bias = use_bias

    def __call__(self, input_signals, log_pre_gain=None, log_post_gain=None, bias=None):
        if self.remove_dc:
            input_signals = input_signals - input_signals.mean(-1, keepdims=True)
        if self.pre_post_gain:
            pre_gain = jnp.exp(log_pre_gain)[..., None]
            input_signals = input_signals * pre_gain
        if self.use_bias:
            bias = bias[..., None]
            out = jnp.tanh(input_signals + bias) - jnp.tanh(bias)
        else:
            out = jnp.tanh(input_signals)
        if self.pre_post_gain:
            post_gain = (
                1.0 / pre_gain
                if self.inverse_post_gain
                else jnp.exp(log_post_gain)[..., None]
            )
            out = out * post_gain
        return out

    def parameter_size(self):
        size = {}
        if self.pre_post_gain:
            size["log_pre_gain"] = 1
            if not self.inverse_post_gain:
                size["log_post_gain"] = 1
        if self.use_bias:
            size["bias"] = 1
        return size


class PiecewiseTanhDistortion:
    """Three-segment tanh with hardness/threshold controls
    (reference: nonlinear.py:115-234)."""

    def __init__(self, pre_post_gain=True, inverse_post_gain=True, remove_dc=False):
        self.pre_post_gain = pre_post_gain
        self.inverse_post_gain = inverse_post_gain
        self.remove_dc = remove_dc

    def __call__(
        self,
        input_signals,
        log_hardness,
        z_threshold,
        log_pre_gain=None,
        log_post_gain=None,
    ):
        if self.remove_dc:
            input_signals = input_signals - input_signals.mean(-1, keepdims=True)
        if self.pre_post_gain:
            pre_gain = jnp.exp(log_pre_gain)[..., None]
            input_signals = input_signals * pre_gain

        hardness = jnp.exp(log_hardness)
        threshold = jax.nn.sigmoid(z_threshold)
        out = self.apply_distortion(input_signals, hardness, threshold)

        if self.pre_post_gain:
            post_gain = (
                1.0 / pre_gain
                if self.inverse_post_gain
                else jnp.exp(log_post_gain)[..., None]
            )
            out = out * post_gain
        return out

    @staticmethod
    def apply_distortion(input_signals, hardness, threshold):
        hardness = hardness[..., None, :]
        threshold = threshold[..., None, :]
        kn, kp = threshold[..., 0:1], threshold[..., 1:2]
        gp, gn = hardness[..., 0:1], hardness[..., 1:2]

        ap, an = (1 - jnp.tanh(kp)) / gp, (1 - jnp.tanh(kn)) / gn
        bp, bn = jnp.tanh(kp), -jnp.tanh(kn)

        above = ap * jnp.tanh(gp * (input_signals - kp)) + bp
        middle = jnp.tanh(input_signals)
        below = an * jnp.tanh(gn * (input_signals + kn)) + bn

        return jnp.where(
            input_signals > kp, above, jnp.where(input_signals < -kn, below, middle)
        )

    def parameter_size(self):
        size = {"log_hardness": 2, "z_threshold": 2}
        if self.pre_post_gain:
            size["log_pre_gain"] = 1
            if not self.inverse_post_gain:
                size["log_post_gain"] = 1
        return size


class PowerDistortion:
    """Elementwise polynomial distortion (reference: nonlinear.py:237-312)."""

    def __init__(self, max_order=10, pre_gain=True, remove_dc=False, use_tanh=False):
        assert max_order > 1
        self.max_order = max_order
        self.pre_gain = pre_gain
        self.remove_dc = remove_dc
        self.use_tanh = use_tanh

    def __call__(self, input_signals, basis_weights, log_pre_gain=None):
        if self.remove_dc:
            input_signals = input_signals - input_signals.mean(-1, keepdims=True)
        if self.pre_gain:
            input_signals = input_signals * jnp.exp(log_pre_gain)[..., None]

        basis_weights = jnp.tanh(basis_weights)  # (B, K)
        k = jnp.arange(self.max_order, dtype=input_signals.dtype)
        powers = input_signals[..., None] ** k  # (B, C, L, K)
        if self.use_tanh:
            powers = jnp.tanh(powers)
        return jnp.einsum("bclk,bk->bcl", powers, basis_weights)

    def parameter_size(self):
        size = {"basis_weights": self.max_order}
        if self.pre_gain:
            size["log_pre_gain"] = 1
        return size


class ChebyshevDistortion:
    """Chebyshev-basis distortion (reference: nonlinear.py:315-413)."""

    def __init__(self, max_order=10, pre_gain=True, remove_dc=False, use_tanh=False):
        assert max_order > 1
        self.max_order = max_order
        self.pre_gain = pre_gain
        self.remove_dc = remove_dc
        self.use_tanh = use_tanh

    def __call__(self, input_signals, basis_weights, log_pre_gain=None):
        if self.remove_dc:
            input_signals = input_signals - input_signals.mean(-1, keepdims=True)
        if self.pre_gain:
            input_signals = input_signals * jnp.exp(log_pre_gain)[..., None]

        basis_weights = jnp.tanh(basis_weights)
        return self.apply_distortion(input_signals, basis_weights, self.use_tanh)

    @staticmethod
    def apply_distortion(input_signals, basis_weights, use_tanh=False):
        max_order = basis_weights.shape[-1]
        # Chebyshev recurrence T_k = 2 x T_{k-1} - T_{k-2}, unrolled
        cheb = [jnp.ones_like(input_signals), input_signals]
        for _ in range(2, max_order):
            cheb.append(2 * input_signals * cheb[-1] - cheb[-2])
        basis = jnp.stack(cheb[:max_order], axis=-1)  # (B, C, L, K)
        if use_tanh:
            basis = jnp.tanh(basis)
        return jnp.einsum("bclk,bk->bcl", basis, basis_weights)

    def parameter_size(self):
        size = {"basis_weights": self.max_order}
        if self.pre_gain:
            size["log_pre_gain"] = 1
        return size
