"""Surrogate learnable delay line.

Behavioral parity with the reference ``SurrogateDelay``
(reference: src/grafx/processors/core/delay.py:16-143): a delay is a
complex sinusoid in the frequency domain; its angular frequency ``z`` is
constrained to the unit disk and optimized by gradient descent, with
optional straight-through hard-delay forward and normalized complex
gradients — both expressed here as ``jax.custom_vjp`` / ``stop_gradient``
compositions.
"""

import jax
import jax.numpy as jnp


@jax.custom_vjp
def normalized_gradient(z):
    """Identity forward; backward normalizes the gradient to unit magnitude
    (reference: core/delay.py:5-13)."""
    return z


def _ng_fwd(z):
    return z, None


def _ng_bwd(_, g):
    return (g / (1e-7 + jnp.abs(g)),)


normalized_gradient.defvjp(_ng_fwd, _ng_bwd)


class SurrogateDelay:
    """Surrogate FIR for a learnable delay.

    Args:
        N: FIR length (max delay + 1).
        straight_through: hard one-hot delays forward, soft surrogates
            backward (STE).
        normalize_gradients: unit-norm complex-conjugate gradients.
        radii_loss: return the ``(1 - |z|)^2`` regularizer encouraging
            sharp delays.
    """

    def __init__(
        self, N, straight_through=True, radii_loss=True, normalize_gradients=True
    ):
        self.N = N
        self.sin_N = N // 2 + 1
        self.straight_through = straight_through
        self.radii_loss = radii_loss
        self.normalize_gradients = normalize_gradients

    def __call__(self, z):
        """Compute surrogate-delay FIRs from complex frequencies.

        Args:
            z: complex array, any shape.

        Returns:
            ``(irs, radii_loss)`` where ``irs`` has a trailing FIR-tap dim.
        """
        assert jnp.iscomplexobj(z)
        shape = z.shape
        z = z.reshape(-1)

        loss = self.calculate_radii_loss(z)

        if self.normalize_gradients:
            z = normalized_gradient(z)

        mag = jnp.abs(z)
        z = z * jnp.tanh(mag) / (mag + 1e-7)

        k = jnp.arange(self.sin_N)[None, :]
        sins = (z[:, None] + 1e-7) ** k
        irs = jnp.fft.irfft(sins)  # length 2 * (sin_N - 1)

        if self.straight_through:
            irs = self.apply_straight_through(irs)

        return irs.reshape(shape + (irs.shape[-1],)), loss

    def calculate_radii_loss(self, z):
        mag = jnp.tanh(jnp.abs(z))
        return jnp.sum(jnp.square(1.0 - mag))

    def apply_straight_through(self, irs):
        hard = self.get_hard_irs(irs)
        return irs + jax.lax.stop_gradient(hard - irs)

    @staticmethod
    def get_hard_irs(irs):
        onset = jnp.argmax(irs, axis=-1)
        hard = jax.nn.one_hot(onset, irs.shape[-1], dtype=irs.dtype)
        return jax.lax.stop_gradient(hard)
