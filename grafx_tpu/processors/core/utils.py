"""Small shared math helpers
(reference: src/grafx/processors/core/utils.py:7-18)."""

import jax.numpy as jnp


def rms_difference(X, Y, eps=1e-7):
    """Sum of |log-RMS(X) - log-RMS(Y)| over the batch (gain-staging loss)."""
    X_rms = jnp.log(jnp.mean(jnp.square(X), axis=(-1, -2)) + eps)
    Y_rms = jnp.log(jnp.mean(jnp.square(Y), axis=(-1, -2)) + eps)
    return jnp.sum(jnp.abs(X_rms - Y_rms))


def normalize_impulse(ir, eps=1e-12):
    """Normalize an IR batch ``(B, C, L)`` to unit mean channel energy."""
    assert ir.ndim == 3
    e = jnp.mean(jnp.sum(jnp.square(ir), axis=2, keepdims=True), axis=1, keepdims=True)
    return ir / jnp.sqrt(e + eps)
