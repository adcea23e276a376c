"""Small shared math helpers
(reference: src/grafx/processors/core/utils.py:7-18)."""

import jax.numpy as jnp


def rms_difference(X, Y, eps=1e-7):
    """Sum of |log-RMS(X) - log-RMS(Y)| over the batch (gain-staging loss)."""
    X_rms = jnp.log(jnp.mean(jnp.square(X), axis=(-1, -2)) + eps)
    Y_rms = jnp.log(jnp.mean(jnp.square(Y), axis=(-1, -2)) + eps)
    return jnp.sum(jnp.abs(X_rms - Y_rms))


def accepts_noise_key(processor):
    """True if ``processor``'s call signature has an explicit
    ``noise_key`` parameter (the stochastic-processor contract: reverbs
    with per-call noise resampling, reference: reverb.py:101-114 and
    :410-418, and containers that forward the key).  Used by the render
    executor to decide which per-stage processors receive a derived RNG
    key; detection is by explicit name, never ``**kwargs``, so parameter
    dicts are never polluted."""
    import inspect

    target = processor if inspect.isroutine(processor) else type(processor).__call__
    try:
        sig = inspect.signature(target)
    except (TypeError, ValueError):
        return False
    return "noise_key" in sig.parameters


_MISSING = object()


def lti_kind_of(processor):
    """LTI serial-fusion family of ``processor`` (render/fuse.py):
    ``"fir"`` (implements ``fir_kernel``), ``"iir"`` (exact-backend
    biquad cascade with ``biquad_kernel``), or ``None``.  Processors may
    declare a ``lti_kind`` property to arbitrate (e.g. backend- or
    channel-mode-dependent); otherwise having ``fir_kernel`` implies
    ``"fir"``."""
    if processor is None:
        return None
    kind = getattr(processor, "lti_kind", _MISSING)
    if kind is not _MISSING:
        return kind
    return "fir" if hasattr(processor, "fir_kernel") else None


def normalize_impulse(ir, eps=1e-12):
    """Normalize an IR batch ``(B, C, L)`` to unit mean channel energy."""
    assert ir.ndim == 3
    e = jnp.mean(jnp.sum(jnp.square(ir), axis=2, keepdims=True), axis=1, keepdims=True)
    return ir / jnp.sqrt(e + eps)
