"""Audio losses for graph parameter optimization.

The reference leaves the loss to the user (its docs train against
``auraloss`` multi-resolution STFT losses).  We provide TPU-native
equivalents built on :mod:`grafx_tpu.ops.stft` — each resolution is one
batched XLA FFT.
"""

import jax.numpy as jnp

from grafx_tpu.ops.stft import hann_window, stft


def _spectrogram(x, n_fft, hop):
    window = jnp.asarray(hann_window(n_fft), dtype=x.dtype)
    flat = x.reshape((-1, x.shape[-1]))
    spec = stft(flat, n_fft, hop, window)
    return jnp.abs(spec)


def stft_loss(x, y, n_fft=1024, hop=256, eps=1e-7):
    """Single-resolution STFT loss: spectral convergence + log-magnitude
    L1 (the auraloss ``STFTLoss`` recipe)."""
    X, Y = _spectrogram(x, n_fft, hop), _spectrogram(y, n_fft, hop)
    sc = jnp.linalg.norm(X - Y) / (jnp.linalg.norm(Y) + eps)
    log_l1 = jnp.mean(jnp.abs(jnp.log(X + eps) - jnp.log(Y + eps)))
    return sc + log_l1


def multi_resolution_stft_loss(
    x, y, n_ffts=(512, 1024, 2048), hop_ratio=4, eps=1e-7
):
    """Multi-resolution STFT loss averaged over FFT sizes."""
    losses = [
        stft_loss(x, y, n_fft=n, hop=n // hop_ratio, eps=eps) for n in n_ffts
    ]
    return sum(losses) / len(losses)


def mae_loss(x, y):
    return jnp.mean(jnp.abs(x - y))


def mse_loss(x, y):
    return jnp.mean(jnp.square(x - y))
