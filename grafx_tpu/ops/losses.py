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


def _stft_loss_from_specs(X, Y, eps):
    sc = jnp.linalg.norm(X - Y) / (jnp.linalg.norm(Y) + eps)
    log_l1 = jnp.mean(jnp.abs(jnp.log(X + eps) - jnp.log(Y + eps)))
    return sc + log_l1


def stft_loss(x, y, n_fft=1024, hop=256, eps=1e-7):
    """Single-resolution STFT loss: spectral convergence + log-magnitude
    L1 (the auraloss ``STFTLoss`` recipe)."""
    X, Y = _spectrogram(x, n_fft, hop), _spectrogram(y, n_fft, hop)
    return _stft_loss_from_specs(X, Y, eps)


def multi_resolution_stft_loss(
    x, y, n_ffts=(512, 1024, 2048), hop_ratio=4, eps=1e-7
):
    """Multi-resolution STFT loss averaged over FFT sizes."""
    losses = [
        stft_loss(x, y, n_fft=n, hop=n // hop_ratio, eps=eps) for n in n_ffts
    ]
    return sum(losses) / len(losses)


def precompute_stft_targets(y, n_ffts=(512, 1024, 2048), hop_ratio=4):
    """Precompute the TARGET spectrograms of the MR-STFT loss once.

    In a parameter-optimization loop the reference target is
    loop-invariant, but a loss traced inside the jitted step re-runs the
    target's STFTs (forward only, but at three resolutions) every
    iteration — XLA cannot hoist work across jit calls.  Compute them
    once outside the loop and pass the result to
    :func:`multi_resolution_stft_loss_precomputed`; with matching
    ``n_ffts``/``hop_ratio`` the loss value is bit-identical to
    :func:`multi_resolution_stft_loss`.
    """
    return tuple(
        _spectrogram(y, n, n // hop_ratio) for n in n_ffts
    )


def multi_resolution_stft_loss_precomputed(
    x, target_specs, n_ffts=(512, 1024, 2048), hop_ratio=4, eps=1e-7
):
    """MR-STFT loss against spectrograms from
    :func:`precompute_stft_targets` (halves the loss FFT count per
    step)."""
    if len(target_specs) != len(n_ffts):
        raise ValueError(
            f"{len(target_specs)} precomputed spectrograms for"
            f" {len(n_ffts)} FFT sizes — precompute_stft_targets and the"
            " loss must use the same n_ffts."
        )
    losses = [
        _stft_loss_from_specs(_spectrogram(x, n, n // hop_ratio), Y, eps)
        for n, Y in zip(n_ffts, target_specs)
    ]
    return sum(losses) / len(losses)


def mae_loss(x, y):
    return jnp.mean(jnp.abs(x - y))


def mse_loss(x, y):
    return jnp.mean(jnp.square(x - y))
