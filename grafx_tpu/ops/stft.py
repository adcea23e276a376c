"""STFT / inverse STFT with torch-compatible conventions.

Used by the masked-noise reverb (reference:
src/grafx/processors/reverb.py:101-187, which relies on ``torch.stft`` /
``torch.istft``).  Conventions matched: ``center=True`` with reflect
padding, periodic windows, and iSTFT synthesis normalized by the summed
squared window envelope.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Below this transform size the inverse DFT runs as two MXU matmuls
# against precomputed real bases instead of jnp.fft.irfft: XLA's TPU FFT
# decomposes small transforms into a tail of reshape/copy/fusion ops,
# while a (frames x F) @ (F x n_fft) matmul is one MXU op with a matmul
# adjoint.  Measured end-to-end neutral on the headline bench (the
# reverb's cost sits in its long convolution, not here) but it cuts
# ~100 ops from the program, which helps compile time and trace size.
_IRFFT_MATMUL_MAX_N = 512


@functools.lru_cache(maxsize=8)
def _irfft_bases(n_fft: int):
    """Real/imag inverse-rfft bases: ``x = Re @ A + Im @ B`` with
    ``A, B (F, n_fft)`` built column-exactly from numpy's irfft."""
    F = n_fft // 2 + 1
    eye = np.eye(F)
    A = np.stack([np.fft.irfft(eye[f], n_fft) for f in range(F)])
    B = np.stack([np.fft.irfft(1j * eye[f], n_fft) for f in range(F)])
    return A.astype(np.float32), B.astype(np.float32)


def _irfft_small(spec, n_fft: int):
    """irfft along the last axis via MXU matmuls (exact; see bases)."""
    A, B = _irfft_bases(n_fft)
    re = jnp.real(spec)
    im = jnp.imag(spec)
    prec = jax.lax.Precision.HIGHEST
    return (
        jnp.einsum("...f,ft->...t", re, jnp.asarray(A), precision=prec)
        + jnp.einsum("...f,ft->...t", im, jnp.asarray(B), precision=prec)
    )


def stft(x, n_fft: int, hop_length: int, window):
    """Short-time Fourier transform.

    Args:
        x: ``(..., L)`` real signals.
        window: length ``n_fft`` array.

    Returns:
        Complex spectrogram ``(..., n_fft // 2 + 1, num_frames)`` with
        ``num_frames = 1 + L // hop_length`` (center=True convention).
    """
    L = x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
    xp = jnp.pad(x, pad, mode="reflect")
    num_frames = 1 + L // hop_length
    if n_fft % hop_length == 0:
        # integer overlap ratio r = n_fft / hop: frame m is the r
        # adjacent hop segments m..m+r-1, so framing is r static slices
        # + a concat (gather-free; TPU gathers are slow)
        r = n_fft // hop_length
        H = hop_length
        num_segs = num_frames + r - 1
        need = num_segs * H
        extra = need - xp.shape[-1]
        if extra > 0:
            xp = jnp.pad(xp, [(0, 0)] * (xp.ndim - 1) + [(0, extra)])
        segs = xp[..., :need].reshape(xp.shape[:-1] + (num_segs, H))
        frames = jnp.concatenate(
            [segs[..., j : j + num_frames, :] for j in range(r)], axis=-1
        )
    else:
        starts = jnp.arange(num_frames) * hop_length
        idx = starts[:, None] + jnp.arange(n_fft)[None, :]
        frames = xp[..., idx]
    frames = frames * window  # (..., num_frames, n_fft)
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.swapaxes(spec, -1, -2)


def istft(spec, n_fft: int, hop_length: int, window, length: int):
    """Inverse STFT via windowed overlap-add (torch.istft convention).

    For the common 50%-overlap case (``hop == n_fft // 2``) the
    overlap-add is scatter-free: each hop segment receives exactly two
    frame halves, so OLA becomes a reshape + add (TPU scatters
    serialize; this path is ~an order of magnitude faster there).

    Args:
        spec: ``(..., n_fft // 2 + 1, num_frames)`` complex spectrogram.
        length: output length (center padding removed).
    """
    spec_t = jnp.swapaxes(spec, -1, -2)
    if n_fft <= _IRFFT_MATMUL_MAX_N:
        frames = _irfft_small(spec_t, n_fft)
    else:
        frames = jnp.fft.irfft(spec_t, n=n_fft, axis=-1)
    frames = frames * window  # (..., num_frames, n_fft)
    num_frames = frames.shape[-2]
    total = n_fft + hop_length * (num_frames - 1)
    batch_shape = frames.shape[:-2]

    if 2 * hop_length == n_fft:
        first = frames[..., :hop_length]  # (..., M, H)
        second = frames[..., hop_length:]
        pad_cfg = [(0, 0)] * (frames.ndim - 2) + [(1, 0), (0, 0)]
        prev_second = jnp.pad(second, pad_cfg)[..., :-1, :]
        y = (first + prev_second).reshape(batch_shape + (num_frames * hop_length,))
        y = jnp.concatenate([y, second[..., -1, :]], axis=-1)

        w2 = window * window
        w_first, w_second = w2[:hop_length], w2[hop_length:]
        wsq_mid = w_first + w_second
        wsq = jnp.concatenate(
            [
                jnp.tile(w_first, 1),
                jnp.tile(wsq_mid, max(num_frames - 1, 0)),
                w_second,
            ]
        )[:total]
    elif n_fft % hop_length == 0:
        # general integer overlap ratio r = n_fft / hop: each hop
        # segment receives exactly r frame chunks, so OLA is r pad+adds
        # on the (segments, hop) grid — still scatter-free (75%/87.5%
        # overlap land here)
        r = n_fft // hop_length
        H = hop_length
        num_segs = num_frames + r - 1
        chunks = frames.reshape(batch_shape + (num_frames, r, H))
        segs = jnp.zeros(batch_shape + (num_segs, H), dtype=frames.dtype)
        w2 = (window * window).reshape(r, H)
        wsq_segs = jnp.zeros((num_segs, H), dtype=frames.dtype)
        pad_lead = [(0, 0)] * len(batch_shape)
        for j in range(r):
            segs = segs + jnp.pad(
                chunks[..., j, :],
                pad_lead + [(j, r - 1 - j), (0, 0)],
            )
            wsq_segs = wsq_segs.at[j : j + num_frames].add(w2[j])
        y = segs.reshape(batch_shape + (num_segs * H,))
        wsq = wsq_segs.reshape(num_segs * H)[:total]
    else:
        starts = jnp.arange(num_frames) * hop_length
        idx = (starts[:, None] + jnp.arange(n_fft)[None, :]).reshape(-1)
        flat = frames.reshape((-1, num_frames * n_fft))
        y = jnp.zeros((flat.shape[0], total), dtype=frames.dtype)
        y = y.at[:, idx].add(flat)
        y = y.reshape(batch_shape + (total,))
        wsq = jnp.zeros((total,), dtype=frames.dtype)
        wsq = wsq.at[idx].add(jnp.tile(window * window, num_frames))

    y = y / jnp.maximum(wsq, 1e-11)
    start = n_fft // 2
    return y[..., start : start + length]


def hann_window(n: int, periodic: bool = True):
    """Periodic Hann window (torch.hann_window convention)."""
    denom = n if periodic else n - 1
    t = np.arange(n)
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * t / denom))


def get_window(window_type, window_length: int, **kwargs):
    """Window factory (reference: core/fir.py:7-22).

    Returns a numpy array, or ``None`` for rectangular windows.
    """
    import scipy.signal

    if window_type in ("rectangular", "none", "boxcar", None):
        return None
    match window_type:
        case "hann":
            return hann_window(window_length)
        case "hamming":
            t = np.arange(window_length)
            return 0.54 - 0.46 * np.cos(2 * np.pi * t / window_length)
        case "blackman":
            t = 2 * np.pi * np.arange(window_length) / window_length
            return 0.42 - 0.5 * np.cos(t) + 0.08 * np.cos(2 * t)
        case "bartlett":
            t = np.arange(window_length)
            return 1.0 - np.abs(2.0 * t / window_length - 1.0)
        case "kaiser":
            beta = kwargs.get("beta", 12.0)
            return np.kaiser(window_length + 1, beta)[:-1]
        case _:
            raise ValueError(f"Unsupported window type: {window_type}")
