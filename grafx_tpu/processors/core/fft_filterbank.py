"""Triangular filterbank on bark/mel/linear/log scales.

Behavioral parity with the reference ``TriangularFilterBank``
(reference: src/grafx/processors/core/fft_filterbank.py:9-154).  The
matrix is built host-side in numpy at init; application is a single
matmul (MXU).
"""

import warnings

import jax.numpy as jnp
import numpy as np

from grafx_tpu.processors.core.scale import from_scale, to_scale


class TriangularFilterBank:
    """Synthesis (expand filterbank energies to FFT bins) and analysis
    (normalized pooling) via matmuls.

    Args:
        num_frequency_bins: linear FFT bins ``F``.
        num_filters: filterbank size ``F_fb``.
        scale: frequency scale name.
        f_min / f_max / sr: frequency range.
        low_half_triangle: attach the remaining low-frequency residual row.
    """

    def __init__(
        self,
        num_frequency_bins,
        num_filters=50,
        scale="bark_traunmuller",
        f_min=40,
        f_max=None,
        sr=44100,
        low_half_triangle=True,
    ):
        if f_max is not None and f_max > sr // 2:
            warnings.warn(
                f"`f_max` ({f_max}) is higher than the Nyquist frequency"
                f" ({sr // 2}); clamping."
            )
            f_max = sr // 2

        fb = TriangularFilterBank.compute_matrix(
            num_frequency_bins=num_frequency_bins,
            num_filters=num_filters,
            scale=scale,
            f_min=f_min,
            f_max=f_max,
            sr=sr,
            low_half_triangle=low_half_triangle,
        )
        self.num_filters = num_filters
        self.filterbank = jnp.asarray(fb.T, dtype=jnp.float32)  # (F_fb, F)
        fb_norm = fb / np.maximum(fb.sum(0, keepdims=True), 1e-12)
        self.filterbank_normalized = jnp.asarray(fb_norm, dtype=jnp.float32)

    def __call__(self, energy, mode="synthesis"):
        """Apply the filterbank to ``(..., F_fb)`` (synthesis) or
        ``(..., F)`` (analysis) energies."""
        match mode:
            case "analysis":
                return jnp.matmul(energy, self.filterbank_normalized)
            case "synthesis":
                return jnp.matmul(energy, self.filterbank)
            case _:
                raise ValueError(f"Unsupported mode: {mode}")

    @staticmethod
    def compute_matrix(
        num_frequency_bins, num_filters, scale, f_min, f_max, sr, low_half_triangle
    ):
        """The ``(F, F_fb)`` triangular filterbank matrix (numpy)."""
        assert scale in (
            "bark_traunmuller",
            "bark_schroeder",
            "bark_wang",
            "mel_htk",
            "mel_slaney",
            "linear",
            "log",
        )
        if f_max is None:
            f_max = sr // 2
        if low_half_triangle:
            num_filters -= 1

        all_freqs = np.linspace(0, sr // 2, num_frequency_bins)
        s_min, s_max = to_scale(f_min, scale), to_scale(f_max, scale)
        s_pts = np.linspace(s_min, s_max, num_filters + 2)
        f_pts = from_scale(s_pts, scale)

        fb = TriangularFilterBank._create_triangular_filterbank(all_freqs, f_pts)

        if low_half_triangle:
            remaining = 1.0 - fb.sum(-1)
            fb = np.concatenate([remaining[:, None], fb], axis=-1)

        if (fb.max(axis=0) == 0.0).any():
            warnings.warn(
                "At least one filterbank row is all-zero; `num_filters` may"
                " be too high or `num_frequency_bins` too low."
            )
        return fb

    @staticmethod
    def _create_triangular_filterbank(all_freqs, f_pts):
        f_diff = f_pts[1:] - f_pts[:-1]
        slopes = f_pts[None, :] - all_freqs[:, None]
        down_slopes = -slopes[:, :-2] / f_diff[:-1]
        up_slopes = slopes[:, 2:] / f_diff[1:]
        return np.maximum(0.0, np.minimum(down_slopes, up_slopes))
