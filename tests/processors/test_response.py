"""Frequency-response property tests for the cookbook filters.

These check the *designed* magnitude responses (RBJ cookbook identities),
independent of any reference implementation — e.g. a low-pass is unity at
DC and ~0 at Nyquist; a peaking filter's gain at its center frequency is
exactly A^2 for the RBJ parameterization... verified against the
analytically evaluated transfer function.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grafx_tpu.processors.filter import (
    AllPassFilter,
    BandPassFilter,
    BandRejectFilter,
    HighPassFilter,
    HighShelf,
    LowPassFilter,
    LowShelf,
    PeakingFilter,
)


def freq_response(Bs, As, w):
    """|H(e^{jw})| for biquad coefficient arrays (..., 3)."""
    z = np.exp(-1j * np.asarray(w))
    B = np.asarray(Bs)
    A = np.asarray(As)
    num = B[..., 0] + B[..., 1] * z + B[..., 2] * z**2
    den = A[..., 0] + A[..., 1] * z + A[..., 2] * z**2
    return np.abs(num / den)


def coeffs(cls, w0, q_inv, log_gain=None):
    w0_act = np.pi * jax.nn.sigmoid(jnp.asarray(w0))
    alpha = np.sin(w0_act) * np.exp(q_inv) * 0.5
    cos_w0 = np.cos(w0_act)
    if log_gain is None:
        Bs, As = cls.get_biquad_coefficients(
            jnp.asarray(cos_w0), jnp.asarray(alpha)
        )
    else:
        Bs, As = cls.get_biquad_coefficients(
            jnp.asarray(cos_w0), jnp.asarray(alpha), jnp.exp(jnp.asarray(log_gain))
        )
    return np.asarray(Bs), np.asarray(As), float(w0_act)


def test_lowpass_dc_and_nyquist():
    Bs, As, w0 = coeffs(LowPassFilter, 0.0, 0.0)
    assert freq_response(Bs, As, 1e-6) == pytest.approx(1.0, abs=1e-3)
    assert freq_response(Bs, As, np.pi) < 1e-3


def test_highpass_dc_and_nyquist():
    Bs, As, w0 = coeffs(HighPassFilter, 0.0, 0.0)
    assert freq_response(Bs, As, 1e-6) < 1e-3
    assert freq_response(Bs, As, np.pi) == pytest.approx(1.0, abs=1e-3)


def test_bandpass_center_unity_skirts_fall():
    Bs, As, w0 = coeffs(BandPassFilter, 0.0, 0.0)
    assert freq_response(Bs, As, w0) == pytest.approx(1.0, abs=1e-3)
    assert freq_response(Bs, As, w0 / 8) < 0.5
    assert freq_response(Bs, As, min(np.pi, 8 * w0) - 1e-3) < 0.7


def test_bandreject_notch():
    Bs, As, w0 = coeffs(BandRejectFilter, 0.0, 0.0)
    assert freq_response(Bs, As, w0) < 1e-6
    assert freq_response(Bs, As, 1e-6) == pytest.approx(1.0, abs=1e-3)


def test_allpass_flat_magnitude():
    Bs, As, w0 = coeffs(AllPassFilter, 0.3, -0.2)
    for w in np.linspace(0.01, np.pi - 0.01, 17):
        assert freq_response(Bs, As, w) == pytest.approx(1.0, abs=1e-4)


def test_peaking_center_gain():
    log_gain = 0.8
    Bs, As, w0 = coeffs(PeakingFilter, 0.0, 0.0, log_gain)
    # RBJ peaking: |H(w0)| = A^2 with A = exp(log_gain)
    A = np.exp(log_gain)
    assert freq_response(Bs, As, w0) == pytest.approx(A**2, rel=1e-3)
    # far away: unity
    assert freq_response(Bs, As, 1e-6) == pytest.approx(1.0, abs=1e-2)


def test_lowshelf_asymptotes():
    log_gain = 0.5
    Bs, As, w0 = coeffs(LowShelf, 0.0, 0.0, log_gain)
    A = np.exp(log_gain)
    # RBJ shelves: |H(0)| = A^2, |H(pi)| = 1
    assert freq_response(Bs, As, 1e-6) == pytest.approx(A**2, rel=1e-3)
    assert freq_response(Bs, As, np.pi) == pytest.approx(1.0, rel=1e-3)


def test_highshelf_asymptotes():
    log_gain = -0.4
    Bs, As, w0 = coeffs(HighShelf, 0.0, 0.0, log_gain)
    A = np.exp(log_gain)
    assert freq_response(Bs, As, np.pi) == pytest.approx(A**2, rel=1e-3)
    assert freq_response(Bs, As, 1e-6) == pytest.approx(1.0, rel=1e-3)


def test_graphic_eq_center_gains_track():
    """GEQ: the magnitude response at each band center approximately
    follows the commanded gain (Liski-design property)."""
    from grafx_tpu.processors.core.geq import GraphicEqualizerBiquad

    geq = GraphicEqualizerBiquad(scale="bark", sr=44100)
    log_gains = jnp.zeros((1, geq.num_bands)).at[0, 10].set(1.0)
    Bs, As = geq(log_gains)
    Bs, As = np.asarray(Bs[0]), np.asarray(As[0])

    fc10 = 1370.0  # band 10 center (bark table)
    w = 2 * np.pi * fc10 / 44100
    total = np.prod([freq_response(Bs[k], As[k], w) for k in range(geq.num_bands)])
    # commanded gain e^1 = 2.72; neighbor-leakage means approximate
    assert 1.8 < total < 4.0
