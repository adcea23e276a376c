"""Dynamics tests (reference: tests/processors/test_dynamics.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grafx_tpu.processors import (
    ApproxCompressor,
    ApproxNoiseGate,
    BallisticsEnvelopeFollower,
    Compressor,
    IIREnvelopeFollower,
    NoiseGate,
)
from utils import _test_single_processor


@pytest.mark.parametrize("energy_smoother", ["iir", "ballistics", None])
@pytest.mark.parametrize("knee", ["hard", "quadratic", "exponential"])
def test_compressor(energy_smoother, knee):
    _test_single_processor(
        Compressor(energy_smoother=energy_smoother, knee=knee, iir_len=2048),
        audio_len=2**12,
    )


@pytest.mark.parametrize("gain_smoother", ["iir", "ballistics"])
@pytest.mark.parametrize("gain_smooth_in_log", [False, True])
def test_compressor_gain_smoother(gain_smoother, gain_smooth_in_log):
    _test_single_processor(
        Compressor(
            gain_smoother=gain_smoother,
            gain_smooth_in_log=gain_smooth_in_log,
            iir_len=2048,
        ),
        audio_len=2**12,
    )


@pytest.mark.parametrize("knee", ["hard", "quadratic", "exponential"])
def test_noisegate(knee):
    _test_single_processor(
        NoiseGate(knee=knee, iir_len=2048), audio_len=2**12
    )


def test_approx_compressor():
    _test_single_processor(ApproxCompressor(iir_len=2048), audio_len=2**12)


def test_approx_noisegate():
    _test_single_processor(ApproxNoiseGate(freq_sample_n=2048), audio_len=2**12)


def test_compressor_actually_compresses():
    """Loud signals get attenuated; quiet signals pass (hard knee)."""
    comp = Compressor(energy_smoother=None, knee="hard")
    B, C, L = 1, 2, 2**12
    loud = 10.0 * jnp.ones((B, C, L))
    params = dict(
        log_threshold=jnp.full((B, 1), -2.0),
        log_ratio=jnp.full((B, 1), 2.0),
    )
    out = comp(loud, **params)
    assert float(jnp.abs(out).max()) < 10.0

    quiet = 1e-4 * jnp.ones((B, C, L))
    out_q = comp(quiet, **params)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(quiet), rtol=1e-4)


def test_envelope_followers():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (3, 2, 2**12))
    env_iir = IIREnvelopeFollower(iir_len=1024)(x, z_alpha=jnp.zeros((3, 1)))
    env_bal = BallisticsEnvelopeFollower()(x, z_alpha=jnp.zeros((3, 2)))
    assert env_iir.shape == (3, 2**12)
    assert env_bal.shape == (3, 2**12)
    assert jnp.isfinite(env_iir).all() and jnp.isfinite(env_bal).all()


def test_factorized_compressor():
    from grafx_tpu.processors import FactorizedCompressor

    _test_single_processor(
        FactorizedCompressor(frame_len=256), audio_len=2**12
    )


def test_factorized_compressor_compresses():
    """The frame-factorized compressor attenuates loud signals like its
    per-sample counterpart (envelopes operate at frame scale, so outputs
    are not bit-comparable)."""
    from grafx_tpu.processors import FactorizedCompressor

    comp = FactorizedCompressor(frame_len=128, knee="hard")
    B, C, L = 1, 2, 2**13
    loud = 10.0 * jnp.ones((B, C, L))
    params = dict(
        log_threshold=jnp.full((B, 1), -2.0),
        log_ratio=jnp.full((B, 1), 2.0),
        z_alpha_pre=jnp.full((B, 2), 4.0),  # slow smoothing
    )
    out = comp(loud, **params)
    assert float(jnp.abs(out[..., L // 2 :]).max()) < 10.0
    assert jnp.isfinite(out).all()


def test_compressor_iir_exact_smoother():
    """'iir_exact' energy smoothing: exact blocked one-pole instead of
    the truncated-FIR approximation; near-identical output (the FIR only
    truncates the tail)."""
    from grafx_tpu.processors import Compressor

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 2, 2**12))
    params = dict(
        log_threshold=jnp.full((2, 1), -1.0),
        log_ratio=jnp.full((2, 1), 1.0),
        log_knee=jnp.zeros((2, 1)),
        z_alpha_pre=jnp.zeros((2, 1)),
    )
    y_fir = Compressor(energy_smoother="iir", iir_len=16384)(x, **params)
    y_exact = Compressor(energy_smoother="iir_exact")(x, **params)
    r = float(jnp.abs(y_fir - y_exact).max() / jnp.abs(y_fir).max())
    assert r < 1e-4, r
    _test_single_processor(
        Compressor(energy_smoother="iir_exact"), audio_len=2**12
    )
