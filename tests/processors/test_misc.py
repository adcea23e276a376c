"""Stereo, nonlinear, and container tests
(reference: tests/processors/test_stereo.py, test_nonlinear.py,
test_container.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grafx_tpu.processors import (
    ChebyshevDistortion,
    Compressor,
    DryWet,
    GainStagingRegularization,
    MidSideToStereo,
    MonoToStereo,
    ParallelMix,
    PiecewiseTanhDistortion,
    PowerDistortion,
    SerialChain,
    SideGainImager,
    StereoGain,
    StereoToMidSide,
    TanhDistortion,
)
from utils import _test_single_processor, random_parameters


def test_stereo_gain():
    _test_single_processor(StereoGain(), audio_len=2**10)


def test_side_gain_imager():
    _test_single_processor(SideGainImager(), audio_len=2**10)


def test_mono_to_stereo():
    x = jnp.ones((2, 1, 64))
    out = MonoToStereo()(x)
    assert out.shape == (2, 2, 64)


def test_midside_roundtrip():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 2, 64))
    mid, side = StereoToMidSide()(x)
    back = MidSideToStereo()(mid, side)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-6)


@pytest.mark.parametrize("use_bias", [False, True])
@pytest.mark.parametrize("inverse_post_gain", [False, True])
def test_tanh_distortion(use_bias, inverse_post_gain):
    _test_single_processor(
        TanhDistortion(use_bias=use_bias, inverse_post_gain=inverse_post_gain),
        audio_len=2**10,
    )


def test_piecewise_tanh():
    _test_single_processor(PiecewiseTanhDistortion(), audio_len=2**10)


@pytest.mark.parametrize("use_tanh", [False, True])
def test_power_distortion(use_tanh):
    _test_single_processor(
        PowerDistortion(max_order=6, use_tanh=use_tanh), audio_len=2**10
    )


@pytest.mark.parametrize("use_tanh", [False, True])
def test_chebyshev_distortion(use_tanh):
    _test_single_processor(
        ChebyshevDistortion(max_order=6, use_tanh=use_tanh), audio_len=2**10
    )


def test_drywet():
    proc = DryWet(TanhDistortion(), external_param=False)
    _test_single_processor(proc, audio_len=2**10)


def test_drywet_all_dry():
    proc = DryWet(TanhDistortion(), external_param=False)
    key = jax.random.PRNGKey(0)
    x = 3.0 * jax.random.normal(key, (2, 2, 256))
    params = random_parameters(proc.processor, 2, key)
    # very negative weight -> sigmoid ~ 0 -> output == input
    out = proc(x, drywet_weight=jnp.full((2, 1), -20.0), **params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_serial_chain():
    chain = SerialChain(
        {"dist": TanhDistortion(), "comp": Compressor(iir_len=512)}
    )
    _test_single_processor(chain, audio_len=2**10)


def test_parallel_mix():
    mix = ParallelMix(
        {"a": TanhDistortion(), "b": PowerDistortion(max_order=4)},
        activation="softmax",
    )
    _test_single_processor(mix, audio_len=2**10)


def test_gain_staging_regularization():
    proc = GainStagingRegularization(TanhDistortion())
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 2, 256))
    params = random_parameters(proc.processor, 2, key)
    out, intermediates = proc(x, **params)
    assert "gain_reg" in intermediates
    assert jnp.isfinite(intermediates["gain_reg"])


def test_nested_container_parameter_sizes():
    chain = SerialChain(
        {
            "drywet": DryWet(TanhDistortion(), external_param=False),
            "comp": Compressor(iir_len=512),
        }
    )
    sizes = chain.parameter_size()
    assert "drywet" in sizes and "comp" in sizes
    assert "drywet_weight" in sizes["drywet"]
