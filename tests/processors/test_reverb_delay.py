"""Reverb and delay tests
(reference: tests/processors/test_reverb.py, test_delay.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grafx_tpu.processors import (
    FilteredNoiseShapingReverb,
    MultitapDelay,
    STFTMaskedNoiseReverb,
)
from utils import _test_single_processor


@pytest.mark.parametrize(
    "channel", ["mono", "stereo", "midside", "pseudo_midside"]
)
def test_stft_masked_noise_reverb(channel):
    _test_single_processor(
        STFTMaskedNoiseReverb(ir_len=4000, processor_channel=channel),
        audio_len=2**12,
    )


def test_stft_masked_noise_reverb_gain_envelope():
    _test_single_processor(
        STFTMaskedNoiseReverb(ir_len=4000, gain_envelope=True), audio_len=2**12
    )


@pytest.mark.parametrize("channel", ["mono", "stereo", "midside"])
def test_filtered_noise_shaping_reverb(channel):
    _test_single_processor(
        FilteredNoiseShapingReverb(
            ir_len=4000,
            num_bands=6,
            processor_channel=channel,
            noise_randomness="fixed",
        ),
        audio_len=2**12,
    )


def test_filtered_noise_reverb_fade_in():
    _test_single_processor(
        FilteredNoiseShapingReverb(
            ir_len=4000, num_bands=4, use_fade_in=True, noise_randomness="fixed"
        ),
        audio_len=2**12,
    )


@pytest.mark.parametrize("channel", ["mono", "stereo", "midside"])
def test_multitap_delay(channel):
    out = _test_single_processor(
        MultitapDelay(
            segment_len=300, num_segments=4, processor_channel=channel
        ),
        audio_len=2**12,
    )


def test_multitap_delay_reports_radii_loss():
    delay = MultitapDelay(segment_len=300, num_segments=2)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 2, 2**11))
    num_delay = 2 * 2 * 1
    out, aux = delay(
        x,
        delay_z=0.01 * jax.random.normal(key, (2, num_delay, 2)),
        log_fir_magnitude=0.01 * jax.random.normal(key, (2, num_delay, 20)),
    )
    assert "radii_reg" in aux
    assert jnp.isfinite(aux["radii_reg"])


@pytest.mark.parametrize("channel", ["mono", "stereo", "midside"])
def test_feedback_delay_network(channel):
    from grafx_tpu.processors import FeedbackDelayNetwork

    _test_single_processor(
        FeedbackDelayNetwork(
            ir_len=4000, num_delays=4, processor_channel=channel
        ),
        audio_len=2**12,
    )


def test_fdn_ir_decays_with_absorption():
    from grafx_tpu.processors import FeedbackDelayNetwork

    fdn = FeedbackDelayNetwork(ir_len=8000, num_delays=4)
    key = jax.random.PRNGKey(0)
    gains_in = jnp.ones((1, 4))
    gains_out = jnp.ones((1, 2, 4))
    # strong absorption -> fast decay; weak -> slow
    ir_fast = fdn.compute_ir(jnp.full((1, 4), -2.0), gains_in, gains_out)
    ir_slow = fdn.compute_ir(jnp.full((1, 4), 4.0), gains_in, gains_out)
    tail_fast = float(jnp.square(ir_fast[..., -2000:]).sum())
    tail_slow = float(jnp.square(ir_slow[..., -2000:]).sum())
    assert tail_fast < tail_slow


def test_surrogate_delay_hard_forward():
    """STE: forward IRs are hard one-hot delays."""
    from grafx_tpu.processors.core.delay import SurrogateDelay

    sd = SurrogateDelay(N=64, straight_through=True)
    key = jax.random.PRNGKey(1)
    z = jax.random.normal(key, (8,)) + 1j * jax.random.normal(key, (8,))
    irs, loss = sd(z)
    sums = np.asarray(jnp.sum(irs, -1))
    maxs = np.asarray(jnp.max(irs, -1))
    np.testing.assert_allclose(sums, 1.0, atol=1e-6)
    np.testing.assert_allclose(maxs, 1.0, atol=1e-6)
