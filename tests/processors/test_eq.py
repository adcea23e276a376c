"""EQ processor tests (reference: tests/processors/test_eq.py)."""

import pytest

from grafx_tpu.processors import (
    GraphicEqualizer,
    NewZeroPhaseFIREqualizer,
    ParametricEqualizer,
    ZeroPhaseFIREqualizer,
)
from utils import _test_single_processor


def test_zerophase_fir_equalizer():
    _test_single_processor(ZeroPhaseFIREqualizer(num_magnitude_bins=128))


@pytest.mark.parametrize("channel", ["mono", "stereo", "midside"])
@pytest.mark.parametrize("use_filterbank", [False, True])
def test_new_zerophase_fir_equalizer(channel, use_filterbank):
    fb_kwargs = {"num_filters": 40, "sr": 44100, "f_max": 22050}
    _test_single_processor(
        NewZeroPhaseFIREqualizer(
            num_frequency_bins=128,
            processor_channel=channel,
            use_filterbank=use_filterbank,
            filterbank_kwargs=fb_kwargs if use_filterbank else None,
        ),
        audio_len=2**12,
    )


@pytest.mark.parametrize("channel", ["mono", "stereo", "midside"])
@pytest.mark.parametrize("backend", ["fsm", "exact"])
def test_parametric_equalizer(channel, backend):
    _test_single_processor(
        ParametricEqualizer(num_filters=6, processor_channel=channel, backend=backend),
        audio_len=2**12,
    )


def test_parametric_equalizer_no_shelving():
    _test_single_processor(
        ParametricEqualizer(num_filters=4, use_shelving_filters=False),
        audio_len=2**12,
    )


@pytest.mark.parametrize("scale", ["bark", "third_octave"])
@pytest.mark.parametrize("backend", ["fsm", "exact"])
def test_graphic_equalizer(scale, backend):
    _test_single_processor(
        GraphicEqualizer(scale=scale, backend=backend), audio_len=2**12
    )
