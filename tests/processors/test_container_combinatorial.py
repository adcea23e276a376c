"""Combinatorial container tests.

Mirrors the reference's random-chain sweep
(reference: tests/processors/test_container.py:15-63,139-166): random
2-3 processor chains wrapped in SerialChain / DryWet / ParallelMix /
GainStagingRegularization must render finite outputs with finite grads.
"""

import random

import pytest

from grafx_tpu.processors import (
    BandPassFilter,
    ChebyshevDistortion,
    Compressor,
    DryWet,
    GainStagingRegularization,
    GraphicEqualizer,
    HighShelf,
    LowPassFilter,
    NewZeroPhaseFIREqualizer,
    NoiseGate,
    ParallelMix,
    ParametricEqualizer,
    PeakingFilter,
    PiecewiseTanhDistortion,
    PowerDistortion,
    SerialChain,
    SideGainImager,
    StereoGain,
    TanhDistortion,
)
from utils import _test_single_processor

PROCESSOR_FACTORIES = [
    lambda: StereoGain(),
    lambda: SideGainImager(),
    lambda: LowPassFilter(backend="exact"),
    lambda: BandPassFilter(backend="fsm", fsm_fir_len=2000),
    lambda: PeakingFilter(num_filters=2, backend="exact"),
    lambda: HighShelf(backend="exact"),
    lambda: ParametricEqualizer(num_filters=4, backend="exact"),
    lambda: GraphicEqualizer(backend="fsm", fsm_fir_len=2000),
    lambda: NewZeroPhaseFIREqualizer(num_frequency_bins=64),
    lambda: Compressor(iir_len=1024),
    lambda: NoiseGate(iir_len=1024, knee="exponential"),
    lambda: TanhDistortion(),
    lambda: PiecewiseTanhDistortion(),
    lambda: PowerDistortion(max_order=4),
    lambda: ChebyshevDistortion(max_order=4),
]


def _random_chain(rng, length):
    picks = rng.sample(range(len(PROCESSOR_FACTORIES)), length)
    return {f"p{i}_{j}": PROCESSOR_FACTORIES[j]() for i, j in enumerate(picks)}


@pytest.mark.parametrize("seed", range(6))
def test_random_serial_chain(seed):
    rng = random.Random(seed)
    chain = SerialChain(_random_chain(rng, rng.choice([2, 3])))
    _test_single_processor(chain, batch_size=2, audio_len=2**11)


@pytest.mark.parametrize("seed", range(4))
def test_random_parallel_mix(seed):
    rng = random.Random(100 + seed)
    mix = ParallelMix(
        _random_chain(rng, 2),
        activation=rng.choice(["softmax", "softplus"]),
    )
    _test_single_processor(mix, batch_size=2, audio_len=2**11)


@pytest.mark.parametrize("seed", range(4))
def test_random_drywet_gainstaging(seed):
    rng = random.Random(200 + seed)
    inner = list(_random_chain(rng, 1).values())[0]
    proc = GainStagingRegularization(DryWet(inner, external_param=False))
    _test_single_processor(proc, batch_size=2, audio_len=2**11)
