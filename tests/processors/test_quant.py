"""Qualitative rendering tier (opt-in via --quant).

Mirrors the reference's quant tests (reference:
tests/processors/conftest.py:19-35, utils.py:230-380): render audio
through each processor at several parameter scales and save waveforms +
mel-spectrogram difference grids to ``outputs/`` for human inspection.
Program material: when the reference checkout's sample WAVs are present
on this machine (/root/reference/tests/samples — the same seven clips
the reference's quant tier uses, read at test time only, never copied
into this repo), each processor is additionally rendered over real
drums/music/speech; otherwise, and always as the base case, a synthetic
program (chirp + noise bursts + tone stack) is used.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grafx_tpu.processors import (
    ChebyshevDistortion,
    Compressor,
    FeedbackDelayNetwork,
    GraphicEqualizer,
    MultitapDelay,
    NoiseGate,
    ParametricEqualizer,
    STFTMaskedNoiseReverb,
    TanhDistortion,
)
from utils import random_parameters

SR = 44100
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "outputs")
REF_SAMPLES = "/root/reference/tests/samples"


def _real_sample_names():
    if not os.path.isdir(REF_SAMPLES):
        return []
    return ["drums", "music", "speech"]


def load_real_sample(name, length=2**16):
    """Load one of the reference's sample WAVs (read-only fixture),
    peak-normalized, trimmed/looped to ``length``, as (2, length)."""
    from scipy.io import wavfile

    sr, x = wavfile.read(os.path.join(REF_SAMPLES, f"{name}.wav"))
    x = np.asarray(x, np.float32)
    if x.dtype.kind != "f" or np.abs(x).max() > 2.0:
        x = x / 32768.0
    if x.ndim == 1:
        x = np.stack([x, x], axis=1)
    x = x.T  # (C, T)
    if sr != SR:
        # anti-aliased polyphase resample (the tier exists for human
        # spectrogram inspection; linear interp would alias HF content)
        from math import gcd

        from scipy.signal import resample_poly

        g = gcd(SR, sr)
        x = resample_poly(x, SR // g, sr // g, axis=1).astype(np.float32)
    reps = -(-length // x.shape[1])
    x = np.tile(x, (1, reps))[:, :length]
    peak = np.abs(x).max() + 1e-9
    return (0.7 * x / peak).astype(np.float32)


def synthetic_program(length=2**16):
    """Chirp + noise bursts + tone stack: broad spectral/temporal content."""
    t = np.arange(length) / SR
    chirp = 0.4 * np.sin(2 * np.pi * (40 * t + 4000 * t**2 / t[-1]))
    rng = np.random.default_rng(0)
    burst = np.zeros(length)
    for start in range(0, length, SR // 3):
        burst[start : start + 2000] = rng.normal(0, 0.3, 2000)[
            : max(0, min(2000, length - start))
        ]
    tones = 0.2 * sum(np.sin(2 * np.pi * f * t) for f in (220, 880, 3520))
    x = (chirp + burst + tones).astype(np.float32)
    return np.stack([x, np.roll(x, 512)])  # pseudo-stereo


def save_wav(path, x):
    from scipy.io import wavfile

    x = np.asarray(x).T
    x = np.clip(x, -1, 1)
    wavfile.write(path, SR, (x * 32767).astype(np.int16))


def save_spec_diff(path, x_in, x_out):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from scipy import signal as ss

    fig, axes = plt.subplots(1, 3, figsize=(12, 3))
    for ax, (sig, title) in zip(
        axes,
        [(x_in[0], "in"), (x_out[0], "out"), (x_out[0] - x_in[0], "diff")],
    ):
        f, tt, S = ss.spectrogram(np.asarray(sig), SR, nperseg=512)
        ax.pcolormesh(tt, f, 10 * np.log10(S + 1e-12), shading="auto")
        ax.set_title(title)
        ax.set_yscale("symlog", linthresh=100)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)


PROCESSORS = {
    "parametric_eq": lambda: ParametricEqualizer(num_filters=6, backend="exact"),
    "graphic_eq": lambda: GraphicEqualizer(backend="exact"),
    "compressor": lambda: Compressor(energy_smoother="ballistics"),
    "noisegate": lambda: NoiseGate(),
    "reverb_stft": lambda: STFTMaskedNoiseReverb(ir_len=30000),
    "fdn": lambda: FeedbackDelayNetwork(ir_len=30000),
    "multitap": lambda: MultitapDelay(segment_len=1500, num_segments=8),
    "tanh": lambda: TanhDistortion(),
    "chebyshev": lambda: ChebyshevDistortion(max_order=8),
}


@pytest.mark.quant
@pytest.mark.parametrize(
    "material", ["synthetic"] + _real_sample_names()
)
@pytest.mark.parametrize("name", sorted(PROCESSORS))
@pytest.mark.parametrize("std", [0.0, 0.01, 1.0])
def test_quant_render(name, std, material):
    os.makedirs(OUT_DIR, exist_ok=True)
    proc = PROCESSORS[name]()
    if material == "synthetic":
        x = jnp.asarray(synthetic_program())[None]
    else:
        x = jnp.asarray(load_real_sample(material))[None]
    params = random_parameters(proc, 1, jax.random.PRNGKey(0), std=max(std, 1e-9))
    out = proc(x, **params)
    if isinstance(out, tuple):
        out = out[0]
    out = np.asarray(out[0])
    assert np.isfinite(out).all()
    tag = f"{name}_{material}_std{std}"
    save_wav(os.path.join(OUT_DIR, f"{tag}.wav"), out)
    save_spec_diff(
        os.path.join(OUT_DIR, f"{tag}.png"), np.asarray(x[0]), out
    )
