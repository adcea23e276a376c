"""Qualitative rendering tier (opt-in via --quant).

Mirrors the reference's quant tests (reference:
tests/processors/conftest.py:19-35, utils.py:230-380): render audio
through EVERY processor class at several parameter scales and save
waveforms + L/R/M/S mel-spectrogram-difference grids to ``outputs/``
for human inspection.  Program material: the reference checkout's seven
sample WAVs (/root/reference/tests/samples — read at test time only,
never copied into this repo) when that mount exists, otherwise
deterministic synthesized stand-ins with the same clip names
(``synth_clips.py`` — the tier is self-contained either way), plus a
synthetic program (chirp + noise bursts + tone stack) as the
always-available base case.

A final collection test asserts the produced file list covers every
(processor x clip x sigma) combination, so gaps in the tier are loud.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import grafx_tpu.processors as GP
from grafx_tpu.processors import (
    DryWet,
    GainStagingRegularization,
    MidSideToStereo,
    ParallelMix,
    ParametricEqualizer,
    SerialChain,
    StereoGain,
    StereoToMidSide,
)
from utils import random_parameters

SR = 44100
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "outputs")
REF_SAMPLES = os.environ.get(
    "GRAFX_TPU_QUANT_SAMPLES", "/root/reference/tests/samples"
)  # point elsewhere (or nowhere) to exercise the synthesized fallback
CLIPS = ["drums", "bass", "guitar", "guitar2", "singing", "speech", "music"]


def _have_real_sample(name):
    return os.path.isfile(os.path.join(REF_SAMPLES, f"{name}.wav"))


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


_MEL_CACHE = {}


def _mel_spec(x, n_fft=1024, hop=256, n_mels=80):
    """Log-mel spectrogram via scipy STFT + this library's own
    triangular mel filterbank (dogfooding processors/core)."""
    from grafx_tpu.processors.core.fft_filterbank import TriangularFilterBank

    key = (n_fft, n_mels)
    if key not in _MEL_CACHE:
        fb = TriangularFilterBank(
            num_frequency_bins=n_fft // 2 + 1,
            num_filters=n_mels,
            scale="mel_slaney",
            sr=SR,
        )
        _MEL_CACHE[key] = np.asarray(fb.filterbank).T  # (F, F_fb)
    fbank = _MEL_CACHE[key]
    from scipy import signal as ss

    _, _, Z = ss.stft(
        np.asarray(x), SR, nperseg=n_fft, noverlap=n_fft - hop, padded=True
    )
    power = np.abs(Z) ** 2  # (F, T)
    mel = power.T @ fbank  # (T, n_mels)
    return 10 * np.log10(mel.T + 1e-10)  # (n_mels, T)


def save_mel_diff_grid(path, x_in, x_out):
    """L/R/M/S mel grid matching the reference's quant artifacts
    (reference: tests/processors/utils.py:230-380): rows = processed
    output and output-minus-input difference, columns = the four
    channel views."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x_in = np.asarray(x_in)
    x_out = np.asarray(x_out)
    views = {
        "L": (x_in[0], x_out[0]),
        "R": (x_in[-1], x_out[-1]),
        "M": ((x_in[0] + x_in[-1]) / 2, (x_out[0] + x_out[-1]) / 2),
        "S": ((x_in[0] - x_in[-1]) / 2, (x_out[0] - x_out[-1]) / 2),
    }
    fig, axes = plt.subplots(2, 4, figsize=(16, 5), sharex=True, sharey=True)
    for col, (name, (xi, xo)) in enumerate(views.items()):
        mo = _mel_spec(xo)
        mi = _mel_spec(xi)
        axes[0, col].imshow(mo, origin="lower", aspect="auto", cmap="magma")
        axes[0, col].set_title(f"{name} out")
        d = axes[1, col].imshow(
            mo - mi,
            origin="lower",
            aspect="auto",
            cmap="coolwarm",
            vmin=-30,
            vmax=30,
        )
        axes[1, col].set_title(f"{name} diff (dB)")
    fig.colorbar(d, ax=axes[1, :].tolist(), shrink=0.8)
    fig.savefig(path, dpi=80)
    plt.close(fig)


# ---------------------------------------------------------------------------
# Every exported processor class, with render-ready constructor args.
# MIMO pairs are wrapped so each renders stereo-in/stereo-out.
# ---------------------------------------------------------------------------


class _MSRoundtrip:
    """StereoToMidSide -> MidSideToStereo, exercising both MIMO tools."""

    def __init__(self):
        self.fwd = StereoToMidSide()
        self.bwd = MidSideToStereo()

    def __call__(self, x):
        return self.bwd(*self.fwd(x))

    def parameter_size(self):
        return {}


PROCESSORS = {
    # equalizers
    "zerophase_eq": lambda: GP.ZeroPhaseFIREqualizer(),
    "new_zerophase_eq": lambda: GP.NewZeroPhaseFIREqualizer(
        processor_channel="stereo"
    ),
    "parametric_eq": lambda: ParametricEqualizer(num_filters=6, backend="exact"),
    "graphic_eq": lambda: GP.GraphicEqualizer(backend="exact"),
    # filters
    "fir_filter": lambda: GP.FIRFilter(processor_channel="stereo"),
    "biquad": lambda: GP.BiquadFilter(num_filters=4, backend="exact"),
    "pole_zero": lambda: GP.PoleZeroFilter(num_filters=4, backend="exact"),
    "svf": lambda: GP.StateVariableFilter(num_filters=4, backend="exact"),
    "lowpass": lambda: GP.LowPassFilter(backend="exact"),
    "highpass": lambda: GP.HighPassFilter(backend="exact"),
    "bandpass": lambda: GP.BandPassFilter(backend="exact"),
    "bandreject": lambda: GP.BandRejectFilter(backend="exact"),
    "allpass": lambda: GP.AllPassFilter(backend="exact"),
    "peaking": lambda: GP.PeakingFilter(backend="exact"),
    "lowshelf": lambda: GP.LowShelf(backend="exact"),
    "highshelf": lambda: GP.HighShelf(backend="exact"),
    # dynamics
    "compressor": lambda: GP.Compressor(energy_smoother="ballistics"),
    "noisegate": lambda: GP.NoiseGate(),
    "factorized_compressor": lambda: GP.FactorizedCompressor(),
    "approx_compressor": lambda: GP.ApproxCompressor(),
    "approx_noisegate": lambda: GP.ApproxNoiseGate(),
    # reverbs and delay
    "reverb_stft": lambda: GP.STFTMaskedNoiseReverb(ir_len=30000),
    "reverb_fns": lambda: GP.FilteredNoiseShapingReverb(
        ir_len=30000, processor_channel="stereo"
    ),
    "fdn": lambda: GP.FeedbackDelayNetwork(ir_len=30000),
    "multitap": lambda: GP.MultitapDelay(segment_len=1500, num_segments=8),
    # nonlinear
    "tanh": lambda: GP.TanhDistortion(),
    "piecewise_tanh": lambda: GP.PiecewiseTanhDistortion(),
    "power_dist": lambda: GP.PowerDistortion(max_order=6),
    "chebyshev": lambda: GP.ChebyshevDistortion(max_order=8),
    # stereo tools
    "stereo_gain": lambda: StereoGain(),
    "side_gain_imager": lambda: GP.SideGainImager(),
    "mono_to_stereo": lambda: GP.MonoToStereo(),
    "ms_roundtrip": _MSRoundtrip,
    # containers
    "drywet_eq": lambda: DryWet(
        ParametricEqualizer(num_filters=4, backend="exact"), external_param=False
    ),
    "serial_chain": lambda: SerialChain(
        {"gain": StereoGain(), "eq": ParametricEqualizer(4, backend="exact")}
    ),
    "parallel_mix": lambda: ParallelMix(
        {"gain": StereoGain(), "eq": ParametricEqualizer(4, backend="exact")}
    ),
    "gain_staging": lambda: GainStagingRegularization(StereoGain()),
}

STDS = [0.0, 0.01, 1.0]
MATERIALS = ["synthetic"] + CLIPS


def load_material(name, length=2**16):
    """Real reference WAV when the read-only mount is present, else the
    deterministic synthesized stand-in of the same name."""
    if _have_real_sample(name):
        return load_real_sample(name, length)
    from synth_clips import synth_clip

    return synth_clip(name, length)


def _render(name, x):
    proc = PROCESSORS[name]()
    if name == "mono_to_stereo":
        x = x[:, :1]
    params = random_parameters(
        proc, 1, jax.random.PRNGKey(0), std=max(_render.std, 1e-9)
    )
    out = proc(x, **params)
    if isinstance(out, tuple):
        out = out[0]
    if isinstance(out, list):  # MIMO multi-output
        out = jnp.concatenate(out, axis=-2)
    return np.asarray(out[0])


@pytest.mark.quant
@pytest.mark.parametrize("material", MATERIALS)
@pytest.mark.parametrize("name", sorted(PROCESSORS))
@pytest.mark.parametrize("std", STDS)
def test_quant_render(name, std, material):
    os.makedirs(OUT_DIR, exist_ok=True)
    if material == "synthetic":
        x = jnp.asarray(synthetic_program())[None]
    else:
        x = jnp.asarray(load_material(material))[None]
    _render.std = std
    out = _render(name, x)
    assert np.isfinite(out).all()
    tag = f"{name}_{material}_std{std}"
    save_wav(os.path.join(OUT_DIR, f"{tag}.wav"), out)
    save_mel_diff_grid(
        os.path.join(OUT_DIR, f"{tag}.png"), np.asarray(x[0]), out
    )


@pytest.mark.quant
def test_quant_file_list_complete():
    """Runs last (alphabetical collection within the module is overridden
    by definition order): every (processor x material x std) must have
    produced both artifacts."""
    missing = []
    for name in PROCESSORS:
        for material in MATERIALS:
            for std in STDS:
                tag = f"{name}_{material}_std{std}"
                for ext in (".wav", ".png"):
                    if not os.path.isfile(os.path.join(OUT_DIR, tag + ext)):
                        missing.append(tag + ext)
    assert not missing, f"{len(missing)} quant artifacts missing: {missing[:10]}"
