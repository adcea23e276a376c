"""Independent-oracle parity tests (VERDICT round-1 item 10).

The cross-framework tests in tests/test_parity_torch.py compare against
torch re-implementations written by the same author.  The oracles here
share no authorship with the library code paths they check:

* compressor/noise-gate static curves — hand-computed textbook values
  (Giannoulis, Massberg & Reiss, "Digital Dynamic Range Compressor
  Design", JAES 2012) evaluated with the ``math`` module;
* graphic EQ — the *defining property* of the Liski et al. design
  (composite response hits the commanded band gains at the band center
  frequencies), measured with ``scipy.signal.freqz`` on the rendered
  impulse response;
* STFT masked-noise reverb — a numpy-authored mask + overlap-add iSTFT
  reconstruction of the impulse response.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal

from grafx_tpu.processors import (
    Compressor,
    GraphicEqualizer,
    NoiseGate,
    STFTMaskedNoiseReverb,
)


# ---------------------------------------------------------------------------
# Dynamics: static (steady-state) gain curves vs textbook closed forms
# ---------------------------------------------------------------------------


def _compressor_out_level(x_db, T_db, R, W_db):
    """Giannoulis et al. (2012) eq. (4), soft (quadratic) knee, in the
    log-energy domain used by the library (natural log of energy)."""
    if W_db > 0 and 2 * (x_db - T_db) < -W_db:
        return x_db
    if W_db > 0 and 2 * abs(x_db - T_db) <= W_db:
        return x_db + (1 / R - 1) * (x_db - T_db + W_db / 2) ** 2 / (2 * W_db)
    return T_db + (x_db - T_db) / R


@pytest.mark.parametrize("knee", ["hard", "quadratic"])
def test_compressor_static_curve_textbook(knee):
    """Steady-state compressor gain matches hand-computed values.

    With no energy smoother the gain is a pure static function of the
    input level; feed constant signals at several amplitudes and check
    the output amplitude against the textbook curve computed with plain
    ``math`` (library spec: reference dynamics.py:443-475)."""
    comp = Compressor(energy_smoother=None, knee=knee)
    L = 512
    log_threshold, log_ratio, log_knee = -2.0, 1.0, 1.0
    R = 1.0 + math.exp(log_ratio)
    T = log_threshold - 6.0  # library offsets the threshold by -6
    W = 2.0 * (math.exp(log_knee) / 2.0)  # knee width (log-energy)

    for amp in [0.001, 0.02, 0.1, 0.5, 2.0]:
        x = jnp.full((1, 2, L), amp)
        params = {
            "log_threshold": jnp.array([[log_threshold]]),
            "log_ratio": jnp.array([[log_ratio]]),
        }
        if knee != "hard":
            params["log_knee"] = jnp.array([[log_knee]])
        y = np.asarray(comp(x, **params))

        le = math.log(amp * amp + 1e-5)
        if knee == "hard":
            out_le = min(le, T + (le - T) / R)
        else:
            out_le = _compressor_out_level(le, T, R, W)
        expected = math.exp(out_le - le) * amp
        np.testing.assert_allclose(y[0, 0, L // 2], expected, rtol=1e-5)


@pytest.mark.parametrize("knee", ["hard", "quadratic"])
def test_noisegate_static_curve_textbook(knee):
    """Noise gate = downward expander below threshold: out level
    ``T + R (x - T)`` below the knee, identity above (Giannoulis et al.
    2012, expander form)."""
    gate = NoiseGate(energy_smoother=None, knee=knee)
    L = 512
    log_threshold, log_ratio, log_knee = 1.0, 0.5, 1.0
    R = 1.0 + math.exp(log_ratio)
    T = log_threshold - 6.0
    half_W = math.exp(log_knee) / 2.0

    for amp in [0.001, 0.02, 0.1, 0.5, 2.0]:
        x = jnp.full((1, 2, L), amp)
        params = {
            "log_threshold": jnp.array([[log_threshold]]),
            "log_ratio": jnp.array([[log_ratio]]),
        }
        if knee != "hard":
            params["log_knee"] = jnp.array([[log_knee]])
        y = np.asarray(gate(x, **params))

        le = math.log(amp * amp + 1e-5)
        if knee == "hard":
            out_le = min(le, R * (le - T) + T)
        elif le < T - half_W:
            out_le = R * (le - T) + T
        elif le > T + half_W:
            out_le = le
        else:
            out_le = le + (1 - R) * (le - T - half_W) ** 2 / (4 * half_W)
        expected = math.exp(out_le - le) * amp
        np.testing.assert_allclose(y[0, 0, L // 2], expected, rtol=1e-5)


# ---------------------------------------------------------------------------
# Graphic EQ: the design's defining property, measured with scipy.freqz
# ---------------------------------------------------------------------------


def _liski_one_pass_sos(gains_db, fc, fB, sr, c=0.4):
    """Independent numpy authorship of the one-pass Liski et al. design
    the reference implements (peaking biquads with the neighbor-gain
    bandwidth correction, reference core/geq.py:139-209)."""
    G = 10.0 ** (gains_db / 20.0)
    GB = G**c
    wc = 2 * np.pi * fc / sr
    beta = np.tan(np.pi * fB / sr)
    active = np.abs(np.log(np.maximum(G, 1e-12))) >= 1e-3
    corr = np.sqrt((np.abs(1 - GB**2) + 1e-7) / (np.abs(G**2 - GB**2) + 1e-7))
    beta = np.where(active, beta * corr, beta)
    sos = np.stack(
        [
            1 + G * beta,
            -2 * np.cos(wc),
            1 - G * beta,
            1 + beta,
            -2 * np.cos(wc),
            1 - beta,
        ],
        axis=-1,
    )
    return sos / sos[:, 3:4]


@pytest.mark.parametrize("scale", ["bark", "third_octave"])
def test_graphic_equalizer_single_band_center_gain(scale):
    """With one band commanded and the rest at 0 dB, the rendered
    composite response at that band's center equals the command exactly
    (a peaking biquad's defining property; other bands are identity)."""
    from grafx_tpu.processors.core.geq import FC_BARK, FC_THIRD_OCTAVE

    sr = 44100
    fc = FC_BARK if scale == "bark" else FC_THIRD_OCTAVE
    fc = fc[fc < sr / 2]
    K = len(fc)

    geq = GraphicEqualizer(scale=scale, sr=sr, backend="exact")
    for band, cmd_db in [(0, 6.0), (K // 2, -9.0), (K - 1, 4.0)]:
        command_db = np.zeros(K)
        command_db[band] = cmd_db
        log_gains = jnp.array(command_db / 20.0 * math.log(10.0))[
            None, None, :
        ]
        L = 2**15
        impulse = jnp.zeros((1, 1, L)).at[..., 0].set(1.0)
        ir = np.asarray(geq(impulse, log_gains))[0, 0]
        w = np.array([2 * np.pi * fc[band] / sr])
        _, h = scipy.signal.freqz(ir.astype(np.float64), worN=w)
        measured_db = 20 * np.log10(np.abs(h))[0]
        assert abs(measured_db - cmd_db) < 0.1, (
            f"band {band}: {measured_db:.2f} vs {cmd_db} dB"
        )


@pytest.mark.parametrize("scale", ["bark", "third_octave"])
def test_graphic_equalizer_matches_numpy_design(scale):
    """The full multi-band rendered response matches an independently
    written numpy implementation of the same one-pass design applied
    with scipy.sosfilt: catches table, beta-formula and biquad
    application bugs without assuming design accuracy the one-pass
    method does not have."""
    from grafx_tpu.processors.core.geq import (
        FB_BARK,
        FB_THIRD_OCTAVE,
        FC_BARK,
        FC_THIRD_OCTAVE,
    )

    sr = 44100
    if scale == "bark":
        fc, fB = FC_BARK, FB_BARK
    else:
        fc, fB = FC_THIRD_OCTAVE, FB_THIRD_OCTAVE
    keep = fc < sr / 2
    fc, fB = fc[keep], fB[: keep.sum()]
    K = len(fc)

    rng = np.random.RandomState(11)
    command_db = rng.uniform(-8, 8, K)
    geq = GraphicEqualizer(scale=scale, sr=sr, backend="exact")
    log_gains = jnp.array(command_db / 20.0 * math.log(10.0))[None, None, :]

    L = 2**14
    rng2 = np.random.RandomState(12)
    x = rng2.randn(1, 1, L).astype(np.float32)
    y = np.asarray(geq(jnp.array(x), log_gains))[0, 0]

    sos = _liski_one_pass_sos(command_db, fc, fB, sr)
    expected = scipy.signal.sosfilt(sos, x[0, 0].astype(np.float64))
    rel = np.abs(y - expected).max() / np.abs(expected).max()
    assert rel < 1e-3, f"{20 * np.log10(rel):.1f} dB (scale={scale})"


# ---------------------------------------------------------------------------
# STFT masked-noise reverb: numpy-authored mask + overlap-add iSTFT oracle
# ---------------------------------------------------------------------------


def _numpy_istft_oracle(spec, n_fft, hop, length):
    """Overlap-add inverse STFT (torch conventions: center=True, hann,
    window-squared normalization), written independently in numpy."""
    win = 0.5 * (1 - np.cos(2 * np.pi * np.arange(n_fft) / n_fft))
    frames = np.fft.irfft(np.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    num_frames = frames.shape[-2]
    total = n_fft + hop * (num_frames - 1)
    out = np.zeros(frames.shape[:-2] + (total,))
    norm = np.zeros(total)
    for t in range(num_frames):
        out[..., t * hop : t * hop + n_fft] += frames[..., t, :] * win
        norm[t * hop : t * hop + n_fft] += win**2
    out = out / np.maximum(norm, 1e-11)
    return out[..., n_fft // 2 : n_fft // 2 + length]


def test_stft_reverb_ir_numpy_oracle():
    """compute_ir matches a numpy-authored reconstruction: the same
    fixed noise spectrogram, mask ``exp((H0 - softplus(Hd) n)/8)``, and
    an independently written overlap-add iSTFT (reference spec:
    reverb.py:189-213)."""
    ir_len = 6000
    rev = STFTMaskedNoiseReverb(ir_len=ir_len, processor_channel="stereo")
    rng = np.random.RandomState(3)
    init = rng.randn(1, 2, rev.num_bins).astype(np.float32) * 0.5
    delta = rng.randn(1, 2, rev.num_bins).astype(np.float32) * 0.5

    ir = np.asarray(rev.compute_ir(jnp.array(init), jnp.array(delta)))

    # numpy oracle
    n = np.arange(rev.num_frames)
    softplus = np.log1p(np.exp(delta.astype(np.float64)))
    mask = np.exp(
        (init[..., None].astype(np.float64) - softplus[..., None] * n) / 8.0
    )  # (1, 2, F, T)
    spec = np.asarray(rev.noise_stft).astype(np.complex128) * mask
    expected = _numpy_istft_oracle(spec, rev.n_fft, rev.hop_length, ir_len)

    rel = np.abs(ir - expected).max() / np.abs(expected).max()
    assert rel < 1e-3, f"{20 * np.log10(rel):.1f} dB"


def test_multitap_delay_integer_shift_oracle():
    """Independent behavioral oracle for the delay path: with hard
    (straight-through) delays, one tap per segment, no coloring FIR,
    a delay encoding an exact grid angle must shift the signal by
    exactly that integer (numpy.roll is the oracle; reference:
    core/delay.py:131-142 straight-through onehot forward)."""
    from grafx_tpu.processors import MultitapDelay

    seg_len = 512
    delay = MultitapDelay(
        segment_len=seg_len,
        num_segments=1,
        num_delay_per_segment=1,
        processor_channel="stereo",
        zp_filter_per_tap=False,
    )
    # the surrogate FIR length is 2 * (seg_len // 2 + 1 - 1) = seg_len
    L = 4096
    rng = np.random.RandomState(0)
    x = rng.randn(1, 2, L).astype(np.float32)

    for m in (0, 5, 63, 200, 511):
        theta = 2.0 * np.pi * m / seg_len
        # radius large so tanh(|z|) ~ 1 => sharp peak exactly at tap m
        z = 5.0 * np.exp(-1j * theta)
        delay_z = np.zeros((1, 2, 2), np.float32)
        delay_z[:, :, 0] = z.real
        delay_z[:, :, 1] = z.imag
        out, aux = delay(jnp.asarray(x), jnp.asarray(delay_z))
        out = np.asarray(out)

        expected = np.zeros_like(x)
        expected[..., m:] = x[..., : L - m]  # causal integer shift
        np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)
    assert np.isfinite(float(aux["radii_reg"]))


def test_chebyshev_distortion_numpy_polynomial_oracle():
    """ChebyshevDistortion against numpy.polynomial.chebyshev (library
    code, not written here): the weighted basis sum must agree for
    in-range inputs (reference: nonlinear.py:315-413)."""
    from numpy.polynomial import chebyshev as C

    from grafx_tpu.processors import ChebyshevDistortion

    K = 6
    dist = ChebyshevDistortion(max_order=K, pre_gain=False)
    rng = np.random.RandomState(1)
    x = (0.9 * np.tanh(rng.randn(2, 2, 1000))).astype(np.float32)
    w = rng.randn(2, K).astype(np.float32) * 0.3

    out = np.asarray(dist(jnp.asarray(x), basis_weights=jnp.asarray(w)))

    for b in range(2):
        # weight k multiplies T_k(x) starting at T_0; weights pass
        # through a tanh activation before the basis sum
        coef = np.tanh(w[b].astype(np.float64))
        expected = C.chebval(x[b].astype(np.float64), coef)
        np.testing.assert_allclose(out[b], expected, rtol=1e-3, atol=1e-4)
