"""Cross-framework parity: grafx-tpu vs independent torch implementations.

The BASELINE north star asks for processor outputs compatible within
-60 dB of the reference.  The reference itself cannot run here, so we
compare against the independent torch implementations in
``benchmarks/torch_proxy.py`` (same published math, different framework
and FFT stack): identical inputs and parameters must agree to well below
-60 dB relative error.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

torch = pytest.importorskip("torch")


def db(err, ref):
    return 20 * np.log10(np.linalg.norm(err) / (np.linalg.norm(ref) + 1e-20))


def test_parametric_eq_fsm_parity():
    from benchmarks.torch_proxy import fft_conv_causal, fsm_fir, peq_coeffs
    from grafx_tpu.processors import ParametricEqualizer

    rng = np.random.default_rng(0)
    N, C, L, K = 3, 2, 2**13, 6
    x = rng.normal(size=(N, C, L)).astype(np.float32)
    w0 = rng.normal(size=(N, 1, K)).astype(np.float32)
    q_inv = rng.normal(size=(N, 1, K)).astype(np.float32)
    log_gain = rng.normal(size=(N, 1, K)).astype(np.float32)

    eq = ParametricEqualizer(num_filters=K, backend="fsm", fsm_fir_len=4000)
    y_jax = np.asarray(
        eq(jnp.asarray(x), jnp.asarray(w0), jnp.asarray(q_inv), jnp.asarray(log_gain))
    )

    tb, ta = peq_coeffs(
        torch.tensor(w0), torch.tensor(q_inv), torch.tensor(log_gain)
    )
    fir = fsm_fir(tb, ta)
    y_torch = fft_conv_causal(torch.tensor(x), fir).numpy()

    assert db(y_jax - y_torch, y_torch) < -80, db(y_jax - y_torch, y_torch)


def test_graphic_eq_fsm_parity():
    from benchmarks.torch_proxy import fft_conv_causal, fsm_fir, geq_coeffs
    from grafx_tpu.processors import GraphicEqualizer
    from grafx_tpu.processors.core.geq import FB_BARK, FC_BARK

    rng = np.random.default_rng(1)
    N, C, L = 2, 2, 2**13
    x = rng.normal(size=(N, C, L)).astype(np.float32)
    log_gains = (0.3 * rng.normal(size=(N, 1, 24))).astype(np.float32)

    geq = GraphicEqualizer(scale="bark", backend="fsm", fsm_fir_len=4000)
    y_jax = np.asarray(geq(jnp.asarray(x), jnp.asarray(log_gains)))

    tb, ta = geq_coeffs(
        torch.tensor(log_gains),
        torch.tensor(FC_BARK, dtype=torch.float32),
        torch.tensor(FB_BARK, dtype=torch.float32),
    )
    fir = fsm_fir(tb, ta)
    y_torch = fft_conv_causal(torch.tensor(x), fir).numpy()

    assert db(y_jax - y_torch, y_torch) < -80, db(y_jax - y_torch, y_torch)


def test_compressor_iir_parity():
    from benchmarks.torch_proxy import TorchProxy
    from grafx_tpu.processors import Compressor

    rng = np.random.default_rng(2)
    N, C, L = 2, 2, 2**13
    x = rng.normal(size=(N, C, L)).astype(np.float32)
    p = {
        "log_threshold": rng.normal(size=(N, 1)).astype(np.float32),
        "log_ratio": rng.normal(size=(N, 1)).astype(np.float32),
        "log_knee": rng.normal(size=(N, 1)).astype(np.float32),
        "z_alpha_pre": rng.normal(size=(N, 1)).astype(np.float32),
    }
    comp = Compressor(energy_smoother="iir", iir_len=16384)
    y_jax = np.asarray(comp(jnp.asarray(x), **{k: jnp.asarray(v) for k, v in p.items()}))

    proxy = TorchProxy.__new__(TorchProxy)  # skip graph setup
    proxy.one_pole_n = torch.arange(16384, dtype=torch.float32)
    y_torch = proxy._dyn(
        torch.tensor(x), {k: torch.tensor(v) for k, v in p.items()}, gate=False
    ).numpy()

    assert db(y_jax - y_torch, y_torch) < -60, db(y_jax - y_torch, y_torch)


def test_reverb_parity():
    """STFT masked-noise reverb: identical seed-0 noise, mask math, and
    iSTFT conventions across frameworks."""
    from benchmarks.torch_proxy import TorchProxy, fft_conv_causal
    from grafx_tpu.processors import STFTMaskedNoiseReverb

    rng = np.random.default_rng(3)
    N, C, L, ir_len = 1, 2, 2**13, 8000
    x = rng.normal(size=(N, C, L)).astype(np.float32)
    init = (0.1 * rng.normal(size=(N, 2, 193))).astype(np.float32)
    delta = (0.1 * rng.normal(size=(N, 2, 193))).astype(np.float32)

    rev = STFTMaskedNoiseReverb(ir_len=ir_len, processor_channel="pseudo_midside")
    y_jax = np.asarray(rev(jnp.asarray(x), jnp.asarray(init), jnp.asarray(delta)))

    proxy = TorchProxy.__new__(TorchProxy)
    noise = torch.tensor(
        2 * np.random.RandomState(0).uniform(size=(2, ir_len)) - 1,
        dtype=torch.float32,
    )
    proxy.n_fft, proxy.hop = 384, 192
    proxy.window = torch.hann_window(384)
    proxy.noise_stft = torch.stft(
        noise, 384, 192, window=proxy.window, return_complex=True
    )[None]
    proxy.ir_len = ir_len
    proxy.num_frames = proxy.noise_stft.shape[-1]
    proxy.num_bins = 193
    y_torch = proxy.proc_reverb(
        torch.tensor(x),
        {
            "init_log_magnitude": torch.tensor(init),
            "delta_log_magnitude": torch.tensor(delta),
        },
    ).numpy()

    assert db(y_jax - y_torch, y_torch) < -60, db(y_jax - y_torch, y_torch)
