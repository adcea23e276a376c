"""Quantify the FSM approximation error of the reference's default IIR.

The reference's default biquad backend samples the DTFT at
``fsm_fir_len`` points and irffts to an FIR (reference:
src/grafx/processors/core/iir.py:96-152) — i.e. it time-aliases the
true infinite impulse response.  This script measures that
approximation's output error against a float64 scipy oracle for
realistic EQ cascades, alongside this framework's exact backend, to
ground BASELINE.md's matched-exactness comparison.

Runs on CPU (math property, no TPU needed):
    python benchmarks/fsm_error.py
"""

import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from scipy import signal as ss

from grafx_tpu.ops.fftconv import fft_convolve
from grafx_tpu.ops.iir import biquad_exact, iir_fsm_fir


def shelving_cascade(rng, N, K):
    """Low-w0 shelving/peaking biquads: poles near the unit circle with
    long decays — the regime real mixing EQs live in."""
    Bs = np.zeros((N, K, 3))
    As = np.zeros((N, K, 3))
    for n in range(N):
        for k in range(K):
            f0 = rng.uniform(40, 8000)
            w0 = 2 * np.pi * f0 / 44100
            q = rng.uniform(0.5, 4.0)
            gain_db = rng.uniform(-12, 12)
            A = 10 ** (gain_db / 40)
            alpha = np.sin(w0) / (2 * q)
            cw = np.cos(w0)
            Bs[n, k] = [1 + alpha * A, -2 * cw, 1 - alpha * A]
            As[n, k] = [1 + alpha / A, -2 * cw, 1 - alpha / A]
    return Bs, As


def oracle(x, Bs, As):
    y = x.astype(np.float64).copy()
    for n in range(x.shape[0]):
        for k in range(Bs.shape[1]):
            y[n] = ss.lfilter(Bs[n, k], As[n, k], y[n])
    return y


def db(err, ref):
    return 10 * np.log10(np.mean(err**2) / np.mean(ref**2) + 1e-300)


def main():
    rng = np.random.RandomState(0)
    N, K, L = 8, 6, 2**17
    Bs, As = shelving_cascade(rng, N, K)
    x = rng.randn(N, L)
    y_ref = oracle(x, Bs, As)

    for fir_len in (4000, 16384):
        fir = iir_fsm_fir(
            jnp.asarray(Bs, jnp.float32), jnp.asarray(As, jnp.float32), fir_len
        )
        y_fsm = np.asarray(
            fft_convolve(
                jnp.asarray(x, jnp.float32), fir, mode="causal", pad_mode="pow2"
            ),
            np.float64,
        )
        print(
            f"fsm (fir_len={fir_len:6d}, reference "
            f"{'default' if fir_len == 4000 else 'max tested'}):"
            f" {db(y_fsm - y_ref, y_ref):7.1f} dB"
        )

    y_exact = np.asarray(
        biquad_exact(
            jnp.asarray(x, jnp.float32),
            jnp.asarray(Bs, jnp.float32),
            jnp.asarray(As, jnp.float32),
        ),
        np.float64,
    )
    print(f"exact blocked cascade (this framework): {db(y_exact - y_ref, y_ref):7.1f} dB")

    # surgical low-frequency EQ: impulse responses longer than the FSM
    # FIR, where the reference default's time-aliasing bites
    print("\n-- surgical filters (single peaking biquad, fsm_fir_len=4000) --")
    for f0, q, g in [(30, 16, -15), (50, 12, -12), (80, 10, 12), (40, 24, -18)]:
        w0 = 2 * np.pi * f0 / 44100
        A = 10 ** (g / 40)
        alpha = np.sin(w0) / (2 * q)
        cw = np.cos(w0)
        b1 = np.array([[[1 + alpha * A, -2 * cw, 1 - alpha * A]]])
        a1 = np.array([[[1 + alpha / A, -2 * cw, 1 - alpha / A]]])
        x1 = rng.randn(1, L)
        y1 = oracle(x1, b1, a1)
        fir = iir_fsm_fir(
            jnp.asarray(b1, jnp.float32), jnp.asarray(a1, jnp.float32), 4000
        )
        y_f = np.asarray(
            fft_convolve(
                jnp.asarray(x1, jnp.float32), fir, mode="causal",
                pad_mode="pow2",
            ),
            np.float64,
        )
        y_e = np.asarray(
            biquad_exact(
                jnp.asarray(x1, jnp.float32),
                jnp.asarray(b1, jnp.float32),
                jnp.asarray(a1, jnp.float32),
            ),
            np.float64,
        )
        print(
            f"f0={f0:5.0f} Hz Q={q:4.0f} gain={g:+3.0f} dB:"
            f"  fsm {db(y_f - y1, y1):7.1f} dB"
            f"   exact {db(y_e - y1, y1):7.1f} dB"
        )


if __name__ == "__main__":
    main()
