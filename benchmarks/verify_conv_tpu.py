"""On-TPU exactness check for the convolution dispatch paths.

The pytest gates (tests/ops/test_fftconv.py) run on CPU; this script
verifies ON THE CHIP that the blocked overlap-save (AUTO_OS) and
uniformly-partitioned (UPOLS) formulations agree with a float64 numpy
direct convolution for the BASELINE workloads (zero-phase 2047-tap EQ,
60k-tap causal reverb IR) — the same hardware-honesty protocol as
benchmarks/verify_iir_tpu.py (the TPU FFT path has no bf16 shortcut to
catch, but the blocked index bookkeeping deserves an on-device gate).

Usage: python benchmarks/verify_conv_tpu.py
"""

import os
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def db(err, ref):
    return 10 * np.log10(
        np.mean(err**2) / (np.mean(ref**2) + 1e-300) + 1e-300
    )


def oracle_causal(x, h):
    y = np.empty_like(x, dtype=np.float64)
    for n in range(x.shape[0]):
        for c in range(x.shape[1]):
            hc = h[n, c if h.shape[1] > 1 else 0]
            y[n, c] = np.convolve(
                x[n, c].astype(np.float64), hc.astype(np.float64)
            )[: x.shape[-1]]
    return y


def oracle_zerophase(x, h):
    shift = h.shape[-1] // 2
    full = np.empty(
        (x.shape[0], x.shape[1], x.shape[-1] + h.shape[-1] - 1), np.float64
    )
    for n in range(x.shape[0]):
        for c in range(x.shape[1]):
            hc = h[n, c if h.shape[1] > 1 else 0]
            full[n, c] = np.convolve(
                x[n, c].astype(np.float64), hc.astype(np.float64)
            )
    return full[..., shift : shift + x.shape[-1]]


def main():
    from grafx_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # repeat on-chip runs compile ~14x faster
    from grafx_tpu.ops.fftconv import fft_convolve, fft_convolve_upols

    print("backend:", jax.default_backend())
    print("AUTO_OS:", os.environ.get("GRAFX_TPU_CONV_AUTO_OS", "1") != "0")
    rng = np.random.RandomState(0)

    # zero-phase 2047-tap EQ on 2^17 audio (config-2 EQ shape) — the
    # AUTO_OS path blocks this into short-FFT overlap-save
    x = rng.randn(2, 2, 2**17).astype(np.float32)
    h = rng.randn(2, 1, 2047).astype(np.float32)
    y = np.asarray(
        fft_convolve(jnp.asarray(x), jnp.asarray(h), mode="zerophase"),
        np.float64,
    )
    e = db(y - oracle_zerophase(x, h), y)
    print(f"zerophase 2047-tap (AUTO_OS) : error {e:7.1f} dB (target <= -60)")

    # 60k-tap causal reverb IR (config-2 reverb shape) — UPOLS
    h = rng.randn(2, 2, 60000).astype(np.float32)
    y = np.asarray(
        fft_convolve_upols(jnp.asarray(x), jnp.asarray(h), mode="causal"),
        np.float64,
    )
    e = db(y - oracle_causal(x, h), y)
    print(f"causal 60k-tap (UPOLS)       : error {e:7.1f} dB (target <= -60)")

    # same IR through the auto dispatcher
    y = np.asarray(
        fft_convolve(jnp.asarray(x), jnp.asarray(h), mode="causal"),
        np.float64,
    )
    e = db(y - oracle_causal(x, h), y)
    print(f"causal 60k-tap (auto)        : error {e:7.1f} dB (target <= -60)")


if __name__ == "__main__":
    main()
