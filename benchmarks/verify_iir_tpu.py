"""On-TPU exactness check for the blocked exact-IIR cascade.

The pytest gates (tests/ops/test_iir.py) run on CPU where matmuls are
true float32; on TPU the MXU computes float32 contractions as bf16
passes unless the op requests higher precision.  This script measures
the actual on-device error of ``biquad_exact`` against a float64 scipy
oracle, for realistic EQ cascades including near-unit-circle shelving
poles, and reports dB error (target: <= -60 dB).

Usage: python benchmarks/verify_iir_tpu.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as ss

from grafx_tpu.utils import enable_compilation_cache

enable_compilation_cache()  # repeat on-chip runs compile ~14x faster
from grafx_tpu.ops.iir import biquad_exact


def random_stable_biquads(rng, N, K, r_lo=0.2, r_hi=0.999, normalized=False):
    r = rng.uniform(r_lo, r_hi, (N, K))
    th = rng.uniform(0.02, np.pi - 0.02, (N, K))
    a1 = -2 * r * np.cos(th)
    a2 = r**2
    As = np.stack([np.ones_like(a1), a1, a2], -1)
    Bs = rng.randn(N, K, 3)
    if normalized:
        # bound each section's peak gain to ~1 (the realistic contract:
        # EQ/filter sections have bounded boost by construction).  A
        # cascade of K *unnormalized* random sections has lognormal
        # gain whose dynamic range exceeds what float32 can represent
        # end-to-end around K ~ 30: the f32 sequential recursion itself
        # only reaches -68 dB on the K=34 unnormalized draw, so no f32
        # algorithm can hit -60 there (see BASELINE.md).
        w = np.linspace(0, np.pi, 512)
        z = np.exp(-1j * w)[None, None, :]
        num = Bs[..., :1] + Bs[..., 1:2] * z + Bs[..., 2:3] * z * z
        den = As[..., :1] + As[..., 1:2] * z + As[..., 2:3] * z * z
        peak = np.abs(num / den).max(-1, keepdims=True)
        Bs = Bs / peak
    return Bs.astype(np.float64), As.astype(np.float64)


def oracle(x, Bs, As):
    y = x.astype(np.float64)
    for n in range(x.shape[0]):
        yn = y[n]
        for k in range(Bs.shape[1]):
            yn = ss.lfilter(Bs[n, k], As[n, k], yn)
        y[n] = yn
    return y


def db(err, ref):
    return 10 * np.log10(
        np.mean(err**2) / (np.mean(ref**2) + 1e-300) + 1e-300
    )


def main():
    print("backend:", jax.default_backend())
    rng = np.random.RandomState(0)
    for name, (N, K, L, r_hi, normalized) in {
        "eq-like  (K=6,  r<=0.95) ": (8, 6, 2**17, 0.95, False),
        "eq-like  (K=6,  r<=0.999)": (8, 6, 2**17, 0.999, False),
        "geq-like (K=24, r<=0.99) ": (4, 24, 2**17, 0.99, False),
        "fused-like (K=34, r<=0.99, unit-peak sections)": (
            4, 34, 2**17, 0.99, True,
        ),
    }.items():
        Bs, As = random_stable_biquads(
            rng, N, K, r_hi=r_hi, normalized=normalized
        )
        x = rng.randn(N, L)
        y_ref = oracle(x, Bs, As)
        y = biquad_exact(
            jnp.asarray(x, jnp.float32),
            jnp.asarray(Bs, jnp.float32),
            jnp.asarray(As, jnp.float32),
        )
        y = np.asarray(jax.block_until_ready(y), np.float64)
        e = db(y - y_ref, y_ref)
        print(f"{name}: error {e:7.1f} dB  (target <= -60)")
        sys.stdout.flush()
        assert e <= -60.0, f"{name}: {e:.1f} dB misses the -60 dB contract"

    # Build-formulation equivalence ON THIS DEVICE: the shipped
    # defaults (reshape Toeplitz + associative-scan powers — the forms
    # the r4 interleaved A/B picked) vs the gather / doubling
    # alternates kept behind the env flags
    # (GRAFX_TPU_TOEPLITZ_BUILD / GRAFX_TPU_POWERS).  CPU asserts
    # bitwise (Toeplitz) / error-class (powers) equality; this repeats
    # the check where MXU/VPU lowering differs.
    from grafx_tpu.ops import iir as iir_mod

    Bs, As = random_stable_biquads(rng, 4, 24, r_hi=0.99, normalized=False)
    x = rng.randn(4, 2**15)
    y_ref = oracle(x, Bs, As)
    xj = jnp.asarray(x, jnp.float32)
    Bj, Aj = jnp.asarray(Bs, jnp.float32), jnp.asarray(As, jnp.float32)
    y_new = np.asarray(jax.block_until_ready(biquad_exact(xj, Bj, Aj)))
    saved = (
        iir_mod._TOEPLITZ_BUILD,
        iir_mod._POWERS_BUILD,
        iir_mod._CASCADE_COMPOSE,
    )
    iir_mod._TOEPLITZ_BUILD = "gather"
    iir_mod._POWERS_BUILD = "doubling"
    iir_mod._CASCADE_COMPOSE = "fft"
    jax.clear_caches()
    try:
        y_old = np.asarray(jax.block_until_ready(biquad_exact(xj, Bj, Aj)))
    finally:
        (
            iir_mod._TOEPLITZ_BUILD,
            iir_mod._POWERS_BUILD,
            iir_mod._CASCADE_COMPOSE,
        ) = saved
        jax.clear_caches()
    e = db((y_new - y_old).astype(np.float64), y_old.astype(np.float64))
    e_new = db(y_new.astype(np.float64) - y_ref, y_ref)
    e_old = db(y_old.astype(np.float64) - y_ref, y_ref)
    # Mutual f32-vs-f32 agreement between the two assemblies.  The
    # Toeplitz builds are bitwise-equal (tests/ops/test_iir.py); the
    # powers differ in product-split rounding only.  CPU measures
    # -105 dB; on TPU, XLA's fma contraction / fusion choices differ
    # per formulation and the r<=0.99 UNNORMALIZED K=24 cascade
    # amplifies those last-bit differences through its lognormal gain,
    # so the r3 on-chip run measured -92.9 dB.  Neither assembly is
    # wrong — both sit at the same error class vs the float64 oracle
    # (printed below; that is the number that matters).  Target re-set
    # to -80 dB mutual with that rationale (VERDICT r3 #1): a genuinely
    # broken formulation shows up ~-30 dB (the bf16-MXU class), far
    # from this gate.
    print(
        f"build-formulation (reshape/scan/fft defaults vs gather/doubling"
        f" alternates): mutual {e:7.1f} dB (target <= -80);"
        f" vs f64 oracle: default {e_new:6.1f} dB, alternate {e_old:6.1f} dB"
    )
    assert e <= -80.0, f"build-formulation mutual agreement {e:.1f} dB > -80"
    assert abs(e_new - e_old) < 6.0, (
        f"assemblies differ in oracle error class: {e_new:.1f} vs {e_old:.1f} dB"
    )
    print("verify_iir_tpu: ALL GATES PASSED")


if __name__ == "__main__":
    main()
