import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal

from grafx_tpu.ops import biquad_exact, biquad_scan, iir_fsm_fir, onepole_exact


def random_stable_biquads(rng, n, k):
    """Random stable biquads via pole/zero radii < 1 (mirrors the setup of
    the reference's exactness test, tests/processors/test_filter.py:216-241)."""
    pole_r = rng.uniform(0.2, 0.95, (n, k))
    pole_th = rng.uniform(0, np.pi, (n, k))
    zero_r = rng.uniform(0.2, 0.95, (n, k))
    zero_th = rng.uniform(0, np.pi, (n, k))
    Bs = np.stack(
        [np.ones((n, k)), -2 * zero_r * np.cos(zero_th), zero_r**2], axis=-1
    )
    As = np.stack(
        [np.ones((n, k)), -2 * pole_r * np.cos(pole_th), pole_r**2], axis=-1
    )
    return Bs.astype(np.float32), As.astype(np.float32)


def scipy_cascade(x, Bs, As):
    y = x.astype(np.float64)
    for i in range(x.shape[0]):
        for k in range(Bs.shape[1]):
            y[i] = scipy.signal.lfilter(
                Bs[i, k].astype(np.float64), As[i, k].astype(np.float64), y[i]
            )
    return y


@pytest.mark.parametrize("L", [1000, 4096])
@pytest.mark.parametrize("K", [1, 3])
def test_biquad_exact_vs_scipy(L, K):
    rng = np.random.RandomState(0)
    x = rng.randn(4, L).astype(np.float32)
    Bs, As = random_stable_biquads(rng, 4, K)
    ref = scipy_cascade(x, Bs, As)
    y = biquad_exact(jnp.array(x), jnp.array(Bs), jnp.array(As), block_size=512)
    err = np.abs(np.asarray(y) - ref)
    scale = np.abs(ref).max()
    # -60 dB target; float32 blocked filtering should land far below it.
    assert err.max() / scale < 1e-3
    assert err.max() / scale < 1e-4


def test_biquad_scan_vs_scipy():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 500).astype(np.float32)
    Bs, As = random_stable_biquads(rng, 2, 2)
    ref = scipy_cascade(x, Bs, As)
    y = biquad_scan(jnp.array(x), jnp.array(Bs), jnp.array(As))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-3, atol=1e-4)


def test_biquad_exact_matches_scan():
    rng = np.random.RandomState(2)
    x = rng.randn(3, 777).astype(np.float32)  # non-multiple of block size
    Bs, As = random_stable_biquads(rng, 3, 2)
    y1 = biquad_exact(jnp.array(x), jnp.array(Bs), jnp.array(As), block_size=256)
    y2 = biquad_scan(jnp.array(x), jnp.array(Bs), jnp.array(As))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-3, atol=1e-4)


def test_biquad_exact_unnormalized():
    rng = np.random.RandomState(3)
    x = rng.randn(2, 300).astype(np.float32)
    Bs, As = random_stable_biquads(rng, 2, 1)
    As[:, :, 0] = 2.0  # a0 != 1
    Bs2, As2 = Bs / 2.0, As / 2.0
    y1 = biquad_exact(jnp.array(x), jnp.array(Bs), jnp.array(As))
    y2 = biquad_exact(jnp.array(x), jnp.array(Bs2 * 2), jnp.array(As2 * 2))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-5, atol=1e-5)


def test_fsm_fir_approximates_iir():
    rng = np.random.RandomState(4)
    Bs, As = random_stable_biquads(rng, 2, 2)
    fir = iir_fsm_fir(jnp.array(Bs), jnp.array(As), fir_len=4096)
    # impulse response comparison: well-damped poles => tiny aliasing
    imp = np.zeros((2, 4096), dtype=np.float32)
    imp[:, 0] = 1.0
    ref = scipy_cascade(imp, Bs, As)
    np.testing.assert_allclose(np.asarray(fir), ref, rtol=1e-2, atol=1e-3)


def test_onepole_exact():
    rng = np.random.RandomState(5)
    x = rng.rand(3, 1000).astype(np.float32)
    alpha = np.array([0.9, 0.99, 0.5], dtype=np.float32)
    y = onepole_exact(jnp.array(x), jnp.array(alpha), block_size=128)
    ref = np.zeros_like(x)
    for i in range(3):
        s = 0.0
        for n in range(1000):
            s = alpha[i] * s + (1 - alpha[i]) * x[i, n]
            ref[i, n] = s
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-5)


def test_biquad_exact_grad():
    rng = np.random.RandomState(6)
    x = jnp.array(rng.randn(2, 256).astype(np.float32))
    Bs, As = random_stable_biquads(rng, 2, 1)

    def loss(Bs, As):
        return jnp.sum(biquad_exact(x, Bs, As, block_size=64) ** 2)

    g_B, g_A = jax.grad(loss, argnums=(0, 1))(jnp.array(Bs), jnp.array(As))
    assert np.all(np.isfinite(np.asarray(g_B)))
    assert np.all(np.isfinite(np.asarray(g_A)))

    # finite differences on one coefficient
    eps = 1e-3
    Bp = Bs.copy()
    Bp[0, 0, 1] += eps
    Bm = Bs.copy()
    Bm[0, 0, 1] -= eps
    fd = (loss(jnp.array(Bp), jnp.array(As)) - loss(jnp.array(Bm), jnp.array(As))) / (
        2 * eps
    )
    np.testing.assert_allclose(np.asarray(g_B)[0, 0, 1], np.asarray(fd), rtol=2e-2)


def test_cascade_matches_scan_oracle():
    """The single-pass blocked cascade (K >= 3 path of biquad_exact) must
    match the sequential scan oracle."""
    rng = np.random.default_rng(5)
    N, K, L = 3, 6, 2**12
    Bs, As = random_stable_biquads(rng, N, K)
    x = rng.normal(size=(N, L)).astype(np.float32)
    y_exact = biquad_exact(jnp.asarray(x), jnp.asarray(Bs), jnp.asarray(As), block_size=256)
    y_scan = biquad_scan(jnp.asarray(x), jnp.asarray(Bs), jnp.asarray(As))
    scale = float(jnp.abs(y_scan).max())
    err = float(jnp.abs(y_exact - y_scan).max())
    assert err / scale < 1e-4, (err, scale)


def test_cascade_gradients_finite():
    rng = np.random.default_rng(6)
    N, K, L = 2, 4, 2**10
    Bs, As = random_stable_biquads(rng, N, K)
    x = jnp.asarray(rng.normal(size=(N, L)).astype(np.float32))

    def loss(Bs_, As_):
        return jnp.mean(biquad_exact(x, Bs_, As_, block_size=128) ** 2)

    g = jax.grad(loss, argnums=(0, 1))(jnp.asarray(Bs), jnp.asarray(As))
    for v in g:
        assert jnp.isfinite(v).all()
