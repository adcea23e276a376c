import jax.numpy as jnp
import numpy as np
import pytest

from grafx_tpu.ops import fft_convolve


@pytest.mark.parametrize("pad_mode", ["pow2", "min"])
@pytest.mark.parametrize("x_len,h_len", [(1000, 101), (256, 256), (500, 33)])
def test_causal_matches_numpy(x_len, h_len, pad_mode):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, x_len).astype(np.float32)
    h = rng.randn(2, 3, h_len).astype(np.float32)
    y = fft_convolve(jnp.array(x), jnp.array(h), mode="causal", pad_mode=pad_mode)
    ref = np.stack(
        [
            np.stack(
                [np.convolve(x[b, c], h[b, c])[:x_len] for c in range(3)]
            )
            for b in range(2)
        ]
    )
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)


def test_zerophase_crop():
    rng = np.random.RandomState(1)
    x = rng.randn(1, 1, 300).astype(np.float32)
    h = rng.randn(1, 1, 101).astype(np.float32)
    y = fft_convolve(jnp.array(x), jnp.array(h), mode="zerophase")
    full = np.convolve(x[0, 0], h[0, 0])
    ref = full[101 // 2 : 101 // 2 + 300]
    np.testing.assert_allclose(np.asarray(y)[0, 0], ref, rtol=1e-4, atol=1e-4)


def test_channel_broadcasting():
    rng = np.random.RandomState(2)
    x = rng.randn(4, 1, 200).astype(np.float32)  # mono input
    h = rng.randn(4, 2, 50).astype(np.float32)  # stereo filter
    y = fft_convolve(jnp.array(x), jnp.array(h), mode="causal")
    assert y.shape == (4, 2, 200)
    ref = np.convolve(x[0, 0], h[0, 1])[:200]
    np.testing.assert_allclose(np.asarray(y)[0, 1], ref, rtol=1e-4, atol=1e-4)


def test_overlap_save_matches_direct_causal():
    from grafx_tpu.ops.fftconv import fft_convolve, fft_convolve_os

    rng = np.random.RandomState(3)
    for L, Lh, block in [(5000, 700, None), (2**14, 6000, None), (9999, 128, 512)]:
        x = jnp.asarray(rng.randn(2, 2, L).astype(np.float32))
        h = jnp.asarray(rng.randn(2, 2, Lh).astype(np.float32))
        a = fft_convolve(x, h, mode="causal", pad_mode="pow2")
        b = fft_convolve_os(x, h, block=block)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-3
        )


@pytest.mark.parametrize("mode", ["causal", "zerophase", "full"])
@pytest.mark.parametrize("pad_mode", ["pow2", "min"])
def test_custom_vjp_matches_autodiff(mode, pad_mode):
    """The shared-spectra custom VJP must equal plain autodiff gradients
    to float round-off, including channel broadcasting (mono filter on
    stereo signal and vice versa)."""
    import jax

    from grafx_tpu.ops import fftconv

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(3, 1, 400).astype(np.float32))
    h = jnp.asarray(rng.randn(3, 2, 77).astype(np.float32))
    dy_key = jax.random.PRNGKey(0)

    def loss_custom(x, h):
        y = fftconv._fft_convolve_shared_vjp(x, h, mode, pad_mode)
        w = jax.random.normal(dy_key, y.shape)
        return jnp.sum(y * w)

    def loss_auto(x, h):
        y, _, _ = fftconv._fft_convolve_spectra(x, h, mode, pad_mode)
        w = jax.random.normal(dy_key, y.shape)
        return jnp.sum(y * w)

    y_c = fftconv._fft_convolve_shared_vjp(x, h, mode, pad_mode)
    y_a, _, _ = fftconv._fft_convolve_spectra(x, h, mode, pad_mode)
    np.testing.assert_allclose(np.asarray(y_c), np.asarray(y_a), atol=1e-6)

    gx_c, gh_c = jax.grad(loss_custom, argnums=(0, 1))(x, h)
    gx_a, gh_a = jax.grad(loss_auto, argnums=(0, 1))(x, h)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_a), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gh_c), np.asarray(gh_a), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mode", ["causal", "zerophase"])
def test_auto_overlap_save_matches_big_fft(mode):
    """The automatic overlap-save dispatch (long conv -> blocked small
    FFTs) must match the single-big-FFT formulation to round-off,
    including gradients."""
    import jax

    from grafx_tpu.ops import fftconv

    rng = np.random.RandomState(7)
    L, Lh = 150000, 2000
    x = jnp.asarray(rng.randn(2, 2, L).astype(np.float32))
    h = jnp.asarray(rng.randn(2, 2, Lh).astype(np.float32) * 0.03)

    shift = Lh // 2 if mode == "zerophase" else 0
    block = fftconv._auto_os_block(L, Lh, shift)
    assert block is not None, "dispatch should trigger on this shape"

    y_os = fftconv.fft_convolve(x, h, mode=mode)  # auto-OS path
    y_big = fftconv._fft_convolve_shared_vjp(x, h, mode, "pow2")
    np.testing.assert_allclose(
        np.asarray(y_os), np.asarray(y_big), rtol=1e-4, atol=1e-4
    )

    g_os = jax.grad(lambda h: jnp.mean(fftconv.fft_convolve(x, h, mode=mode) ** 2))(h)
    g_big = jax.grad(
        lambda h: jnp.mean(fftconv._fft_convolve_shared_vjp(x, h, mode, "pow2") ** 2)
    )(h)
    np.testing.assert_allclose(
        np.asarray(g_os), np.asarray(g_big), rtol=1e-3, atol=1e-6
    )


def test_auto_overlap_save_filter_side_broadcast():
    """Auto-OS must preserve filter-side channel broadcasting (mono
    signal x stereo filter) on long signals (regression: the OS reshape
    used x's leading shape instead of the broadcast shape)."""
    import jax

    rng = np.random.RandomState(8)
    L, Lh = 2**18, 2000
    x = jnp.asarray(rng.randn(2, 1, L).astype(np.float32))  # mono signal
    h = jnp.asarray(rng.randn(2, 2, Lh).astype(np.float32) * 0.02)  # stereo

    y = fft_convolve(jnp.array(x), h, mode="zerophase")
    assert y.shape == (2, 2, L)
    # spot-check against the big-FFT path on a slice
    from grafx_tpu.ops import fftconv

    y_big = fftconv._fft_convolve_spectra(x, h, "zerophase", "pow2")[0]
    np.testing.assert_allclose(
        np.asarray(y[..., :5000]), np.asarray(y_big[..., :5000]),
        rtol=1e-4, atol=1e-4,
    )


def test_forward_mode_autodiff_through_fft_convolve():
    """jax.jvp must work through the default conv path (regression: a
    custom_vjp default rejected forward-mode autodiff)."""
    import jax

    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(1, 2, 500).astype(np.float32))
    h = jnp.asarray(rng.randn(1, 2, 64).astype(np.float32))
    th = jnp.ones_like(h)
    y, dy = jax.jvp(lambda h: fft_convolve(x, h, mode="causal"), (h,), (th,))
    expected = fft_convolve(x, th, mode="causal")
    np.testing.assert_allclose(np.asarray(dy), np.asarray(expected), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mode", ["causal", "zerophase", ("shift", 777)])
@pytest.mark.parametrize("x_len,h_len,part", [
    (5000, 3000, 512), (4096, 900, 256), (3000, 2561, 1024),
])
def test_upols_matches_direct(mode, x_len, h_len, part):
    """Uniformly-partitioned overlap-save == single-FFT convolution to
    round-off, for filters shorter and longer than the partition, all
    crop modes, and filter-side channel broadcasting."""
    from grafx_tpu.ops.fftconv import _fft_convolve_spectra, fft_convolve_upols

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 1, x_len).astype(np.float32))
    h = jnp.asarray(rng.randn(2, 2, h_len).astype(np.float32) * 0.05)
    y = fft_convolve_upols(x, h, mode=mode, part=part)
    ref, _, _ = _fft_convolve_spectra(x, h, mode, "pow2")
    assert y.shape == ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4, atol=2e-4)


def test_upols_gradients_match():
    import jax

    from grafx_tpu.ops.fftconv import _fft_convolve_spectra, fft_convolve_upols

    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(1, 2, 4000).astype(np.float32))
    h = jnp.asarray(rng.randn(1, 2, 1500).astype(np.float32) * 0.05)
    g1 = jax.grad(
        lambda h: jnp.mean(fft_convolve_upols(x, h, part=512) ** 2)
    )(h)
    g2 = jax.grad(
        lambda h: jnp.mean(_fft_convolve_spectra(x, h, "causal", "pow2")[0] ** 2)
    )(h)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-6)
