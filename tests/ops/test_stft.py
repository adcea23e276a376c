import jax.numpy as jnp
import numpy as np
import torch
import pytest

from grafx_tpu.ops import hann_window, istft, stft


def test_stft_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 6000).astype(np.float32)
    n_fft, hop = 384, 192
    w = hann_window(n_fft).astype(np.float32)
    spec = stft(jnp.array(x), n_fft, hop, jnp.array(w))
    ref = torch.stft(
        torch.tensor(x),
        n_fft=n_fft,
        hop_length=hop,
        window=torch.tensor(w),
        return_complex=True,
    ).numpy()
    assert spec.shape == ref.shape
    np.testing.assert_allclose(np.asarray(spec), ref, rtol=1e-3, atol=1e-4)


def test_istft_matches_torch():
    rng = np.random.RandomState(1)
    n_fft, hop, length = 384, 192, 6000
    w = hann_window(n_fft).astype(np.float32)
    x = rng.randn(2, length).astype(np.float32)
    spec_t = torch.stft(
        torch.tensor(x),
        n_fft=n_fft,
        hop_length=hop,
        window=torch.tensor(w),
        return_complex=True,
    )
    # mask it so spec is no longer a perfect STFT of a real signal
    mask = torch.tensor(rng.rand(*spec_t.shape).astype(np.float32))
    spec_t = spec_t * mask
    ref = torch.istft(
        spec_t,
        n_fft=n_fft,
        hop_length=hop,
        window=torch.tensor(w),
        length=length,
    ).numpy()
    y = istft(jnp.array(spec_t.numpy()), n_fft, hop, jnp.array(w), length)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-3, atol=1e-4)


def test_roundtrip():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 4096).astype(np.float32)
    n_fft, hop = 256, 64
    w = jnp.array(hann_window(n_fft).astype(np.float32))
    y = istft(stft(jnp.array(x), n_fft, hop, w), n_fft, hop, w, 4096)
    np.testing.assert_allclose(np.asarray(y), x, rtol=1e-3, atol=1e-4)


def test_istft_matches_torch_75_overlap():
    """hop = n_fft / 4 exercises the scatter-free integer-ratio OLA."""
    rng = np.random.RandomState(3)
    n_fft, hop, length = 512, 128, 6000
    w = hann_window(n_fft).astype(np.float32)
    x = rng.randn(2, length).astype(np.float32)
    spec_t = torch.stft(
        torch.tensor(x), n_fft=n_fft, hop_length=hop,
        window=torch.tensor(w), return_complex=True,
    )
    mask = torch.tensor(rng.rand(*spec_t.shape).astype(np.float32))
    spec_t = spec_t * mask
    ref = torch.istft(
        spec_t, n_fft=n_fft, hop_length=hop,
        window=torch.tensor(w), length=length,
    ).numpy()
    y = istft(jnp.array(spec_t.numpy()), n_fft, hop, jnp.array(w), length)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-3, atol=1e-4)


def test_istft_matches_torch_noninteger_ratio():
    """hop that does not divide n_fft takes the scatter fallback."""
    rng = np.random.RandomState(4)
    n_fft, hop, length = 384, 160, 4800
    w = hann_window(n_fft).astype(np.float32)
    x = rng.randn(1, length).astype(np.float32)
    spec_t = torch.stft(
        torch.tensor(x), n_fft=n_fft, hop_length=hop,
        window=torch.tensor(w), return_complex=True,
    )
    ref = torch.istft(
        spec_t, n_fft=n_fft, hop_length=hop,
        window=torch.tensor(w), length=length,
    ).numpy()
    y = istft(jnp.array(spec_t.numpy()), n_fft, hop, jnp.array(w), length)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("n_fft,hop,length", [
    (512, 128, 6000),   # r = 4 (75% overlap), hop divides length check off
    (384, 128, 5000),   # r = 3, length not a hop multiple
    (256, 256, 4096),   # r = 1 (no overlap)
])
def test_stft_matches_torch_integer_ratios(n_fft, hop, length):
    """Gather-free framing must match torch.stft for any integer ratio."""
    rng = np.random.RandomState(5)
    x = rng.randn(2, length).astype(np.float32)
    w = hann_window(n_fft).astype(np.float32)
    spec = stft(jnp.array(x), n_fft, hop, jnp.array(w))
    ref = torch.stft(
        torch.tensor(x), n_fft=n_fft, hop_length=hop,
        window=torch.tensor(w), return_complex=True,
    ).numpy()
    assert spec.shape == ref.shape
    np.testing.assert_allclose(np.asarray(spec), ref, rtol=1e-3, atol=1e-4)
