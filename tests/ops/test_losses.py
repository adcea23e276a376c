import jax.numpy as jnp
import numpy as np
import pytest

from grafx_tpu.ops.losses import (
    multi_resolution_stft_loss,
    multi_resolution_stft_loss_precomputed,
    precompute_stft_targets,
)


def test_mrstft_precomputed_target_matches():
    """Precomputing the target spectrograms must not change the loss."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 2, 8192).astype(np.float32))
    y = jnp.asarray(rng.randn(2, 2, 8192).astype(np.float32))
    full = multi_resolution_stft_loss(x, y)
    pre = multi_resolution_stft_loss_precomputed(x, precompute_stft_targets(y))
    assert float(jnp.abs(full - pre)) == 0.0

    with pytest.raises(ValueError):
        multi_resolution_stft_loss_precomputed(
            x, precompute_stft_targets(y, n_ffts=(512,))
        )
